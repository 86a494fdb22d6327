"""Multi-host / multi-slice (DCN-aware) scale-out layer.

The reference is single-GPU (SURVEY section 2.5); ``parallel/mesh.py`` is the
single-host (ICI) scale-out layer it lacks. This module extends that layer to
multi-host TPU pods and multi-slice deployments, where two interconnects with
a ~10x bandwidth gap coexist:

- ICI: the intra-slice torus — fast; where tp all-gathers/partials and sp
  conv halo exchanges must live;
- DCN: the inter-slice datacenter network — slow; only the once-per-step
  data-parallel gradient psum should cross it.

The design keeps the SAME axis names ("dp", "sp", "tp") and therefore the
same sharding rules, train steps, and engine paths as the single-host layer:
DCN-awareness lives purely in the DEVICE ORDER of the mesh array. The dp
axis is laid out so its outer stride crosses slices while every (sp, tp)
block stays inside one slice — XLA then routes each collective over the
right fabric (the scaling-book recipe: pick the mesh, annotate, let XLA
insert collectives).

Pieces:
- ``init_distributed``     — gated ``jax.distributed.initialize`` wrapper
  (one JAX process per host; no-op when single-process).
- ``make_hybrid_mesh``     — the DCN-aware (dp, sp, tp) mesh.
- ``process_batch_slice``  / ``host_local_batch_to_global`` — host-sharded
  data loading: each host loads ONLY its rows, then the per-host shards are
  assembled into one global ``jax.Array`` without any cross-host transfer.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    initialization_timeout: Optional[float] = None,
) -> bool:
    """Initialize the JAX multi-process runtime (one process per host).

    Arguments default to the standard env vars (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``); on Cloud TPU pods with no
    explicit configuration ``jax.distributed.initialize()`` auto-detects.
    Returns True when a multi-process runtime was started, False when
    single-process (already initialized, or nothing configured) — callers can
    use it unconditionally.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False  # single-process run; nothing to do
    kw = {}
    if initialization_timeout is not None:
        # bounded rendezvous (default upstream is 300 s) — lets launchers and
        # the fail-fast test surface a dead coordinator quickly
        kw["initialization_timeout"] = initialization_timeout
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kw,
        )
        return True
    except RuntimeError as e:
        if "already" in str(e).lower():
            return False  # initialize() called twice — benign
        # A configured multi-host launch that cannot connect must FAIL FAST:
        # silently degrading to independent single-process runs would train
        # every host on the full batch with no gradient sync (wrong results,
        # not an error).
        raise


def _slice_index(device) -> Optional[int]:
    """Hardware slice id when the backend exposes one (TPU multislice)."""
    return getattr(device, "slice_index", None)


def make_hybrid_mesh(
    tp: int = 1,
    sp: int = 1,
    devices: Optional[Sequence] = None,
    devices_per_slice: Optional[int] = None,
) -> Mesh:
    """A (dp, sp, tp) mesh whose (sp, tp) blocks never cross a slice.

    Slice membership comes from ``device.slice_index`` when the hardware
    exposes it (TPU multislice); otherwise ``devices_per_slice`` partitions
    the flat device list into contiguous slices (also how tests model slices
    on virtual CPU devices). With one slice this degrades exactly to
    ``mesh.make_mesh``'s layout.

    Deliberately NOT ``jax.experimental.mesh_utils.create_hybrid_device_mesh``:
    that helper requires real ``slice_index`` attributes (absent on the
    virtual CPU devices the test suite and the driver dryrun run on) and
    fixes its own axis convention; this explicit layout is what
    ``mesh_fabric_report`` asserts against in CI and the dryrun.

    Every slice must hold a multiple of sp*tp devices; dp collects the
    remaining factor from all slices, ordered slice-major so the OUTER dp
    stride is the only thing that crosses DCN.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if sp * tp == 0 or n % (sp * tp):
        raise ValueError(f"{n} devices not divisible by sp*tp={sp * tp}")

    slices: list[list] = []
    if devices_per_slice is None and _slice_index(devices[0]) is not None:
        by_slice: dict = {}
        for d in devices:
            by_slice.setdefault(_slice_index(d), []).append(d)
        slices = [by_slice[k] for k in sorted(by_slice)]
    else:
        per = devices_per_slice or n
        if n % per:
            raise ValueError(f"{n} devices not divisible by slice size {per}")
        slices = [devices[i : i + per] for i in range(0, n, per)]

    per = len(slices[0])
    if any(len(s) != per for s in slices):
        raise ValueError("unequal slice sizes: " + str([len(s) for s in slices]))
    if per % (sp * tp):
        raise ValueError(
            f"slice size {per} not divisible by sp*tp={sp * tp}: the sp/tp "
            "axes must live inside one slice (ICI), never across DCN"
        )

    # Slice-major dp: arr[dp, sp, tp]; dp index = slice*per_slice_dp + local.
    per_dp = per // (sp * tp)
    arr = np.concatenate(
        [np.asarray(s).reshape(per_dp, sp, tp) for s in slices], axis=0
    )
    return Mesh(arr, axis_names=("dp", "sp", "tp"))


def process_batch_slice(global_batch: int, n_hosts: Optional[int] = None,
                        host_id: Optional[int] = None) -> Tuple[int, int]:
    """(start_row, n_rows) of the global batch THIS host should load.

    The loader-side half of host-sharded data loading: each host reads only
    its own rows from disk (no host ever materializes the global batch).
    Single-process: (0, global_batch).
    """
    n_hosts = jax.process_count() if n_hosts is None else n_hosts
    host_id = jax.process_index() if host_id is None else host_id
    if global_batch % n_hosts:
        raise ValueError(f"batch {global_batch} not divisible by {n_hosts} hosts")
    per = global_batch // n_hosts
    return host_id * per, per


def host_local_batch_to_global(local_batch, mesh: Mesh,
                               spec: Optional[P] = None):
    """Assemble per-host batch shards into one global dp-sharded jax.Array.

    ``local_batch``'s leading axis is this host's rows (from
    ``process_batch_slice``); the result behaves as the full global batch
    sharded ``P("dp", "sp")`` (rows over dp, image height over sp when the
    mesh has one) with zero cross-host data movement — each device keeps the
    rows its own host loaded, because the mesh's dp axis is slice-major.
    """
    spec = P("dp", "sp") if spec is None else spec
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, np.asarray(local_batch))


def mesh_fabric_report(mesh: Mesh, devices_per_slice: Optional[int] = None) -> dict:
    """Which axes cross DCN vs ride ICI — for logs/dryruns.

    An axis "crosses DCN" when two devices that differ only along it sit in
    different slices. Used by the multichip dryrun to assert the layout
    invariant (sp/tp never cross)."""
    devs = mesh.devices
    n = devs.size
    # explicit devices_per_slice takes precedence over any hardware
    # slice_index (distributed CPU devices can report slice_index=0 for
    # every process, which would hide the DCN boundary the caller modelled)
    flat = list(devs.ravel())
    order = {id(d): i for i, d in enumerate(sorted(flat, key=lambda d: (d.process_index, d.id)))}

    def slice_of(d) -> int:
        if devices_per_slice is not None:
            return order[id(d)] // devices_per_slice
        s = _slice_index(d)
        if s is not None:
            return s
        return int(d.id) // n

    report = {}
    for ax, name in enumerate(mesh.axis_names):
        crosses = False
        moved = np.moveaxis(devs, ax, 0)
        flat = moved.reshape(moved.shape[0], -1)
        for col in range(flat.shape[1]):
            if len({slice_of(d) for d in flat[:, col]}) > 1:
                crosses = True
                break
        report[name] = "dcn" if crosses else "ici"
    return report
