"""Subprocess worker for the REAL 2-process multi-host test
(tests/test_multihost_mp.py). Each invocation is one "host": its own JAX
process with 4 virtual CPU devices, rendezvousing through
``jax.distributed.initialize`` and running ONE hybrid-mesh sharded train
step on host-sharded data.

Run only via the test; prints ``LOSS <value>`` (process 0) on success.
"""

import sys


def main() -> None:
    coordinator, pid, nprocs, outfile = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    # optional 5th arg: save the post-step sharded state here (both
    # processes participate in the orbax write — the multi-process
    # checkpoint path under test in test_multihost_mp.py)
    ckpt_dir = sys.argv[5] if len(sys.argv) > 5 else None

    import os

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    )
    import jax

    # this jax build ignores the JAX_PLATFORMS env var; only the config API
    # works (and it must run before distributed init touches a backend)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from midd_tpu.parallel.multihost import (
        host_local_batch_to_global,
        init_distributed,
        make_hybrid_mesh,
        mesh_fabric_report,
        process_batch_slice,
    )

    started = init_distributed(
        coordinator_address=coordinator, num_processes=nprocs, process_id=pid
    )
    assert started, "init_distributed must report a multi-process runtime"
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.process_index() == pid
    assert len(jax.devices()) == 4 * nprocs, len(jax.devices())

    # each host = one "slice" of 4 devices; dp is slice-major (crosses DCN),
    # tp stays inside a host
    mesh = make_hybrid_mesh(tp=2, sp=1, devices_per_slice=4)
    report = mesh_fabric_report(mesh, devices_per_slice=4)
    assert report == {"dp": "dcn", "sp": "ici", "tp": "ici"}, (
        report,
        [(d.id, d.process_index) for d in mesh.devices.ravel()],
    )

    import numpy as np
    import jax.numpy as jnp
    import optax

    from midd_tpu.parallel.train_dp import make_sharded_train_step
    from tests._multihost_worker import make_problem  # self-import for reuse

    params, clean, noisy, loss_fn = make_problem()

    tx = optax.sgd(1e-2)
    step_fn, s_params, s_opt = make_sharded_train_step(
        loss_fn, tx, params, mesh, min_size=64
    )

    # host-sharded loading: THIS host materializes only its 4 rows
    start, nrows = process_batch_slice(clean.shape[0])
    assert nrows == clean.shape[0] // nprocs
    g_clean = host_local_batch_to_global(clean[start : start + nrows], mesh)
    g_noisy = host_local_batch_to_global(noisy[start : start + nrows], mesh)

    _p, _o, loss = step_fn(
        s_params, s_opt, (g_clean, g_noisy), jax.random.PRNGKey(0)
    )
    loss = float(loss)
    if ckpt_dir:
        # every process participates: orbax coordinates the distributed
        # write through the jax runtime; each host contributes its shards
        from midd_tpu.utils.checkpoint import save_checkpoint

        save_checkpoint(
            ckpt_dir, {"params": _p, "opt_state": _o}, {"loss": loss}
        )
    if pid == 0:
        with open(outfile, "w") as f:
            f.write(repr(loss))
        print("LOSS", loss, flush=True)
    # clean shutdown so the coordinator does not log spurious disconnects
    jax.distributed.shutdown()


def make_problem():
    """Deterministic tiny conv regression shared by workers and the parent's
    single-process reference: global batch 8, one 3x3 conv (16 out channels,
    tp-shardable), MSE loss."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1234)
    clean = rng.standard_normal((8, 8, 8, 1)).astype(np.float32)
    noisy = (clean + 0.1 * rng.standard_normal(clean.shape)).astype(np.float32)
    params = {
        "kernel": jnp.asarray(
            rng.standard_normal((3, 3, 1, 16)).astype(np.float32) * 0.1
        ),
        "proj": jnp.asarray(
            rng.standard_normal((16, 1)).astype(np.float32) * 0.1
        ),
    }

    def loss_fn(p, batch, rng_key):
        clean_b, noisy_b = batch
        h = jax.lax.conv_general_dilated(
            noisy_b, p["kernel"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        pred = jnp.einsum("bhwc,co->bhwo", jax.nn.relu(h), p["proj"])
        return jnp.mean((pred - clean_b) ** 2), {}

    return params, clean, noisy, loss_fn


if __name__ == "__main__":
    main()
