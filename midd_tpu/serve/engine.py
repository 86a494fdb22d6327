"""Serving engine: loads all four model families, compiles each inference
path ONCE at startup (fixed 512x512 shapes, warmup call), and answers
requests with per-path exception isolation + per-model latency logs —
the TPU-native ModelManager (reference: run.py:20-151).

Key differences from the reference, by design:
- every path is a single jitted XLA program; the diffusion rollout is a
  ``lax.scan`` (no per-step host sync, run.py:107 vs midd_tpu.diffusion);
- the hybrid is ONE fused fan-out graph instead of eager
  NAFNet -> rollout -> router -> fusion dispatches (SURVEY 3.5);
- models can run in bf16 on TPU (fp32 norms) via ``compute_dtype``.

Checkpoint sources per model, in priority order:
1. orbax checkpoint dir  <ckpt_dir>/<name>/
2. reference torch file  <ckpt_dir>/<name>.pth (converted on load)
3. seeded random init (demo mode) — the reference's .pth files are not
   distributed with its repo either.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from midd_tpu import config
from midd_tpu.diffusion import denoise, make_schedule
from midd_tpu.models import (
    EnhancedNAFNet,
    ExpertDenoiser,
    FusionModule,
    NoiseAnalyzer,
    UNetDiffusion,
)
from midd_tpu.models.hybrid import hybrid_forward
from midd_tpu.serve.codec import tensor_to_base64_png
from midd_tpu.utils.logging import get_logger

MODEL_NAMES = ("diffusion", "nafnet", "expert", "hybrid")

log = get_logger("engine")


@dataclass
class EngineConfig:
    img_size: int = config.SERVE_IMG_SIZE
    diffusion_steps: int = config.SERVE_DIFFUSION_STEPS  # run.py:107
    hybrid_diffusion_steps: int = 8  # run.py:72-73
    ckpt_dir: str = "checkpoints"
    compute_dtype: Optional[Any] = None  # e.g. jnp.bfloat16 on TPU
    use_flash_attention: Optional[bool] = None  # None = auto (TPU yes, CPU no)
    warmup: bool = True
    # model architecture overrides (tests / small deployments)
    nafnet_cfg: Any = config.SERVE_NAFNET
    diffusion_cfg: Any = config.SERVE_DIFFUSION
    expert_cfg: Any = config.SERVE_EXPERT
    router_cfg: Any = field(default_factory=config.RouterConfig)
    fusion_cfg: Any = field(default_factory=config.FusionConfig)
    schedule_cfg: Any = config.SERVE_SCHEDULE
    # dynamic micro-batching of concurrent requests (one compiled program per
    # bucket per model; see midd_tpu.serve.batching)
    batching: bool = False
    # "auto" picks buckets by image size from TPU measurements
    # (examples/serving_load_test.py, 8 concurrent clients, v5e-lite):
    #   <=256²: (1,2,4,8) — batch-8 rollouts are ~4.4x cheaper/img than
    #     batch-1 (bench.py scaling probe), so the queue rides the bucket;
    #   512²+:  (1,)     — the chip saturates at batch 1; every coalescing
    #     level measured WORSE (req/s: 2.55 @ (1,) > 1.84 @ (1,2) >
    #     1.72 @ (1,2,4) > 1.39 @ (1,2,4,8)); the queue still wins 2.5x
    #     over thread-concurrent dispatch (1.03) by serializing cleanly.
    batch_buckets: Any = "auto"
    batch_max_wait_ms: float = 4.0
    # batch-sharded inference over a dp mesh (multi-chip serving; SURVEY
    # section 7 step 10). Buckets must be multiples of the dp size.
    data_parallel: bool = False
    # tensor-parallel inference: conv/dense kernels with >= tp_min_size
    # elements are sharded over the mesh's tp axis (output channels); XLA
    # partitions the convs and inserts the collectives. Composes with
    # data_parallel (batch over dp, weights over tp).
    tensor_parallel: bool = False
    tp_min_size: int = 1 << 16
    # tp axis size; None = all devices when tensor_parallel alone (so batch-1
    # requests work: dp=1), else the (4,2,1) mesh policy when composed with dp.
    tp_size: Optional[int] = None
    # spatial parallelism: the image H axis is sharded over the mesh's sp
    # axis and GSPMD inserts the conv halo exchanges — the batch-1 LATENCY
    # lever (dp needs batch >= devices; sp splits one image). Composes with
    # dp/tp (set sp_size); alone it takes every device.
    spatial_parallel: bool = False
    sp_size: Optional[int] = None
    # accelerated sampling: an int k recomputes epsilon every k-th step
    # (FORA-style uniform stride); a tuple of scan indices is an EXPLICIT
    # refresh schedule (sampler.eps_refresh_idx). GROUND-TRUTH-GATED on
    # xraybench-v1 (turbo_gate_r3.json + the round-3 schedule study,
    # ROADMAP.md): on the 8-requested/9-actual serving rollout the studied
    # schedule {0,2,6,7} is quality-free for the standalone path
    # (-0.007 dB at 2.25x fewer UNet evals) while uniform k=2 costs
    # -0.56 dB with MORE evals. "auto" (the default) serves the studied
    # schedule at the 8-step serving count and exact everywhere else:
    # the schedule has now passed the standalone gate on TWO independent
    # checkpoint generations (-0.007 dB then +0.05, turbo_gate_r3.json /
    # turbo_gate_r3b.json) — unlike uniform strides, whose quality proved
    # weight-sensitive. Pin 1 for the exact reference rollout; always
    # re-gate per deployment (xray_bench --turbo-gate).
    turbo_eps_reuse: Any = "auto"
    # None = auto (measured preference order): the fused shared rollout
    # when available (free and exact); else the studied {0,2,6,7} schedule
    # at the served 8-step count (quality-free-to-POSITIVE on BOTH gated
    # hybrid profiles); else the legacy gated k=2 (index schedules are
    # rollout-length-specific).
    hybrid_turbo_eps_reuse: Optional[Any] = None
    # mixed-precision hybrid: run ONLY the hybrid's internal diffusion-UNet
    # evals in bf16 (weights stay fp32; the posterior-mean update, NAFNet,
    # expert, router and fusion keep the engine compute_dtype). Rationale:
    # the whole-engine bf16 gate showed the STANDALONE diffusion path is
    # bf16-free (−0.002 dB) while whole-engine bf16 costs the hybrid
    # −0.34 dB (the NAFNet branch carries the loss) — and the fp32 rollout
    # is ~80% of the hybrid's 512² latency. GATED on xraybench-v1
    # (hybrid_bf16_rollout_gate.json): 46.227/0.9954 IDENTICAL to fp32 on
    # the regenerated checkpoints, and −0.007 dB composed with the default
    # refresh schedule — on by default; pin False for the all-fp32 hybrid,
    # and re-gate per deployment like every precision lever.
    hybrid_rollout_bf16: bool = True
    # mirror of hybrid_rollout_bf16 for the STANDALONE diffusion path: UNet
    # evals in bf16, posterior-mean update + clip in fp32. The whole-path
    # bf16 gate already measured this path bf16-free (−0.002 dB) and this
    # form is strictly closer to fp32; gate on the regenerated checkpoints
    # (hybrid_bf16_rollout_gate.json): 33.662 bf16 vs 33.653 fp32 —
    # quality-FREE, on by default. No-op when compute_dtype is set.
    diffusion_eval_bf16: bool = True
    # fused single-program requests: compile ALL FOUR model paths into ONE
    # XLA program for the /denoise contract. When the hybrid checkpoint
    # falls back to the standalone backends (trainer-saved hybrids / no
    # hybrid ckpt), the NAFNet forward — and, when the step count and
    # eps_reuse match, the whole diffusion rollout — is computed ONCE and
    # reused for both its standalone output and the hybrid's input
    # (bit-identical semantics: the raw backend outputs are injected into
    # hybrid_forward, whose nan/clamp walls run unchanged). Also saves 3 of
    # the 4 per-request dispatch round-trips (~30 ms each over the tunnel).
    # MEASURED OFF by default (TPU v5e-lite, 512², trained ckpts): although
    # the fused program computes strictly less work (one rollout + one
    # NAFNet instead of ~1.5 rollouts + two NAFNets), merging models into
    # one XLA module costs ~40-50 ms per added model in lost
    # scheduling/layout quality (rollout 213 ms, +naf 284, +expert 338,
    # all-4 387 vs a 240 ms sum of parts), which eats the sharing win:
    # endpoint solo p50 607 ms fused vs 572 per-path, 2.26 vs 2.52 req/s
    # under 8 clients. Kept as a tested opt-in (fused == per-path outputs
    # pinned by tests/test_fused_request.py) for deployments where dispatch
    # round-trips dominate. Per-path exception isolation is preserved by
    # falling back to the per-path programs if the fused dispatch raises.
    fused_request: Optional[bool] = None  # None = off (measured); True = on
    # persistent XLA compilation cache: warm process starts load executables
    # from disk instead of recompiling (round-1 cost: ~19 min cold warmup at
    # 512² with batching over the TPU tunnel)
    persistent_cache: bool = True
    cache_dir: Optional[str] = None
    # space-to-depth stage-0 layout for BOTH NAFNet instances (standalone +
    # hybrid backend): numerically equivalent, same checkpoints
    # (ops/naf_s2d.py — the C=32 lane-padding fix). Measured opt-in.
    nafnet_s2d: bool = False
    # opt-in int8 convs inside the diffusion UNets (standalone + hybrid
    # backend). NOT exact — gated on the xraybench-v1 ground-truth benchmark
    # (PARITY.md). Values:
    #   "static" — calibrated activation scales (a short calibration rollout
    #     over the three noise families runs once at startup); the fast path:
    #     no per-call reductions, quantize fuses into each producer.
    #   True / "dynamic" — per-call abs-max scales (no calibration, but each
    #     conv pays a full-tensor reduction; measured SLOWER end-to-end).
    quantize_int8: Any = False
    # LOAD-ADAPTIVE turbo (requires batching=True): when the request queue
    # depth at dispatch time reaches adaptive_queue_depth, the heavy paths
    # (diffusion + hybrid) switch to their quality-gated turbo programs —
    # the saturated-load pressure valve the round-2 verdict asked for
    # (512²: the chip saturates at batch 1 and p50 grows with the queue;
    # the gated levers sat unused). Tier settings accept an int k
    # (eps_reuse) or a tuple of refresh indices (sampler.eps_refresh_idx,
    # e.g. from the round-3 turbo schedule study).
    # Tier defaults = the round-3 turbo schedule study's brute-force
    # winners for the 9-step serving rollout (turbo_schedule_study.json;
    # gated per-checkpoint via xray_bench --turbo-gate --turbo-idx):
    # since {0,2,6,7} became the SERVING DEFAULT (quality-free on two
    # checkpoint generations), escalation steps further down to {0,2,7}
    # (3 evals; re-gate: standalone -0.12 dB, hybrid -0.009 —
    # turbo_gate_r3b.json). Uniform k-strides are strictly worse
    # (k=2: -0.56 dB with MORE evals) — fresh eps matters at the trajectory
    # ends (steps 6-7; the final step's eps coefficient is 3x smaller and
    # nearly free to reuse), not on a uniform grid.
    adaptive_turbo: bool = False
    adaptive_queue_depth: int = 3
    adaptive_diffusion_eps: Any = (0, 2, 7)
    adaptive_hybrid_eps: Any = (0, 2, 7)
    # bounded admission: batcher.submit raises QueueFull beyond this many
    # waiting requests (the HTTP layer answers 503). None = unbounded.
    max_queue_depth: Optional[int] = None
    # AOT executable pinning (round-2 verdict item 8): serialize the exact
    # serving executables (per model x batch bucket) into this dir at first
    # warmup and LOAD them on later starts — cold start independent of
    # .xla_cache eviction / lazy-trace costs. Single-device engines only
    # (deserialization targets the process's full addressable device set,
    # see utils/compile_cache.load_executable). Fingerprints cover arch,
    # shapes, step counts, eps settings, dtype, jax version, device kind;
    # stale or foreign-topology files are recompiled and overwritten.
    aot_dir: Optional[str] = None


class InferenceEngine:
    def __init__(self, cfg: EngineConfig = EngineConfig()):
        if cfg.use_flash_attention is None:
            import dataclasses

            # Pallas TPU kernel: only on TPU-class backends (the axon platform
            # is the tunnelled TPU); never on CPU/GPU.
            cfg = dataclasses.replace(
                cfg,
                use_flash_attention=jax.default_backend() in ("tpu", "axon"),
            )
        self.cfg = cfg
        if cfg.persistent_cache:
            from midd_tpu.utils.compile_cache import enable_persistent_cache

            enable_persistent_cache(cfg.cache_dir)
        self._pth_cache: Dict[str, Dict] = {}
        self.loaded: Dict[str, bool] = {n: False for n in MODEL_NAMES}
        self.fns: Dict[str, Callable] = {}
        self.meta: Dict[str, Dict] = {}
        self._build()

    # -- checkpoint plumbing -------------------------------------------------

    def _load_pth(self, path: str) -> Dict:
        if path not in self._pth_cache:
            from midd_tpu.convert.torch_import import load_pth

            self._pth_cache[path] = load_pth(path)
        return self._pth_cache[path]

    @staticmethod
    def _demo_key(name: str):
        # stable across processes (Python's str hash is salted per process)
        import zlib

        return jax.random.PRNGKey(zlib.crc32(name.encode()) % (2**31))

    @staticmethod
    def _normalize_tree(tree):
        """Accept converter output ({'params', ['batch_stats']}), Trainer
        checkpoints ({'params', 'opt_state', 'extra': {'batch_stats'}}), or a
        raw variables dict."""
        if "variables" in tree:
            return tree["variables"]
        if "params" in tree:
            variables = {"params": tree["params"]}
            bs = tree.get("batch_stats") or tree.get("extra", {}).get("batch_stats")
            if bs:
                variables["batch_stats"] = bs
            return variables
        return tree

    def _variables_for(self, name: str, model, *example_args):
        path = os.path.join(self.cfg.ckpt_dir, name)
        if os.path.isdir(path):
            from midd_tpu.utils.checkpoint import load_checkpoint

            tree, meta = load_checkpoint(path)
            self.meta[name] = meta
            return self._normalize_tree(tree)
        pth = path + ".pth"
        if os.path.exists(pth):
            from midd_tpu.convert.torch_import import convert_state_dict

            ckpt = self._load_pth(pth)
            variables = jax.jit(model.init)(jax.random.PRNGKey(0), *example_args)
            converted = convert_state_dict(
                ckpt.get("model_state_dict", ckpt), variables
            )
            self.meta[name] = {
                k: v for k, v in ckpt.items() if not k.endswith("state_dict")
            }
            return converted
        # demo mode: seeded random weights
        self.meta[name] = {"demo_weights": True}
        return jax.jit(model.init)(self._demo_key(name), *example_args)

    def _shard(self, tree):
        """Lay out a loaded variables tree for tensor-parallel serving: large
        kernels sharded over tp (output channels), the rest replicated. The
        jitted paths capture these committed arrays and GSPMD partitions the
        convs around their layouts."""
        if self.mesh is None or self.mesh.shape["tp"] == 1:
            return tree
        from midd_tpu.parallel.mesh import count_tp_sharded, param_shardings

        shardings = param_shardings(tree, self.mesh, min_size=self.cfg.tp_min_size)
        self.n_tp_sharded += count_tp_sharded(shardings)
        return jax.device_put(tree, shardings)

    def _diffusion_cfg_from_meta(self, meta: Dict, default):
        """Diffusion arch from checkpoint metadata (``diffusion_params``
        saved by the trainers; same override rule as the hybrid's internal
        UNet and run.py's NAFNet width pickup)."""
        # train_diffusion saves the arch FLATTENED into the metadata
        # (recipes.py); hybrid-style checkpoints nest it under
        # "diffusion_params" — accept both layouts.
        d = meta.get("diffusion_params") or meta
        if "model_channels" not in d:
            return default
        return config.DiffusionUNetConfig(
            in_channels=int(d.get("in_channels", default.in_channels)),
            model_channels=int(d["model_channels"]),
            channel_mult=tuple(d.get("channel_mult", default.channel_mult)),
            num_res_blocks=int(d.get("num_res_blocks", default.num_res_blocks)),
            attention_resolutions=tuple(
                d.get("attention_resolutions", default.attention_resolutions)
            ),
            time_emb_dim=int(d.get("time_emb_dim", default.time_emb_dim)),
            skip_mode=d.get("skip_mode", default.skip_mode),
        )

    def _peek_meta(self, name: str) -> Dict:
        """Read checkpoint metadata so arch hyperparams stored in checkpoints
        override the static config — run.py does the same for NAFNet
        width/blocks and the hybrid's nafnet_params/diffusion_params
        (run.py:45-47,61-62). orbax dirs keep metadata in a JSON sidecar;
        .pth files are torch-loaded once and cached for the weight pass."""
        import json

        path = os.path.join(self.cfg.ckpt_dir, name)
        meta_json = os.path.join(path, "metadata.json")
        if os.path.isfile(meta_json):
            with open(meta_json) as f:
                return json.load(f)
        pth = path + ".pth"
        if os.path.exists(pth):
            ckpt = self._load_pth(pth)
            return {k: v for k, v in ckpt.items() if not k.endswith("state_dict")}
        return {}

    @staticmethod
    def _router_cfg_from_meta(meta: Dict, default):
        d = meta.get("router_params") or {}
        if "base_c" not in d:
            return default
        return config.RouterConfig(
            in_c=int(d.get("in_c", default.in_c)),
            out_c=int(d.get("out_c", default.out_c)),
            base_c=int(d["base_c"]),
        )

    @staticmethod
    def _fusion_cfg_from_meta(meta: Dict, default):
        d = meta.get("fusion_params") or {}
        if "base_c" not in d:
            return default
        return config.FusionConfig(
            in_c=int(d.get("in_c", default.in_c)),
            out_c=int(d.get("out_c", default.out_c)),
            base_c=int(d["base_c"]),
            residual=bool(d.get("residual", default.residual)),
            sees_expert=bool(d.get("sees_expert", default.sees_expert)),
        )

    @staticmethod
    def _nafnet_cfg_from_meta(meta: Dict, default):
        if "width" not in meta:
            return default
        return config.NAFNetConfig(
            width=int(meta.get("width", 32)),
            middle_blk_num=int(meta.get("middle_blk_num", 8)),
            enc_blk_nums=tuple(meta.get("enc_blk_nums", (2, 2, 4, 6))),
            dec_blk_nums=tuple(meta.get("dec_blk_nums", (2, 2, 2, 2))),
        )

    # -- int8 calibration ----------------------------------------------------

    def _calibrate_unet(self, unet_cfg, variables, schedule, steps: int):
        """Record per-conv activation abs-max over representative rollouts
        (2 procedural phantoms x the three reference noise families,
        cddpm/cddpmTrain.py:3) for the static-int8 serving path. Runs in fp32
        so the recorded ranges are exact; returns the ``qscales`` tree."""
        from midd_tpu.benchmarks.xray_bench import make_phantoms
        from midd_tpu.ops.qconv import calibrate_unet_rollout
        from midd_tpu.train.data import NOISE_FNS

        s = self.cfg.img_size
        cal = UNetDiffusion(
            unet_cfg, use_flash=self.cfg.use_flash_attention, quant="calibrate"
        )
        clean = make_phantoms(2, s, seed=123)
        rng = np.random.default_rng(0)
        batches = [
            np.stack(
                [np.clip(fn(c, rng), 0.0, 1.0) for c in clean]
            ).astype(np.float32)
            for fn in NOISE_FNS.values()
        ]
        t = time.time()
        qs = calibrate_unet_rollout(
            cal, {"params": variables["params"]}, schedule, batches, steps
        )
        log.latency("int8_calibration", time.time() - t,
                    steps=steps, batches=len(batches))
        return qs

    # -- graph construction --------------------------------------------------

    def _build(self):
        cfg = self.cfg
        s = cfg.img_size
        dt = cfg.compute_dtype
        x0 = jnp.zeros((1, s, s, 1), jnp.float32)
        t0 = jnp.zeros((1,), jnp.int32)
        schedule = make_schedule(cfg.schedule_cfg)

        self.mesh = None
        self.n_tp_sharded = 0
        if (
            cfg.data_parallel or cfg.tensor_parallel or cfg.spatial_parallel
        ) and len(jax.devices()) > 1:
            from midd_tpu.parallel import make_mesh

            n = len(jax.devices())
            sp = 1
            if cfg.spatial_parallel:
                # sp must not exceed the DEEPEST feature-map height or some
                # shards are empty — measured to produce wrong results under
                # GSPMD, not just waste. Depth must come from the RESOLVED
                # architectures: checkpoint metadata can deepen the served
                # models past the static configs (nafnet width/blocks and
                # the hybrid's diffusion_params are read from metadata), and
                # an sp guard computed from the presets would then let GSPMD
                # produce silently wrong outputs.
                naf_meta_cfg = self._nafnet_cfg_from_meta(
                    self._peek_meta("nafnet"), cfg.nafnet_cfg
                )
                hyb_meta = self._peek_meta("hybrid")
                hyb_naf_meta_cfg = self._nafnet_cfg_from_meta(
                    hyb_meta.get("nafnet_params", {}) or {}, cfg.nafnet_cfg
                )
                diff_meta_cfg = self._diffusion_cfg_from_meta(
                    self._peek_meta("diffusion"), cfg.diffusion_cfg
                )
                hyb_diff_meta = hyb_meta.get("diffusion_params") or {}
                hyb_diff_mult = tuple(
                    hyb_diff_meta.get(
                        "channel_mult", cfg.diffusion_cfg.channel_mult
                    )
                )
                n_downs = max(
                    len(naf_meta_cfg.enc_blk_nums),
                    len(hyb_naf_meta_cfg.enc_blk_nums),
                    len(diff_meta_cfg.channel_mult) - 1,
                    len(hyb_diff_mult) - 1,
                    2,
                )
                deepest = max(1, cfg.img_size >> n_downs)
                sp = cfg.sp_size or (
                    min(n, deepest)
                    if not (cfg.data_parallel or cfg.tensor_parallel)
                    else 2
                )
                if sp > deepest:
                    raise ValueError(
                        f"spatial_parallel sp={sp} exceeds the deepest "
                        f"feature-map height {deepest} at img_size="
                        f"{cfg.img_size}: some shards would be empty "
                        f"(wrong results under GSPMD). Lower sp_size."
                    )
            if cfg.tensor_parallel:
                tp = cfg.tp_size
                if tp is None and not cfg.data_parallel:
                    tp = n // sp  # dp=1: single-image requests work
            else:
                tp = 1
            # spatial/tensor-alone modes keep dp=1 (batch-1 requests) even if
            # that leaves devices idle; data_parallel spreads over the rest.
            n_use = n if cfg.data_parallel else sp * tp
            self.mesh = make_mesh(n_devices=n_use, tp=tp, sp=sp)

        # int8 mode: False | "dynamic" | "static" (see EngineConfig)
        qmode = (
            "static"
            if cfg.quantize_int8 == "static"
            else ("dynamic" if cfg.quantize_int8 else False)
        )

        # Diffusion path (standalone). Checkpoint loading/init always goes
        # through the plain model (identical param tree; the static-quant
        # model cannot run before calibration). Arch hyperparams stored in
        # the checkpoint metadata override the static config (run.py
        # semantics, same as the nafnet/hybrid paths) — this is how e.g. the
        # wide (96-channel) variant serves as a drop-in checkpoint.
        diff_cfg = self._diffusion_cfg_from_meta(
            self._peek_meta("diffusion"), cfg.diffusion_cfg
        )

        def _mk_unets(dcfg):
            plain = UNetDiffusion(
                dcfg, use_flash=cfg.use_flash_attention, dtype=dt
            )
            q = (
                UNetDiffusion(dcfg, use_flash=cfg.use_flash_attention, dtype=dt, quant=qmode)
                if qmode
                else plain
            )
            return plain, q

        unet_plain, unet = _mk_unets(diff_cfg)
        v_diff_raw = self._variables_for("diffusion", unet_plain, x0, x0, t0)
        # arch-less checkpoints (no metadata, e.g. pre-round-2 trainer
        # saves): infer the base width from the stem conv kernel and rebuild
        kern = (
            v_diff_raw.get("params", {}).get("in_conv", {}).get("kernel")
            if isinstance(v_diff_raw, dict)
            else None
        )
        if kern is not None and kern.shape[-1] != diff_cfg.model_channels:
            import dataclasses as _dc

            diff_cfg = _dc.replace(
                diff_cfg, model_channels=int(kern.shape[-1])
            )
            unet_plain, unet = _mk_unets(diff_cfg)
            # width inference only rescales the stem; a metadata-less
            # checkpoint that ALSO differs in channel_mult/num_res_blocks
            # would otherwise surface later as an opaque trace-time shape
            # error — cross-check the full tree now and name the checkpoint
            ref_shapes = jax.eval_shape(
                lambda: unet_plain.init(jax.random.PRNGKey(0), x0, x0, t0)
            )["params"]
            ref_flat = {
                jax.tree_util.keystr(k): tuple(v.shape)
                for k, v in jax.tree_util.tree_flatten_with_path(ref_shapes)[0]
            }
            got_flat = {
                jax.tree_util.keystr(k): tuple(np.shape(v))
                for k, v in jax.tree_util.tree_flatten_with_path(
                    v_diff_raw["params"]
                )[0]
            }
            if ref_flat != got_flat:
                diffs = sorted(
                    set(ref_flat.items()) ^ set(got_flat.items())
                )[:6]
                raise ValueError(
                    f"diffusion checkpoint {os.path.join(self.cfg.ckpt_dir, 'diffusion')!r} "
                    f"has no arch metadata and does not match the width-"
                    f"inferred config (model_channels={diff_cfg.model_channels}); "
                    f"likely differing channel_mult/num_res_blocks. First "
                    f"mismatches: {diffs}. Re-save the checkpoint with arch "
                    f"metadata or pass an explicit diffusion_cfg."
                )
        noise_steps = int(
            self.meta["diffusion"].get("noise_steps", schedule.noise_steps)
        )
        if noise_steps != schedule.noise_steps:
            schedule = make_schedule(
                config.ScheduleConfig(noise_steps=noise_steps)
            )
        if qmode == "static":
            v_diff_raw = {
                **v_diff_raw,
                "qscales": self._calibrate_unet(
                    diff_cfg, v_diff_raw, schedule, cfg.diffusion_steps
                ),
            }
        v_diff = self._shard(v_diff_raw)

        def _eps_kwargs(setting) -> Dict[str, Any]:
            """int k -> uniform eps_reuse; tuple/list -> explicit refresh
            index set (sampler.eps_refresh_idx)."""
            if isinstance(setting, (tuple, list)):
                return {"eps_refresh_idx": tuple(int(i) for i in setting)}
            return {"eps_reuse": int(setting)}

        # Every serving fn takes its weights as the FIRST argument instead of
        # closing over them: closure-captured arrays are baked into the XLA
        # program as constants, and large profiles (w96 hybrid: both backends
        # ≈ 285 MB) exceed the remote-compile tunnel's request limit
        # (HTTP 413) — and bloat every serialized executable.
        # standalone mixed precision (mirror of hybrid_rollout_bf16): UNet
        # evals in bf16, posterior-mean update and clip in fp32. Gated:
        # the whole-path-bf16 gate already measured the standalone
        # diffusion path bf16-FREE (-0.002 dB, PARITY bf16 table), and this
        # form is strictly closer to fp32 than that; re-gated per-ckpt in
        # hybrid_bf16_rollout_gate.json's companion rows.
        unet_eval = (
            UNetDiffusion(diff_cfg, use_flash=cfg.use_flash_attention,
                          dtype=jnp.bfloat16, quant=qmode)
            if cfg.diffusion_eval_bf16 and dt is None
            else unet
        )

        def make_diffusion_fn(eps_setting):
            def fn(v, x):
                eps = lambda a, c, t: unet_eval.apply(v, a, c, t)
                out = denoise(
                    eps, x, schedule, cfg.diffusion_steps,
                    **_eps_kwargs(eps_setting),
                )
                return jnp.clip(out, 0.0, 1.0)

            return fn

        # Explicit refresh-index schedules are specific to the ACTUAL rollout
        # length (stride arithmetic over the checkpoint's noise_steps, NOT
        # the requested step count): out-of-range indices are silently
        # dropped by the sampler, which is exactly the failure mode the
        # adaptive tier guard exists to prevent — apply the same length
        # check wherever "auto" resolves to an index schedule.
        from midd_tpu.diffusion.schedule import timestep_sequence

        def _sched_fits(setting, sched, steps) -> bool:
            if not isinstance(setting, (tuple, list)):
                return True
            return max(setting) < len(timestep_sequence(sched.noise_steps, steps))

        # Resolve the standalone eps setting ("auto" -> the twice-gated
        # {0,2,6,7} schedule at the served 8-step count, exact otherwise;
        # index schedules are rollout-length-specific).
        dk = cfg.turbo_eps_reuse
        if dk == "auto":
            dk = (
                (0, 2, 6, 7)
                if cfg.diffusion_steps == 8
                and _sched_fits((0, 2, 6, 7), schedule, 8)
                else 1
            )
        self.diffusion_eps_reuse = dk
        diffusion_fn = make_diffusion_fn(dk)

        # NAFNet path (arch from checkpoint metadata when present, run.py:45-47)
        naf_cfg = self._nafnet_cfg_from_meta(self._peek_meta("nafnet"), cfg.nafnet_cfg)
        naf = EnhancedNAFNet(naf_cfg, dtype=dt, s2d_stage0=cfg.nafnet_s2d)
        v_naf = self._shard(self._variables_for("nafnet", naf, x0))

        def nafnet_fn(v, x):
            return jnp.clip(naf.apply(v, x), 0.0, 1.0)

        # Expert path
        expert = ExpertDenoiser(cfg.expert_cfg, dtype=dt)
        v_exp = self._shard(self._variables_for("expert", expert, x0))

        def expert_fn(v, x):
            return jnp.clip(expert.apply(v, x), 0.0, 1.0)

        # Hybrid path: its OWN backend weights + arch configs from the
        # checkpoint (run.py:60-74). The hybrid's schedule comes from ITS
        # checkpoint's diffusion_params, independent of the standalone
        # diffusion checkpoint's noise_steps.
        hmeta = self._peek_meta("hybrid")
        dparams = hmeta.get("diffusion_params") or {}
        hyb_naf_cfg = self._nafnet_cfg_from_meta(
            hmeta.get("nafnet_params", {}) or {}, cfg.nafnet_cfg
        )
        if "model_channels" in dparams:
            hyb_unet_cfg = config.DiffusionUNetConfig(
                in_channels=int(dparams.get("in_channels", 1)),
                model_channels=int(dparams["model_channels"]),
                channel_mult=tuple(dparams.get("channel_mult", (1, 2, 3, 4))),
                num_res_blocks=int(dparams.get("num_res_blocks", 2)),
                attention_resolutions=tuple(dparams.get("attention_resolutions", (3,))),
                time_emb_dim=int(dparams.get("time_emb_dim", 192)),
                skip_mode=dparams.get("skip_mode", "ddim"),
            )
        else:
            hyb_unet_cfg = diff_cfg
        hschedule = (
            make_schedule(config.ScheduleConfig(noise_steps=int(dparams["noise_steps"])))
            if dparams.get("noise_steps")
            else schedule
        )

        router = NoiseAnalyzer(
            self._router_cfg_from_meta(hmeta, cfg.router_cfg), dtype=dt
        )
        fusion_cfg_resolved = self._fusion_cfg_from_meta(hmeta, cfg.fusion_cfg)
        fusion = FusionModule(fusion_cfg_resolved, dtype=dt)
        # sees_expert hybrids feed the standalone expert path's MODEL as the
        # third frozen branch (trainer-saved hybrids carry only router/
        # fusion; the expert is a frozen external like the other backends).
        # The branch WEIGHTS prefer a dedicated <ckpt_dir>/expert_ftl2
        # checkpoint when present (the l2-polished branch tree train_all
        # writes since round 5): the standalone expert path keeps its
        # reference-loss weights (the row users of run.py:53-56 actually
        # get) while the hybrid keeps the branch it was trained on —
        # round-4 verdict weak #3: sharing ONE tree traded −0.40 dB on the
        # standalone row for ~7.6 M params of HBM.
        sees_expert = fusion_cfg_resolved.sees_expert
        self.hybrid_expert_tree = "shared"
        v_exp_hyb = v_exp
        if sees_expert and (
            os.path.isdir(os.path.join(cfg.ckpt_dir, "expert_ftl2"))
            or os.path.exists(os.path.join(cfg.ckpt_dir, "expert_ftl2.pth"))
        ):
            v_exp_hyb = self._shard(
                self._variables_for("expert_ftl2", expert, x0)
            )
            self.hybrid_expert_tree = "expert_ftl2"
        hyb_unet_plain = UNetDiffusion(hyb_unet_cfg, use_flash=cfg.use_flash_attention, dtype=dt)
        hyb_unet = (
            UNetDiffusion(hyb_unet_cfg, use_flash=cfg.use_flash_attention, dtype=dt, quant=qmode)
            if qmode
            else hyb_unet_plain
        )
        hyb_naf = EnhancedNAFNet(hyb_naf_cfg, dtype=dt, s2d_stage0=cfg.nafnet_s2d)
        v_h_raw = self._variables_for_hybrid(hyb_naf, hyb_unet_plain, router, fusion, x0, t0)
        fell_back = "nafnet" not in v_h_raw
        if fell_back:
            # Trainer-saved hybrid checkpoints hold only the trainable
            # router+fusion groups (the backends were frozen externals,
            # hybrid3diffusionspeed.py:669); fall back to the standalone
            # paths' models and weights for the backends.
            hyb_naf, hyb_unet, hschedule = naf, unet, schedule
        if qmode == "static":
            if fell_back and cfg.hybrid_diffusion_steps == cfg.diffusion_steps:
                # identical weights + rollout trajectory: reuse the scales
                qs_h = v_diff_raw["qscales"]
            else:
                src_params = (
                    v_diff_raw["params"] if fell_back else v_h_raw["diffusion_unet"]
                )
                qs_h = self._calibrate_unet(
                    diff_cfg if fell_back else hyb_unet_cfg,
                    {"params": src_params},
                    hschedule,
                    cfg.hybrid_diffusion_steps,
                )
            v_h_raw = {**v_h_raw, "diffusion_qscales": qs_h}
        if cfg.hybrid_rollout_bf16:
            # same arch + weights, bf16 eval dtype: the UNet casts its
            # activations internally, eps returns bf16, and the sampler's
            # posterior-mean update stays in the carry dtype (fp32)
            hyb_unet = UNetDiffusion(
                hyb_unet.cfg, use_flash=cfg.use_flash_attention,
                dtype=jnp.bfloat16, quant=hyb_unet.quant,
            )
        v_h = self._shard(v_h_raw)
        if fell_back:
            v_h = {
                "nafnet": v_naf["params"],
                "diffusion_unet": v_diff["params"],
                **v_h,
            }
        # hybrid weights bundle passed as the jit argument (exp included
        # only for sees_expert profiles; dict membership is a static
        # trace-time property)
        v_hb = {"h": v_h}
        if sees_expert:
            v_hb["exp"] = v_exp_hyb

        # One predicate for "the hybrid COULD ride the standalone rollout":
        # shared weights (fallback), same schedule, same step count. Both the
        # eps-reuse auto rule and the fused sharing decision derive from it.
        rollout_shareable = (
            fell_back
            and hschedule is schedule
            and cfg.hybrid_diffusion_steps == cfg.diffusion_steps
        )

        # Resolve the hybrid eps setting (EngineConfig.hybrid_turbo_eps_reuse
        # docstring). Auto rule, by measured preference:
        # 1. fused path sharing the standalone rollout -> match it (the
        #    shared exact rollout is free and higher-quality);
        # 2. the served 8-step rollout (9 scan steps) -> the round-3 studied
        #    schedule {0,2,6,7}: quality-free-to-POSITIVE on both hybrid
        #    profiles (turbo_gate_r3/adopted.json: +0.06/+0.002 dB vs
        #    exact) at 2.25x fewer UNet evals;
        # 3. any other step count -> the legacy gated k=2 (index schedules
        #    are length-specific).
        hk = cfg.hybrid_turbo_eps_reuse
        if hk is None or hk == "auto":  # "auto" accepted for API symmetry
            # with turbo_eps_reuse (both mean: resolve by the rules below)
            # a refresh-index tuple (beyond k) is never auto-inherited
            fused_will_share = (
                bool(cfg.fused_request)
                and rollout_shareable
                and isinstance(dk, int)
                and dk <= 2
            )
            if fused_will_share:
                hk = dk
            elif cfg.hybrid_diffusion_steps == 8 and _sched_fits(
                (0, 2, 6, 7), hschedule, 8
            ):
                hk = (0, 2, 6, 7)
            else:
                hk = 2
        self.hybrid_eps_reuse = hk

        def _hyb_unet_vars(vh):
            hv = {"params": vh["diffusion_unet"]}
            if "diffusion_qscales" in vh:
                hv["qscales"] = vh["diffusion_qscales"]
            return hv

        def make_hybrid_fn(eps_setting):
            def fn(v, x):
                vh = v["h"]
                out = hybrid_forward(
                    lambda a: hyb_naf.apply({"params": vh["nafnet"]}, a),
                    lambda a: denoise(
                        lambda b, c, t: hyb_unet.apply(_hyb_unet_vars(vh), b, c, t),
                        a,
                        hschedule,
                        cfg.hybrid_diffusion_steps,
                        **_eps_kwargs(eps_setting),
                    ),
                    lambda a: router.apply({"params": vh["router"]}, a),
                    lambda *ins: fusion.apply({"params": vh["fusion"]}, *ins),
                    x,
                    expert_apply=(
                        (lambda a: expert.apply(v["exp"], a))
                        if "exp" in v else None
                    ),
                )
                return jnp.clip(out, 0.0, 1.0)

            return fn

        hybrid_fn = make_hybrid_fn(hk)

        # (fn, weights) per path — weights ride as jit ARGUMENTS (committed
        # device arrays), never closure constants
        raw_fns = {
            "diffusion": (diffusion_fn, v_diff),
            "nafnet": (nafnet_fn, v_naf),
            "expert": (expert_fn, v_exp),
            "hybrid": (hybrid_fn, v_hb),
        }
        # queue-pressure turbo tier for the two rollout-bound paths (see
        # EngineConfig.adaptive_turbo); compiled alongside the exact paths
        raw_turbo = None
        if cfg.adaptive_turbo:
            # index-schedule tier defaults are 9-step-rollout-specific; if a
            # schedule doesn't fit the ACTUAL rollout length (stride
            # arithmetic, not the requested step count) fall back to the
            # legacy gated k=2 rather than silently dropping out-of-range
            # refresh indices. Each tier validates against ITS OWN path's
            # schedule: the hybrid rollout length derives from hschedule
            # (the hybrid checkpoint's noise_steps), not the standalone's.
            def tier_eps(setting, sched, steps):
                return setting if _sched_fits(setting, sched, steps) else 2

            raw_turbo = {
                "diffusion": (
                    make_diffusion_fn(
                        tier_eps(cfg.adaptive_diffusion_eps, schedule,
                                 cfg.diffusion_steps)
                    ),
                    v_diff,
                ),
                "hybrid": (
                    make_hybrid_fn(
                        tier_eps(cfg.adaptive_hybrid_eps, hschedule,
                                 cfg.hybrid_diffusion_steps)
                    ),
                    v_hb,
                ),
            }

        # Fused single-program request path (see EngineConfig.fused_request).
        share_backends = fell_back
        share_rollout = rollout_shareable and hk == dk
        fused_on = bool(cfg.fused_request)
        self.shares = {"backends": share_backends, "rollout": share_rollout}
        raw_fused = None
        # "exph" = the hybrid branch's expert tree (== "exp" unless a
        # dedicated expert_ftl2 checkpoint was loaded; duplicate leaves are
        # the same jax.Array objects, so no extra HBM when shared)
        v_all = {"diff": v_diff, "naf": v_naf, "exp": v_exp,
                 "exph": v_exp_hyb, "h": v_h}
        if fused_on:

            def fused_fn(v, x):
                naf_raw = naf.apply(v["naf"], x)
                # same eval model as make_diffusion_fn — the fused contract
                # is bit-equality with the per-path programs, including the
                # gated bf16-eval default
                eps = lambda a, c, t: unet_eval.apply(v["diff"], a, c, t)
                diff_raw = denoise(
                    eps, x, schedule, cfg.diffusion_steps,
                    **_eps_kwargs(dk),
                )
                vh = v["h"]
                hyb_naf_fn = (
                    (lambda a: naf_raw)
                    if share_backends
                    else (lambda a: hyb_naf.apply({"params": vh["nafnet"]}, a))
                )
                hyb_diff_fn = (
                    (lambda a: diff_raw)
                    if share_rollout
                    else (
                        lambda a: denoise(
                            lambda b, c, t: hyb_unet.apply(_hyb_unet_vars(vh), b, c, t),
                            a,
                            hschedule,
                            cfg.hybrid_diffusion_steps,
                            **_eps_kwargs(hk),
                        )
                    )
                )
                hyb = hybrid_forward(
                    hyb_naf_fn,
                    hyb_diff_fn,
                    lambda a: router.apply({"params": vh["router"]}, a),
                    lambda *ins: fusion.apply({"params": vh["fusion"]}, *ins),
                    x,
                    expert_apply=(
                        (lambda a: expert.apply(v["exph"], a))
                        if sees_expert else None
                    ),
                )
                return {
                    "diffusion": jnp.clip(diff_raw, 0.0, 1.0),
                    "nafnet": jnp.clip(naf_raw, 0.0, 1.0),
                    "expert": expert_fn(v["exp"], x),
                    "hybrid": jnp.clip(hyb, 0.0, 1.0),
                }

            raw_fused = fused_fn

        def _jit_and_bind(fn, weights, bs=None):
            """jit with weights as arg #0 (committed shardings respected),
            return (bound x->out callable, jit object, weights)."""
            if bs is not None:
                jf = jax.jit(fn, in_shardings=(None, bs), out_shardings=bs)
            else:
                jf = jax.jit(fn)
            return (lambda x: jf(weights, x)), jf, weights

        if self.mesh is not None:
            from midd_tpu.parallel import batch_sharding, image_sharding

            bs = (
                image_sharding(self.mesh)
                if cfg.spatial_parallel
                else batch_sharding(self.mesh)
            )
        else:
            bs = None
        self._jit_fns = {}
        self.fns = {}
        for n, (f, w) in raw_fns.items():
            self.fns[n], jf, _ = _jit_and_bind(f, w, bs)
            self._jit_fns[n] = (jf, w)
        self.turbo_fns = None
        if raw_turbo is not None:
            self.turbo_fns = {}
            for n, (f, w) in raw_turbo.items():
                self.turbo_fns[n], jf, _ = _jit_and_bind(f, w, bs)
                self._jit_fns[f"turbo@{n}"] = (jf, w)
        self.fused = None
        if raw_fused is not None:
            self.fused, _, _ = _jit_and_bind(raw_fused, v_all, bs)

        # resolve batch buckets once (batcher + AOT pinning both need them)
        buckets = cfg.batch_buckets
        if buckets == "auto":
            buckets = (1, 2, 4, 8) if cfg.img_size <= 256 else (1,)
        if (
            cfg.batching
            and self.mesh is not None
            and self.mesh.shape["dp"] > 1
        ):
            dp = self.mesh.shape["dp"]
            buckets = tuple(sorted({-(-b // dp) * dp for b in buckets}))

        self.aot_report: Dict[str, Any] = {}
        if cfg.aot_dir:
            if self.mesh is not None or len(jax.devices()) > 1:
                raise ValueError(
                    "aot_dir requires a single-device process: deserialized "
                    "executables target the process's FULL addressable "
                    "device set (utils/compile_cache.load_executable), so a "
                    "pin compiled single-device cannot execute on a multi-"
                    "device runtime"
                )
            self._pin_executables(tuple(buckets) if cfg.batching else (1,))

        if cfg.warmup:
            wb = self.mesh.shape["dp"] if self.mesh is not None else 1
            xw = jnp.zeros((wb, s, s, 1), jnp.float32)
            warm = dict(self.fns)
            if self.fused is not None:
                warm["fused(all4)"] = self.fused
            for name, fn in warm.items():
                t = time.time()
                out = fn(xw)
                jax.tree_util.tree_map(np.asarray, out)  # forced materialisation
                log.latency("warmup_compile", time.time() - t, model=name)

        self.batcher = None
        if cfg.batching:
            from midd_tpu.serve.batching import MicroBatcher

            # buckets resolved above (dp-rounded when mesh-sharded: a size-1
            # batch cannot shard 8 ways)
            self.batcher = MicroBatcher(
                self.fns,
                buckets=tuple(buckets),
                max_wait_ms=cfg.batch_max_wait_ms,
                warmup_shape=(s, s, 1) if cfg.warmup else None,
                fused_fn=self.fused,
                turbo_fns=self.turbo_fns,
                turbo_queue_depth=cfg.adaptive_queue_depth,
                max_queue_depth=cfg.max_queue_depth,
            )

        for n in MODEL_NAMES:
            self.loaded[n] = True

    @staticmethod
    def _tree_ident(tree) -> str:
        """Structural identity of a weights tree (paths + shapes + dtypes).
        Weights ride as jit ARGUMENTS, so pinned executables are
        weight-VALUE-agnostic: a retrained checkpoint with the same
        architecture reuses its pins; any arch change (different shapes)
        invalidates them."""
        import hashlib

        items = [
            f"{jax.tree_util.keystr(k)}:{tuple(v.shape)}:{v.dtype}"
            for k, v in jax.tree_util.tree_flatten_with_path(tree)[0]
        ]
        return hashlib.sha256("|".join(sorted(items)).encode()).hexdigest()[:16]

    def _pin_executables(self, batches: Tuple[int, ...]) -> None:
        """AOT-pin every serving program (model x batch bucket): load from
        cfg.aot_dir when a matching pin exists, else compile once and
        serialize. Replaces each self.fns entry with an AotDispatch that
        serves pinned shapes and falls back to jit for others."""
        from midd_tpu.utils.compile_cache import (
            AotDispatch,
            aot_fingerprint,
            pin_or_load,
        )

        cfg = self.cfg
        s = cfg.img_size
        t_all = time.time()
        for name, (jit_fn, weights) in self._jit_fns.items():
            weights_id = self._tree_ident(weights)
            execs = {}
            for b in batches:
                key = aot_fingerprint(
                    model=name,
                    batch=int(b),
                    img_size=s,
                    steps=(cfg.diffusion_steps, cfg.hybrid_diffusion_steps),
                    eps=(
                        self.diffusion_eps_reuse,
                        self.hybrid_eps_reuse,
                        cfg.adaptive_diffusion_eps if cfg.adaptive_turbo else None,
                        cfg.adaptive_hybrid_eps if cfg.adaptive_turbo else None,
                    ),
                    # the eval-precision flags change the compiled program
                    # with identical eps settings — a pin keyed without them
                    # would silently serve the wrong precision (pin_or_load
                    # validates executability, not numerics)
                    dtype=(
                        str(cfg.compute_dtype),
                        bool(cfg.diffusion_eval_bf16),
                        bool(cfg.hybrid_rollout_bf16),
                    ),
                    quant=str(cfg.quantize_int8),
                    flash=bool(cfg.use_flash_attention),
                    s2d=bool(cfg.nafnet_s2d),
                    weights=weights_id,
                )
                path = os.path.join(cfg.aot_dir, f"{name}_b{b}_{key}.jx")
                t = time.time()
                compiled, loaded = pin_or_load(
                    jit_fn,
                    (weights, jnp.zeros((b, s, s, 1), jnp.float32)),
                    path,
                )
                execs[int(b)] = compiled
                self.aot_report[f"{name}_b{b}"] = {
                    "loaded": loaded, "secs": round(time.time() - t, 2),
                }
                log.latency(
                    "aot_load" if loaded else "aot_compile",
                    time.time() - t, model=name, batch=int(b),
                )
            dispatch = AotDispatch(jit_fn, execs, bound_args=(weights,))
            if name.startswith("turbo@"):
                self.turbo_fns[name.split("@", 1)[1]] = dispatch
            else:
                self.fns[name] = dispatch
        log.latency("aot_ready", time.time() - t_all,
                    n=len(self.aot_report))

    def _variables_for_hybrid(self, naf, unet, router, fusion, x0, t0):
        """Hybrid checkpoint layout: one tree with nafnet/diffusion_unet/
        router/fusion param groups (hybrid3diffusionspeed.py:837-852 stores
        the full composed state_dict)."""
        name = "hybrid"
        path = os.path.join(self.cfg.ckpt_dir, name)
        if os.path.isdir(path):
            from midd_tpu.utils.checkpoint import load_checkpoint

            tree, meta = load_checkpoint(path)
            self.meta[name] = meta
            groups = tree["params"] if "params" in tree else tree
            return groups
        pth = path + ".pth"
        if os.path.exists(pth):
            from midd_tpu.convert.torch_import import convert_state_dict

            ckpt = self._load_pth(pth)
            sd = ckpt["model_state_dict"]
            groups = {}
            for prefix, model, args in [
                ("nafnet", naf, (x0,)),
                ("diffusion_unet", unet, (x0, x0, t0)),
                ("router", router, (x0,)),
                ("fusion", fusion, (x0, x0, x0)),
            ]:
                sub = {
                    k[len(prefix) + 1 :]: v
                    for k, v in sd.items()
                    if k.startswith(prefix + ".")
                }
                variables = jax.jit(model.init)(jax.random.PRNGKey(0), *args)
                groups[prefix] = convert_state_dict(sub, variables)["params"]
            self.meta[name] = {
                k: v for k, v in ckpt.items() if not k.endswith("state_dict")
            }
            return groups
        self.meta[name] = {"demo_weights": True}
        key = jax.random.PRNGKey(4)
        ks = jax.random.split(key, 4)
        return {
            "nafnet": jax.jit(naf.init)(ks[0], x0)["params"],
            "diffusion_unet": jax.jit(unet.init)(ks[1], x0, x0, t0)["params"],
            "router": jax.jit(router.init)(ks[2], x0)["params"],
            "fusion": jax.jit(fusion.init)(ks[3], x0, x0, x0)["params"],
        }

    # -- request processing --------------------------------------------------

    def process_one(self, name: str, x: np.ndarray, original_size) -> Optional[str]:
        """Run one model path; returns base64 PNG or raises."""
        t0 = time.time()
        out = np.asarray(self.fns[name](jnp.asarray(x)))
        result = tensor_to_base64_png(out, original_size)
        log.latency("request", time.time() - t0, model=name)
        return result

    def process_all(self, x: np.ndarray, original_size) -> Dict[str, Optional[str]]:
        """All four paths with per-path exception isolation (run.py:85-101).
        JAX dispatch is async: enqueue all four programs first, then encode
        results as each completes — device compute overlaps host PNG encode."""
        t_start = time.time()
        if self.batcher is not None:
            outs_b = self.batcher.process(np.asarray(x))
            results = {}
            for name in MODEL_NAMES:
                o = outs_b.get(name)
                results[name] = (
                    None if o is None else tensor_to_base64_png(o, original_size)
                )
            log.latency("request_all", time.time() - t_start, mode="batched")
            return results
        outs: Dict[str, Any] = {}
        xj = jnp.asarray(x)
        if self.fused is not None:
            # one program, one dispatch; shared subgraphs computed once.
            # Materialise INSIDE the try: JAX device errors surface at
            # np.asarray, not at dispatch — only a materialised result
            # proves the fused program ran, otherwise fall back per-path.
            try:
                outs = {
                    k: np.asarray(v) for k, v in dict(self.fused(xj)).items()
                }
            except Exception as e:  # noqa: BLE001
                log.log("fused_dispatch_failed", error=str(e))
                outs = {}
        if not outs:
            for name in MODEL_NAMES:
                try:
                    outs[name] = self.fns[name](xj)  # async dispatch
                except Exception as e:  # noqa: BLE001
                    log.log("model_failed", model=name, error=str(e))
                    outs[name] = None
        results: Dict[str, Optional[str]] = {}
        for name in MODEL_NAMES:
            if outs[name] is None:
                results[name] = None
                continue
            try:
                t0 = time.time()
                results[name] = tensor_to_base64_png(np.asarray(outs[name]), original_size)
                log.latency("encode", time.time() - t0, model=name)
            except Exception as e:  # noqa: BLE001
                log.log("model_failed", model=name, error=str(e))
                results[name] = None
        log.latency("request_all", time.time() - t_start, mode="per_path")
        return results

    def serving_mode(self) -> Dict:
        """What a request will actually get: the resolved quality levers
        (turbo refresh schedules per path, precision flags, adaptive tier
        state) and an ``exact`` bool that is True only when every gated
        non-exact default is off — the reference-parity fp32 mode that
        ``--exact`` pins. The reference logs per-model behavior per request
        (run.py:94-206); this surfaces the equivalent through the API so an
        operator can verify a deployment without reading its flags."""
        cfg = self.cfg

        def _eps(s):
            return list(s) if isinstance(s, (tuple, list)) else s

        # diffusion_eval_bf16 is a no-op when a whole-engine compute_dtype
        # is set (the eval model IS the engine model then) — report the
        # EFFECTIVE eval precisions, not the raw flags
        dt = cfg.compute_dtype
        diff_eval = (
            str(jnp.dtype(dt).name) if dt is not None
            else ("bfloat16" if cfg.diffusion_eval_bf16 else "float32")
        )
        hyb_eval = "bfloat16" if cfg.hybrid_rollout_bf16 else (
            str(jnp.dtype(dt).name) if dt is not None else "float32"
        )
        exact = (
            self.diffusion_eps_reuse == 1
            and self.hybrid_eps_reuse == 1
            and diff_eval == "float32"
            and hyb_eval == "float32"
            and dt is None
            and not cfg.quantize_int8
        )
        mode = {
            "exact": exact,
            "img_size": cfg.img_size,
            "steps": [cfg.diffusion_steps, cfg.hybrid_diffusion_steps],
            "diffusion_eps": _eps(self.diffusion_eps_reuse),
            "hybrid_eps": _eps(self.hybrid_eps_reuse),
            "compute_dtype": str(jnp.dtype(dt).name) if dt is not None else "float32",
            "diffusion_eval_dtype": diff_eval,
            "hybrid_rollout_eval_dtype": hyb_eval,
            "quantize_int8": str(cfg.quantize_int8) if cfg.quantize_int8 else False,
            "fused_request": self.fused is not None,
            "batching": self.batcher is not None,
            "flash_attention": bool(cfg.use_flash_attention),
            # which weights feed the hybrid's sees_expert branch: "shared"
            # (the standalone expert tree) or "expert_ftl2" (the dedicated
            # polished branch checkpoint). Informational — both are exact
            # weight choices, not approximations.
            "hybrid_expert_tree": self.hybrid_expert_tree,
            # exact layout restructurings (numerically equivalent, identical
            # param trees — informational, they never affect ``exact``):
            # models/unet_diffusion.py fuse_updown/s2d_stage0 defaults and
            # EngineConfig.nafnet_s2d (ops/naf_s2d.py, measured opt-in)
            "layout": {
                "nafnet_s2d": bool(cfg.nafnet_s2d),
                "unet_fused_updown": True,
                # the model's s2d guard auto-disables under int8 quant
                "unet_s2d_stage0": not bool(cfg.quantize_int8),
            },
        }
        if cfg.adaptive_turbo:
            mode["adaptive_turbo"] = {
                "queue_depth": cfg.adaptive_queue_depth,
                "diffusion_eps": _eps(cfg.adaptive_diffusion_eps),
                "hybrid_eps": _eps(cfg.adaptive_hybrid_eps),
            }
        else:
            mode["adaptive_turbo"] = False
        return mode

    def health(self) -> Dict:
        return {
            "status": "healthy",
            "device": str(jax.devices()[0]),
            "models_loaded": dict(self.loaded),
            "serving_mode": self.serving_mode(),
        }
