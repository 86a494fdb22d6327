"""AOT executable pinning: measured cold-start value (round-2 verdict
item 8 "integrate or delete" — integrated; this is the measurement).

Three fresh-process engine starts, timed end-to-end (construction + warmup
of all four serving programs):

  cold   — empty XLA cache, no pins: the full compile cost every deploy
           pays after a cache eviction or jax/libtpu upgrade;
  pin    — empty XLA cache, but cfg.aot_dir holds pinned executables from
           a previous start: load + validate instead of compile;
  cache  — warm persistent .xla_cache (the round-2 default path).

Each mode runs in its own subprocess so lazy-trace + compile costs are
really paid per process. The pin run is primed first (one extra start that
writes the pins). Usage:

    python examples/aot_cold_start.py [--img-size 256] [--steps 8]

Writes aot_cold_start.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
import jax
t0 = time.time()
from midd_tpu import config
from midd_tpu.serve.engine import EngineConfig, InferenceEngine

img_size = int(sys.argv[1])
steps = int(sys.argv[2])
cache_dir = sys.argv[3]
aot_dir = sys.argv[4] or None
ckpt_dir = sys.argv[5]

eng = InferenceEngine(EngineConfig(
    img_size=img_size, diffusion_steps=steps, hybrid_diffusion_steps=steps,
    ckpt_dir=ckpt_dir, warmup=True,
    persistent_cache=True, cache_dir=cache_dir, aot_dir=aot_dir,
))
print("ENGINE_READY", time.time() - t0)
if aot_dir:
    print("AOT_REPORT", {k: v["loaded"] for k, v in eng.aot_report.items()})
"""


def run_child(img_size, steps, cache_dir, aot_dir, ckpt_dir):
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        REPO + os.pathsep + "/root/.axon_site" + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "-u", "-c", CHILD, str(img_size), str(steps),
         cache_dir, aot_dir or "", ckpt_dir],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    if "ENGINE_READY" not in out.stdout:
        raise RuntimeError(f"child failed:\n{out.stdout}\n{out.stderr[-3000:]}")
    ready = float(out.stdout.split("ENGINE_READY")[1].split()[0])
    print(out.stdout.strip().splitlines()[-1])
    return {"engine_ready_s": round(ready, 1),
            "wall_s": round(time.time() - t0, 1)}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--img-size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--ckpt-dir", default=os.path.join(REPO, "bench_ckpts"))
    ap.add_argument("--json-out", default=os.path.join(REPO, "aot_cold_start.json"))
    args = ap.parse_args()

    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        # 1. cold: fresh cache, no pins
        print("[cold] fresh cache, no pins ...")
        results["cold"] = run_child(
            args.img_size, args.steps, os.path.join(tmp, "c1"), None,
            args.ckpt_dir,
        )
        # 2. prime pins (fresh cache again so priming doesn't warm it)
        print("[prime] writing pins ...")
        aot = os.path.join(tmp, "pins")
        results["prime"] = run_child(
            args.img_size, args.steps, os.path.join(tmp, "c2"), aot,
            args.ckpt_dir,
        )
        # 3. pin-loaded start, fresh cache
        print("[pin] fresh cache, load pins ...")
        results["pin"] = run_child(
            args.img_size, args.steps, os.path.join(tmp, "c3"), aot,
            args.ckpt_dir,
        )
        # 4. warm persistent cache (the c1 dir), no pins
        print("[cache] warm persistent cache ...")
        results["cache"] = run_child(
            args.img_size, args.steps, os.path.join(tmp, "c1"), None,
            args.ckpt_dir,
        )

    payload = {"img_size": args.img_size, "steps": args.steps, **results}
    print(json.dumps(payload))
    with open(args.json_out, "w") as f:
        json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
