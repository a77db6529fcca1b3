"""Oxford sequential-stream inference throughput on the real TPU.

The reference's only published throughput anchor is the Oxford RobotCar
14 FPS inference rate (reference README.md:21; workload at
train_OxfordRobotCar.py:195-397). This measures our equivalent: the
forward + on-device pose decode used by stream_eval / InferenceEngine,
on synthetic Oxford-geometry inputs (154x231 ground, 512^2 aerial).

Timing is per-batch VALUE-fetch synced - every batch's decoded poses are
pulled to the host before the next batch is dispatched, exactly like the
real streaming loop (ccvpe_tpu/train/stream.py fetches poses per batch).
block_until_ready is never used (it returns early on this platform,
docs/PERFORMANCE.md).

Usage: python tools/bench_stream.py [--batches 1,8,32] [--dtype bfloat16]
Appends one JSON line per config to --out.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def run_one(batch, dtype, warmup=3, iters=30):
    from ccvpe_tpu.core import config as cfg_lib
    from ccvpe_tpu.models.cvm import CVM
    from ccvpe_tpu.ops import pose

    model_cfg = dataclasses.replace(cfg_lib.oxford(), compute_dtype=dtype)
    model = CVM(model_cfg)
    hg, wg = model_cfg.grd_size
    hs, ws = model_cfg.sat_size
    rng = np.random.default_rng(0)
    variables = model.init(jax.random.PRNGKey(17),
                           np.zeros((1, hg, wg, 3), np.float32),
                           np.zeros((1, hs, ws, 3), np.float32), False)

    def fn(variables, grd, sat):
        out = model.apply(variables, grd, sat, False)
        return pose.decode_pose(out.heatmap, out.ori)

    fn = jax.jit(fn)
    grd = np.ascontiguousarray(
        rng.normal(size=(batch, hg, wg, 3)).astype(np.float32))
    sat = np.ascontiguousarray(
        rng.normal(size=(batch, hs, ws, 3)).astype(np.float32))

    t0 = time.perf_counter()
    for _ in range(warmup):
        rows, cols, ang = fn(variables, grd, sat)
        np.asarray(rows)  # value fetch
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(iters):
        rows, cols, ang = fn(variables, grd, sat)
        # per-batch host fetch of the decoded poses, like the real stream
        np.asarray(rows), np.asarray(cols), np.asarray(ang)
    dt = (time.perf_counter() - t0) / iters
    return {"batch": batch, "dtype": dtype,
            "ms_per_batch": round(dt * 1e3, 3),
            "fps": round(batch / dt, 2),
            "warmup_s": round(compile_s, 1)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="1,8,32")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--out", default="/tmp/bench_stream.jsonl")
    args = p.parse_args()

    for b in [int(x) for x in args.batches.split(",")]:
        try:
            res = run_one(b, args.dtype, iters=args.iters)
        except Exception as e:
            res = {"batch": b, "dtype": args.dtype,
                   "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(res), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
