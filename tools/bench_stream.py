"""Oxford sequential-stream inference throughput on the real TPU.

The reference's only published throughput anchor is the Oxford RobotCar
14 FPS inference rate (reference README.md:21; workload at
train_OxfordRobotCar.py:195-397). This measures our equivalent: the
forward + on-device pose decode used by stream_eval / InferenceEngine,
on synthetic Oxford-geometry inputs (154x231 ground, 512^2 aerial).

Three measurements per batch size (all value-fetch synced - decoded poses
are pulled to the host for every batch; block_until_ready is never used, it
returns early on this platform, docs/PERFORMANCE.md):

  * device FPS    - inputs staged on device once, fetch before next
                    dispatch; every batch pays the full round trip (the
                    naive loop structure).
  * pipelined FPS - two batches in flight, one blocking fetch per
                    iteration (the round-3 stream_eval structure): round
                    trip overlaps device compute but throughput is capped
                    at 1/RTT.
  * overlap FPS   - k batches in flight with the device->host copy of each
                    STARTED at dispatch time (copy_to_host_async) and read
                    k batches later — the round-4 stream_eval structure
                    (r3 verdict item 3): up to k round trips in flight, so
                    the RTT amortizes and the cap becomes device compute +
                    dispatch overhead.
  * ingest FPS    - fresh uint8 numpy arrays shipped every batch; on THIS
                    container the H2D path crosses the axon tunnel at
                    ~25 MB/s (also probed and reported), so this measures
                    the tunnel, not the framework - recorded for honesty.

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
import jax.numpy as jnp
import numpy as np

from ccvpe_tpu.core.profiling import enable_compile_cache

enable_compile_cache()


def run_one(batch, dtype, warmup=3, iters=20):
    from ccvpe_tpu.core import config as cfg_lib
    from ccvpe_tpu.models.cvm import CVM
    from ccvpe_tpu.ops import pose
    from ccvpe_tpu.train.step import device_normalize

    model_cfg = dataclasses.replace(cfg_lib.oxford(), compute_dtype=dtype)
    model = CVM(model_cfg)
    hg, wg = model_cfg.grd_size
    hs, ws = model_cfg.sat_size
    rng = np.random.default_rng(0)
    variables = model.init(jax.random.PRNGKey(17),
                           np.zeros((1, hg, wg, 3), np.float32),
                           np.zeros((1, hs, ws, 3), np.float32), False)

    def fn(variables, grd, sat):
        out = model.apply(variables, device_normalize(grd),
                          device_normalize(sat), False)
        return pose.decode_pose(out.heatmap, out.ori)

    fn = jax.jit(fn)
    # uint8 ingest: raw pixels, normalized on device (4x less H2D than f32)
    grd_np = rng.integers(0, 255, size=(batch, hg, wg, 3), dtype=np.uint8)
    sat_np = rng.integers(0, 255, size=(batch, hs, ws, 3), dtype=np.uint8)

    t0 = time.perf_counter()
    for _ in range(warmup):
        rows, _, _ = fn(variables, grd_np, sat_np)
        np.asarray(rows)
    compile_s = time.perf_counter() - t0

    # device FPS: inputs staged once, fully synchronous (fetch every batch
    # before the next dispatch) - each batch pays the full dispatch+fetch
    # round trip, like a naive streaming loop
    grd_dev, sat_dev = jnp.asarray(grd_np), jnp.asarray(sat_np)
    t0 = time.perf_counter()
    for _ in range(iters):
        rows, cols, ang = fn(variables, grd_dev, sat_dev)
        np.asarray(rows), np.asarray(cols), np.asarray(ang)
    dt_dev = (time.perf_counter() - t0) / iters

    # pipelined FPS: two batches in flight (dispatch N+1, then fetch N's
    # scalars) - the round trip overlaps device compute. This is the real
    # stream_eval loop structure (ccvpe_tpu/train/stream.py).
    t0 = time.perf_counter()
    prev = None
    for _ in range(iters):
        out = fn(variables, grd_dev, sat_dev)
        if prev is not None:
            for x in prev:
                np.asarray(x)
        prev = out
    for x in prev:
        np.asarray(x)
    dt_pipe = (time.perf_counter() - t0) / iters

    # overlap FPS: k outstanding async D2H copies (stream_eval round-4
    # structure, ccvpe_tpu/train/stream.py pipeline_depth)
    import collections
    depth = 4
    t0 = time.perf_counter()
    pending = collections.deque()
    for _ in range(iters):
        out = fn(variables, grd_dev, sat_dev)
        for x in out:
            if hasattr(x, "copy_to_host_async"):
                x.copy_to_host_async()
        pending.append(out)
        if len(pending) > depth:
            for x in pending.popleft():
                np.asarray(x)
    while pending:
        for x in pending.popleft():
            np.asarray(x)
    dt_overlap = (time.perf_counter() - t0) / iters

    # ingest FPS: ship fresh uint8 arrays each batch (tunnel-limited here)
    t0 = time.perf_counter()
    for _ in range(iters):
        rows, cols, ang = fn(variables, grd_np, sat_np)
        np.asarray(rows), np.asarray(cols), np.asarray(ang)
    dt_h2d = (time.perf_counter() - t0) / iters

    mb_per_batch = (grd_np.nbytes + sat_np.nbytes) / 1e6
    # implied tunnel H2D rate from the ingest-vs-device delta; meaningless
    # when the delta is within timing noise (small batches), so omit it then
    delta = dt_h2d - dt_dev
    h2d_mb_s = (round(mb_per_batch / delta, 1)
                if delta > 0.2 * dt_dev else None)
    return {"batch": batch, "dtype": dtype,
            "device_ms_per_batch": round(dt_dev * 1e3, 3),
            "device_fps": round(batch / dt_dev, 2),
            "pipelined_ms_per_batch": round(dt_pipe * 1e3, 3),
            "pipelined_fps": round(batch / dt_pipe, 2),
            "overlap_ms_per_batch": round(dt_overlap * 1e3, 3),
            "overlap_fps": round(batch / dt_overlap, 2),
            "overlap_depth": depth,
            "ingest_ms_per_batch": round(dt_h2d * 1e3, 3),
            "ingest_fps": round(batch / dt_h2d, 2),
            "h2d_mb_per_batch": round(mb_per_batch, 1),
            "implied_h2d_mb_per_s": h2d_mb_s,
            "warmup_s": round(compile_s, 1)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="1,2,4,8,32")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=20)
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
