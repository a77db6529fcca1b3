"""Eval throughput: the scalar-only fused decode step vs the full-map fetch.

The r5 eval redesign (train/step.py::make_eval_decode_step +
train/evaluate.py::eval_over_loader) fuses forward + pose decode + GT
location + prob@GT into one dispatch and fetches six [B] vectors with k
batches in flight. The pre-r5 path returned [B,512,512,1] + [B,512,512,2]
maps per batch (~25 MB/batch-8 D2H for B scalars of information) and
decoded eagerly on the host — the reference's own protocol
(train_VIGOR.py:182-186). This benchmark measures both on staged device
inputs (loader excluded; tools/bench_loader_fed.py covers host decode).

Usage: python tools/bench_eval.py [--batch 32] [--iters 20] [--fullmap]
Emits one JSON line per mode.
"""

import argparse
import collections
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from ccvpe_tpu.core.profiling import enable_compile_cache

enable_compile_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--preset", default="vigor")
    ap.add_argument("--fullmap", action="store_true",
                    help="also time the pre-r5 full-map fetch path")
    args = ap.parse_args()

    from ccvpe_tpu.core import config as cfg_lib
    from ccvpe_tpu.ops import pose
    from ccvpe_tpu.train.step import (create_train_state,
                                      make_eval_decode_step, make_eval_step)

    model_cfg = cfg_lib.get_model_config(args.preset)
    import dataclasses
    model_cfg = dataclasses.replace(model_cfg, compute_dtype="bfloat16")
    model, state, _ = create_train_state(model_cfg, cfg_lib.TrainConfig(),
                                         jax.random.PRNGKey(17))
    params, stats = state.params, state.batch_stats

    rng = np.random.default_rng(0)
    b = args.batch
    hg, wg = model_cfg.grd_size
    hs, ws = model_cfg.sat_size
    grd = jax.device_put(rng.normal(size=(b, hg, wg, 3)).astype(np.float32))
    sat = jax.device_put(rng.normal(size=(b, hs, ws, 3)).astype(np.float32))
    ro = jax.device_put(rng.uniform(-100, 100, b).astype(np.float32))
    co = jax.device_put(rng.uniform(-100, 100, b).astype(np.float32))

    decode_step = make_eval_decode_step(model, model_cfg)

    def run_scalar():
        pending = collections.deque()
        got = 0
        for _ in range(args.iters):
            out = decode_step(params, stats, grd, sat, ro, co)
            for t in out:
                t.copy_to_host_async()
            pending.append(out)
            if len(pending) > args.depth:
                got += len(np.asarray(pending.popleft()[0]))
        while pending:
            got += len(np.asarray(pending.popleft()[0]))
        return got

    run_scalar()  # compile + warm
    t0 = time.perf_counter()
    n = run_scalar()
    dt = time.perf_counter() - t0
    print(json.dumps({"metric": f"{args.preset}_eval_pairs_per_s",
                      "value": round(n / dt, 2), "unit": "pairs/s",
                      "batch": b, "mode": "scalar_pipelined"}), flush=True)

    if args.fullmap:
        full_step = make_eval_step(model, model_cfg)

        def run_full():
            got = 0
            for _ in range(max(2, args.iters // 4)):
                heatmap, ori = full_step(params, stats, grd, sat)
                hm = np.asarray(heatmap)
                orin = np.asarray(ori)
                rows, cols, ang = map(np.asarray,
                                      pose.decode_pose(heatmap, ori))
                gr, gc = pose.gt_location(hs, ws, np.asarray(ro),
                                          np.asarray(co))
                _ = hm[np.arange(len(gr)), gr, gc, 0]
                got += len(rows) + 0 * orin.size
            return got

        run_full()
        t0 = time.perf_counter()
        n = run_full()
        dt = time.perf_counter() - t0
        print(json.dumps({"metric": f"{args.preset}_eval_pairs_per_s",
                          "value": round(n / dt, 2), "unit": "pairs/s",
                          "batch": b, "mode": "fullmap_fetch"}), flush=True)


if __name__ == "__main__":
    main()
