"""Train-step throughput sweep over (batch, remat, dtype) configs on the TPU.

Each config is a separate XLA program (remote compiles are minutes-long), so
run this under nohup and let it append one JSON line per config to the
results file. Usage:

  python tools/bench_sweep.py --out /tmp/sweep.jsonl \
      --config batch=32,remat_backbone=1,remat_decoder=1 \
      --config batch=64,remat_backbone=1,remat_decoder=1,dtype=bfloat16

Keep the host otherwise idle (2 CPUs; concurrent pytest runs starve the
client-side lowering and the wall-clock numbers lie - CLAUDE.md).
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


def parse_config(s):
    out = {"batch": 32, "remat_backbone": 1, "remat_decoder": 0,
           "dtype": "float32", "preset": "vigor", "deconv": "einsum",
           "flatten": 1, "accum": 1, "remat_skip": 0, "corr": "auto",
           "ori_window": 0, "lmu": 0, "phase": 0, "corr_bf16": 0,
           "remat_policy": "none", "circ": "wrap"}
    for kv in s.split(","):
        k, v = kv.split("=")
        out[k] = (v if k in ("dtype", "preset", "deconv", "corr",
                             "remat_policy", "circ") else int(v))
    return out


def run_one(cfg, warmup=5, iters=30):
    from ccvpe_tpu.core import config as cfg_lib
    from ccvpe_tpu.train.step import Batch, create_train_state, make_train_step

    model_cfg = dataclasses.replace(
        cfg_lib.get_model_config(cfg["preset"]),
        remat_backbone=bool(cfg["remat_backbone"]),
        remat_decoder=bool(cfg["remat_decoder"]),
        remat_skip_blocks=cfg["remat_skip"],
        remat_policy=cfg["remat_policy"],
        ori_window=cfg["ori_window"],
        lmu_fused_min_res=cfg["lmu"],
        phase_space_min_res=cfg["phase"],
        corr_bf16=bool(cfg["corr_bf16"]),
        circular_impl=cfg["circ"],
        deconv_impl=cfg["deconv"],
        corr_impl=cfg["corr"],
        compute_dtype=cfg["dtype"])
    train_cfg = cfg_lib.TrainConfig(batch_size=cfg["batch"],
                                    flatten_optimizer=bool(cfg["flatten"]),
                                    grad_accum_steps=cfg["accum"])
    model, state, tx = create_train_state(model_cfg, train_cfg,
                                          jax.random.PRNGKey(17))
    step = make_train_step(model, tx, model_cfg, train_cfg, donate=True)

    rng = np.random.default_rng(0)
    b = cfg["batch"]
    hg, wg = model_cfg.grd_size
    hs, ws = model_cfg.sat_size
    batch = Batch(
        grd=jnp.asarray(rng.normal(size=(b, hg, wg, 3)).astype(np.float32)),
        sat=jnp.asarray(rng.normal(size=(b, hs, ws, 3)).astype(np.float32)),
        row_offset=jnp.asarray(rng.uniform(-100, 100, b).astype(np.float32)),
        col_offset=jnp.asarray(rng.uniform(-100, 100, b).astype(np.float32)),
        angle_deg=jnp.asarray(rng.uniform(0, 360, b).astype(np.float32)),
    )
    key = jax.random.PRNGKey(0)

    # value-fetch synchronization: block_until_ready lies on this platform
    # (see ccvpe_tpu.core.profiling.sync / tools/microbench_tpu.py)
    t_compile = time.perf_counter()
    for _ in range(warmup):
        state, metrics = step(state, batch, key)
    float(jax.device_get(metrics["loss"]))
    compile_s = time.perf_counter() - t_compile

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch, key)
    loss = float(jax.device_get(metrics["loss"]))
    dt = (time.perf_counter() - t0) / iters
    return {"config": cfg, "ms_per_step": round(dt * 1000, 3),
            "pairs_per_s": round(b / dt, 2),
            "warmup_s": round(compile_s, 1),
            "final_loss": round(loss, 4)}   # finite-ness check (bf16 runs)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/bench_sweep.jsonl")
    p.add_argument("--config", action="append", required=True)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    for s in args.config:
        cfg = parse_config(s)
        print(f"=== {cfg}", flush=True)
        try:
            res = run_one(cfg, iters=args.iters)
        except Exception as e:  # record OOM/compile failures, keep sweeping
            res = {"config": cfg, "error": f"{type(e).__name__}: {e}"[:500]}
        print(json.dumps(res), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
