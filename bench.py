"""Benchmark harness: VIGOR train-step throughput on real TPU hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference is PyTorch, single-device, with no published
throughput numbers (SURVEY.md 6); the north-star target is >=10x the
reference's PyTorch-CPU pairs/s. TORCH_CPU_PAIRS_PER_S below was measured in
this container (reference CVM_VIGOR, batch 8, Adam step incl. full loss,
average of 3 steps after warmup).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: the full train-step compile is minutes-long
from ccvpe_tpu.core.profiling import enable_compile_cache

enable_compile_cache(os.path.dirname(os.path.abspath(__file__)))

# Measured in-container: reference PyTorch-CPU CVM_VIGOR train step
# (batch 8, forward+losses+backward+Adam, 185.1 s/step averaged over 3 steps
# after warmup). See tools/bench_torch_baseline.py.
TORCH_CPU_PAIRS_PER_S = 0.0432

# Throughput-optimal single-chip configuration (docs/PERFORMANCE.md, r4
# sweep docs/sweep_r4.jsonl): bf16 activations on the conv paths
# (params/BN/losses stay f32), backbone rematerialization with the first 2
# blocks stored (remat_skip; skip 3 and no-remat both measured slower),
# train-time orientation-decoder GT windowing at its validated floor of 160
# px (gradient-exact, tests/test_ori_window.py), bf16 correlation operands
# with f32 accumulation (corr_bf16), deconv_impl='conv', batch 96 — the
# measured optimum; 104 is slower and 112/128 exceed the remote compile
# helper's limits (the BN-output cast is what made 96 fit). Phase-space
# stages measured slower and stay off ("Phase-space" in the docs). Every
# knob is
# env-overridable for A/B runs (BENCH_<NAME>); BENCH_PRESET selects the
# workload (vigor / kitti / oxford) with per-preset batch defaults.
PRESET = os.environ.get("BENCH_PRESET", "vigor")
_DEFAULT_BATCH = {"vigor": 96, "kitti": 80, "oxford": 124}
BATCH = int(os.environ.get("BENCH_BATCH", _DEFAULT_BATCH.get(PRESET, 32)))
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")
REMAT_SKIP = int(os.environ.get("BENCH_REMAT_SKIP", 2))
REMAT_POLICY = os.environ.get("BENCH_REMAT_POLICY", "none")
ORI_WINDOW = int(os.environ.get("BENCH_ORI_WINDOW", 160))
LMU_FUSED_MIN_RES = int(os.environ.get("BENCH_LMU_FUSED", 0))
PHASE_SPACE = int(os.environ.get("BENCH_PHASE_SPACE", 0))
CORR_IMPL = os.environ.get("BENCH_CORR", "auto")
CORR_BF16 = int(os.environ.get("BENCH_CORR_BF16", 1))
CIRC_IMPL = os.environ.get("BENCH_CIRC", "wrap")
WARMUP = 5
ITERS = 30


def main():
    import dataclasses

    from ccvpe_tpu.core import config as cfg_lib
    from ccvpe_tpu.train.step import Batch, create_train_state, make_train_step

    model_cfg = dataclasses.replace(cfg_lib.get_model_config(PRESET),
                                    remat_backbone=True,
                                    deconv_impl="conv", compute_dtype=DTYPE,
                                    remat_skip_blocks=REMAT_SKIP,
                                    remat_policy=REMAT_POLICY,
                                    ori_window=ORI_WINDOW,
                                    lmu_fused_min_res=LMU_FUSED_MIN_RES,
                                    phase_space_min_res=PHASE_SPACE,
                                    corr_impl=CORR_IMPL,
                                    corr_bf16=bool(CORR_BF16),
                                    circular_impl=CIRC_IMPL)
    train_cfg = cfg_lib.TrainConfig(batch_size=BATCH)
    model, state, tx = create_train_state(model_cfg, train_cfg,
                                          jax.random.PRNGKey(17))
    step = make_train_step(model, tx, model_cfg, train_cfg, donate=True)

    rng = np.random.default_rng(0)
    hg, wg = model_cfg.grd_size
    hs, ws = model_cfg.sat_size
    batch = Batch(
        grd=jnp.asarray(rng.normal(size=(BATCH, hg, wg, 3)).astype(np.float32)),
        sat=jnp.asarray(rng.normal(size=(BATCH, hs, ws, 3)).astype(np.float32)),
        row_offset=jnp.asarray(rng.uniform(-100, 100, BATCH).astype(np.float32)),
        col_offset=jnp.asarray(rng.uniform(-100, 100, BATCH).astype(np.float32)),
        angle_deg=jnp.asarray(rng.uniform(0, 360, BATCH).astype(np.float32)),
    )
    key = jax.random.PRNGKey(0)

    # Timing is synchronized by VALUE (jax.device_get), never
    # block_until_ready: on the axon remote platform block_until_ready
    # returns before device completion for large executables (verified
    # against the device trace; tools/microbench_tpu.py). The final fetch
    # data-depends on all queued steps, so the measurement covers the full
    # device execution while still allowing dispatch pipelining.
    for _ in range(WARMUP):
        state, metrics = step(state, batch, key)
    float(jax.device_get(metrics["loss"]))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step(state, batch, key)
    float(jax.device_get(metrics["loss"]))
    dt = (time.perf_counter() - t0) / ITERS

    pairs_per_s = BATCH / dt
    print(json.dumps({
        "metric": f"{PRESET}_train_pairs_per_chip_per_s",
        "value": round(pairs_per_s, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / TORCH_CPU_PAIRS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
