"""Microbench: the orientation-rolled correlation op on the real TPU.

Compares, at the VIGOR bottleneck geometry and the fine decoder scales:
  * xla     - two batched MXU matmuls (ops/corr.py::rolled_corr)
  * pallas  - fused single-pass kernel (ops/corr_pallas.py)
  * loops   - direct transcription of the reference's per-bin roll loop
              (reference models.py:191-202), what a naive port would run

and reports the HBM speed-of-light bound for the op (read S once, write
scores once) so the kernel's distance to SOL is explicit.

All timings value-fetch synced (block_until_ready lies on this platform,
docs/PERFORMANCE.md). Usage: python tools/bench_corr.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ccvpe_tpu.core.profiling import enable_compile_cache, sync_element

enable_compile_cache()

# effective single-op HBM rate measured on this platform (docs/PERFORMANCE.md)
HBM_GB_S = 580.0


def bench(fn, args, iters=50):
    out = fn(*args)
    sync_element(out)  # compile + sync; full-output fetch would dominate
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync_element(out)
    return (time.perf_counter() - t0) / iters


def main():
    from ccvpe_tpu.ops.corr import rolled_corr, rolled_corr_reference
    from ccvpe_tpu.ops.corr_pallas import rolled_corr_pallas

    rng = np.random.default_rng(0)
    # (name, B, h, w, D, L, shift, K): bottleneck + two decoder scales
    cases = [
        ("vigor_bottleneck", 64, 8, 8, 1280, 1280, 64, 20),
        ("vigor_scale4", 64, 64, 64, 160, 160, 8, 20),
        ("vigor_scale5", 64, 128, 128, 80, 80, 4, 20),
        ("vigor_scale6", 64, 256, 256, 40, 40, 2, 20),
        ("kitti_bottleneck", 32, 8, 8, 2048, 2048, 128, 16),
    ]
    skip_loops = os.environ.get("BENCH_CORR_NO_LOOPS", "0") == "1"
    for name, b, h, w, d, l, shift, k in cases:
        sat = jnp.asarray(rng.normal(size=(b, h, w, d)).astype(np.float32))
        grd = jnp.asarray(rng.normal(size=(b, l)).astype(np.float32))

        impls = {
            "xla": jax.jit(lambda s, g: rolled_corr(s, g, shift, k)),
        }
        if not skip_loops:
            impls["loops"] = jax.jit(
                lambda s, g: rolled_corr_reference(s, g, shift, k))
        # pallas now covers D < 128 too (combined [s|s^2] @ [G';M] single
        # matmul, ops/corr_pallas.py); bench all scales to set the dispatch
        # threshold empirically
        impls["pallas"] = jax.jit(
            lambda s, g: rolled_corr_pallas(s, g, shift, k))

        # SOL: one read of S (f32), one write of scores; G/M matrices are tiny
        sol_bytes = 4 * (b * h * w * d + b * h * w * k)
        sol_ms = sol_bytes / (HBM_GB_S * 1e6)
        res = {"case": name, "shape": [b, h, w, d], "K": k,
               "sol_ms": round(sol_ms, 3)}
        for label, fn in impls.items():
            try:
                dt = bench(fn, (sat, grd))
                res[label + "_ms"] = round(dt * 1e3, 3)
            except Exception as e:
                res[label + "_ms"] = f"{type(e).__name__}"[:60]
        if isinstance(res.get("pallas_ms"), float):
            res["pallas_vs_sol"] = round(res["pallas_ms"] / sol_ms, 2)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
