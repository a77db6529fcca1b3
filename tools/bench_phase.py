"""On-chip A/B of the phase-space fine stages vs the fine-layout XLA chain.

Round-4 measurement for the r3 verdict's top item: reformulate the finest
two stages of both decoders on lane-friendly [B, H/2, W/2, 4C] packings in
pure XLA (the same math ops/lmu_pallas.py runs as a Mosaic kernel, which
measured 0.12-0.35x; docs/PERFORMANCE.md "Fused LMU").

Each case times forward AND a full grad (wrt input + all weights, the
training shape of the cost) with value-fetch sync. Geometries are the
bench-config stages (VIGOR batch 80, bf16, ori_window 224):

  loc5:  [80,128,128,81] -> deconv 40 -> +skip16 -> 40 -> 40   (256^2 fine)
  loc6:  [80,256,256,41] -> deconv 16 -> head 16 -> 1          (512^2 fine)
  ori6:  [80,112,112,32] -> deconv 16 -> head 16 -> 2          (224^2 fine)

Usage: python tools/bench_phase.py [--cases loc5,loc6,ori6] [--batch 80]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ccvpe_tpu.ops.phase_space import (conv3x3_packed, deconv2x2_packed,
                                       depth_to_space, phase_stage)

BF16 = jnp.bfloat16


def timed(fn, *args, iters=10):
    out = fn(*args)                      # compile
    jax.tree.map(lambda t: float(jax.device_get(jnp.sum(t))), out)
    for _ in range(2):
        out = fn(*args)
    jax.tree.map(lambda t: float(jax.device_get(jnp.sum(t))), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(lambda t: float(jax.device_get(jnp.sum(t))), out)
    return (time.perf_counter() - t0) / iters


def fine_conv3x3(x, w, b):
    # bf16 in -> bf16 out (flax nn.Conv(dtype=bf16) semantics; a f32
    # preferred_element_type over bf16 operands breaks the conv VJP)
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b


def fine_deconv_conv(x, k, b):
    """The bench-config deconv (deconv_impl='conv', nn/decoder.py)."""
    y = jax.lax.conv_transpose(
        x, k[::-1, ::-1].astype(x.dtype), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def make_stage(case, impl):
    """Returns (fn(params...), params) computing the fine NHWC output."""
    rng = np.random.default_rng(0)
    b = case["batch"]
    h, cin = case["hw"], case["cin"]
    cd, cs, ca, cb = case["cd"], case["cs"], case["ca"], case["cout"]

    def t(shape, dt=BF16, scale=1.0):
        return jnp.asarray(rng.normal(size=shape) * scale, dt)

    x = t((b, h, h, cin))
    skip = t((b, 2 * h, 2 * h, cs)) if cs else None
    params = dict(
        dk=t((2, 2, cin, cd), jnp.float32, 0.1),
        db=t((cd,), jnp.float32, 0.1),
        wa=t((3, 3, cd + cs, ca), jnp.float32, 0.1),
        ba=t((ca,), jnp.float32, 0.1),
        wb=t((3, 3, ca, cb), jnp.float32, 0.1),
        bb=t((cb,), jnp.float32, 0.1),
    )

    if impl == "fine":
        def fn(x, p):
            y = fine_deconv_conv(x, p["dk"], p["db"]).astype(BF16)
            if skip is not None:
                y = jnp.concatenate([y, skip], axis=-1)
            y = jax.nn.relu(fine_conv3x3(y, p["wa"], p["ba"]).astype(BF16))
            return fine_conv3x3(y, p["wb"], p["bb"]).astype(jnp.float32)
    else:
        def fn(x, p):
            if skip is not None:
                y = phase_stage(x, skip, p["dk"], p["db"], p["wa"], p["ba"],
                                p["wb"], p["bb"], dtype=BF16, impl=impl)
                return y.astype(jnp.float32)
            # final stage + head: keep packed through the head
            z = phase_stage(x, None, p["dk"], p["db"], None, None, None,
                            None, dtype=BF16, unpack=False)
            g = jax.nn.relu(
                conv3x3_packed(z, p["wa"], p["ba"], impl=impl).astype(BF16))
            o = conv3x3_packed(g, p["wb"], p["bb"], impl=impl)
            return depth_to_space(o, p["wb"].shape[3]).astype(jnp.float32)
    return fn, x, params


CASES = {
    "loc4": dict(hw=64, cin=161, cd=80, cs=40, ca=80, cout=80),
    "loc5": dict(hw=128, cin=81, cd=40, cs=16, ca=40, cout=40),
    "loc6": dict(hw=256, cin=41, cd=16, cs=0, ca=16, cout=1),
    "ori5": dict(hw=56, cin=64, cd=32, cs=16, ca=32, cout=32),
    "ori6": dict(hw=112, cin=32, cd=16, cs=0, ca=16, cout=2),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="loc5,loc6,ori6")
    ap.add_argument("--impls", default="fine,onebig,phase4")
    ap.add_argument("--batch", type=int, default=80)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="/tmp/bench_phase.jsonl")
    args = ap.parse_args()
    print(f"backend={jax.default_backend()}", flush=True)

    for name in args.cases.split(","):
        case = dict(CASES[name], batch=args.batch)
        for impl in args.impls.split(","):
            fn, x, params = make_stage(case, impl)
            fwd = jax.jit(fn)

            def train(x, p):
                loss, grads = jax.value_and_grad(
                    lambda p: jnp.sum(fn(x, p)))(p)
                return loss, grads
            trn = jax.jit(train)
            try:
                dt_f = timed(fwd, x, params, iters=args.iters)
                dt_t = timed(trn, x, params, iters=args.iters)
                rec = {"case": name, "impl": impl, "batch": args.batch,
                       "fwd_ms": round(dt_f * 1e3, 2),
                       "train_ms": round(dt_t * 1e3, 2)}
            except Exception as e:  # noqa: BLE001
                rec = {"case": name, "impl": impl, "batch": args.batch,
                       "error": f"{type(e).__name__}: {e}"[:300]}
            print(json.dumps(rec), flush=True)
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
