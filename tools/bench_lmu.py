"""On-chip benchmark: fused LMU-stage Pallas kernel vs the XLA chain, at the
real VIGOR decoder geometries (batch 64, bf16).

Per case: parity check (max |delta| vs the f32 jnp reference) + timing of
both implementations with value-fetch sync. The north-star gate
(VERDICT r2 #2): ship the kernel if >= 1.15x stage-level; otherwise these
numbers ARE the documented waiver.

Measured r3 (docs/PERFORMANCE.md "Fused LMU"): fwd 0.12x (stage6+head) and
0.35x (stage5) vs XLA - the waiver stands.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ccvpe_tpu.ops.lmu_pallas import fused_stage, fused_stage_reference

# (name, B, Hc, Wc, Cin, Cd, Cskip, C1, Cout, strip)
# channel plans from core/config.py vigor(): loc stages 4-6 + head, ori 5-6
CASES = [
    ("loc_stage6+head [64,256,256,41]->512^2x16->16->1",
     64, 256, 256, 41, 16, 0, 16, 1, 16),
    ("ori_stage6+head [64,256,256,33]->512^2x16->16->2",
     64, 256, 256, 33, 16, 0, 16, 2, 16),
    ("loc_stage5 [64,128,128,81]->256^2x40+skip16->40->40",
     64, 128, 128, 81, 40, 16, 40, 40, 16),
    ("ori_stage5 [64,128,128,65]->256^2x32+skip16->32->32",
     64, 128, 128, 65, 32, 16, 32, 32, 16),
    ("loc_stage4 [64,64,64,161]->128^2x80+skip24->80->80",
     64, 64, 64, 161, 80, 24, 80, 80, 16),
]


def timed(fn, *args, iters=10):
    out = fn(*args)
    float(jax.device_get(jnp.sum(out)))
    for _ in range(2):
        out = fn(*args)
    float(jax.device_get(jnp.sum(out)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.device_get(jnp.sum(out)))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=None,
                    help="override batch of every case")
    ap.add_argument("--cases", default=None,
                    help="comma-separated case indices")
    args = ap.parse_args()
    print(f"backend={jax.default_backend()}", flush=True)

    idxs = (range(len(CASES)) if args.cases is None
            else [int(i) for i in args.cases.split(",")])
    for i in idxs:
        try:
            run_case(args, i)
        except Exception as e:  # keep the sweep alive (OOM, Mosaic, ...)
            print(f"case {i} failed: {type(e).__name__}: {e}"[:300],
                  flush=True)


def run_case(args, i):
        name, b, hc, wc, cin, cd, cskip, c1, cout, strip = CASES[i]
        if args.batch:
            b = args.batch
        rng = np.random.default_rng(i)
        dt = jnp.bfloat16
        x = jnp.asarray(rng.normal(size=(b, hc, wc, cin)) * 0.3, dt)
        skip = (jnp.asarray(rng.normal(size=(b, 2 * hc, 2 * wc, cskip)) * 0.3,
                            dt) if cskip else None)
        wd = jnp.asarray(rng.normal(size=(2, 2, cin, cd)) * 0.1, jnp.float32)
        bd = jnp.asarray(rng.normal(size=(cd,)) * 0.1, jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(3, 3, cd + cskip, c1)) * 0.1,
                         jnp.float32)
        b1 = jnp.asarray(rng.normal(size=(c1,)) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(3, 3, c1, cout)) * 0.1, jnp.float32)
        b2 = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)

        fused = jax.jit(lambda x, s: fused_stage(
            x, s, wd, bd, w1, b1, w2, b2, strip=strip))

        def xla_chain(x, s):
            # the same ops as nn/decoder.py emits (bf16 compute, conv deconv)
            y = jax.lax.conv_transpose(
                x, wd[::-1, ::-1].astype(dt), (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bd
            y = y.astype(dt)
            if s is not None:
                y = jnp.concatenate([y, s], axis=-1)
            y = jax.lax.conv_general_dilated(
                y, w1.astype(dt), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32) + b1
            y = jnp.maximum(y, 0.0).astype(dt)
            y = jax.lax.conv_general_dilated(
                y, w2.astype(dt), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32) + b2
            return y

        xla = jax.jit(xla_chain)

        # fwd+bwd (the train-relevant path): value+grad wrt x and weights,
        # Pallas fwd + Pallas one-pass bwd vs Pallas fwd + XLA recompute bwd
        # vs the plain XLA chain's native autodiff
        from ccvpe_tpu.ops.lmu_pallas import fused_stage_diff

        def make_loss(stage_fn):
            def loss(x, s, *w):
                out = stage_fn(x, s, *w)
                return jnp.sum(out.astype(jnp.float32) ** 2)
            return jax.jit(jax.grad(loss, argnums=(0, 2, 3, 4, 5, 6, 7)))

        g_pallas = make_loss(lambda x, s, *w: fused_stage_diff(
            x, s, *w, strip, False, "pallas"))
        g_xlabwd = make_loss(lambda x, s, *w: fused_stage_diff(
            x, s, *w, strip, False, "xla"))
        g_chain = make_loss(lambda x, s, *w: xla_chain_w(x, s, *w))

        def timed_tuple(fn, iters=10):
            out = fn(x, skip, wd, bd, w1, b1, w2, b2)
            float(jax.device_get(jnp.sum(out[0].astype(jnp.float32))))
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(x, skip, wd, bd, w1, b1, w2, b2)
            float(jax.device_get(jnp.sum(out[0].astype(jnp.float32))))
            return (time.perf_counter() - t0) / iters

        def xla_chain_w(x, s, wd, bd, w1, b1, w2, b2):
            # f32 convs on bf16-rounded values: bf16 operands with
            # preferred_element_type=f32 are NOT differentiable (the VJP's
            # conv mixes the f32 cotangent with the bf16 operand) - same
            # policy as ops/lmu_pallas.py::_xla_chain
            f32 = jnp.float32
            y = jax.lax.conv_transpose(
                x.astype(f32), wd[::-1, ::-1].astype(f32), (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bd
            y = y.astype(dt)
            if s is not None:
                y = jnp.concatenate([y, s.astype(dt)], axis=-1)
            y = jax.lax.conv_general_dilated(
                y.astype(f32), w1.astype(f32), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b1
            y = jnp.maximum(y, 0.0).astype(dt)
            return jax.lax.conv_general_dilated(
                y.astype(f32), w2.astype(f32), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b2

        # parity at bf16 tolerance vs the f32 reference
        sl = (slice(None), slice(0, 8))
        ref = fused_stage_reference(
            np.asarray(x[sl], np.float32),
            None if skip is None else np.asarray(skip[:, :16], np.float32),
            wd, bd, w1, b1, w2, b2)
        got = np.asarray(fused(x[sl], None if skip is None
                               else skip[:, :16]))
        gotx = np.asarray(xla(x[sl], None if skip is None
                              else skip[:, :16]))
        scale = np.abs(np.asarray(ref)).max()
        err_f = np.abs(got - np.asarray(ref)).max() / scale
        err_x = np.abs(gotx - np.asarray(ref)).max() / scale
        t_fused = timed(fused, x, skip)
        t_xla = timed(xla, x, skip)
        gb = (x.size + (0 if skip is None else skip.size)) * 2 / 1e9
        print(f"{name}\n  fused {t_fused*1e3:8.2f} ms (rel err {err_f:.1e})"
              f"   xla {t_xla*1e3:8.2f} ms (rel err {err_x:.1e})"
              f"   speedup {t_xla/t_fused:4.2f}x   in-bytes {gb:.2f} GB",
              flush=True)

        # grads at HALF batch (three grad programs + their outputs resident
        # at once OOM'd 15.75G HBM at batch 64); per-pair rates still compare
        bg = max(1, b // 2)
        xg, skipg = x[:bg], None if skip is None else skip[:bg]

        def timed_tuple_g(fn, iters=10):
            out = fn(xg, skipg, wd, bd, w1, b1, w2, b2)
            float(jax.device_get(jnp.sum(out[0].astype(jnp.float32))))
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(xg, skipg, wd, bd, w1, b1, w2, b2)
            float(jax.device_get(jnp.sum(out[0].astype(jnp.float32))))
            return (time.perf_counter() - t0) / iters

        # on-device grad parity (scalar fetch): pallas-bwd vs chain autodiff
        gp = g_pallas(xg, skipg, wd, bd, w1, b1, w2, b2)
        gc = g_chain(xg, skipg, wd, bd, w1, b1, w2, b2)
        rel = jax.jit(lambda a, b: sum(
            jnp.max(jnp.abs(p.astype(jnp.float32) - q.astype(jnp.float32)))
            / (jnp.max(jnp.abs(q.astype(jnp.float32))) + 1e-9)
            for p, q in zip(a, b)) / len(a))(gp, gc)
        rel = float(jax.device_get(rel))
        del gp, gc

        tg_p = timed_tuple_g(g_pallas)
        tg_x = timed_tuple_g(g_xlabwd)
        tg_c = timed_tuple_g(g_chain)
        print(f"  grad (batch {bg}): pallas-bwd {tg_p*1e3:8.2f} ms"
              f"   xla-recompute-bwd {tg_x*1e3:8.2f} ms"
              f"   xla-chain {tg_c*1e3:8.2f} ms"
              f"   speedup {tg_c/tg_p:4.2f}x   mean-rel-err {rel:.1e}",
              flush=True)


if __name__ == "__main__":
    main()
