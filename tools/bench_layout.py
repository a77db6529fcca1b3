"""Layout/padding experiments for the fine-stage HBM-traffic attack (round 3).

The train step is HBM-bound at the fine decoder / early-encoder resolutions
(docs/PERFORMANCE.md). STATUS.md:104-109 attributes ~2x of that traffic to
XLA's batch-minor layouts padding batch 64 -> 128 lanes on few-channel
tensors. This script measures the representative ops directly on the chip to
(a) verify the padding model, (b) find which reformulation actually cuts
traffic, before touching the model.

Each case is timed with value-fetch sync (jax.device_get of a scalar that
data-depends on the result; block_until_ready is broken on this platform).
Prints one line per case: name, ms/call, moved GB (logical), effective GB/s.
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=10):
    out = fn(*args)                      # compile
    float(jax.device_get(jnp.sum(out)))
    for _ in range(2):                   # warm
        out = fn(*args)
    float(jax.device_get(jnp.sum(out)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.device_get(jnp.sum(out)))
    return (time.perf_counter() - t0) / iters


def conv3x3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def report(name, ms, gb):
    print(f"{name:58s} {ms*1e3:8.2f} ms  {gb:7.3f} GB  {gb/ms:7.1f} GB/s",
          flush=True)


def run_conv_case(b, hw, cin, cout, dtype=jnp.bfloat16, label=""):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, hw, hw, cin)), dtype)
    w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, dtype)
    f = jax.jit(conv3x3)
    dt = timed(f, x, w)
    bytes_ = (x.size + b * hw * hw * cout) * x.dtype.itemsize
    report(f"conv3x3 [{b},{hw},{hw},{cin}]->{cout} {x.dtype.name} {label}",
           dt, bytes_ / 1e9)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--group", default="all",
                    choices=["all", "batch", "channels", "stage", "corr"])
    args = ap.parse_args()
    print(f"backend={jax.default_backend()}", flush=True)

    if args.group in ("all", "batch"):
        # 1. batch sweep at the two dominant fine geometries: does lane
        # padding of batch 64->128 really cost 2x, and do 96/128 compile?
        for b in (32, 64, 96, 128):
            try:
                run_conv_case(b, 512, 16, 16)
            except Exception as e:  # noqa: BLE001
                print(f"conv3x3 [{b},512,512,16] FAILED: {type(e).__name__}",
                      flush=True)
        for b in (64, 96, 128):
            try:
                run_conv_case(b, 256, 40, 40)
            except Exception as e:  # noqa: BLE001
                print(f"conv3x3 [{b},256,256,40] FAILED: {type(e).__name__}",
                      flush=True)

    if args.group in ("all", "channels"):
        # 2. channel sweep at fixed batch 64, 512^2: where does the
        # effective GB/s recover? (lane dim = batch until C >= 128?)
        for c in (8, 16, 32, 64, 128):
            run_conv_case(64, 512 if c <= 32 else 256, c, c)

    if args.group in ("all", "stage"):
        # 3. the stage-6+head chain (deconv 41->16 at 256^2 -> 512^2, then
        # conv3x3 16->16 -> relu -> conv3x3 16->1): XLA baseline for the
        # fused-Pallas prototype to beat.
        rng = np.random.default_rng(0)
        b = 64
        x = jnp.asarray(rng.normal(size=(b, 256, 256, 41)), jnp.bfloat16)
        wd = jnp.asarray(rng.normal(size=(2, 2, 41, 16)) * 0.1, jnp.bfloat16)
        w1 = jnp.asarray(rng.normal(size=(3, 3, 16, 16)) * 0.1, jnp.bfloat16)
        w2 = jnp.asarray(rng.normal(size=(3, 3, 16, 1)) * 0.1, jnp.bfloat16)

        def stage(x, wd, w1, w2):
            y = jnp.einsum("bhwc,ijco->bhiwjo", x, wd,
                           preferred_element_type=jnp.float32)
            y = y.reshape(b, 512, 512, 16).astype(jnp.bfloat16)
            y = jax.nn.relu(conv3x3(y, w1))
            return conv3x3(y, w2)

        dt = timed(jax.jit(stage), x, wd, w1, w2)
        gb = (x.size * 2 + b * 512 * 512 * 1 * 2) / 1e9
        report("stage6+head chain XLA (einsum deconv)", dt, gb)

        def stage_conv(x, wd, w1, w2):
            y = jax.lax.conv_transpose(
                x, wd[::-1, ::-1], (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = jax.nn.relu(conv3x3(y.astype(jnp.bfloat16), w1))
            return conv3x3(y, w2)

        dt = timed(jax.jit(stage_conv), x, wd, w1, w2)
        report("stage6+head chain XLA (conv_transpose)", dt, gb)

    if args.group in ("all", "corr"):
        # 4. fine-scale correlation, XLA path (D=40 at 256^2): current 3.1x
        # SOL case the sub-128 Pallas kernel must beat.
        from ccvpe_tpu.ops.corr import rolled_corr
        rng = np.random.default_rng(0)
        sat = jnp.asarray(rng.normal(size=(64, 256, 256, 40)), jnp.float32)
        grd = jnp.asarray(rng.normal(size=(64, 800)), jnp.float32)

        f = jax.jit(lambda s, g: rolled_corr(s, g, shift=2, num_bins=20))
        dt = timed(f, sat, grd)
        gb = (sat.size + 64 * 256 * 256 * 20) * 4 / 1e9
        report("rolled_corr XLA [64,256,256,40] K=20", dt, gb)


if __name__ == "__main__":
    main()
