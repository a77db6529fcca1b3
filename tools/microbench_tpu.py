"""Chip-truth microbenchmarks: peak matmul throughput, per-op overhead, and
blocking semantics over the axon tunnel.

Motivation: device traces showed the VIGOR train step takes 551 ms on-device
while the wall-clock loop (block_until_ready on a metrics leaf) reported
8.5 ms/step - block_until_ready over this remote platform returns before the
computation finishes. Every timing in this repo must therefore force a value
transfer (jax.device_get) on a result that data-depends on the full
computation. This script quantifies the primitives:

  1. big matmul chain       -> achievable MXU TFLOP/s (bf16 + f32)
  2. many tiny chained ops  -> per-HLO-op overhead
  3. wall-clock of block_until_ready vs device_get on the same result

All measurements use device_get of a scalar reduction of the result.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=5):
    """Honest timing: dispatch iters calls, clock until a scalar derived from
    the last result is fetched to host."""
    out = None
    for _ in range(iters):
        out = fn(*args)
    t0 = time.perf_counter()
    # separate measurement pass
    for _ in range(iters):
        out = fn(*args)
    val = float(jax.device_get(jnp.sum(out)))
    dt = (time.perf_counter() - t0) / iters
    return dt, val


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)

    # --- 1. matmul peak ---
    for dtype, n in ((jnp.bfloat16, 4096), (jnp.float32, 4096)):
        x = jnp.ones((n, n), dtype)
        w = jnp.ones((n, n), dtype)

        @jax.jit
        def chain(x, w, _n=n):
            def body(c, _):
                return jax.lax.dot(c, w, preferred_element_type=c.dtype), ()
            y, _ = jax.lax.scan(body, x, None, length=32)
            return y

        # warmup/compile
        jax.device_get(jnp.sum(chain(x, w)))
        dt, _ = timed(chain, x, w, iters=3)
        flops = 2 * n * n * n * 32
        print(f"matmul chain {dtype.__name__} {n}^3 x32: {dt*1e3:.2f} ms "
              f"-> {flops/dt/1e12:.1f} TFLOP/s", flush=True)

    # --- 2. per-op overhead: chain of 1000 tiny dependent ops ---
    x = jnp.ones((8, 128), jnp.float32)

    @jax.jit
    def tiny_chain(x):
        for i in range(1000):
            x = x * 1.000001 + 1e-7
        return x

    jax.device_get(jnp.sum(tiny_chain(x)))
    dt, _ = timed(tiny_chain, x, iters=3)
    print(f"1000 dependent tiny ops: {dt*1e3:.3f} ms -> "
          f"{dt/1000*1e6:.2f} us/op (incl. fusion; XLA may fuse the chain)",
          flush=True)

    # 2b. defeat fusion with rsqrt+reshape mix of distinct shapes
    @jax.jit
    def tiny_convs(x):
        # 200 dependent 1x1 convs on a small NHWC tensor - unfusable chain
        w = jnp.eye(32, dtype=jnp.float32).reshape(1, 1, 32, 32)
        for _ in range(200):
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return x

    xc = jnp.ones((1, 8, 8, 32), jnp.float32)
    jax.device_get(jnp.sum(tiny_convs(xc)))
    dt, _ = timed(tiny_convs, xc, iters=3)
    print(f"200 dependent tiny convs: {dt*1e3:.3f} ms -> "
          f"{dt/200*1e6:.2f} us/conv", flush=True)

    # --- 3. block_until_ready vs device_get on a slow computation ---
    big = jnp.ones((8192, 8192), jnp.bfloat16)

    @jax.jit
    def slow(w):
        def body(c, _):
            return jax.lax.dot(c, w, preferred_element_type=jnp.bfloat16), ()
        y, _ = jax.lax.scan(body, w, None, length=64)
        return y

    jax.device_get(jnp.sum(slow(big)))  # compile
    t0 = time.perf_counter()
    y = slow(big)
    t_dispatch = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(y)
    t_block = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(jax.device_get(jnp.sum(y)))
    t_get = time.perf_counter() - t0
    flops = 2 * 8192**3 * 64
    print(f"8192^3 x64 ({flops/1e12:.0f} TF): dispatch {t_dispatch*1e3:.2f} ms, "
          f"block_until_ready {t_block*1e3:.2f} ms, "
          f"then device_get {t_get*1e3:.2f} ms", flush=True)
    print("if block_until_ready ~= the matmul-peak prediction, blocking works;"
          " if it returns in ~0 ms and device_get carries the time, it is"
          " broken on this platform", flush=True)


if __name__ == "__main__":
    main()
