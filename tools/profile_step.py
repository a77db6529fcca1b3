"""Capture a device trace of the bench train step and print the top ops.

Runs the same configuration as bench.py (VIGOR, remat backbone, batch 32) on
the real TPU, captures an XPlane trace of a few steps, and aggregates
per-HLO-op device time via jax.profiler.ProfileData. Output: top ops by self
time + a coarse category breakdown (backbone convs / decoder convs / matmuls /
elementwise / reduce / other) to guide kernel work.

Usage: python tools/profile_step.py [--batch 32] [--out /tmp/ccvpe_trace]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_step(batch, dtype="float32", ori_window=0, remat_skip=0,
               phase_space=0, corr_bf16=0, preset="vigor"):
    import dataclasses

    from ccvpe_tpu.core import config as cfg_lib
    from ccvpe_tpu.train.step import Batch, create_train_state, make_train_step

    model_cfg = dataclasses.replace(cfg_lib.get_model_config(preset),
                                    remat_backbone=True,
                                    deconv_impl="conv", compute_dtype=dtype,
                                    ori_window=ori_window,
                                    remat_skip_blocks=remat_skip,
                                    phase_space_min_res=phase_space,
                                    corr_bf16=bool(corr_bf16))
    train_cfg = cfg_lib.TrainConfig(batch_size=batch)
    model, state, tx = create_train_state(model_cfg, train_cfg,
                                          jax.random.PRNGKey(17))
    step = make_train_step(model, tx, model_cfg, train_cfg, donate=True)
    rng = np.random.default_rng(0)
    hg, wg = model_cfg.grd_size
    hs, ws = model_cfg.sat_size
    data = Batch(
        grd=jnp.asarray(rng.normal(size=(batch, hg, wg, 3)).astype(np.float32)),
        sat=jnp.asarray(rng.normal(size=(batch, hs, ws, 3)).astype(np.float32)),
        row_offset=jnp.asarray(rng.uniform(-100, 100, batch).astype(np.float32)),
        col_offset=jnp.asarray(rng.uniform(-100, 100, batch).astype(np.float32)),
        angle_deg=jnp.asarray(rng.uniform(0, 360, batch).astype(np.float32)),
    )
    return step, state, data


def aggregate_trace(logdir):
    """Sum device-plane event durations by event name."""
    from jax.profiler import ProfileData

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    path = max(paths, key=os.path.getmtime)
    with open(path, "rb") as f:
        data = ProfileData.from_serialized_xspace(f.read())
    per_op = collections.Counter()
    planes = 0
    for plane in data.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        planes += 1
        for line in plane.lines:
            # ONLY the serialized compute timeline; 'XLA Modules', 'Steps'
            # and 'Async XLA Ops' overlap it and would multi-count.
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                per_op[ev.name] += ev.duration_ns
    return path, planes, per_op


def opcode(name):
    """Extract the HLO opcode from a full-text op name.

    Event names are full HLO instructions including the operand list, e.g.
    '%fusion.14 = (f32[...], ...) fusion(f32[...] %copy-done.665, ...)'.
    Substring tests against the whole name misattribute ops (any fusion with
    a %copy-done OPERAND would look like a copy), so parse the opcode token:
    the last lowercase-initial identifier before a '(' on the left of the
    operand list (tuple-shaped results contain T(8,128) layout parens, which
    never match because layout tags are uppercase).
    """
    head = name.split(" %", 1)[0]          # up to the first operand
    m = None
    for m in re.finditer(r"([a-z][a-z0-9._-]*)\(", head):
        pass                                # keep the last match
    return m.group(1) if m else "?"


def categorize(name):
    op = opcode(name)
    if op in ("copy-start", "copy-done"):
        return "async-copy"
    if op == "copy":
        return "layout-copy"
    if op in ("transpose", "reverse", "reshape", "bitcast", "slice",
              "concatenate", "pad"):
        return "data-movement"
    if op == "convolution":
        return "convolution"
    if op in ("dot", "custom-call"):
        return "dot/custom"
    if "all-reduce" in op or "all-gather" in op or "collective" in op:
        return "collective"
    if op == "fusion":
        low = name.lower()
        if "remat_compressed" in low or "remat_uncompressed" in low:
            return "remat-compress-copy"
        return "fusion"
    return f"other ({op})"


def max_activation_res(name, batch):
    """Largest spatial dim of any [batch, H, W, C] tensor in the op text -
    a proxy for which model stage the op belongs to."""
    best = 0
    for m in re.finditer(r"\[(\d+(?:,\d+){3})\]", name):
        dims = [int(x) for x in m.group(1).split(",")]
        if dims[0] == batch:
            best = max(best, dims[1])
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--ori-window", type=int, default=0)
    ap.add_argument("--remat-skip", type=int, default=0)
    ap.add_argument("--phase-space", type=int, default=0)
    ap.add_argument("--corr-bf16", type=int, default=0)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--out", default="/tmp/ccvpe_trace")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    step, state, data = build_step(args.batch, args.dtype, args.ori_window,
                                   args.remat_skip, args.phase_space,
                                   args.corr_bf16)
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    state, metrics = step(state, data, key)
    float(jax.device_get(metrics["loss"]))  # value-fetch sync; block_until_ready lies here
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s", flush=True)
    for _ in range(3):
        state, metrics = step(state, data, key)
    float(jax.device_get(metrics["loss"]))  # value-fetch sync; block_until_ready lies here

    jax.profiler.start_trace(args.out)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, data, key)
    float(jax.device_get(metrics["loss"]))  # value-fetch sync; block_until_ready lies here
    dt = (time.perf_counter() - t0) / args.steps
    jax.profiler.stop_trace()
    print(f"traced {args.steps} steps @ {dt * 1e3:.2f} ms/step "
          f"({args.batch / dt:.0f} pairs/s)", flush=True)

    path, planes, per_op = aggregate_trace(args.out)
    total = sum(per_op.values())
    print(f"trace: {path} device_planes={planes} "
          f"total_device_ns={total}")
    cats = collections.Counter()
    for name, ns in per_op.items():
        cats[categorize(name)] += ns
    print("\n== category breakdown ==")
    for cat, ns in cats.most_common():
        print(f"{ns / total * 100:6.2f}%  {ns / args.steps / 1e6:8.3f} ms/step  {cat}")

    # time by activation resolution: which model stage is expensive
    byres = collections.Counter()
    nres = collections.Counter()
    for name, ns in per_op.items():
        r = max_activation_res(name, args.batch)
        byres[r] += ns
        nres[r] += 1
    print("\n== time by max activation resolution ==")
    for r, ns in sorted(byres.items(), key=lambda kv: -kv[1])[:12]:
        print(f"res {r:5d}: {ns / args.steps / 1e6:8.1f} ms/step "
              f"({nres[r]} distinct ops)")

    print(f"\n== top {args.top} ops ==")
    for name, ns in per_op.most_common(args.top):
        print(f"{ns / total * 100:6.2f}%  {ns / args.steps / 1e6:8.3f} ms/step  {name[:140]}")

    summary = {
        "ms_per_step": dt * 1e3,
        "pairs_per_s": args.batch / dt,
        "categories": {c: ns / args.steps / 1e6 for c, ns in cats.items()},
        "by_resolution": {str(r): ns / args.steps / 1e6
                          for r, ns in byres.items()},
        "top_ops": [(n, ns / args.steps / 1e6)
                    for n, ns in per_op.most_common(args.top)],
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(f"\nwrote {os.path.join(args.out, 'summary.json')}")


if __name__ == "__main__":
    main()
