"""Whole-step speed-of-light / MFU accounting (VERDICT r4 item 1).

For the bench train-step config this tool answers: *how far is the measured
step time from this platform's floor?* Method:

  1. Compile the bench train step once; fetch the OPTIMIZED HLO text of the
     executable (fusions formed, layouts assigned).
  2. Parse every instruction in every computation: opcode, result shape,
     operand shapes (resolved by name), conv windows / dot contracting dims.
     Per instruction:
       - flops: 2*prod(out)*prod(kernel_spatial)*kernel_i for convolutions,
         2*prod(out)*prod(contracted) for dots; a fusion's flops = the sum
         over its fused computation. Elementwise flops are ignored - on this
         model they ride the bandwidth floor (docs/PERFORMANCE.md).
       - logical bytes: operand buffer bytes + result bytes (tuple-aware).
         Logical (unpadded) bytes make the floor a defensible LOWER bound.
  3. Trace a few steps (jax.profiler), aggregate device ns per instruction
     name from the serialized 'XLA Ops' line (tools/profile_step.py).
  4. Per instruction floor = max(flop_time, byte_time) against DATASHEET
     ceilings (PEAK_TFLOPS / HBM_PEAK_GBPS below - a floor needs true
     upper bounds; the in-repo microbenches proved to be lower bounds).
     The in-process axpy calibration is still run and reported as the
     platform's demonstrated practical stream rate.
  5. Aggregate achieved-vs-floor into the existing trace buckets (category,
     dominant activation resolution) and print the whole-step verdict.

Caveats (all push the floor DOWN, i.e. the reported headroom is an upper
bound): while-body instructions are floored once but traced over all
iterations (ori-window crops, ~1.5% of the step); elementwise FLOPs are
uncounted; logical bytes ignore TPU tile padding.

Usage: python tools/speed_of_light.py [--batch 96] [--dtype bfloat16]
           [--ori-window 160] [--remat-skip 2] [--corr-bf16 1] [--steps 5]
"""

import argparse
import collections
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from profile_step import (aggregate_trace, build_step, categorize,
                          max_activation_res, opcode)

# Ceilings for the FLOOR must be true upper bounds on achievable rate, so
# they are the v5e datasheet numbers - NOT the in-repo microbenches, which
# this tool itself proved to be lower bounds: the r5 trace shows fused
# bottleneck convs running at ~130 TFLOP/s, far above the 73.6 TF/s
# dependent-scan matmul chain (tools/microbench_tpu.py), and layout copies
# at ~490 GB/s, matching the axpy calibration (real streams can approach
# the 819 GB/s datasheet). A floor computed with too-HIGH a ceiling stays a
# valid lower bound on time; with a too-low one it silently overstates
# efficiency - hence datasheet.
PEAK_TFLOPS = {"bf16": 197.0, "f32": 98.5}   # v5e MXU
HBM_PEAK_GBPS = 819.0                        # v5e HBM

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1, "pred": 1, "token": 0,
    "c64": 8, "c128": 16,
}

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def shape_bytes(shape_text: str) -> int:
    """Logical bytes of an HLO shape string; sums tuple elements."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_text):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def shape_dims(shape_text: str):
    m = _SHAPE_RE.search(shape_text)
    if not m:
        return None, ()
    dt, dims = m.groups()
    return dt, tuple(int(d) for d in dims.split(",") if d)


class Instr:
    __slots__ = ("name", "shape", "opcode", "operands", "attrs", "comp")

    def __init__(self, name, shape, opcode, operands, attrs, comp):
        self.name, self.shape, self.opcode = name, shape, opcode
        self.operands, self.attrs, self.comp = operands, attrs, comp


# instruction line:  %name = SHAPE opcode(opnds), attrs   ('%' optional)
_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.-]+)\s*=\s*(\(?[a-z0-9].*?\)?)\s+"
    r"([a-z][\w-]*)\((.*)$")
_COMP_RE = re.compile(r"^\s*%?([\w.-]+)\s*(?:\(.*\))?\s*->.*\{\s*$")


def parse_hlo(text: str):
    """Parse optimized HLO text -> {instr_name: Instr}. Line-oriented; only
    the fields the accounting needs (shapes, opcode, operand names, the
    window/dim_labels/contracting attrs, owning computation)."""
    instrs = {}
    comp = "?"
    for line in text.splitlines():
        if line.endswith("{") and ("->" in line or line.lstrip().startswith(
                ("ENTRY", "%fused", "fused_", "%wide", "wide_", "%while",
                 "while_", "%body", "body", "%cond", "cond", "%region",
                 "region"))):
            m = _COMP_RE.match(line.replace("ENTRY ", ""))
            if m:
                comp = m.group(1)
            continue
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, shape, op, rest = m.groups()
        # operand names: leading %tokens (or bare names) inside the parens
        depth, i, args = 1, 0, ""
        while i < len(rest) and depth:
            c = rest[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            args += c
            i += 1
        attrs = rest[i + 1:]
        operands = [t.strip().lstrip("%") for t in args.split(",") if t.strip()]
        instrs[name] = Instr(name, shape, op, operands, attrs, comp)
    return instrs


def _parse_window(attrs: str):
    """window={size=AxB stride=.. pad=.. lhs_dilate=.. rhs_dilate=..} ->
    dict of per-dim int lists (missing fields default later)."""
    m = re.search(r"window=\{([^}]*)\}", attrs)
    out = {}
    if not m:
        return out
    for field in ("size", "stride", "lhs_dilate", "rhs_dilate"):
        fm = re.search(rf"{field}=([0-9x_]+)", m.group(1))
        if fm:
            out[field] = [int(t.split("_")[0]) for t in
                          fm.group(1).split("x")]
    return out


def _conv_flops(instr: Instr, instrs) -> float:
    """2 * prod(out) * prod(effective_taps_d) * contracted_features.

    XLA expresses data-grads, weight-grads and even batch-contraction
    einsums as convolutions with exotic windows (e.g. a 1x1 weight 'image'
    against a 256x256 activation 'kernel' padded 255, or lhs_dilate=96 for
    a batch contraction). The true multiplies per output in dim d are
    bounded by BOTH the kernel taps surviving rhs_dilation AND the real
    (undilated, in-bounds) lhs elements a window can cover:
        taps_d = min(ceil(k/rhs_dil), ceil(k/lhs_dil), lhs_spatial_d)
    which reduces to k for ordinary convolutions."""
    _, out_dims = shape_dims(instr.shape)
    if len(instr.operands) < 2:
        return 0.0
    lhs = instrs.get(instr.operands[0])
    rhs = instrs.get(instr.operands[1])
    if lhs is None or rhs is None:
        return 0.0
    _, ldims = shape_dims(lhs.shape)
    _, kdims = shape_dims(rhs.shape)
    m = re.search(r"dim_labels=([\w?]+)_([\w?]+)->([\w?]+)", instr.attrs)
    win = _parse_window(instr.attrs)
    if not m or len(kdims) != len(m.group(2)) or len(ldims) != len(m.group(1)):
        if len(kdims) < 2:
            return 0.0
        taps = float(np.prod(kdims[:-2], dtype=np.float64))
        cin = kdims[-2]
        return 2.0 * float(np.prod(out_dims, dtype=np.float64)) * taps * cin
    llabels, klabels = m.group(1), m.group(2)
    lhs_spatial = [d for d, lab in zip(ldims, llabels) if lab not in "bf"]
    k_spatial = [d for d, lab in zip(kdims, klabels) if lab not in "io"]
    cin = 1
    for d, lab in zip(kdims, klabels):
        if lab == "i":
            cin = d
    nd = len(k_spatial)
    sizes = win.get("size", k_spatial)
    lhs_dil = win.get("lhs_dilate", [1] * nd)
    rhs_dil = win.get("rhs_dilate", [1] * nd)
    taps = 1.0
    for d in range(nd):
        k = sizes[d] if d < len(sizes) else k_spatial[d]
        t = min(-(-k // max(1, rhs_dil[d] if d < len(rhs_dil) else 1)),
                -(-k // max(1, lhs_dil[d] if d < len(lhs_dil) else 1)),
                lhs_spatial[d] if d < len(lhs_spatial) else k)
        taps *= max(1, t)
    return 2.0 * float(np.prod(out_dims, dtype=np.float64)) * taps * cin


def _dot_flops(instr: Instr, instrs) -> float:
    _, out_dims = shape_dims(instr.shape)
    lhs = instrs.get(instr.operands[0]) if instr.operands else None
    if lhs is None:
        return 0.0
    _, ldims = shape_dims(lhs.shape)
    m = re.search(r"lhs_contracting_dims=\{([0-9,]*)\}", instr.attrs)
    k = 1.0
    if m and m.group(1):
        for d in m.group(1).split(","):
            if int(d) < len(ldims):
                k *= ldims[int(d)]
    elif ldims:
        k = ldims[-1]
    return 2.0 * float(np.prod(out_dims, dtype=np.float64)) * k


def annotate(instrs):
    """Per instruction: (conv_flops, dot_flops, mxu_dtype, bytes)."""
    by_comp = collections.defaultdict(list)
    for ins in instrs.values():
        by_comp[ins.comp].append(ins)

    def own_flops(ins):
        if ins.opcode == "convolution":
            return _conv_flops(ins, instrs), 0.0, _op_dtype(ins, instrs)
        if ins.opcode == "dot":
            return 0.0, _dot_flops(ins, instrs), _op_dtype(ins, instrs)
        return 0.0, 0.0, None

    def _op_dtype(ins, instrs):
        op0 = instrs.get(ins.operands[0]) if ins.operands else None
        dt, _ = shape_dims(op0.shape) if op0 is not None else (None, ())
        return "bf16" if dt == "bf16" else "f32"

    comp_flops = {}

    def comp_total(comp):
        if comp not in comp_flops:
            comp_flops[comp] = [0.0, 0.0, None]
            for ins in by_comp.get(comp, ()):
                cf, df, dt = own_flops(ins)
                # nested calls (fusion inside fusion body is rare; reduce
                # to_apply bodies carry no conv/dot)
                cm = re.search(r"calls=%?([\w.-]+)", ins.attrs)
                if ins.opcode == "fusion" and cm:
                    sub = comp_total(cm.group(1))
                    cf, df = cf + sub[0], df + sub[1]
                    dt = dt or sub[2]
                comp_flops[comp][0] += cf
                comp_flops[comp][1] += df
                if dt and comp_flops[comp][2] is None:
                    comp_flops[comp][2] = dt
        return comp_flops[comp]

    out = {}
    for name, ins in instrs.items():
        cf, df, dt = own_flops(ins)
        if ins.opcode == "fusion":
            cm = re.search(r"calls=%?([\w.-]+)", ins.attrs)
            if cm:
                cf, df, dt = comp_total(cm.group(1))
        nbytes = shape_bytes(ins.shape)
        seen = set()
        for opn in ins.operands:
            if opn in seen:
                continue
            seen.add(opn)
            o = instrs.get(opn)
            if o is not None:
                nbytes += shape_bytes(o.shape)
        out[name] = (cf, df, dt or "f32", nbytes)
    return out


def calibrate_hbm_gbps():
    """Measured HBM bandwidth: scanned axpy over a 1 GiB f32 buffer
    (each scan step reads + writes the full buffer)."""
    x = jnp.ones((256, 1024, 1024), jnp.float32)
    steps = 16

    @jax.jit
    def chain(x):
        def body(c, _):
            return c * 1.0000001 + 0.5, ()
        y, _ = jax.lax.scan(body, x, None, length=steps)
        return y

    y = chain(x)
    float(jax.device_get(y[0, 0, 0]))  # compile+complete
    t0 = time.perf_counter()
    y = chain(y)
    y = chain(y)
    float(jax.device_get(y[0, 0, 0]))
    dt = (time.perf_counter() - t0) / 2
    gib = x.size * 4 / 2**30
    gbps = 2 * gib * steps * 2**30 / dt / 1e9
    return gbps, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--ori-window", type=int, default=160)
    ap.add_argument("--remat-skip", type=int, default=2)
    ap.add_argument("--corr-bf16", type=int, default=1)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--out", default="/tmp/ccvpe_sol_trace")
    ap.add_argument("--hbm-gbps", type=float, default=0.0,
                    help="skip calibration, use this HBM BW")
    ap.add_argument("--json-out", default="")
    ap.add_argument("--preset", default="vigor")
    ap.add_argument("--reuse", action="store_true",
                    help="offline re-analysis: parse <out>/module.hlo.txt + "
                         "the existing trace under <out>, no TPU needed")
    ap.add_argument("--debug-top-flops", type=int, default=0,
                    help="print the N largest per-instruction FLOP "
                         "attributions with their parse details")
    args = ap.parse_args()

    hlo_path = os.path.join(args.out, "module.hlo.txt")
    if args.reuse:
        hbm_gbps = args.hbm_gbps or 494.0   # measured r5 (this tool)
        hlo_text = open(hlo_path).read()
    else:
        print(f"backend={jax.default_backend()} devices={jax.devices()}",
              flush=True)
        if args.hbm_gbps:
            hbm_gbps = args.hbm_gbps
            print(f"HBM BW (given): {hbm_gbps:.0f} GB/s", flush=True)
        else:
            hbm_gbps, dt = calibrate_hbm_gbps()
            print(f"HBM BW (measured, 1 GiB axpy x16): {hbm_gbps:.0f} GB/s "
                  f"({dt*1e3:.0f} ms/chain)", flush=True)

        step, state, data = build_step(args.batch, args.dtype,
                                       args.ori_window, args.remat_skip, 0,
                                       args.corr_bf16, preset=args.preset)
        key = jax.random.PRNGKey(0)

        t0 = time.perf_counter()
        lowered = step.lower(state, data, key)
        compiled = lowered.compile()
        print(f"compile: {time.perf_counter() - t0:.1f}s", flush=True)
        hlo_text = compiled.as_text()
        os.makedirs(args.out, exist_ok=True)
        with open(hlo_path, "w") as f:
            f.write(hlo_text)
    print(f"optimized HLO: {len(hlo_text) / 1e6:.1f} MB", flush=True)
    instrs = parse_hlo(hlo_text)
    info = annotate(instrs)
    print(f"parsed {len(instrs)} instructions", flush=True)

    if args.debug_top_flops:
        tops = sorted(info.items(), key=lambda kv: -(kv[1][0] + kv[1][1]))
        for name, (cf, df, dt_, nbytes) in tops[:args.debug_top_flops]:
            ins = instrs[name]
            print(f"  {cf/1e9:10.1f} GF conv {df/1e9:10.1f} GF dot {dt_} "
                  f"{ins.opcode:<12} {name} :: {ins.shape[:60]} "
                  f"attrs={ins.attrs[:120]}")

    if not args.reuse:
        # run + trace (reuses the executable just compiled)
        state, metrics = step(state, data, key)
        float(jax.device_get(metrics["loss"]))
        for _ in range(3):
            state, metrics = step(state, data, key)
        float(jax.device_get(metrics["loss"]))
        jax.profiler.start_trace(args.out)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = step(state, data, key)
        float(jax.device_get(metrics["loss"]))
        wall = (time.perf_counter() - t0) / args.steps
        jax.profiler.stop_trace()
        print(f"{args.steps} steps @ {wall*1e3:.1f} ms/step "
              f"({args.batch/wall:.1f} pairs/s)", flush=True)

    path, planes, per_op = aggregate_trace(args.out)
    total_ns = sum(per_op.values())
    print(f"trace total: {total_ns/args.steps/1e6:.1f} ms/step device",
          flush=True)

    rows = []   # (name, ns, floor_ns, flop_ns, byte_ns, flops, bytes, ok)
    unmatched_ns = 0
    for ev_name, ns in per_op.items():
        m = re.match(r"%?([\w.-]+)", ev_name)
        key_name = m.group(1) if m else ""
        rec = info.get(key_name)
        if rec is None:
            unmatched_ns += ns
            rows.append((ev_name, ns, 0.0, 0.0, 0.0, 0.0, 0, False))
            continue
        cf, df, dt, nbytes = rec
        flop_s = (cf + df) / (PEAK_TFLOPS[dt] * 1e12)
        byte_s = nbytes / (HBM_PEAK_GBPS * 1e9)
        floor = max(flop_s, byte_s) * 1e9
        rows.append((ev_name, ns, floor * args.steps,
                     flop_s * 1e9 * args.steps,
                     byte_s * 1e9 * args.steps, cf + df, nbytes, True))

    # NOTE: floors are per-execution; trace ns sums args.steps executions
    # (and while-loop iterations). Scale floors by steps above; while-bodies
    # under-floor, stated in the module docstring.
    def bucket_table(keyfn, title):
        agg = collections.defaultdict(lambda: [0, 0.0, 0.0, 0.0, 0.0, 0])
        for name, ns, floor, flns, byns, flops, nbytes, ok in rows:
            b = keyfn(name)
            agg[b][0] += ns
            agg[b][1] += floor
            agg[b][2] += flns
            agg[b][3] += byns
            agg[b][4] += flops
            agg[b][5] += nbytes
        print(f"\n== {title} ==")
        print(f"{'bucket':<36}{'meas ms':>9}{'floor ms':>10}"
              f"{'eff':>6}  bound  {'TF/s':>6}{'GB/s':>7}")
        items = sorted(agg.items(), key=lambda kv: -kv[1][0])
        for b, (ns, floor, flns, byns, flops, nbytes) in items:
            ms = ns / args.steps / 1e6
            if ms < 0.05:
                continue
            fms = floor / args.steps / 1e6
            bound = ("flop" if flns > byns else "byte") if floor else "-"
            eff = floor / ns if ns else 0.0
            sec = ns / 1e9
            print(f"{str(b):<36}{ms:>9.1f}{fms:>10.1f}{eff:>6.2f}  "
                  f"{bound:<5}{flops/sec/1e12:>7.1f}"
                  f"{nbytes*args.steps/sec/1e9:>7.0f}")
        return agg

    bucket_table(categorize, "by category")
    res_agg = bucket_table(
        lambda n: f"res {max_activation_res(n, args.batch)}",
        "by dominant activation resolution")

    meas_ms = total_ns / args.steps / 1e6
    floor_ms = sum(r[2] for r in rows) / args.steps / 1e6
    flop_ms = sum(r[3] for r in rows) / args.steps / 1e6
    byte_ms = sum(r[4] for r in rows) / args.steps / 1e6
    tf = sum(r[5] for r in rows if r[7]) / 1e12
    gbytes = sum(r[6] for r in rows if r[7]) / 1e9
    print(f"\n== whole step (datasheet ceilings: "
          f"{PEAK_TFLOPS['bf16']:.0f} TF/s bf16, {HBM_PEAK_GBPS:.0f} GB/s) ==")
    print(f"measured device: {meas_ms:.1f} ms/step")
    print(f"floor (sum of per-op max(flop,byte)): {floor_ms:.1f} ms/step "
          f"-> step efficiency {floor_ms/meas_ms:.2f}")
    print(f"  pure-flop floor {flop_ms:.1f} ms, pure-byte floor {byte_ms:.1f} ms")
    print(f"unmatched trace time: {unmatched_ns/args.steps/1e6:.1f} ms/step")
    print(f"MXU work: {tf:.2f} TFLOP/step -> achieved "
          f"{tf/(meas_ms/1e3):.1f} TFLOP/s overall "
          f"({tf/(meas_ms/1e3)/PEAK_TFLOPS['bf16']*100:.0f}% MFU)")
    print(f"logical HBM bytes: {gbytes:.1f} GB/step -> achieved "
          f"{gbytes/(meas_ms/1e3):.0f} GB/s overall "
          f"(calibrated axpy stream: {hbm_gbps:.0f} GB/s)")

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"batch": args.batch, "meas_ms": meas_ms,
                       "floor_ms": floor_ms, "flop_ms": flop_ms,
                       "byte_ms": byte_ms, "hbm_gbps_calibrated": hbm_gbps,
                       "tflop_per_step": tf, "gbyte_per_step": gbytes,
                       "res_buckets": {str(k): [v[0]/args.steps/1e6,
                                               v[1]/args.steps/1e6]
                                       for k, v in res_agg.items()}}, f)

    # top under-floor ops: where the slack is
    print("\n== top 15 ops by (measured - floor) ==")
    for name, ns, floor, flns, byns, flops, nbytes, ok in sorted(
            rows, key=lambda r: -(r[1] - r[2]))[:15]:
        print(f"  {(ns-floor)/args.steps/1e6:7.2f} ms slack  "
              f"meas {ns/args.steps/1e6:7.2f}  floor {floor/args.steps/1e6:6.2f}  "
              f"{name[:130]}")


if __name__ == "__main__":
    main()
