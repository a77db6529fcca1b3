"""Pod-ready scaling-efficiency harness: measured pairs/s at 1..N hosts.

The north star asks for aggregate train throughput at 1 chip / 1 host /
N hosts with >=80% weak-scaling efficiency. Real multi-host hardware is not
present in this container, so this harness has two faces with ONE code
path:

  * in-container smoke (the default): the driver spawns N local processes
    over 127.0.0.1 on a CPU device mesh
    (`--xla_force_host_platform_device_count`) and reports the measured
    efficiency table - proving the harness end-to-end;
  * a real pod: run the SAME worker command once per host with the real
    coordinator address and `--platform tpu` - nothing else changes:

      python tools/bench_scaling.py --worker --coordinator host0:8476 \
          --num_processes N --process_id $i --platform tpu \
          --preset vigor --local_batch 80 --phase 256

Weak scaling: every process contributes `local_batch` samples per step
(global batch = N * local_batch); the step is the REAL sharded train step
(train/step.py - XLA inserts the gradient all-reduce), timed with
value-fetch sync. efficiency(N) = rate(N) / (N * rate(1)).

Output: one JSON line per N with {num_processes, global_batch,
aggregate_pairs_per_s, efficiency_vs_1}; the driver appends to --out.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(args):
    os.environ.pop("JAX_PLATFORMS", None)
    if args.platform == "cpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices_per_proc}")
    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/ccvpe_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from ccvpe_tpu.core.mesh import init_distributed
    if args.num_processes > 1:
        init_distributed(args.coordinator, args.num_processes,
                         args.process_id)

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from ccvpe_tpu.core import config as cfg_lib
    from ccvpe_tpu.core.mesh import make_mesh, replicate, shard_batch
    from ccvpe_tpu.train.step import Batch, create_train_state, make_train_step

    model_cfg = dataclasses.replace(
        cfg_lib.get_model_config(args.preset),
        remat_backbone=bool(args.remat), compute_dtype=args.dtype,
        deconv_impl="conv", ori_window=args.ori_window,
        remat_skip_blocks=args.remat_skip,
        phase_space_min_res=args.phase)
    global_batch = args.local_batch * args.num_processes
    train_cfg = cfg_lib.TrainConfig(batch_size=global_batch)
    model, state, tx = create_train_state(model_cfg, train_cfg,
                                          jax.random.PRNGKey(17))
    step = make_train_step(model, tx, model_cfg, train_cfg, donate=True)

    mesh = make_mesh()
    state = replicate(mesh, state)
    rng = np.random.default_rng(args.process_id)
    hg, wg = model_cfg.grd_size
    hs, ws = model_cfg.sat_size
    lb = args.local_batch
    local = Batch(
        grd=rng.normal(size=(lb, hg, wg, 3)).astype(np.float32),
        sat=rng.normal(size=(lb, hs, ws, 3)).astype(np.float32),
        row_offset=rng.uniform(-100, 100, lb).astype(np.float32),
        col_offset=rng.uniform(-100, 100, lb).astype(np.float32),
        angle_deg=rng.uniform(0, 360, lb).astype(np.float32),
    )
    with jax.set_mesh(mesh):
        batch = shard_batch(mesh, local)
        key = jax.random.PRNGKey(0)
        for _ in range(args.warmup):
            state, metrics = step(state, batch, key)
        float(jax.device_get(metrics["loss"]))

        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, metrics = step(state, batch, key)
        loss = float(jax.device_get(metrics["loss"]))
        dt = (time.perf_counter() - t0) / args.iters

    rec = {"num_processes": args.num_processes,
           "devices": jax.device_count(),
           "preset": args.preset, "dtype": args.dtype,
           "local_batch": lb, "global_batch": global_batch,
           "ms_per_step": round(dt * 1e3, 2),
           "aggregate_pairs_per_s": round(global_batch / dt, 2),
           "final_loss": round(loss, 4)}
    if args.process_id == 0:
        print(json.dumps(rec), flush=True)
        if args.result:
            with open(args.result, "w") as f:
                json.dump(rec, f)


def driver(args):
    results = []
    for n in [int(x) for x in args.procs.split(",")]:
        port = args.base_port + n
        res_file = tempfile.mktemp(suffix=f".scaling.{n}.json")
        procs = []
        for i in range(n):
            cmd = [sys.executable, os.path.abspath(__file__), "--worker",
                   "--coordinator", f"127.0.0.1:{port}",
                   "--num_processes", str(n), "--process_id", str(i),
                   "--platform", args.platform,
                   "--devices_per_proc", str(args.devices_per_proc),
                   "--preset", args.preset, "--dtype", args.dtype,
                   "--local_batch", str(args.local_batch),
                   "--iters", str(args.iters),
                   "--warmup", str(args.warmup),
                   "--remat", str(args.remat),
                   "--remat_skip", str(args.remat_skip),
                   "--ori_window", str(args.ori_window),
                   "--phase", str(args.phase)]
            if i == 0:
                cmd += ["--result", res_file]
            procs.append(subprocess.Popen(cmd))
        codes = [p.wait() for p in procs]
        if any(codes):
            results.append({"num_processes": n, "error": f"exit codes {codes}"})
            print(json.dumps(results[-1]), flush=True)
            continue
        with open(res_file) as f:
            results.append(json.load(f))
        os.unlink(res_file)

    base = next((r for r in results if r.get("num_processes") == 1
                 and "aggregate_pairs_per_s" in r), None)
    for r in results:
        if base and "aggregate_pairs_per_s" in r:
            ideal = base["aggregate_pairs_per_s"] * r["num_processes"]
            r["efficiency_vs_1"] = round(r["aggregate_pairs_per_s"] / ideal, 3)
        print(json.dumps(r), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(r) + "\n")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--worker", action="store_true")
    p.add_argument("--procs", default="1,2",
                   help="driver mode: comma list of process counts to run")
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num_processes", type=int, default=1)
    p.add_argument("--process_id", type=int, default=0)
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    p.add_argument("--devices_per_proc", type=int, default=1)
    p.add_argument("--preset", default="tiny")
    p.add_argument("--dtype", default="float32")
    p.add_argument("--local_batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--remat", type=int, default=0)
    p.add_argument("--remat_skip", type=int, default=0)
    p.add_argument("--ori_window", type=int, default=0)
    p.add_argument("--phase", type=int, default=0)
    p.add_argument("--base_port", type=int, default=12650)
    p.add_argument("--result", default=None)
    p.add_argument("--out", default="/tmp/bench_scaling.jsonl")
    args = p.parse_args()
    if args.worker:
        worker(args)
    else:
        driver(args)


if __name__ == "__main__":
    main()
