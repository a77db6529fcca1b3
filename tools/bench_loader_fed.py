"""Loader-fed end-to-end train throughput: synthetic JPEG corpus -> real
input path (ThreadedLoader + native C++ decode + uint8 ingest) -> TPU train
step, sustained over many steps.

Validates the input-pipeline redesign claim (vs reference datasets.py:98-177,
whose PIL-per-sample + host GT rendering is its real bottleneck): the host
pipeline must sustain >= the device step rate.

Three numbers are reported:
  host_pairs_per_s     - loader alone (decode + collate, no device): the
                         host pipeline's capacity.
  overlap_pairs_per_s  - device runs the train step on staged tensors WHILE
                         the loader decodes the same stream concurrently:
                         proves decode keeps up with compute on shared CPUs.
  fed_pairs_per_s      - full end-to-end: every batch decoded, shipped
                         host->device, stepped. In THIS container the axon
                         tunnel's ~15-55 MB/s H2D path (vs GB/s PCIe on a
                         real TPU host) binds; reported for honesty with the
                         H2D MB/batch so the real-host rate is derivable.

Usage: python tools/bench_loader_fed.py [--steps 100] [--batch 64]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_corpus(root: str, n_pano=96, n_sat=24):
    """Synthetic VIGOR-layout JPEG corpus; random-noise images so JPEG
    decode cost is realistic. VIGORDataset loads the reference's fixed
    4-city list (data/vigor.py:76), so the other three cities are symlinks
    to the NewYork image dirs with their own (identical) split files."""
    import PIL.Image
    if os.path.exists(os.path.join(root, "done")):
        return
    rng = np.random.default_rng(0)
    city = "NewYork"
    os.makedirs(os.path.join(root, "splits_new", city), exist_ok=True)
    sats = [f"sat_{i}.jpg" for i in range(n_sat)]
    with open(os.path.join(root, "splits_new", city,
                           "satellite_list.txt"), "w") as f:
        f.write("\n".join(sats) + "\n")
    for s in sats:
        path = os.path.join(root, city, "satellite", s)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        PIL.Image.fromarray(rng.integers(0, 255, (640, 640, 3),
                                         dtype=np.uint8)).save(path)
    lines = []
    for i in range(n_pano):
        pano = f"pano_{i}.jpg"
        path = os.path.join(root, city, "panorama", pano)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        PIL.Image.fromarray(rng.integers(0, 255, (512, 1024, 3),
                                         dtype=np.uint8)).save(path)
        fields = [pano]
        for j in range(4):
            fields += [sats[(i + j) % n_sat], "10.0", "-20.0"]
        lines.append(" ".join(fields))
    with open(os.path.join(root, "splits_new", city,
                           "same_area_balanced_train.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    for other in ("Seattle", "SanFrancisco", "Chicago"):
        os.makedirs(os.path.join(root, "splits_new", other), exist_ok=True)
        for fname in ("satellite_list.txt", "same_area_balanced_train.txt"):
            src = os.path.join(root, "splits_new", city, fname)
            dst = os.path.join(root, "splits_new", other, fname)
            if not os.path.exists(dst):
                os.link(src, dst)
        if not os.path.exists(os.path.join(root, other)):
            os.symlink(os.path.join(root, city), os.path.join(root, other))
    with open(os.path.join(root, "done"), "w") as f:
        f.write("ok")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--corpus", default="/tmp/ccvpe_corpus")
    ap.add_argument("--num_workers", type=int, default=4)
    ap.add_argument("--host_only", action="store_true")
    args = ap.parse_args()

    make_corpus(args.corpus)

    import jax
    import jax.numpy as jnp

    from ccvpe_tpu.core import config as cfg_lib
    from ccvpe_tpu.core.profiling import enable_compile_cache
    from ccvpe_tpu.data.loader import ThreadedLoader
    from ccvpe_tpu.data.vigor import VIGORDataset
    from ccvpe_tpu.train.step import Batch, create_train_state, make_train_step

    enable_compile_cache()
    import dataclasses

    dataset = VIGORDataset(args.corpus, split="samearea", train=True,
                           image_dtype="uint8")
    # repeat the corpus so the index stream covers `steps` batches
    reps = -(-args.steps * args.batch // len(dataset))
    indices = list(range(len(dataset))) * reps

    def fresh_loader():
        return ThreadedLoader(dataset, args.batch, shuffle=True, seed=1,
                              num_workers=args.num_workers, prefetch=4,
                              indices=indices)

    def to_batch(raw):
        return Batch(grd=raw["grd"], sat=raw["sat"],
                     row_offset=raw["row_offset"],
                     col_offset=raw["col_offset"],
                     angle_deg=raw["angle_deg"])

    # --- 1. host pipeline alone ---
    loader = fresh_loader()
    it = iter(loader)
    next(it)  # warm the thread pool
    t0 = time.perf_counter()
    n = 0
    for raw in it:
        n += raw["grd"].shape[0]
        if n >= args.steps * args.batch // 2:
            break
    host_rate = n / (time.perf_counter() - t0)
    result = {"host_pairs_per_s": round(host_rate, 1)}
    print(json.dumps(result), flush=True)
    if args.host_only:
        return

    model_cfg = dataclasses.replace(cfg_lib.vigor(), remat_backbone=True,
                                    deconv_impl="conv",
                                    compute_dtype="bfloat16",
                                    remat_skip_blocks=2, ori_window=160,
                                    corr_bf16=True)  # r4 bench config
    train_cfg = cfg_lib.TrainConfig(batch_size=args.batch)
    model, state, tx = create_train_state(model_cfg, train_cfg,
                                          jax.random.PRNGKey(17))
    step = make_train_step(model, tx, model_cfg, train_cfg, donate=True)
    key = jax.random.PRNGKey(0)

    # staged batch for the overlap test
    raw0 = next(iter(fresh_loader()))
    staged = Batch(*(jnp.asarray(x) for x in to_batch(raw0)))
    state, metrics = step(state, staged, key)
    float(jax.device_get(metrics["loss"]))  # compile (value-fetch sync)

    # --- 2. device on staged tensors WHILE the loader decodes ---
    loader = fresh_loader()
    it = iter(loader)
    consumed = [0]

    import threading
    stop = threading.Event()

    def drain():
        for raw in it:
            consumed[0] += raw["grd"].shape[0]
            if stop.is_set():
                break

    th = threading.Thread(target=drain, daemon=True)
    n_steps = max(10, args.steps // 2)
    th.start()
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, staged, key)
    float(jax.device_get(metrics["loss"]))
    dt = time.perf_counter() - t0
    stop.set()
    overlap_rate = n_steps * args.batch / dt
    decoded_during = consumed[0] / dt
    result.update({
        "overlap_pairs_per_s": round(overlap_rate, 1),
        "decoded_during_overlap_pairs_per_s": round(decoded_during, 1),
    })
    print(json.dumps(result), flush=True)

    # --- 3. full loader-fed end-to-end ---
    loader = fresh_loader()
    it = iter(loader)
    b0 = to_batch(next(it))
    h2d_mb = sum(x.nbytes for x in b0) / 1e6
    state, metrics = step(state, Batch(*(jnp.asarray(x) for x in b0)), key)
    float(jax.device_get(metrics["loss"]))
    t0 = time.perf_counter()
    n = 0
    for raw in it:
        state, metrics = step(
            state, Batch(*(jnp.asarray(x) for x in to_batch(raw))), key)
        n += raw["grd"].shape[0]
        if n >= args.steps * args.batch:
            break
    float(jax.device_get(metrics["loss"]))
    fed_rate = n / (time.perf_counter() - t0)
    result.update({"fed_pairs_per_s": round(fed_rate, 1),
                   "h2d_mb_per_batch": round(h2d_mb, 1),
                   "steps": n // args.batch})
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
