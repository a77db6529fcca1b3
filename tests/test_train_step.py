"""End-to-end train step on the tiny config: smoke, overfit, and
data-parallel sharding equivalence on the fake 8-device CPU mesh
(SURVEY.md 4: DP gradient psum equals single-device gradient)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccvpe_tpu.core import config as cfg_lib
from ccvpe_tpu.core.mesh import make_mesh, replicated, shard_batch
from ccvpe_tpu.train.step import (
    Batch,
    create_train_state,
    make_eval_step,
    make_train_step,
)

# compile-heavy parity/equivalence suites: full-lane only (the op-level
# variants stay in the fast lane via test_lmu_pallas/test_corr)
pytestmark = pytest.mark.slow


def synthetic_batch(cfg, batch_size, seed=0):
    rng = np.random.default_rng(seed)
    hg, wg = cfg.grd_size
    hs, ws = cfg.sat_size
    return Batch(
        grd=jnp.asarray(rng.normal(size=(batch_size, hg, wg, 3)).astype(np.float32)),
        sat=jnp.asarray(rng.normal(size=(batch_size, hs, ws, 3)).astype(np.float32)),
        row_offset=jnp.asarray(rng.uniform(-20, 20, size=batch_size).astype(np.float32)),
        col_offset=jnp.asarray(rng.uniform(-20, 20, size=batch_size).astype(np.float32)),
        angle_deg=jnp.asarray(rng.uniform(0, 360, size=batch_size).astype(np.float32)),
    )


@pytest.fixture(scope="module")
def tiny_setup():
    model_cfg = cfg_lib.tiny()
    train_cfg = cfg_lib.TrainConfig(batch_size=8, learning_rate=3e-4)
    model, state, tx = create_train_state(model_cfg, train_cfg,
                                          jax.random.PRNGKey(17))
    return model_cfg, train_cfg, model, state, tx


def test_train_step_runs_and_decreases_loss(tiny_setup):
    model_cfg, train_cfg, model, state, tx = tiny_setup
    step = make_train_step(model, tx, model_cfg, train_cfg, donate=False)
    batch = synthetic_batch(model_cfg, 8)
    rng = jax.random.PRNGKey(0)
    state1, m0 = step(state, batch, rng)
    losses = [float(m0["loss"])]
    for _ in range(14):
        state1, m = step(state1, batch, rng)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    # overfitting one fixed batch must reduce the loss substantially
    assert losses[-1] < losses[0] * 0.7, losses


def test_flattened_optimizer_matches_per_tensor(tiny_setup):
    """optax.flatten (the op-count optimization, default on) must produce
    numerically equivalent parameter updates to the per-tensor optimizer.

    Both transforms are applied to the SAME gradient pytrees (realistic ones,
    taken from real train steps) rather than re-running the train step under
    each optimizer: the two step variants compile to different XLA graphs
    whose gradients differ at roundoff, and Adam amplifies roundoff-level
    gradients (e.g. BN biases with ~0 grad) into full lr-sized update
    differences - that would test graph determinism, not the transform."""
    import dataclasses

    from ccvpe_tpu.train.step import make_optimizer

    model_cfg, train_cfg, model, state, tx = tiny_setup
    step = make_train_step(model, tx, model_cfg, train_cfg, donate=False)
    batch = synthetic_batch(model_cfg, 4)
    rng = jax.random.PRNGKey(3)

    # harvest realistic gradients: successive param deltas are optimizer
    # output, but we want raw grads - recompute via jax.grad on the loss
    # inside the step is heavyweight; instead synthesize grads from param
    # deltas plus structured noise keyed per leaf.
    st1, _ = step(state, batch, rng)
    grads = jax.tree.map(lambda a, b: (a - b) * 1e3 + 1e-6,
                         state.params, st1.params)

    tx_flat = make_optimizer(dataclasses.replace(train_cfg,
                                                 flatten_optimizer=True))
    tx_per = make_optimizer(dataclasses.replace(train_cfg,
                                                flatten_optimizer=False))

    import optax

    results = {}
    for name, txx in (("flat", tx_flat), ("per", tx_per)):
        p = state.params
        st = txx.init(p)
        for i in range(3):
            g = jax.tree.map(lambda x, s=i + 1: x * s, grads)
            upd, st = txx.update(g, st, p)
            p = optax.apply_updates(p, upd)
        results[name] = p

    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(results["flat"]),
            jax.tree_util.tree_leaves_with_path(results["per"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-9, err_msg=str(path))


def test_grad_accum_matches_single_shot(tiny_setup):
    """grad_accum_steps=2 on a batch made of two identical halves must
    produce the mean of the two per-microbatch gradients, where microbatch i
    draws its dropout masks from fold_in(fold_in(rng, step), i) - computed
    here manually through make_loss_fn as the expected update.

    Compared under SGD so parameter deltas ARE gradients - Adam at step 1
    normalizes g/|g|, which amplifies roundoff-level graph differences into
    sign flips (see test_flattened_optimizer_matches_per_tensor)."""
    import dataclasses

    import optax

    from ccvpe_tpu.train.step import make_loss_fn

    model_cfg, train_cfg, model, state, tx_unused = tiny_setup
    lr = 1e-3
    tx = optax.sgd(lr)
    state = state._replace(opt_state=tx.init(state.params))

    cfg2 = dataclasses.replace(train_cfg, batch_size=8, grad_accum_steps=2)
    step2 = make_train_step(model, tx, model_cfg, cfg2, donate=False)

    half = synthetic_batch(model_cfg, 4, seed=5)
    dup = Batch(*(jnp.concatenate([x, x], axis=0) for x in half))
    rng = jax.random.PRNGKey(2)

    s2, m2 = step2(state, dup, rng)

    # expected: mean of the two microbatch grads (identical halves, but
    # per-microbatch folded rng -> different drop-connect masks)
    loss_fn = make_loss_fn(model, model_cfg, cfg2)
    grad_fn = jax.jit(jax.grad(loss_fn, has_aux=True))
    rng_step = jax.random.fold_in(rng, state.step)
    g0, (_, mm0) = grad_fn(state.params, state.batch_stats, half,
                           jax.random.fold_in(rng_step, 0))
    g1, (_, mm1) = grad_fn(state.params, state.batch_stats, half,
                           jax.random.fold_in(rng_step, 1))

    np.testing.assert_allclose(
        float(m2["loss"]),
        (float(mm0["loss"]) + float(mm1["loss"])) / 2, rtol=1e-5)
    # Per-leaf elementwise comparison is noise-dominated on cancellation-heavy
    # BN bias/scale gradient sums (the scan graph reduces in a different
    # order; see test_dp_sharded_grads_match_single_device for the same
    # effect). Assert global relative L2 agreement of the update vector -
    # any real accumulation bug (wrong microbatch split, missing /accum,
    # wrong rng fold, stale batch_stats) is an O(1) relative error here.
    da = jnp.concatenate([
        (-lr * 0.5 * (a + b)).ravel()
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1))])
    db = jnp.concatenate([
        (b - a0).ravel() for a0, b in zip(jax.tree.leaves(state.params),
                                          jax.tree.leaves(s2.params))])
    rel = float(jnp.linalg.norm(da - db) / jnp.linalg.norm(da))
    assert rel < 1e-3, rel
    # BN EMA advanced (applied per microbatch)
    changed = jax.tree.map(lambda x, y: float(jnp.abs(x - y).max()),
                           state.batch_stats, s2.batch_stats)
    assert max(jax.tree.leaves(changed)) > 0


def test_grad_accum_composes_with_dp_mesh(tiny_setup):
    """grad_accum under data-parallel input sharding must compile and run
    (lax.scan over microbatches + GSPMD batch sharding): loss finite and
    equal to the unsharded accum step."""
    import dataclasses

    model_cfg, train_cfg, model, state, tx = tiny_setup
    cfg = dataclasses.replace(train_cfg, batch_size=16, grad_accum_steps=2)
    step = make_train_step(model, tx, model_cfg, cfg, donate=False)
    batch = synthetic_batch(model_cfg, 16, seed=7)
    rng = jax.random.PRNGKey(4)

    _, m_single = step(state, batch, rng)

    mesh = make_mesh()
    rep = replicated(mesh)
    _, m_dp = step(jax.device_put(state, rep), shard_batch(mesh, batch), rng)
    assert np.isfinite(float(m_dp["loss"]))
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_single["loss"]),
                               rtol=2e-4)


def test_eval_step_outputs(tiny_setup):
    model_cfg, train_cfg, model, state, tx = tiny_setup
    eval_step = make_eval_step(model, model_cfg)
    batch = synthetic_batch(model_cfg, 2)
    heatmap, ori = eval_step(state.params, state.batch_stats, batch.grd, batch.sat)
    hs, ws = model_cfg.sat_size
    assert heatmap.shape == (2, hs, ws, 1)
    assert ori.shape == (2, hs, ws, 2)
    np.testing.assert_allclose(np.asarray(heatmap.sum((1, 2, 3))), 1.0, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(ori, axis=-1)), 1.0, atol=1e-3)


def test_dp_sharded_grads_match_single_device(tiny_setup):
    """Data-parallel gradients on an 8-device mesh must match single-device
    gradients (XLA all-reduce correctness).

    Compared in eval mode (running-stats BN, no drop-connect): train-mode BN
    reduces batch statistics across shards in a different summation order,
    which shows up as noise on cancellation-dominated bias-gradient sums.
    In eval mode the computation is bitwise shard-invariant, so this asserts
    tight tolerances and would catch any real sharding bug. Train-mode loss
    equivalence is asserted separately below.
    """
    from ccvpe_tpu.train.step import compute_losses, make_loss_fn

    model_cfg, train_cfg, model, state, tx = tiny_setup
    batch = synthetic_batch(model_cfg, 8)

    def eval_loss(params, batch_stats, batch):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          batch.grd, batch.sat, False)
        total, _ = compute_losses(model_cfg, train_cfg, out, batch)
        return total

    grad_fn = jax.jit(jax.grad(eval_loss))
    g_single = grad_fn(state.params, state.batch_stats, batch)

    mesh = make_mesh()
    assert mesh.devices.size == 8
    rep = replicated(mesh)
    g_dp = grad_fn(jax.device_put(state.params, rep),
                   jax.device_put(state.batch_stats, rep),
                   shard_batch(mesh, batch))

    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_single),
            jax.tree_util.tree_leaves_with_path(g_dp)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1e-3, float(np.abs(a).max()))
        np.testing.assert_allclose(a, b, atol=5e-4 * scale,
                                   err_msg=str(path))

    # train-mode (BN batch stats + drop-connect): loss must agree closely
    loss_fn = make_loss_fn(model, model_cfg, train_cfg)
    rng = jax.random.PRNGKey(1)
    train_grad = jax.jit(jax.grad(loss_fn, has_aux=True))
    _, (_, m_single) = train_grad(state.params, state.batch_stats, batch, rng)
    _, (_, m_dp) = train_grad(jax.device_put(state.params, rep),
                              jax.device_put(state.batch_stats, rep),
                              shard_batch(mesh, batch), rng)
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_single["loss"]),
                               rtol=2e-4)
