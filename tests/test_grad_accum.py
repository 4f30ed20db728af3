"""Gradient accumulation (optim.grad_accum) — semantics = sequential DP.

The design claim (steps.py::step_accum): accumulation over A microbatches
on one device reproduces a data-parallel run over A devices — same
per-microbatch mbstd/latent/penalty semantics, same key folds (microbatch
index where DP folds axis_index), averaged grads/metrics/w̄ like pmean.
The headline test checks exactly that, leaf by leaf, on the fake-device
mesh; the rest cover the PL chain, the Trainer feed plumbing, and the
recipe guard.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ganlab_tpu.config import get_config
from ganlab_tpu.data import SyntheticSource
from ganlab_tpu.parallel import (
    make_mesh,
    make_parallel_step,
    make_single_step,
    replicate,
    shard_batch,
)
from ganlab_tpu.train.loop import Trainer
from ganlab_tpu.train.schedule import build_phases
from ganlab_tpu.train.state import create_train_state
from ganlab_tpu.train.steps import build_train_step


def tiny_config(preset="stylegan-256", **extra):
    over = {
        "model.resolution": 16,
        "model.fmap_base": 256,
        "model.fmap_max": 32,
        "model.latent_dim": 32,
        "model.mapping_layers": 2,
        "model.base_channels": 16,
        "run.compute_dtype": "float32",
        "schedule.batch_schedule": {4: 2, 8: 2, 16: 2},
        "schedule.total_kimg": 1.0,
    }
    over.update(extra)
    return get_config(preset, **over)


def fake_batch(n, res, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(n, res, res, 3), dtype=np.uint8)


def assert_trees_close(a, b, what, atol=1e-5, rtol=1e-5):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x, np.float64),
                                   np.asarray(y, np.float64),
                                   atol=atol, rtol=rtol, err_msg=what)


def run_both(A, over, seed=7):
    """One step of grad_accum=A on ONE device vs shard_map DP over A
    devices — same total batch, same initial state. Returns both
    (state, metrics) pairs."""
    cfg_dp = tiny_config(**over)
    cfg_ac = tiny_config(**{"optim.grad_accum": A, **over})
    phase = build_phases(cfg_dp.schedule, cfg_dp.model)[-1]
    mesh = make_mesh(jax.devices()[:A])
    step_dp = make_parallel_step(
        build_train_step(cfg_dp, phase, axis_name="data"), mesh)
    step_ac = make_single_step(build_train_step(cfg_ac, phase))
    batch = fake_batch(A * 2, 16, seed=seed)  # 2 per device / microbatch
    state0 = create_train_state(cfg_dp, jax.random.PRNGKey(3))
    out_dp = step_dp(replicate(state0, mesh), shard_batch(batch, mesh))
    out_ac = step_ac(create_train_state(cfg_ac, jax.random.PRNGKey(3)),
                     batch)
    return out_dp, out_ac


@pytest.mark.slow
def test_accum_gradients_equal_dp():
    """The accumulated GRADIENTS equal DP's pmean'd gradients.

    Adam is made an identity map on the gradient (lr = eps = 1e3 =>
    update = -lr*g/(|g|+eps) ~= -g for |g| << 1e3), so the one-step param
    delta IS the gradient, compared through the real step functions. The
    tolerance covers reduction-order reassociation only: a few first-layer
    leaves (const input, first style bias/noise scale) have mathematically
    ~zero gradients whose cancellation residue (~1e-4 of the O(1) summed
    terms) differs between pmean's tree reduce and the scan's sequential
    sum."""
    (s_dp, _), (s_ac, _) = run_both(
        4, {"optim.lr_g": 1e3, "optim.lr_d": 1e3, "optim.eps": 1e3})
    for name in ("params_g", "params_d"):
        a, b = getattr(s_dp, name), getattr(s_ac, name)
        for (path, x), y in zip(
                jax.tree_util.tree_flatten_with_path(a)[0],
                jax.tree.leaves(b)):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), atol=5e-4, rtol=1e-3,
                err_msg=f"{name}{jax.tree_util.keystr(path)}")


@pytest.mark.parametrize("aug_mode", [
    "off", pytest.param("ada", marks=pytest.mark.slow)])
def test_accum_equals_dp(aug_mode):
    """Full-recipe one-step equality: params, EMA, w̄ (and ada_p).

    optim.eps floors Adam's denominator: at init the first-layer leaves'
    true gradients are ~0, and with the default eps=1e-8 the first Adam
    step is lr*sign(g) — pure reassociation noise decides the sign. The
    floor restores conditioning without changing the semantics under
    test (test_accum_gradients_equal_dp pins the gradients themselves)."""
    A = 4
    over = {"aug.mode": aug_mode, "optim.eps": 1e-3}
    (s_dp, m_dp), (s_ac, m_ac) = run_both(A, over)

    assert_trees_close(s_dp.params_g, s_ac.params_g, "params_g",
                       atol=5e-4, rtol=1e-3)
    assert_trees_close(s_dp.params_d, s_ac.params_d, "params_d",
                       atol=5e-4, rtol=1e-3)
    assert_trees_close(s_dp.params_ema, s_ac.params_ema, "params_ema",
                       atol=5e-4, rtol=1e-3)
    assert_trees_close(s_dp.w_avg, s_ac.w_avg, "w_avg")
    assert float(s_dp.shown_imgs) == float(s_ac.shown_imgs) == A * 2
    assert np.array_equal(np.asarray(s_dp.rng), np.asarray(s_ac.rng))
    if aug_mode == "ada":
        np.testing.assert_allclose(float(s_dp.ada_p), float(s_ac.ada_p),
                                   atol=1e-7)
    for k in ("d_loss", "g_loss", "penalty", "real_score", "fake_score"):
        np.testing.assert_allclose(float(m_dp[k]), float(m_ac[k]),
                                   atol=1e-4, rtol=1e-4, err_msg=k)


def test_accum_composes_with_dp():
    """DP over 2 devices x grad_accum=2 runs, is replica-consistent, and
    counts micro x accum x n_dev shown images per step."""
    A = 2
    cfg = tiny_config(**{"optim.grad_accum": A})
    phase = build_phases(cfg.schedule, cfg.model)[-1]
    mesh = make_mesh(jax.devices()[:2])
    step = make_parallel_step(
        build_train_step(cfg, phase, axis_name="data"), mesh)
    state = replicate(create_train_state(cfg, jax.random.PRNGKey(0)), mesh)
    batch = shard_batch(fake_batch(2 * A * 2, 16), mesh)  # (dev, A*2) rows
    state2, metrics = step(state, batch)
    assert float(state2.shown_imgs) == 2 * A * 2
    for k in ("d_loss", "g_loss", "penalty"):
        assert np.isfinite(float(metrics[k]))


@pytest.mark.slow
def test_accum_pl_chain_runs_and_updates_mean():
    """stylegan2 + path-length reg under accumulation: the chained
    per-microbatch running mean updates and training stays finite."""
    cfg = tiny_config("stylegan2-256", **{
        "optim.grad_accum": 2, "model.d_resnet": False,
        "loss.pl_batch_shrink": 1,
    })
    phase = build_phases(cfg.schedule, cfg.model)[-1]
    # pl_override=True: the PL-firing program (interval-scaled weight).
    step = make_single_step(build_train_step(cfg, phase,
                                             penalty_override=True,
                                             pl_override=True))
    state = create_train_state(cfg, jax.random.PRNGKey(1))
    pl0 = float(state.pl_mean)
    state, metrics = step(state, fake_batch(4, 16, seed=2))
    assert np.isfinite(float(metrics["pl_penalty"]))
    assert float(state.pl_mean) != pl0
    # One more step on the updated state (the chain keeps advancing).
    state, metrics = step(state, fake_batch(4, 16, seed=3))
    assert np.isfinite(float(metrics["g_loss"]))


def test_accum_trainer_feed_plumbing(tmp_path):
    """The Trainer feeds micro x accum rows per step and the shown-image
    counter advances by the effective batch."""
    cfg = tiny_config("resnetgan-cifar10", **{
        "optim.grad_accum": 2,
        "run.log_every": 0, "run.sample_every": 0,
        "run.checkpoint_every": 0,
        "schedule.total_kimg": 0.1,
    })
    src = SyntheticSource(16, num_images=32)
    tr = Trainer(cfg, workdir=str(tmp_path), use_mesh=False, source=src)
    try:
        tr.train(max_steps=3)
        assert int(jax.device_get(tr.state.step)) == 3
        assert float(jax.device_get(tr.state.shown_imgs)) == 3 * 2 * 2
    finally:
        tr.close()


def test_accum_rejects_fused_g_step():
    cfg = tiny_config(**{"optim.grad_accum": 2, "loss.fused_g_step": True})
    phase = build_phases(cfg.schedule, cfg.model)[-1]
    with pytest.raises(ValueError, match="grad_accum"):
        build_train_step(cfg, phase)


def test_grad_accum_validation():
    with pytest.raises(ValueError, match="grad_accum"):
        tiny_config(**{"optim.grad_accum": 0})
