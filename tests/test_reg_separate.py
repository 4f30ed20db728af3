"""Two-phase lazy regularization (loss.reg_separate).

The official StyleGAN2-ADA trainer runs Dmain and Dreg as SEPARATE
optimizer steps; r1-r3 summed the k-scaled penalty into the main D loss.
These tests pin the structural semantics of the separate mode: two Adam
updates on a penalty tick (one off-tick), penalty-only gradients at the
post-main weights, and exclusivity guards.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ganlab_tpu.config import get_config
from ganlab_tpu.train.schedule import build_phases
from ganlab_tpu.train.state import create_train_state
from ganlab_tpu.train.steps import build_train_step
from ganlab_tpu.parallel import make_single_step


def tiny_cfg(**over):
    base = {
        "model.resolution": 16, "model.latent_dim": 16,
        "model.fmap_base": 64, "model.fmap_max": 16,
        "model.mapping_layers": 2,
        "run.compute_dtype": "float32",
        "schedule.progressive": False, "schedule.start_res": 16,
        "schedule.batch_schedule": {16: 4}, "schedule.total_kimg": 1.0,
        "loss.penalty_every": 4,
    }
    base.update(over)
    return get_config("stylegan-256", **base)


def _batch(seed=0):
    return np.random.RandomState(seed).randint(
        0, 256, size=(4, 16, 16, 3), dtype=np.uint8)


def _adam_counts(opt_state):
    return [int(x) for x in jax.tree.leaves(opt_state)
            if hasattr(x, "dtype") and x.dtype == jnp.int32 and x.ndim == 0]


def test_guards():
    with pytest.raises(ValueError):
        tiny_cfg(**{"loss.reg_separate": True, "loss.fused_g_step": True})
    # reg_separate x grad_accum is rejected at CONFIG construction
    # (Config.__post_init__), not at build_train_step compile time
    # (VERDICT r4): the user finds out when writing the config.
    with pytest.raises(ValueError, match="grad_accum"):
        tiny_cfg(**{"loss.reg_separate": True, "optim.grad_accum": 2})


def test_tick_takes_two_d_optimizer_steps():
    """On a penalty tick the D optimizer advances TWICE (Dmain + Dreg,
    the official phase structure); off-tick once; the combined (default)
    mode always advances once."""
    cfg = tiny_cfg(**{"loss.reg_separate": True})
    phase = build_phases(cfg.schedule, cfg.model)[-1]
    state = create_train_state(cfg, jax.random.PRNGKey(0))

    tick = make_single_step(build_train_step(cfg, phase,
                                             penalty_override=True))
    off = make_single_step(build_train_step(cfg, phase,
                                            penalty_override=False))
    s1, m1 = tick(state, _batch(0))
    assert max(_adam_counts(s1.opt_d)) == 2
    assert float(m1["penalty"]) > 0.0
    s2, m2 = off(s1, _batch(1))
    assert max(_adam_counts(s2.opt_d)) == 3
    assert float(m2["penalty"]) == 0.0
    # G side is untouched: one update per step.
    assert max(_adam_counts(s2.opt_g)) == 2

    cfg_c = tiny_cfg()
    state_c = create_train_state(cfg_c, jax.random.PRNGKey(0))
    tick_c = make_single_step(build_train_step(cfg_c, phase,
                                               penalty_override=True))
    s1c, _ = tick_c(state_c, _batch(0))
    assert max(_adam_counts(s1c.opt_d)) == 1


def test_off_program_matches_plain_sequential_bitwise():
    """With the penalty off (15/16 of steps) reg_separate changes
    NOTHING: the compiled program must produce bitwise-identical state
    to the default build."""
    cfg_a = tiny_cfg(**{"loss.reg_separate": True})
    cfg_b = tiny_cfg()
    phase = build_phases(cfg_a.schedule, cfg_a.model)[-1]
    sa, _ = make_single_step(build_train_step(
        cfg_a, phase, penalty_override=False))(
        create_train_state(cfg_a, jax.random.PRNGKey(3)), _batch(7))
    sb, _ = make_single_step(build_train_step(
        cfg_b, phase, penalty_override=False))(
        create_train_state(cfg_b, jax.random.PRNGKey(3)), _batch(7))
    for a, b in zip(jax.tree.leaves(sa.params_d),
                    jax.tree.leaves(sb.params_d)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_separate_differs_from_combined_on_tick_and_trains():
    cfg_s = tiny_cfg(**{"loss.reg_separate": True})
    cfg_c = tiny_cfg()
    phase = build_phases(cfg_s.schedule, cfg_s.model)[-1]
    ss, ms = make_single_step(build_train_step(
        cfg_s, phase, penalty_override=True))(
        create_train_state(cfg_s, jax.random.PRNGKey(1)), _batch(2))
    sc, mc = make_single_step(build_train_step(
        cfg_c, phase, penalty_override=True))(
        create_train_state(cfg_c, jax.random.PRNGKey(1)), _batch(2))
    # Same main loss (same weights/batch), different D update rule.
    assert float(ms["d_loss"]) == pytest.approx(float(mc["d_loss"]),
                                                rel=1e-5)
    da = np.concatenate([np.asarray(x).ravel()
                         for x in jax.tree.leaves(ss.params_d)])
    db = np.concatenate([np.asarray(x).ravel()
                         for x in jax.tree.leaves(sc.params_d)])
    assert not np.allclose(da, db)
    assert np.all(np.isfinite(da))
    # Penalty metric on the tick is the reg phase's value and finite.
    assert np.isfinite(float(ms["penalty"])) and float(ms["penalty"]) > 0
