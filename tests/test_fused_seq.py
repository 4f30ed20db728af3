"""Shared-batch sequential step (loss.fused_seq).

The ONLY semantic change vs the plain sequential step is that the G
update scores the D step's fake batch (under the post-update D) instead
of drawing a fresh one. So with identical state and input:

* the D-phase keys and math are untouched -> the D update must be
  BITWISE identical to the plain sequential step's;
* the G update sees different latents -> G params must differ.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ganlab_tpu.config import get_config
from ganlab_tpu.parallel import make_single_step
from ganlab_tpu.train.schedule import build_phases
from ganlab_tpu.train.state import create_train_state
from ganlab_tpu.train.steps import make_lazy_stepper


def tiny_cfg(**over):
    base = {
        "model.model": "stylegan",
        "model.resolution": 16,
        "model.latent_dim": 8,
        "model.fmap_base": 64,
        "model.fmap_max": 8,
        "model.mapping_layers": 2,
        "schedule.progressive": False,
        "run.compute_dtype": "float32",
        # This file A/Bs fused_seq against the plain sequential step, so
        # the base pins it OFF explicitly (it was the preset default
        # during r3; reverted r4 — BASELINE.md Finding 6).
        "loss.fused_seq": False,
    }
    base.update(over)
    cfg = get_config("stylegan-256", **base)
    return cfg.replace(schedule=cfg.schedule.__class__(
        progressive=False, batch_schedule={16: 4}))


def one_step(cfg, batch):
    phase = build_phases(cfg.schedule, cfg.model)[-1]
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_lazy_stepper(cfg, phase, make_single_step)
    return step(state, jnp.asarray(batch))


def test_fused_seq_d_identical_g_differs():
    rng = np.random.RandomState(0)
    batch = rng.randint(0, 256, (4, 16, 16, 3), np.uint8)
    s_plain, m_plain = one_step(tiny_cfg(), batch)
    s_seq, m_seq = one_step(tiny_cfg(**{"loss.fused_seq": True}), batch)

    # D phase untouched: bitwise-equal D params and D metrics.
    d_a = jax.tree.leaves(s_plain.params_d)
    d_b = jax.tree.leaves(s_seq.params_d)
    assert all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(d_a, d_b))
    assert float(m_plain["d_loss"]) == float(m_seq["d_loss"])

    # G phase sees the shared batch: params must differ.
    g_a = np.concatenate([np.asarray(x).ravel()
                          for x in jax.tree.leaves(s_plain.params_g)])
    g_b = np.concatenate([np.asarray(x).ravel()
                          for x in jax.tree.leaves(s_seq.params_g)])
    assert not np.array_equal(g_a, g_b)
    # Both updates are sane (finite, nonzero).
    assert np.isfinite(g_b).all()
    assert float(m_seq["g_loss"]) != 0.0


def test_fused_seq_trains():
    cfg = tiny_cfg(**{"loss.fused_seq": True, "loss.penalty_every": 4})
    phase = build_phases(cfg.schedule, cfg.model)[-1]
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_lazy_stepper(cfg, phase, make_single_step)
    rng = np.random.RandomState(1)
    for i in range(8):
        b = rng.randint(0, 256, (4, 16, 16, 3), np.uint8)
        state, m = step(state, jnp.asarray(b))
    assert np.isfinite(float(m["d_loss"]))
    assert np.isfinite(float(m["g_loss"]))
    assert int(state.step) == 8


def test_fused_seq_chunked_matches_singles():
    """The production scan-chunked path composes with fused_seq."""
    from ganlab_tpu.train.steps import make_chunked_stepper

    cfg = tiny_cfg(**{"loss.fused_seq": True, "loss.penalty_every": 4})
    phase = build_phases(cfg.schedule, cfg.model)[-1]
    rng = np.random.RandomState(2)
    stack = np.stack([rng.randint(0, 256, (4, 16, 16, 3), np.uint8)
                      for _ in range(4)])

    state_s = create_train_state(cfg, jax.random.PRNGKey(0))
    stepper_s = make_lazy_stepper(cfg, phase, make_single_step)
    for i in range(4):
        state_s, m_s = stepper_s(state_s, jnp.asarray(stack[i]))

    state_c = create_train_state(cfg, jax.random.PRNGKey(0))
    chunked, k = make_chunked_stepper(cfg, phase, make_single_step,
                                      make_single_step)
    assert k == 4
    state_c, m_c = chunked(state_c, jnp.asarray(stack))

    # Same math through the scan compile: reuse test_chunked's
    # state-equality helper (statistics tolerance — a different compile
    # reassociates float math; exact equality only holds same-program).
    from tests.test_chunked import assert_states_equal

    assert_states_equal(state_s, state_c)
    assert int(state_c.step) == int(state_s.step) == 4


def test_fused_seq_composes_with_pl():
    """The stylegan2-256 preset defaults fused_seq=True WITH path-length
    regularization; the interleaved PL cadence must run and stay finite,
    and the PL running mean must move off its init."""
    cfg = tiny_cfg(**{"loss.fused_seq": True, "loss.penalty_every": 4,
                      "loss.pl_weight": 2.0, "loss.pl_every": 2})
    phase = build_phases(cfg.schedule, cfg.model)[-1]
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_lazy_stepper(cfg, phase, make_single_step)
    rng = np.random.RandomState(3)
    saw_pl = False
    for i in range(4):
        b = rng.randint(0, 256, (4, 16, 16, 3), np.uint8)
        state, m = step(state, jnp.asarray(b))
        if "pl_penalty" in m:
            saw_pl = True
            assert np.isfinite(float(m["pl_penalty"]))
    assert saw_pl
    assert np.isfinite(float(state.pl_mean))
    assert float(state.pl_mean) != 0.0
    assert np.isfinite(float(m["g_loss"]))


def test_fused_seq_excludes_fused():
    with pytest.raises(ValueError, match="mutually exclusive"):
        tiny_cfg(**{"loss.fused_seq": True, "loss.fused_g_step": True})
