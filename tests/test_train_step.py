"""Train-step integration tests on tiny models (CPU).

SURVEY.md section 4 "Integration": losses move the right way, penalties stay
finite, EMA tracks G, the state advances deterministically under a fixed
seed.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ganlab_tpu.config import get_config
from ganlab_tpu.train.schedule import build_phases, phase_at
from ganlab_tpu.train.state import create_train_state
from ganlab_tpu.train.steps import build_train_step, build_sample_fn
from ganlab_tpu.parallel import make_single_step


def tiny_config(model="resnetgan", **extra):
    presets = {"resnetgan": "resnetgan-cifar10", "progan": "progan-64",
               "stylegan": "stylegan-256"}
    over = {
        "model.resolution": 16,
        "model.fmap_base": 256,
        "model.fmap_max": 32,
        "model.latent_dim": 32,
        "model.base_channels": 16,
        "model.mapping_layers": 2,
        "run.compute_dtype": "float32",
        "schedule.batch_schedule": {4: 4, 8: 4, 16: 4},
        "schedule.total_kimg": 1.0,
    }
    over.update(extra)
    return get_config(presets[model], **over)


def fake_batch(n, res, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(n, res, res, 3), dtype=np.uint8)


@pytest.mark.parametrize("model", ["resnetgan", "progan", "stylegan"])
def test_step_runs_and_updates(model):
    cfg = tiny_config(model)
    phases = build_phases(cfg.schedule, cfg.model)
    phase = phases[-1]  # full-res stabilize phase
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_single_step(build_train_step(cfg, phase))

    batch = fake_batch(4, cfg.model.resolution)
    old_g = jax.tree.leaves(state.params_g)[0].copy()
    state2, metrics = step(state, batch)

    assert int(state2.step) == 1
    assert float(state2.shown_imgs) == 4.0
    for k in ("d_loss", "g_loss", "penalty", "alpha"):
        assert np.isfinite(float(metrics[k])), (k, metrics[k])
    # Params actually moved.
    new_g = jax.tree.leaves(state2.params_g)[0]
    assert not np.allclose(np.asarray(old_g), np.asarray(new_g))


def test_ema_kimg_beta_applied():
    """With optim.ema_kimg set the EMA uses the kimg-derived decay."""
    kimg = 0.01  # half-life of 10 images
    cfg = tiny_config("resnetgan", **{"optim.ema_kimg": kimg})
    phase = build_phases(cfg.schedule, cfg.model)[-1]
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_single_step(build_train_step(cfg, phase))

    old_ema = jax.device_get(state.params_ema)
    state2, _ = step(state, fake_batch(4, 16))
    beta = 0.5 ** (4 / (kimg * 1000.0))
    expect = jax.tree.map(
        lambda e, p: e * beta + np.asarray(p, e.dtype) * (1 - beta),
        old_ema, jax.device_get(state2.params_g))
    got = jax.device_get(state2.params_ema)
    for a, b in zip(jax.tree.leaves(expect), jax.tree.leaves(got)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_ema_rampup_warms_up_horizon():
    """optim.ema_rampup (StyleGAN2-ADA): the effective EMA horizon is
    min(ema_kimg*1000, shown_imgs*rampup), so beta grows over early steps.

    Isolation trick: lr_g=0 freezes params_g and params_ema is perturbed
    away from it, so the measured per-run contraction equals the product
    of the per-step betas exactly — compared against the closed form."""
    import dataclasses

    kimg, rampup, bs, n_steps = 0.1, 0.5, 4, 3
    cfg = tiny_config("resnetgan", **{"optim.ema_kimg": kimg})
    cfg = cfg.replace(optim=dataclasses.replace(
        cfg.optim, lr_g=0.0, ema_rampup=rampup))
    phase = build_phases(cfg.schedule, cfg.model)[-1]
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    state = state.replace(params_ema=jax.tree.map(
        lambda x: x + 1.0, state.params_ema))
    g0 = np.asarray(jax.tree.leaves(jax.device_get(state).params_g)[0])
    e0 = np.asarray(jax.tree.leaves(jax.device_get(state).params_ema)[0])
    step = make_single_step(build_train_step(cfg, phase))

    expected = 1.0
    for t in range(n_steps):
        shown = t * bs
        nimg = max(min(kimg * 1000.0, shown * rampup), 1.0)
        expected *= 0.5 ** (bs / nimg)
    for t in range(n_steps):
        state, _ = step(state, fake_batch(bs, 16, seed=t))

    e1 = np.asarray(jax.tree.leaves(jax.device_get(state).params_ema)[0])
    got = float(np.median(((e1 - g0) / (e0 - g0)).ravel()))
    assert got == pytest.approx(expected, rel=1e-4)
    # Sanity: the first step's beta is ~0 (horizon 1 image), so without
    # the perturbation-cancelling product the EMA tracks the live G early.
    assert expected < 0.05


def test_ema_rampup_requires_kimg():
    import dataclasses

    from ganlab_tpu.config import OptimConfig

    with pytest.raises(ValueError):
        OptimConfig(ema_rampup=0.05)
    with pytest.raises(ValueError):
        OptimConfig(ema_rampup=0.05, ema_kimg=None)
    OptimConfig(ema_rampup=0.05, ema_kimg=10.0)  # ok


def test_rng_key_not_reused_across_steps():
    """The carried state key must differ from every key consumed in the
    step (ADVICE r1: split(base,1)[0] aliased the first consumed key)."""
    def raw(k):
        if jnp.issubdtype(k.dtype, jax.dtypes.prng_key):
            k = jax.random.key_data(k)
        return np.asarray(k)

    base = jax.random.PRNGKey(3)
    n = 6
    ks = jax.random.split(base, n + 1)
    consumed, nxt = ks[1:], ks[0]
    # Next step's split must not reproduce any of this step's keys.
    ks2 = jax.random.split(nxt, n + 1)
    a = np.concatenate([raw(consumed), raw(ks2[1:])])
    flat = {tuple(row) for row in a.reshape(2 * n, -1)}
    assert len(flat) == 2 * n
    assert tuple(raw(nxt).ravel()) not in flat


def test_determinism_fixed_seed():
    cfg = tiny_config("resnetgan")
    phase = build_phases(cfg.schedule, cfg.model)[-1]

    def run():
        state = create_train_state(cfg, jax.random.PRNGKey(7))
        step = make_single_step(build_train_step(cfg, phase))
        for i in range(2):
            state, m = step(state, fake_batch(4, 16, seed=i))
        return float(m["d_loss"]), np.asarray(
            jax.tree.leaves(state.params_g)[0])

    l1, p1 = run()
    l2, p2 = run()
    assert l1 == l2
    np.testing.assert_array_equal(p1, p2)


def test_ema_tracks_generator():
    cfg = tiny_config("resnetgan", **{"optim.ema_beta": 0.5})
    phase = build_phases(cfg.schedule, cfg.model)[-1]
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_single_step(build_train_step(cfg, phase))
    # Snapshot BEFORE the step: the jitted step donates its input state.
    g0 = np.asarray(jax.tree.leaves(state.params_g)[0])
    state2, _ = step(state, fake_batch(4, 16))
    # ema' = 0.5*ema0 + 0.5*g1, with ema0 == g0.
    g1 = np.asarray(jax.tree.leaves(state2.params_g)[0])
    ema1 = np.asarray(jax.tree.leaves(state2.params_ema)[0])
    np.testing.assert_allclose(ema1, 0.5 * g0 + 0.5 * g1,
                               rtol=1e-5, atol=1e-6)


def test_losses_move_right_direction():
    """A few steps of WGAN-GP on fixed data: D loss should decrease
    (critic separates real from fake) and stay finite."""
    cfg = tiny_config("resnetgan")
    phase = build_phases(cfg.schedule, cfg.model)[-1]
    state = create_train_state(cfg, jax.random.PRNGKey(1))
    step = make_single_step(build_train_step(cfg, phase))
    batch = fake_batch(8, 16, seed=42)
    d_losses = []
    for _ in range(8):
        state, m = step(state, batch)
        d_losses.append(float(m["d_loss"]))
    assert all(np.isfinite(d_losses))
    # Wasserstein critic loss E[D(fake)]-E[D(real)] should trend down.
    assert np.mean(d_losses[-3:]) < np.mean(d_losses[:3])


def test_fade_phase_alpha_advances_in_jit():
    """During a fade phase, alpha is derived from shown_imgs inside jit and
    advances without recompilation."""
    cfg = tiny_config("progan", **{
        "schedule.progressive": True,
        "schedule.start_res": 4,
        "schedule.fade_kimg": 0.016,      # 16 images
        "schedule.stabilize_kimg": 0.016,
        "schedule.total_kimg": 0.2,
    })
    phases = build_phases(cfg.schedule, cfg.model)
    fade8 = [p for p in phases if p.kind == "fade"][0]
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    state = state.replace(shown_imgs=jnp.float32(fade8.start_img))
    step = make_single_step(build_train_step(cfg, fade8))
    alphas = []
    for i in range(3):
        state, m = step(state, fake_batch(4, fade8.resolution, seed=i))
        alphas.append(float(m["alpha"]))
    np.testing.assert_allclose(alphas, [0.0, 0.25, 0.5], atol=1e-6)


def test_stylegan_w_avg_updates():
    cfg = tiny_config("stylegan")
    phase = build_phases(cfg.schedule, cfg.model)[-1]
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_single_step(build_train_step(cfg, phase))
    state2, _ = step(state, fake_batch(4, 16))
    assert not np.allclose(np.asarray(state2.w_avg), 0.0)


def test_sample_fn_truncation():
    cfg = tiny_config("stylegan")
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    sample = jax.jit(build_sample_fn(cfg, cfg.model.res_log2),
                     static_argnums=())
    z = jax.random.normal(jax.random.PRNGKey(3), (2, cfg.model.latent_dim))
    img_full = sample(state.params_ema, state.w_avg, z,
                      jax.random.PRNGKey(4), 1.0, 1.0)
    img_trunc = sample(state.params_ema, state.w_avg, z,
                       jax.random.PRNGKey(4), 0.0, 1.0)
    assert img_full.shape == (2, 16, 16, 3)
    # psi=0 maps all truncated layers to w_avg: outputs differ from psi=1.
    assert not np.allclose(np.asarray(img_full), np.asarray(img_trunc))
    # psi=0 with w_avg fixed: the two different z's give much more similar
    # images than at psi=1 (style collapse onto the average).
    var_full = np.var(np.asarray(img_full[0] - img_full[1]))
    var_trunc = np.var(np.asarray(img_trunc[0] - img_trunc[1]))
    assert var_trunc < var_full


def test_lazy_regularization_interval():
    """penalty_every=2: penalty appears on even optimizer steps only
    (host-side dispatch between the two compiled programs)."""
    from ganlab_tpu.train.steps import make_lazy_stepper

    cfg = tiny_config("resnetgan", **{"loss.penalty_every": 2})
    phase = build_phases(cfg.schedule, cfg.model)[-1]
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_lazy_stepper(cfg, phase, make_single_step)
    pens = []
    for i in range(4):
        state, m = step(state, fake_batch(4, 16, seed=i))
        pens.append(float(m["penalty"]))
    # step counter starts at 0: steps 0 and 2 carry the penalty.
    assert pens[0] > 0.0 and pens[2] > 0.0
    assert pens[1] == 0.0 and pens[3] == 0.0


def test_lazy_regularization_weight_scaling():
    """With identical state/batch, the lazy penalty (interval k) equals k x
    the eager penalty."""
    from ganlab_tpu.train.steps import make_lazy_stepper

    batch = fake_batch(4, 16, seed=9)
    vals = {}
    for k in (1, 3):
        cfg = tiny_config("resnetgan", **{"loss.penalty_every": k})
        phase = build_phases(cfg.schedule, cfg.model)[-1]
        state = create_train_state(cfg, jax.random.PRNGKey(5))
        step = make_lazy_stepper(cfg, phase, make_single_step)
        _, m = step(state, batch)
        vals[k] = float(m["penalty"])
    assert vals[3] == pytest.approx(3.0 * vals[1], rel=1e-4)


def test_lazy_stepper_resume_offset():
    """On resume the lazy cadence continues from the restored step count."""
    from ganlab_tpu.train.steps import make_lazy_stepper

    cfg = tiny_config("resnetgan", **{"loss.penalty_every": 2})
    phase = build_phases(cfg.schedule, cfg.model)[-1]
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    # Pretend we restored at step 1: next step (odd) must skip the penalty.
    step = make_lazy_stepper(cfg, phase, make_single_step, initial_step=1)
    state, m = step(state, fake_batch(4, 16))
    assert float(m["penalty"]) == 0.0
    state, m = step(state, fake_batch(4, 16, seed=1))
    assert float(m["penalty"]) > 0.0


def test_n_critic_g_updates_every_nth_step():
    """d_steps_per_g=3: G params change only on steps 3, 6, ... and g_loss
    is reported only there."""
    cfg = tiny_config("resnetgan", **{"loss.d_steps_per_g": 3})
    phase = build_phases(cfg.schedule, cfg.model)[-1]
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_single_step(build_train_step(cfg, phase))
    g_prev = np.asarray(jax.tree.leaves(state.params_g)[0])
    changes, g_losses = [], []
    for i in range(6):
        state, m = step(state, fake_batch(4, 16, seed=i))
        g_now = np.asarray(jax.tree.leaves(state.params_g)[0])
        changes.append(not np.array_equal(g_prev, g_now))
        g_losses.append(float(m["g_loss"]))
        g_prev = g_now
    # steps counted from 0: G updates when step % 3 == 2 -> iters 2 and 5.
    assert changes == [False, False, True, False, False, True]
    assert g_losses[0] == 0.0 and g_losses[2] != 0.0


def test_remat_preserves_values():
    """model.remat recomputes activations but must not change results."""
    batch = fake_batch(4, 16, seed=3)
    outs = []
    for remat in (False, True):
        cfg = tiny_config("progan", **{"model.remat": remat})
        phase = build_phases(cfg.schedule, cfg.model)[-1]
        state = create_train_state(cfg, jax.random.PRNGKey(2))
        step = make_single_step(build_train_step(cfg, phase))
        state, m = step(state, batch)
        outs.append((float(m["d_loss"]), float(m["g_loss"]),
                     np.asarray(jax.tree.leaves(state.params_g)[0])))
    assert outs[0][0] == pytest.approx(outs[1][0], rel=1e-5)
    assert outs[0][1] == pytest.approx(outs[1][1], rel=1e-5)
    np.testing.assert_allclose(outs[0][2], outs[1][2], rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_bf16_compute_dtype_step():
    """The full step runs with bfloat16 activations (the TPU default) and
    keeps params/EMA in f32 with finite losses."""
    cfg = tiny_config("stylegan", **{"run.compute_dtype": "bfloat16"})
    phase = build_phases(cfg.schedule, cfg.model)[-1]
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_single_step(build_train_step(cfg, phase))
    state, m = step(state, fake_batch(4, 16))
    for k in ("d_loss", "g_loss", "penalty"):
        assert np.isfinite(float(m[k])), k
    for leaf in jax.tree.leaves(state.params_g):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree.leaves(state.params_ema):
        assert leaf.dtype == jnp.float32


class TestFusedStep:
    def _cfg(self):
        return tiny_config("stylegan", **{"loss.fused_g_step": True})

    def test_runs_and_updates_both(self):
        cfg = self._cfg()
        phase = build_phases(cfg.schedule, cfg.model)[-1]
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        g0 = np.asarray(jax.tree.leaves(state.params_g)[0])
        d0 = np.asarray(jax.tree.leaves(state.params_d)[0])
        step = make_single_step(build_train_step(cfg, phase))
        state, m = step(state, fake_batch(4, 16))
        for k in ("d_loss", "g_loss", "penalty"):
            assert np.isfinite(float(m[k])), k
        assert not np.allclose(g0, np.asarray(jax.tree.leaves(
            state.params_g)[0]))
        assert not np.allclose(d0, np.asarray(jax.tree.leaves(
            state.params_d)[0]))
        assert not np.allclose(np.asarray(state.w_avg), 0.0)

    @pytest.mark.slow
    def test_gradients_match_unfused_semantics(self):
        """Fused gradients == separately computed d-grad and g-grad (both
        against the PRE-update opponent, same keys)."""
        import jax.numpy as jnp
        from jax import lax

        from ganlab_tpu.ops import losses as L
        from ganlab_tpu.train.steps import (
            _preprocess,
            build_generator_forward,
        )
        from ganlab_tpu.models import build_models

        cfg = self._cfg()
        phase = build_phases(cfg.schedule, cfg.model)[-1]
        state = create_train_state(cfg, jax.random.PRNGKey(2))
        batch_u8 = fake_batch(4, 16, seed=3)

        # Reproduce step_fused's key derivation and preprocessing
        # (derive_keys: one split of n+1, ks[0] carried, ks[1:] consumed).
        k_flip, k_z, k_n, k_gp = jax.random.split(state.rng, 5)[1:]
        real = _preprocess(batch_u8, cfg.data.hflip, k_flip, jnp.float32)
        _, gen_fwd = build_generator_forward(cfg, phase.res_log2)
        _, d_model = build_models(cfg.model)

        def d_apply(p, x):
            return d_model.apply(p, x, phase.res_log2, 1.0).astype(
                jnp.float32)

        fake, _ = gen_fwd(state.params_g, k_z, k_n, jnp.float32(1.0), 4)
        fake = lax.stop_gradient(fake)

        def d_obj(pd):
            loss = L.d_loss_nonsaturating(d_apply(pd, real),
                                          d_apply(pd, fake))
            pen = L.r1_penalty(lambda x: d_apply(pd, x), real,
                               cfg.loss.penalty_weight)
            return loss + pen

        def g_obj(pg):
            fk, _ = gen_fwd(pg, k_z, k_n, jnp.float32(1.0), 4)
            return L.g_loss_nonsaturating(d_apply(state.params_d, fk))

        want_d = jax.grad(d_obj)(state.params_d)
        want_g = jax.grad(g_obj)(state.params_g)

        # Fused step with lr ~ 0 exposes raw gradients via Adam's update
        # direction? Simpler: recompute via the step's own objective by
        # diffing optimizer inputs is invasive — instead check the updated
        # params move in the SAME direction as a tiny manual SGD step.
        step = make_single_step(build_train_step(cfg, phase))
        state2, _ = step(create_train_state(cfg, jax.random.PRNGKey(2)),
                         batch_u8)

        # Adam step direction = sign(grad) for the first step; compare signs
        # where the reference gradient is significant.
        for got_tree, want_tree, old_tree in (
                (state2.params_d, want_d, state.params_d),
                (state2.params_g, want_g, state.params_g)):
            got = jax.tree.leaves(got_tree)
            want = jax.tree.leaves(want_tree)
            old = jax.tree.leaves(old_tree)
            agree, total = 0, 0
            for g_leaf, w_leaf, o_leaf in zip(got, want, old):
                delta = np.asarray(g_leaf) - np.asarray(o_leaf)
                w = np.asarray(w_leaf)
                mask = np.abs(w) > 1e-5
                if mask.sum() == 0:
                    continue
                # Adam moves against the gradient sign.
                agree += np.sum(np.sign(delta[mask]) == -np.sign(w[mask]))
                total += mask.sum()
            assert total > 0
            assert agree / total > 0.95, (agree, total)


def test_per_resolution_lr_multiplier():
    """optim.lr_mult_by_res scales the phase's update magnitude; Adam state
    stays structurally identical (checkpoint-compatible across phases)."""
    batch = fake_batch(4, 16, seed=13)
    deltas = {}
    for mult in (1.0, 4.0):
        cfg = tiny_config("resnetgan",
                          **{"optim.lr_mult_by_res": {16: mult}})
        phase = build_phases(cfg.schedule, cfg.model)[-1]
        state = create_train_state(cfg, jax.random.PRNGKey(6))
        g0 = np.asarray(jax.tree.leaves(state.params_g)[0])
        step = make_single_step(build_train_step(cfg, phase))
        state, _ = step(state, batch)
        g1 = np.asarray(jax.tree.leaves(state.params_g)[0])
        deltas[mult] = np.abs(g1 - g0).mean()
    # First Adam step magnitude is ~lr, so 4x lr -> ~4x delta.
    assert deltas[4.0] == pytest.approx(4.0 * deltas[1.0], rel=0.05)
