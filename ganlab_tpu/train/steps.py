"""Jitted alternating G/D train steps; one compiled program per phase.

Rebuild of the reference's Learner ``train-step`` hot loop (SURVEY.md 3.2) as
a single pure function: D update (loss + gradient penalty via grad-of-grad)
-> G update (against the updated D, matching the reference's sequential
``opt_D.step(); g_loss.backward()``) -> generator EMA -> W-average -> counter
updates. The resolution and phase boundaries are static per compiled step;
fade-in alpha is derived from the shown-image counter *inside* jit, so one
compile covers a whole fade phase (SURVEY.md 3.3).

Data parallelism: ``axis_name`` threads a mesh axis through the step; the
only communication is a gradient/metric ``pmean`` over ICI. Everything else
(sampling, minibatch-stddev, penalties) is per-device by design, matching the
reference's per-GPU semantics (SURVEY.md 2.1, 2.3).

Images enter as uint8 NHWC and are normalized + augmented (random hflip)
on device — host->HBM traffic stays at 1 byte/pixel.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax import lax

from ganlab_tpu.config import Config
from ganlab_tpu.models import build_models
from ganlab_tpu.models.stylegan import (
    mix_styles,
    num_style_layers,
    truncate_ws,
)
from ganlab_tpu.ops import losses as L
from ganlab_tpu.ops.augment import augment
from ganlab_tpu.train.schedule import PhaseSpec
from ganlab_tpu.train.state import TrainState, make_optimizers


def _dtype_of(cfg: Config):
    return jnp.dtype(cfg.run.compute_dtype)


def _preprocess(real_u8, hflip: bool, key, dtype):
    """uint8 -> [-1, 1] in compute dtype, with per-sample random hflip."""
    x = real_u8.astype(jnp.float32) * (2.0 / 255.0) - 1.0
    if hflip:
        flip = jax.random.bernoulli(key, 0.5, (x.shape[0], 1, 1, 1))
        x = jnp.where(flip, x[:, :, ::-1, :], x)
    return x.astype(dtype)


def _ema_update(ema_params, new_params, beta):
    b = jnp.asarray(beta, jnp.float32)
    return jax.tree.map(lambda e, p: e * b + p.astype(e.dtype) * (1.0 - b),
                        ema_params, new_params)


def build_generator_forward(cfg: Config, res_log2: int):
    """(params_g, z-key, noise-key, alpha, batch) -> (fake_images, w_mean).

    For StyleGAN this includes mixing regularization: with probability
    ``style_mixing_prob`` a second latent is mapped and the per-layer styles
    cross over at a random (traced) layer. w_mean is the batch mean of the
    primary W, feeding the running W-average; None for non-style models.
    """
    g_model, _ = build_models(cfg.model)
    dtype = _dtype_of(cfg)
    zdim = cfg.model.latent_dim
    is_style = hasattr(g_model, "map_latents")  # stylegan & stylegan2

    if not is_style:
        def forward(params_g, zkey, nkey, alpha, batch):
            del nkey
            z = jax.random.normal(zkey, (batch, zdim), dtype)
            img = g_model.apply(params_g, z, res_log2, alpha)
            return img, None

        return g_model, forward

    nl = num_style_layers(res_log2)
    mix_prob = cfg.model.style_mixing_prob

    def forward(params_g, zkey, nkey, alpha, batch):
        k1, k2, kp, kc = jax.random.split(zkey, 4)
        z1 = jax.random.normal(k1, (batch, zdim), dtype)
        z2 = jax.random.normal(k2, (batch, zdim), dtype)
        # One mapping pass over both latents: the mapping net is per-row,
        # so mapping concat([z1, z2]) is bit-identical to two calls while
        # halving the latency-bound small-GEMM chain at train batch sizes.
        ww = g_model.apply(params_g, jnp.concatenate([z1, z2], axis=0),
                           method="map_latents")
        w1, w2 = ww[:batch], ww[batch:]
        use_mix = jax.random.bernoulli(kp, mix_prob)
        cross = jax.random.randint(kc, (), 1, nl)
        crossover = jnp.where(use_mix, cross, nl)
        ws = mix_styles(w1, w2, crossover, nl)
        img = g_model.apply(params_g, ws, res_log2, alpha,
                            method="synthesize", rngs={"noise": nkey})
        w_mean = jnp.mean(w1.astype(jnp.float32), axis=0)
        return img, w_mean

    return g_model, forward


def build_train_step(cfg: Config, phase: PhaseSpec,
                     axis_name: str | None = None,
                     fold_device_rng: bool = True,
                     penalty_override: bool | None = None,
                     pl_override: bool | None = None) -> Callable:
    """Pure (state, real_uint8) -> (state, metrics) for one phase.

    Wrap with jax.jit (single device) or shard_map+jit (DP) via
    ``ganlab_tpu.parallel.make_parallel_step``.

    ``fold_device_rng=False`` makes every device draw identical latents
    (test-only: with identical per-device data it turns DP into an exact
    replica of the single-device step, giving a bitwise equality check of
    the psum placement and state replication).

    Lazy regularization (``loss.penalty_every`` = k > 1): rather than one
    program with a ``lax.cond`` over both branches (2x compile size), the
    host compiles TWO smaller programs — ``penalty_override=True`` (penalty
    scaled by k) and ``False`` (no penalty) — and picks per step from the
    optimizer-step counter (see ``make_lazy_stepper``). With
    ``penalty_override=None`` the penalty (if any) is applied every step.
    """
    res_log2 = phase.res_log2
    g_model, gen_forward = build_generator_forward(cfg, res_log2)
    _, d_model = build_models(cfg.model)
    opt_g, opt_d = make_optimizers(cfg, resolution=phase.resolution)
    dtype = _dtype_of(cfg)
    lc = cfg.loss
    accum = max(1, cfg.optim.grad_accum)
    d_loss_fn_base = L.D_LOSSES[lc.loss]
    g_loss_fn_base = L.G_LOSSES[lc.loss]
    is_style = cfg.model.model in ("stylegan", "stylegan2")

    fade_start = float(phase.start_img)
    fade_len = float(max(phase.fade_images, 1))
    is_fade = phase.kind == "fade"

    def alpha_of(shown):
        if not is_fade:
            # STATIC 1.0: lets the models skip the fade branch at trace
            # time (models/progan.py::static_stable) — XLA cannot DCE the
            # 0*old_head product itself.
            return 1.0
        return jnp.clip((shown - fade_start) / fade_len, 0.0, 1.0)

    def d_apply(params_d, imgs, alpha):
        return d_model.apply(params_d, imgs, res_log2, alpha).astype(jnp.float32)

    def pmean(x):
        return lax.pmean(x, axis_name) if axis_name else x

    # Lazy regularization (StyleGAN2 sec. 5.1): the penalty applies every
    # k-th step with weight scaled by k (the k-scaling belongs to the lazy
    # 'on' program, penalty_override=True; the every-step program uses the
    # plain weight). Dispatch between the two programs is host-side — see
    # make_lazy_stepper.
    has_penalty = lc.penalty in ("wgan-gp", "r1")
    with_penalty = (has_penalty if penalty_override is None
                    else penalty_override)
    pen_weight = lc.penalty_weight * (
        lc.penalty_every if penalty_override is True else 1)
    # Two-phase D regularization (official ADA Dmain/Dreg; loss docs).
    reg_separate = lc.reg_separate and has_penalty
    if reg_separate and accum > 1:
        raise ValueError("loss.reg_separate with optim.grad_accum > 1 is "
                         "not supported (the accumulation scan folds the "
                         "penalty into the main gradient sum)")

    # Path-length regularization on G (StyleGAN2 extension; loss.pl_*).
    # Same lazy-override pattern as the D penalty: None = as configured
    # every step (plain weight), True = fire with interval-scaled weight,
    # False = off (the program for non-fire steps).
    pl_active = cfg.pl_active
    if pl_active and lc.d_steps_per_g > 1:
        # The PL cadence (i % pl_every) is independent of the G-update
        # cadence (i % n_critic) — PL would silently never fire (or fire
        # with a wrong effective weight). Reject the combination.
        raise ValueError("loss.pl_weight > 0 requires d_steps_per_g == 1")
    with_pl = pl_active if pl_override is None else pl_override
    pl_weight = lc.pl_weight * (lc.pl_every if pl_override is True else 1)
    zdim = cfg.model.latent_dim

    def pl_term(params_g, pl_mean, k_pl, alpha, batch, decay=None):
        """(penalty, new_pl_mean): E[(||J_w^T y|| - a)^2] with a = running
        mean of the lengths (StyleGAN2 app. B). Fresh latents at
        batch/pl_batch_shrink; grads wrt the per-layer styles via
        grad-of-grad, like the R1 path. ``decay`` overrides lc.pl_decay
        (the accumulation path chains one update per microbatch and scales
        the per-microbatch decay so the per-STEP horizon is unchanged)."""
        nb = max(batch // max(lc.pl_batch_shrink, 1), 1)
        decay = lc.pl_decay if decay is None else decay
        kz, kn, ky = jax.random.split(k_pl, 3)
        z = jax.random.normal(kz, (nb, zdim), dtype)
        w = g_model.apply(params_g, z, method="map_latents")
        ws = jnp.repeat(w[:, None, :], num_style_layers(res_log2), axis=1)

        def img_proj(ws_):
            img = g_model.apply(params_g, ws_, res_log2, alpha,
                                method="synthesize", rngs={"noise": kn})
            scale = 1.0 / float(
                (2 ** res_log2) )  # sqrt(H*W) = 2**res_log2 for square H=W
            y = jax.random.normal(ky, img.shape, jnp.float32) * scale
            return jnp.sum(img.astype(jnp.float32) * y)

        g = jax.grad(img_proj)(ws)
        pl_len = jnp.sqrt(jnp.mean(
            jnp.sum(jnp.square(g.astype(jnp.float32)), axis=2), axis=1))
        new_mean = pl_mean + jnp.float32(decay) * (
            pmean(jnp.mean(pl_len)) - pl_mean)
        new_mean = lax.stop_gradient(new_mean)
        pen = jnp.float32(pl_weight) * jnp.mean(
            jnp.square(pl_len - new_mean))
        return pen, new_mean

    # Discriminator augmentation (aug.*; ops/augment.py). Every image D
    # sees — reals and fakes, in the D and G losses and the penalty — is
    # augmented at strength p; sampling/eval is untouched. p is TRACED
    # (state.ada_p when adaptive, a constant when fixed), so adaptation
    # never recompiles. When off, nothing below changes any program.
    aug_active = cfg.aug_active
    ada_active = cfg.ada_active

    def aug_p_of(state):
        if not aug_active:
            return None
        return state.ada_p if ada_active else jnp.float32(cfg.aug.p_init)

    def maybe_aug(x, key, p):
        return augment(x, p, key, cfg.aug.categories) if aug_active else x

    def ada_update(state, rt, batch):
        """In-graph p step toward the overfitting target (official ADA:
        p moves by ±global_batch/(kimg*1000) per step, following
        sign(r_t - target) with r_t = E[sign(D(real_aug))]). ``rt`` is
        already pmean'd, so the update is replica-identical under DP."""
        n_dev = lax.psum(1, axis_name) if axis_name else 1
        adj = jnp.sign(rt - jnp.float32(cfg.aug.target)) * (
            jnp.float32(batch * n_dev) / jnp.float32(cfg.aug.kimg * 1000.0))
        return jnp.clip(state.ada_p + adj, 0.0, jnp.float32(cfg.aug.p_max))

    def derive_keys(state, n):
        """Per-device sampling keys + the replicated next key.

        All n+1 keys come from ONE split of the state key, so the carried
        key is never one of the keys consumed this step and no threefry
        counter range is shared across steps. The mesh position folds into
        the sampling keys only (each device draws its own latents); the
        state key advances identically on every device so the state stays
        replica-identical."""
        ks = jax.random.split(state.rng, n + 1)
        keys = ks[1:]
        if axis_name and fold_device_rng:
            idx = lax.axis_index(axis_name)
            keys = jax.vmap(lambda k: jax.random.fold_in(k, idx))(keys)
        return keys, ks[0]

    def ema_beta(batch: int, shown=None):
        """Per-step G-EMA decay from the GLOBAL batch (OptimConfig.
        ema_beta_for): with ema_kimg set the horizon is invariant to batch
        size and device count; psum of 1 over the mesh axis is static.

        With ema_rampup also set (StyleGAN2-ADA), the horizon warms up as
        min(ema_kimg*1000, shown_imgs*rampup) — beta becomes a TRACED
        function of the pre-step shown-image counter (one program for the
        whole run); otherwise beta stays a static constant and the
        compiled program is unchanged from the non-rampup build."""
        n_dev = lax.psum(1, axis_name) if axis_name else 1
        o = cfg.optim
        if o.ema_rampup is not None and shown is not None:
            nimg = jnp.minimum(jnp.float32(o.ema_kimg * 1000.0),
                               shown.astype(jnp.float32)
                               * jnp.float32(o.ema_rampup))
            return jnp.float32(0.5) ** (
                jnp.float32(batch * n_dev) / jnp.maximum(nimg, 1.0))
        return cfg.optim.ema_beta_for(batch * n_dev)

    def penalty_term(params_d, alpha, real, fake_sg, k_gp, real_s):
        penalty = jnp.float32(0.0)
        if with_penalty:
            critic = lambda x: d_apply(params_d, x, alpha)
            if lc.penalty == "wgan-gp":
                penalty = L.wgan_gp(critic, real, fake_sg, k_gp, pen_weight)
            elif lc.penalty == "r1":
                penalty = L.r1_penalty(critic, real, pen_weight)
        if lc.drift_weight:
            penalty = penalty + L.drift_penalty(real_s, lc.drift_weight)
        return penalty

    def assemble(state, *, params_g, params_d, ema, opt_g_state, opt_d_state,
                 w_avg, next_rng, batch, alpha, aux, g_loss,
                 pl_mean=None, pl_penalty=0.0, ada_p=None, ada_rt=0.0):
        n_dev = lax.psum(1, axis_name) if axis_name else 1
        new_state = state.replace(
            params_g=params_g, params_d=params_d, params_ema=ema,
            opt_g=opt_g_state, opt_d=opt_d_state, w_avg=w_avg,
            rng=next_rng, step=state.step + 1,
            shown_imgs=state.shown_imgs + jnp.float32(batch * n_dev),
            pl_mean=state.pl_mean if pl_mean is None else pl_mean,
            ada_p=state.ada_p if ada_p is None else ada_p)
        metrics = {
            "d_loss": pmean(aux["d_loss"]),
            "g_loss": pmean(g_loss),
            "penalty": pmean(aux["penalty"]),
            "real_score": pmean(aux["real_score"]),
            "fake_score": pmean(aux["fake_score"]),
            "alpha": alpha,
        }
        if pl_active:
            # Only PL configs carry the extra metric: non-PL programs keep
            # the exact verified output arity (see TrainState.pl_mean).
            metrics["pl_penalty"] = pmean(jnp.float32(pl_penalty))
        if ada_active:
            # Same arity discipline; both values are already replicated
            # (ada_p is updated from a pmean'd heuristic).
            metrics["aug_p"] = new_state.ada_p
            metrics["aug_rt"] = jnp.float32(ada_rt)
        return new_state, metrics

    def update_w_avg(w_avg, w_mean):
        if is_style and w_mean is not None:
            beta = jnp.float32(cfg.model.w_avg_beta)
            return w_avg * beta + pmean(w_mean) * (1.0 - beta)
        return w_avg

    def step(state: TrainState, real_u8) -> tuple[TrainState, dict]:
        batch = real_u8.shape[0]
        alpha = alpha_of(state.shown_imgs)
        # With PL configured, derive one extra key in BOTH lazy variants
        # (streams stay aligned across on/off programs). Without PL the
        # key layout — and hence the whole program — is unchanged from
        # the non-PL build: the 1024^2 R1 program sits within ~300 MB of
        # HBM capacity and even no-op graph additions can flip XLA's
        # memory plan over the edge (measured: +270 MB from carrying an
        # unused 7th key).
        n_base = 7 if pl_active else 6
        keys, next_rng = derive_keys(state,
                                     n_base + (3 if aug_active else 0))
        k_flip, k_zd, k_nd, k_gp, k_zg, k_ng = keys[:6]
        if lc.fused_seq:
            # Shared-batch sequential step: G scores the SAME fake batch
            # the D step just saw (under the post-update D). The G
            # objective's forward becomes HLO-identical to the D phase's
            # fake computation, so XLA CSEs it — one G forward per step
            # instead of two. Key arity is unchanged (k_zg/k_ng become
            # dead and are DCE'd), so this is its own compiled program
            # only because the G-phase graph changes, not the key layout.
            k_zg, k_ng = k_zd, k_nd
        k_pl = keys[6] if pl_active else None
        real = _preprocess(real_u8, cfg.data.hflip, k_flip, dtype)
        p_aug = aug_p_of(state)

        # ------------------------------------------------------------------
        # D step
        # ------------------------------------------------------------------
        fake_d, _ = gen_forward(state.params_g, k_zd, k_nd, alpha, batch)
        fake_d = lax.stop_gradient(fake_d)
        if aug_active:
            # D only ever sees augmented images (ADA): reals and fakes,
            # in the loss AND the penalty.
            real = maybe_aug(real, keys[n_base], p_aug)
            fake_d = maybe_aug(fake_d, keys[n_base + 1], p_aug)

        def d_objective(params_d):
            real_s = d_apply(params_d, real, alpha)
            fake_s = d_apply(params_d, fake_d, alpha)
            loss = d_loss_fn_base(real_s, fake_s)
            if reg_separate:
                # Official ADA Dmain phase: adversarial loss (+ drift)
                # only; the penalty gets its own optimizer step below.
                penalty = (L.drift_penalty(real_s, lc.drift_weight)
                           if lc.drift_weight else jnp.float32(0.0))
            else:
                penalty = penalty_term(params_d, alpha, real, fake_d,
                                       k_gp, real_s)
            aux = {"d_loss": loss, "penalty": penalty,
                   "real_score": jnp.mean(real_s),
                   "fake_score": jnp.mean(fake_s)}
            if ada_active:
                aux["rt"] = jnp.mean(jnp.sign(real_s))
            return loss + penalty, aux

        (_, d_aux), d_grads = jax.value_and_grad(
            d_objective, has_aux=True)(state.params_d)
        d_grads = pmean(d_grads)
        d_updates, new_opt_d = opt_d.update(d_grads, state.opt_d,
                                            state.params_d)
        new_params_d = optax.apply_updates(state.params_d, d_updates)

        if reg_separate and with_penalty:
            # Official ADA Dreg phase: a SEPARATE penalty-only gradient
            # step, evaluated at the post-main weights, through the same
            # optimizer chain (Adam count advances twice on tick steps,
            # exactly like the official two-phase loop). Keeps the
            # k-scaled penalty impulse out of the main step's direction
            # and moment estimates.
            def d_reg_objective(params_d):
                critic = lambda x: d_apply(params_d, x, alpha)  # noqa: E731
                if lc.penalty == "wgan-gp":
                    return L.wgan_gp(critic, real, fake_d, k_gp,
                                     pen_weight)
                return L.r1_penalty(critic, real, pen_weight)

            pen_val, reg_grads = jax.value_and_grad(d_reg_objective)(
                new_params_d)
            reg_grads = pmean(reg_grads)
            reg_updates, new_opt_d = opt_d.update(reg_grads, new_opt_d,
                                                  new_params_d)
            new_params_d = optax.apply_updates(new_params_d, reg_updates)
            d_aux = {**d_aux, "penalty": pen_val}
        if ada_active:
            ada_rt = pmean(d_aux.pop("rt"))
            new_ada_p = ada_update(state, ada_rt, batch)
        else:
            ada_rt, new_ada_p = 0.0, None

        # ------------------------------------------------------------------
        # G step (against the updated D, like the reference). With
        # loss.d_steps_per_g = n > 1 (n-critic training, e.g. classic
        # WGAN-GP recipes) the G/EMA/w-avg update runs on every n-th step
        # only, via lax.cond — both branches compile once, one executes.
        # ------------------------------------------------------------------
        def g_objective(params_g):
            fake, w_mean = gen_forward(params_g, k_zg, k_ng, alpha, batch)
            if aug_active:
                # Gradients flow through the augmentation into G.
                fake = maybe_aug(fake, keys[n_base + 2], p_aug)
            fake_s = d_apply(new_params_d, fake, alpha)
            g_loss = g_loss_fn_base(fake_s)
            if not with_pl:
                # Keep the non-PL objective byte-identical to the old
                # build (see the key-derivation comment above).
                return g_loss, (w_mean, state.pl_mean, jnp.float32(0.0),
                                g_loss)
            pl_pen, new_pl = pl_term(params_g, state.pl_mean, k_pl,
                                     alpha, batch)
            return g_loss + pl_pen, (w_mean, new_pl, pl_pen, g_loss)

        def run_g_update(operand):
            params_g, opt_g_state, ema, w_avg, pl_mean = operand
            ((_, (w_mean, new_pl, pl_pen, g_loss)), g_grads) = \
                jax.value_and_grad(g_objective, has_aux=True)(params_g)
            g_grads = pmean(g_grads)
            g_updates, new_opt_g = opt_g.update(g_grads, opt_g_state,
                                                params_g)
            new_params_g = optax.apply_updates(params_g, g_updates)
            new_ema = _ema_update(ema, new_params_g,
                                  ema_beta(batch, state.shown_imgs))
            new_w_avg = update_w_avg(w_avg, w_mean)
            return (new_params_g, new_opt_g, new_ema, new_w_avg, new_pl,
                    g_loss, pl_pen)

        operand = (state.params_g, state.opt_g, state.params_ema,
                   state.w_avg, state.pl_mean)
        n_critic = max(1, lc.d_steps_per_g)
        if n_critic == 1:
            (new_params_g, new_opt_g, new_ema, new_w_avg, new_pl,
             g_loss, pl_pen) = run_g_update(operand)
        else:
            do_g = (state.step % n_critic) == (n_critic - 1)
            (new_params_g, new_opt_g, new_ema, new_w_avg, new_pl,
             g_loss, pl_pen) = lax.cond(
                do_g,
                run_g_update,
                lambda op: (*op, jnp.float32(0.0), jnp.float32(0.0)),
                operand)

        return assemble(state, params_g=new_params_g, params_d=new_params_d,
                        ema=new_ema, opt_g_state=new_opt_g,
                        opt_d_state=new_opt_d, w_avg=new_w_avg,
                        next_rng=next_rng, batch=batch, alpha=alpha,
                        aux=d_aux, g_loss=g_loss, pl_mean=new_pl,
                        pl_penalty=pl_pen, ada_p=new_ada_p, ada_rt=ada_rt)

    def step_fused(state: TrainState, real_u8) -> tuple[TrainState, dict]:
        """Fused simultaneous update (loss.fused_g_step): ONE backward pass
        yields both gradients. The fake batch's G forward is shared between
        the D and G losses, and its two D forwards (one stop-gradding the
        images for the D loss, one stop-gradding the D params for the G
        loss) are identical computations that XLA CSEs into one. G sees the
        PRE-update D — the official TF StyleGAN/ProGAN simultaneous-update
        semantics, vs the reference's sequential D-then-G."""
        batch = real_u8.shape[0]
        alpha = alpha_of(state.shown_imgs)
        # Key layout unchanged when PL is off — see step()'s comment.
        n_base = 5 if pl_active else 4
        keys, next_rng = derive_keys(state,
                                     n_base + (2 if aug_active else 0))
        k_flip, k_z, k_n, k_gp = keys[:4]
        k_pl = keys[4] if pl_active else None
        real_in = _preprocess(real_u8, cfg.data.hflip, k_flip, dtype)
        p_aug = aug_p_of(state)

        def objective(params):
            params_d, params_g = params
            fake, w_mean = gen_forward(params_g, k_z, k_n, alpha, batch)
            if aug_active:
                # ONE augmentation draw per batch, shared between the D
                # and G losses (stop-gradient placement differs, primal
                # values are identical, so XLA still CSEs the D forward).
                real = maybe_aug(real_in, keys[n_base], p_aug)
                fake = maybe_aug(fake, keys[n_base + 1], p_aug)
            else:
                real = real_in
            fake_sg = lax.stop_gradient(fake)
            real_s = d_apply(params_d, real, alpha)
            fake_s = d_apply(params_d, fake_sg, alpha)
            d_loss = d_loss_fn_base(real_s, fake_s)
            penalty = penalty_term(params_d, alpha, real, fake_sg, k_gp,
                                   real_s)
            params_d_sg = jax.tree.map(lax.stop_gradient, params_d)
            g_scores = d_apply(params_d_sg, fake, alpha)
            g_loss = g_loss_fn_base(g_scores)
            if with_pl:
                pl_pen, new_pl = pl_term(params_g, state.pl_mean, k_pl,
                                         alpha, batch)
            else:
                pl_pen, new_pl = jnp.float32(0.0), state.pl_mean
            aux = {"d_loss": d_loss, "g_loss": g_loss, "penalty": penalty,
                   "real_score": jnp.mean(real_s),
                   "fake_score": jnp.mean(fake_s), "w_mean": w_mean,
                   "pl_pen": pl_pen, "pl_mean": new_pl}
            if ada_active:
                aux["rt"] = jnp.mean(jnp.sign(real_s))
            return d_loss + penalty + g_loss + pl_pen, aux

        (_, aux), (d_grads, g_grads) = jax.value_and_grad(
            objective, has_aux=True)((state.params_d, state.params_g))
        if ada_active:
            ada_rt = pmean(aux.pop("rt"))
            new_ada_p = ada_update(state, ada_rt, batch)
        else:
            ada_rt, new_ada_p = 0.0, None
        d_grads = pmean(d_grads)
        g_grads = pmean(g_grads)
        d_updates, new_opt_d = opt_d.update(d_grads, state.opt_d,
                                            state.params_d)
        new_params_d = optax.apply_updates(state.params_d, d_updates)
        g_updates, new_opt_g = opt_g.update(g_grads, state.opt_g,
                                            state.params_g)
        new_params_g = optax.apply_updates(state.params_g, g_updates)
        new_ema = _ema_update(state.params_ema, new_params_g,
                              ema_beta(batch, state.shown_imgs))
        new_w_avg = update_w_avg(state.w_avg, aux["w_mean"])

        return assemble(state, params_g=new_params_g, params_d=new_params_d,
                        ema=new_ema, opt_g_state=new_opt_g,
                        opt_d_state=new_opt_d, w_avg=new_w_avg,
                        next_rng=next_rng, batch=batch, alpha=alpha,
                        aux=aux, g_loss=aux["g_loss"],
                        pl_mean=aux["pl_mean"], pl_penalty=aux["pl_pen"],
                        ada_p=new_ada_p, ada_rt=ada_rt)

    def step_accum(state: TrainState, real_u8) -> tuple[TrainState, dict]:
        """Gradient accumulation (optim.grad_accum = A > 1): one optimizer
        step over A sequential microbatches.

        Semantics are EXACTLY sequential data parallelism: each microbatch
        is the per-device batch (minibatch-stddev, latents, penalties all
        per-microbatch), gradients/metrics/w̄ are averaged over the A
        microbatches like DP's pmean over devices, and the RNG folds the
        microbatch index into the sampling keys precisely where DP folds
        ``axis_index`` — so accumulation over A microbatches reproduces a
        DP run over A devices (tested to tolerance in
        tests/test_grad_accum.py). Under DP the two compose: the global
        batch per step is micro x A x n_devices.

        The A backward passes run as a ``lax.scan`` whose carry is the
        gradient sum — one microbatch's activations are live at a time,
        which is the point: A x the effective batch at ~1x the activation
        memory. The only PL deviation from the DP analog is documented in
        pl_term (a chained running mean with per-step-equivalent decay).
        """
        total = real_u8.shape[0]
        micro = total // accum
        stack = real_u8.reshape((accum, micro) + real_u8.shape[1:])
        batch = micro * accum  # per-device images consumed this step
        alpha = alpha_of(state.shown_imgs)
        n_base = 7 if pl_active else 6
        keys, next_rng = derive_keys(state,
                                     n_base + (3 if aug_active else 0))
        p_aug = aug_p_of(state)

        def micro_keys(j):
            # The microbatch fold mirrors derive_keys' device fold (and
            # composes with it under DP: fold_in(fold_in(k, dev), j)).
            return jax.vmap(lambda k: jax.random.fold_in(k, j))(keys)

        # -------------------------------------------------------------- D
        def d_micro(params_d, real_u8_j, ks):
            real = _preprocess(real_u8_j, cfg.data.hflip, ks[0], dtype)
            fake_d, _ = gen_forward(state.params_g, ks[1], ks[2], alpha,
                                    micro)
            fake_d = lax.stop_gradient(fake_d)
            if aug_active:
                real = maybe_aug(real, ks[n_base], p_aug)
                fake_d = maybe_aug(fake_d, ks[n_base + 1], p_aug)

            def d_objective(params_d):
                real_s = d_apply(params_d, real, alpha)
                fake_s = d_apply(params_d, fake_d, alpha)
                loss = d_loss_fn_base(real_s, fake_s)
                penalty = penalty_term(params_d, alpha, real, fake_d,
                                       ks[3], real_s)
                aux = {"d_loss": loss, "penalty": penalty,
                       "real_score": jnp.mean(real_s),
                       "fake_score": jnp.mean(fake_s)}
                if ada_active:
                    aux["rt"] = jnp.mean(jnp.sign(real_s))
                return loss + penalty, aux

            return jax.value_and_grad(d_objective, has_aux=True)(params_d)

        def d_body(gsum, inp):
            real_j, j = inp
            (_, aux), g = d_micro(state.params_d, real_j, micro_keys(j))
            return jax.tree.map(jnp.add, gsum, g), aux

        d_gsum, d_auxs = lax.scan(
            d_body, jax.tree.map(jnp.zeros_like, state.params_d),
            (stack, jnp.arange(accum)))
        d_grads = pmean(jax.tree.map(lambda g: g / accum, d_gsum))
        d_aux = jax.tree.map(lambda a: jnp.mean(a, axis=0), d_auxs)
        d_updates, new_opt_d = opt_d.update(d_grads, state.opt_d,
                                            state.params_d)
        new_params_d = optax.apply_updates(state.params_d, d_updates)
        if ada_active:
            ada_rt = pmean(d_aux.pop("rt"))
            new_ada_p = ada_update(state, ada_rt, batch)
        else:
            ada_rt, new_ada_p = 0.0, None

        # -------------------------------------------------------------- G
        # Per-step-equivalent chained PL decay: (1-d_eff)^A = 1-d.
        pl_micro_decay = 1.0 - (1.0 - lc.pl_decay) ** (1.0 / accum)

        def g_micro(params_g, pl_mean, ks):
            k_zg, k_ng = (ks[1], ks[2]) if lc.fused_seq else (ks[4], ks[5])
            k_pl = ks[6] if pl_active else None

            def g_objective(params_g):
                fake, w_mean = gen_forward(params_g, k_zg, k_ng, alpha,
                                           micro)
                if aug_active:
                    fake = maybe_aug(fake, ks[n_base + 2], p_aug)
                fake_s = d_apply(new_params_d, fake, alpha)
                g_loss = g_loss_fn_base(fake_s)
                if not with_pl:
                    return g_loss, (w_mean, pl_mean, jnp.float32(0.0),
                                    g_loss)
                pl_pen, new_pl = pl_term(params_g, pl_mean, k_pl, alpha,
                                         micro, decay=pl_micro_decay)
                return g_loss + pl_pen, (w_mean, new_pl, pl_pen, g_loss)

            return jax.value_and_grad(g_objective, has_aux=True)(params_g)

        def run_g_update(operand):
            params_g, opt_g_state, ema, w_avg, pl_mean = operand

            def g_body(carry, j):
                gsum, pl_m = carry
                ((_, (w_mean, new_pl, pl_pen, g_loss)), g) = g_micro(
                    params_g, pl_m, micro_keys(j))
                return ((jax.tree.map(jnp.add, gsum, g), new_pl),
                        (w_mean, pl_pen, g_loss))

            (g_gsum, new_pl), (w_means, pl_pens, g_losses) = lax.scan(
                g_body, (jax.tree.map(jnp.zeros_like, params_g), pl_mean),
                jnp.arange(accum))
            g_grads = pmean(jax.tree.map(lambda g: g / accum, g_gsum))
            g_updates, new_opt_g = opt_g.update(g_grads, opt_g_state,
                                                params_g)
            new_params_g = optax.apply_updates(params_g, g_updates)
            new_ema = _ema_update(ema, new_params_g,
                                  ema_beta(batch, state.shown_imgs))
            w_mean = (jnp.mean(w_means, axis=0) if w_means is not None
                      else None)
            new_w_avg = update_w_avg(w_avg, w_mean)
            return (new_params_g, new_opt_g, new_ema, new_w_avg, new_pl,
                    jnp.mean(g_losses), jnp.mean(pl_pens))

        operand = (state.params_g, state.opt_g, state.params_ema,
                   state.w_avg, state.pl_mean)
        n_critic = max(1, lc.d_steps_per_g)
        if n_critic == 1:
            (new_params_g, new_opt_g, new_ema, new_w_avg, new_pl,
             g_loss, pl_pen) = run_g_update(operand)
        else:
            do_g = (state.step % n_critic) == (n_critic - 1)
            (new_params_g, new_opt_g, new_ema, new_w_avg, new_pl,
             g_loss, pl_pen) = lax.cond(
                do_g,
                run_g_update,
                lambda op: (*op, jnp.float32(0.0), jnp.float32(0.0)),
                operand)

        return assemble(state, params_g=new_params_g, params_d=new_params_d,
                        ema=new_ema, opt_g_state=new_opt_g,
                        opt_d_state=new_opt_d, w_avg=new_w_avg,
                        next_rng=next_rng, batch=batch, alpha=alpha,
                        aux=d_aux, g_loss=g_loss, pl_mean=new_pl,
                        pl_penalty=pl_pen, ada_p=new_ada_p, ada_rt=ada_rt)

    if lc.fused_g_step:
        assert not lc.fused_seq, \
            "fused_g_step and fused_seq are mutually exclusive"
        assert lc.d_steps_per_g == 1, \
            "fused_g_step requires d_steps_per_g == 1"
        if accum > 1:
            raise ValueError(
                "optim.grad_accum > 1 requires a sequential recipe "
                "(loss.fused_g_step=False; fused_seq is supported)")
        return step_fused
    if accum > 1:
        return step_accum
    return step


def build_sample_fn(cfg: Config, res_log2: int,
                    use_ema: bool = True) -> Callable:
    """Jittable sampling: (params, w_avg, z, noise-key, psi, alpha) -> images.

    Uses the G-EMA weights (the reference samples from G-EMA, SURVEY.md 3.4);
    StyleGAN applies the truncation trick in W space with traced psi.
    Returned images are float32 in [-1, 1].
    """
    g_model, _ = build_models(cfg.model)
    is_style = hasattr(g_model, "map_latents")  # stylegan & stylegan2
    dtype = _dtype_of(cfg)
    cutoff = cfg.model.truncation_cutoff

    def sample(params, w_avg, z, noise_key, psi=1.0, alpha=1.0):
        z = z.astype(dtype)
        if is_style:
            w = g_model.apply(params, z, method="map_latents")
            nl = num_style_layers(res_log2)
            ws = jnp.repeat(w[:, None, :], nl, axis=1)
            ws = truncate_ws(ws, w_avg.astype(ws.dtype), psi, cutoff)
            img = g_model.apply(params, ws, res_log2, alpha,
                                method="synthesize",
                                rngs={"noise": noise_key})
        else:
            img = g_model.apply(params, z, res_log2, alpha)
        return jnp.clip(img.astype(jnp.float32), -1.0, 1.0)

    return sample


def make_chunked_stepper(cfg: Config, phase: PhaseSpec,
                         wrap: Callable[[Callable], Callable],
                         wrap_chunk: Callable[[Callable], Callable],
                         axis_name: str | None = None,
                         initial_step: int = 0,
                         fold_device_rng: bool = True):
    """Scan-chunked lazy-regularization stepper: 2 dispatches per k steps.

    On the tunneled TPU platform every host->device dispatch costs ~1 ms+
    and the step loop measures ~11 ms/step of host gap (BASELINE.md
    round-2 profile: 79 ms device vs 90 ms wall). With lazy regularization
    (``loss.penalty_every`` = k > 1) the step sequence is periodic
    [on, off x (k-1)], so the off-run is compiled ONCE as a
    ``lax.scan`` over a stacked uint8 batch: per k steps the host
    dispatches one penalty-on step and one scanned program instead of k.
    With lazy PL also active (pl_every | k required) the cycle interleaves
    PL singles between (pl_every-1)-step scans — 2*k/pl_every dispatches
    per k steps (e.g. 8 per 16 for the stylegan2 preset) instead of k.
    Per-step math is IDENTICAL to the single-step path — the scan body is
    the same step function, the RNG chain threads through state — tested
    equal in tests/test_chunked.py.

    Returns ``(stepper, chunk)``: ``stepper(state, stack)`` takes a
    (<=chunk, B, H, W, C) uint8 stack and returns ``(state, metrics)``
    with each metric stacked (n_consumed,) in step order — the CALLER
    derives the consumed step count from the metric length. A misaligned
    cycle position (resume or a phase starting mid-cycle) consumes only
    the single steps needed to REALIGN (discarding the stack's tail), so
    the scan fast path always resumes on the next call; partial tails run
    as single steps.
    """
    lc = cfg.loss
    k = lc.penalty_every
    has_penalty = lc.penalty in ("wgan-gp", "r1")
    assert has_penalty and k > 1, "chunking requires lazy regularization"
    combo_at, _ = _lazy_combos(cfg)
    get = _program_cache(cfg, phase, wrap, axis_name, fold_device_rng)

    pl_active = cfg.pl_active
    if pl_active and lc.pl_every > 1:
        # Lazy PL inside the chunk: scan segments of plain steps between
        # the PL singles. Cadences must nest for a periodic pattern.
        assert k % lc.pl_every == 0, \
            "chunking with lazy PL requires pl_every | penalty_every"
        seg = lc.pl_every - 1
    else:
        seg = k - 1

    # The scanned segment runs the "neither fires" program — except with
    # every-step PL (pl_every <= 1), where PL is in every program (None).
    # Index 1 is always a segment step (k > 1, and pe > 1 when lazy PL).
    seg_combo = combo_at(1)
    plain_fn = build_train_step(cfg, phase, axis_name=axis_name,
                                fold_device_rng=fold_device_rng,
                                penalty_override=seg_combo[0],
                                pl_override=seg_combo[1])

    def scan_plain(state, stack):
        return lax.scan(plain_fn, state, stack)

    chunk_plain = wrap_chunk(scan_plain) if seg > 0 else None
    counter = {"i": int(initial_step)}

    def _expand(m):
        return jax.tree.map(lambda a: a[None], m)

    def stepper(state, stack):
        n = stack.shape[0]
        pos = counter["i"] % k
        if pos == 0 and n == k:
            parts = []
            idx = 0
            segments = k // (seg + 1)
            for s in range(segments):
                state, m = (get(*combo_at(counter["i"] + idx))
                            )(state, stack[idx])
                parts.append(_expand(m))
                idx += 1
                if seg:
                    state, mseg = chunk_plain(state, stack[idx:idx + seg])
                    parts.append(mseg)
                    idx += seg
            assert idx == k, (idx, k)
            counter["i"] += k
            metrics = jax.tree.map(
                lambda *xs: jnp.concatenate(xs), *parts)
            return state, metrics
        # Misaligned: consume ONLY the singles needed to realign (the
        # unused stack tail is discarded — shuffled-stream data, and this
        # happens at most once per phase/resume); partial tails (n < k)
        # run fully as singles.
        n = min(n, k - pos) if pos else n
        ms = []
        for i in range(n):
            state, m = (get(*combo_at(counter["i"])))(state, stack[i])
            counter["i"] += 1
            ms.append(m)
        metrics = jax.tree.map(lambda *xs: jnp.stack(xs), *ms)
        return state, metrics

    return stepper, k


def _lazy_combos(cfg: Config):
    """(d_override, pl_override) per step index for the lazy dispatch.

    Returns ``combo_at(i)`` mapping the optimizer-step counter to the
    ``build_train_step`` override pair: None = as-configured every step
    (plain weight), True = fire with interval-scaled weight, False = the
    non-fire program.
    """
    lc = cfg.loss
    has_pen = lc.penalty in ("wgan-gp", "r1")
    k = lc.penalty_every
    pl_active = cfg.pl_active
    pe = lc.pl_every

    def combo_at(i: int):
        if not has_pen:
            dpen = False
        elif k <= 1:
            dpen = None
        else:
            dpen = (i % k) == 0
        if not pl_active:
            pl = False
        elif pe <= 1:
            pl = None
        else:
            pl = (i % pe) == 0
        return dpen, pl

    lazy = (has_pen and k > 1) or (pl_active and pe > 1)
    return combo_at, lazy


def _program_cache(cfg: Config, phase: PhaseSpec, wrap, axis_name,
                   fold_device_rng: bool = True):
    cache: dict = {}

    def get(dpen, pl):
        if (dpen, pl) not in cache:
            cache[(dpen, pl)] = wrap(build_train_step(
                cfg, phase, axis_name=axis_name,
                fold_device_rng=fold_device_rng,
                penalty_override=dpen, pl_override=pl))
        return cache[(dpen, pl)]

    return get


def make_lazy_stepper(cfg: Config, phase: PhaseSpec,
                      wrap: Callable[[Callable], Callable],
                      axis_name: str | None = None,
                      initial_step: int = 0) -> Callable:
    """Host-side lazy-regularization dispatcher.

    ``wrap`` is the compile wrapper (make_single_step / make_parallel_step
    partial). Each lazy regularizer (the D penalty at ``penalty_every``,
    path-length at ``pl_every``) fires with interval-scaled weight on its
    cadence; only the program variants that actually occur are compiled
    (e.g. k=16, pl_every=4 -> 3 programs), dispatched host-side from the
    optimizer-step counter, which the caller seeds with the restored
    ``initial_step`` on resume. No laziness -> one program.

    Returns a callable (state, batch) -> (state, metrics).
    """
    combo_at, lazy = _lazy_combos(cfg)
    get = _program_cache(cfg, phase, wrap, axis_name)
    if not lazy:
        return get(*combo_at(0))

    counter = {"i": int(initial_step)}

    def stepper(state, batch):
        fn = get(*combo_at(counter["i"]))
        counter["i"] += 1
        return fn(state, batch)

    return stepper
