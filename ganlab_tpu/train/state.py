"""The single training-state pytree (SURVEY.md 5, checkpoint/resume row).

Everything the reference's Learner holds mutably — G, D, G-EMA, optimizer
states, schedule position, W-average, RNG — lives in one immutable
``TrainState`` so that (a) a train step is a pure ``state -> state`` function
under jit, (b) orbax checkpoints/restores the whole thing atomically, and
(c) under data parallelism the state is replicated and provably stays
replica-identical (tested on 8 fake devices).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ganlab_tpu.config import Config
from ganlab_tpu.models import build_models


class TrainState(struct.PyTreeNode):
    params_g: Any
    params_d: Any
    params_ema: Any
    opt_g: Any
    opt_d: Any
    w_avg: jax.Array            # (latent_dim,) running W mean (StyleGAN)
    rng: jax.Array              # PRNG key, replicated across devices
    step: jax.Array             # int32 optimizer-step counter
    shown_imgs: jax.Array       # float32 global shown-image counter
    # Path-length regularization running mean (StyleGAN2 extension;
    # loss.pl_weight). Scalar f32 when PL is configured, else None — None
    # is an EMPTY pytree leaf, so non-PL programs keep the exact verified
    # input/output arity. (Measured: threading even one unused scalar
    # through the 1024^2 R1 program flips XLA's buffer assignment and
    # overflows HBM by 270 MB — BASELINE.md.)
    pl_mean: Any = None
    # ADA augmentation strength p (aug.mode='ada'; ops/augment.py). Same
    # arity discipline as pl_mean: scalar f32 only when ADA is configured,
    # else None (empty leaf) so every non-ADA program keeps its verified
    # input/output arity byte-for-byte. Updated IN-GRAPH each D step from
    # the pmean'd overfitting heuristic, so it stays replica-identical
    # under DP and rides through the chunked scan as ordinary carry.
    ada_p: Any = None


def make_optimizers(cfg: Config, resolution: int | None = None
                    ) -> tuple[optax.GradientTransformation,
                               optax.GradientTransformation]:
    """Adam pair; ``resolution`` applies the per-phase lr multiplier
    (optim.lr_mult_by_res). Adam state is lr-independent (and the
    mb_ratio below only rescales lr/betas), so per-phase optimizers
    share one checkpointed state.

    Lazy-regularization compensation (official StyleGAN2
    ``training_loop.py``: when a regularizer runs every k-th step, that
    network's Adam uses ``mb_ratio = k / (k+1)``: lr*mb_ratio and
    beta**mb_ratio — the per-image effective step statistics then match
    the every-step recipe). Measured r3 (BASELINE.md recipe A/B): the
    k=16 fast recipe DIVERGES on the ellipses benchmark without this
    and is what the official recipe prescribes with it. D gets the
    ratio from ``loss.penalty_every``, G from ``loss.pl_every`` when
    path-length regularization is lazy. ``optim.lazy_adjust=False``
    restores the raw hyperparameters for A/Bs of the adjustment itself.
    """
    o, lc = cfg.optim, cfg.loss

    def ratio(active: bool, k: int) -> float:
        return k / (k + 1.0) if (o.lazy_adjust and active and k > 1) else 1.0

    mb_d = ratio(lc.penalty in ("wgan-gp", "r1"), lc.penalty_every)
    mb_g = ratio(cfg.pl_active, lc.pl_every)
    mult = o.lr_mult_by_res.get(resolution, 1.0) if resolution else 1.0
    opt_g = optax.adam(o.lr_g * mult * mb_g, b1=o.beta1 ** mb_g,
                       b2=o.beta2 ** mb_g, eps=o.eps)
    opt_d = optax.adam(o.lr_d * mult * mb_d, b1=o.beta1 ** mb_d,
                       b2=o.beta2 ** mb_d, eps=o.eps)
    return opt_g, opt_d


def create_train_state(cfg: Config, rng: jax.Array) -> TrainState:
    """Initialize the FULL pytree (all progressive resolutions) up front."""
    g_model, d_model = build_models(cfg.model)
    kg, kd, krest = jax.random.split(rng, 3)
    params_g = g_model.init_all(kg)
    params_d = d_model.init_all(kd)
    opt_g, opt_d = make_optimizers(cfg)
    pl_mean = jnp.zeros((), jnp.float32) if cfg.pl_active else None
    ada_p = (jnp.float32(cfg.aug.p_init) if cfg.ada_active else None)
    return TrainState(
        pl_mean=pl_mean,
        ada_p=ada_p,
        params_g=params_g,
        params_d=params_d,
        params_ema=jax.tree.map(jnp.copy, params_g),
        opt_g=opt_g.init(params_g),
        opt_d=opt_d.init(params_d),
        w_avg=jnp.zeros((cfg.model.latent_dim,), jnp.float32),
        rng=krest,
        step=jnp.zeros((), jnp.int32),
        shown_imgs=jnp.zeros((), jnp.float32),
    )
