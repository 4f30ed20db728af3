"""GAN losses and gradient penalties.

Replaces the reference's loss dispatch + ``calc_gradient_penalty`` in
``gan_lab/utils/backprop_utils.py`` (SURVEY.md 2.2). Loss names mirror the
reference config surface: 'wgan', 'wgan-gp', 'nonsaturating', 'minimax'
(SURVEY.md 2.2, config system row).

TPU notes:
* the WGAN-GP / R1 double-backward is expressed as ``jax.grad`` of a scalar
  function of the *input images*; under ``jit`` XLA compiles the
  forward-over-reverse program directly, and under ``shard_map`` all ops are
  local to the shard so the penalty is per-device (matching per-GPU
  semantics) with only the final gradient ``psum`` crossing ICI.
* like torch's ``autograd.grad(D(x).sum(), x)``, the gradient of the summed
  critic output w.r.t. the batch keeps the cross-example coupling introduced
  by minibatch-stddev — identical semantics to the reference.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Critic = Callable[[jax.Array], jax.Array]  # images (N,H,W,C) -> scores (N,)


def _softplus(x):
    return jax.nn.softplus(x)


# ----------------------------------------------------------------------------
# Discriminator / generator losses, keyed the way the reference config is.
# Each d_loss takes (real_scores, fake_scores); each g_loss takes fake_scores.
# ----------------------------------------------------------------------------

def d_loss_wgan(real_scores: jax.Array, fake_scores: jax.Array) -> jax.Array:
    """Wasserstein critic loss: E[D(fake)] - E[D(real)]."""
    return jnp.mean(fake_scores) - jnp.mean(real_scores)


def g_loss_wgan(fake_scores: jax.Array) -> jax.Array:
    return -jnp.mean(fake_scores)


def d_loss_nonsaturating(real_scores, fake_scores):
    """-log sigmoid(D(real)) - log(1 - sigmoid(D(fake))), softplus form."""
    return jnp.mean(_softplus(-real_scores)) + jnp.mean(_softplus(fake_scores))


def g_loss_nonsaturating(fake_scores):
    """-log sigmoid(D(fake)) (the 'non-saturating' generator loss)."""
    return jnp.mean(_softplus(-fake_scores))


def d_loss_minimax(real_scores, fake_scores):
    """Original GAN discriminator loss (same as nonsaturating for D)."""
    return jnp.mean(_softplus(-real_scores)) + jnp.mean(_softplus(fake_scores))


def g_loss_minimax(fake_scores):
    """Minimax generator loss: +log(1 - sigmoid(D(fake)))."""
    return -jnp.mean(_softplus(fake_scores))


D_LOSSES = {
    "wgan": d_loss_wgan,
    "wgan-gp": d_loss_wgan,  # penalty added separately
    "nonsaturating": d_loss_nonsaturating,
    "minimax": d_loss_minimax,
}

G_LOSSES = {
    "wgan": g_loss_wgan,
    "wgan-gp": g_loss_wgan,
    "nonsaturating": g_loss_nonsaturating,
    "minimax": g_loss_minimax,
}


# ----------------------------------------------------------------------------
# Gradient penalties
# ----------------------------------------------------------------------------

def wgan_gp(critic: Critic, real: jax.Array, fake: jax.Array,
            key: jax.Array, lambda_gp: float = 10.0) -> jax.Array:
    """WGAN-GP (Gulrajani et al.): lambda * E[(||grad D(x_hat)|| - 1)^2].

    x_hat = eps*real + (1-eps)*fake with per-example eps ~ U[0,1], exactly
    the reference's interpolation scheme (SURVEY.md 3.2).
    """
    n = real.shape[0]
    eps = jax.random.uniform(key, (n, 1, 1, 1), dtype=real.dtype)
    x_hat = eps * real + (1.0 - eps) * fake

    grads = jax.grad(lambda x: jnp.sum(critic(x)))(x_hat)
    g2 = jnp.sum(jnp.square(grads.astype(jnp.float32)), axis=(1, 2, 3))
    norms = jnp.sqrt(g2 + 1e-12)
    return lambda_gp * jnp.mean(jnp.square(norms - 1.0))


def r1_penalty(critic: Critic, real: jax.Array,
               gamma: float = 10.0) -> jax.Array:
    """R1 (Mescheder et al.): gamma/2 * E[||grad D(real)||^2]."""
    grads = jax.grad(lambda x: jnp.sum(critic(x)))(real)
    g2 = jnp.sum(jnp.square(grads.astype(jnp.float32)), axis=(1, 2, 3))
    return (gamma * 0.5) * jnp.mean(g2)


def drift_penalty(real_scores: jax.Array, eps_drift: float = 1e-3) -> jax.Array:
    """ProGAN's drift term eps * E[D(real)^2] keeping scores near zero."""
    return eps_drift * jnp.mean(jnp.square(real_scores))
