"""Latent sampling and interpolation helpers
(reference: gan_lab/utils/latent_utils.py, SURVEY.md 2.2)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gen_latents(key: jax.Array, batch: int, dim: int,
                dtype=jnp.float32) -> jax.Array:
    """z ~ N(0, I), the reference's gen_rand_latent_vars."""
    return jax.random.normal(key, (batch, dim), dtype)


def lerp(a: jax.Array, b: jax.Array, t) -> jax.Array:
    """Linear interpolation — appropriate in W space (StyleGAN)."""
    t = jnp.asarray(t, a.dtype)
    return a + t * (b - a)


def slerp(a: jax.Array, b: jax.Array, t, eps: float = 1e-7) -> jax.Array:
    """Spherical interpolation — appropriate in Z space, where latents live
    near the radius-sqrt(dim) sphere of the Gaussian prior."""
    t = jnp.asarray(t, a.dtype)
    an = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + eps)
    bn = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + eps)
    dot = jnp.clip(jnp.sum(an * bn, axis=-1, keepdims=True), -1.0, 1.0)
    omega = jnp.arccos(dot)
    so = jnp.sin(omega)
    # Fall back to lerp when nearly parallel.
    safe = so > eps
    w_a = jnp.where(safe, jnp.sin((1.0 - t) * omega) / (so + eps), 1.0 - t)
    w_b = jnp.where(safe, jnp.sin(t * omega) / (so + eps), t)
    return w_a * a + w_b * b


def interpolation_path(key: jax.Array, num_anchors: int, steps_per: int,
                       dim: int, *, spherical: bool = True) -> jax.Array:
    """A closed latent walk: ``num_anchors`` random z's joined by
    ``steps_per`` interpolated frames each -> (num_anchors*steps_per, dim)."""
    anchors = gen_latents(key, num_anchors, dim)
    nxt = jnp.roll(anchors, -1, axis=0)
    ts = jnp.linspace(0.0, 1.0, steps_per, endpoint=False)
    interp = slerp if spherical else lerp
    frames = jax.vmap(
        lambda t: interp(anchors, nxt, t))(ts)     # (steps, anchors, dim)
    return frames.transpose(1, 0, 2).reshape(-1, dim)
