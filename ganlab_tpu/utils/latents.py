"""Latent sampling (reference: gan_lab/utils/latent_utils.py, SURVEY.md 2.2)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gen_latents(key: jax.Array, batch: int, dim: int,
                dtype=jnp.float32) -> jax.Array:
    """z ~ N(0, I), the reference's gen_rand_latent_vars."""
    return jax.random.normal(key, (batch, dim), dtype)
