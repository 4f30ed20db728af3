"""Minibatch standard deviation layer (ProGAN sec. 3; Karras et al. 2017).

Appends one constant feature map holding the average (over features and
pixels) of the per-feature batch standard deviation. Replaces the reference's
torch composite in ``gan_lab/utils/custom_layers.py`` (SURVEY.md 2.1).

Distributed semantics: under data parallelism this is computed over the
*per-device* batch shard (the natural result inside ``shard_map``), matching
the reference's per-GPU batch semantics — intentionally NOT a global
cross-device statistic (SURVEY.md 2.1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def minibatch_stddev(x: jax.Array, group_size: int | None = None,
                     eps: float = 1e-8) -> jax.Array:
    """x: (N, H, W, C) -> (N, H, W, C+1).

    group_size=None uses the whole (per-device) batch as one group, the
    original ProGAN formulation. A finite group size splits the batch into
    groups and computes the statistic per group (StyleGAN's variant).
    """
    if group_size is None:
        from ganlab_tpu.ops import pallas as plops

        if plops.use_pallas():
            return plops.minibatch_stddev_pallas(x, eps)
    n, h, w, c = x.shape
    g = n if group_size is None else min(group_size, n)
    if n % g != 0:
        # Fall back to a divisor so the reshape stays static-shaped.
        while n % g != 0:
            g -= 1
    # (G, N//G, H, W, C): group members along axis 0.
    y = x.reshape(g, n // g, h, w, c).astype(jnp.float32)
    mean = jnp.mean(y, axis=0, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=0)          # (N//G, H, W, C)
    std = jnp.sqrt(var + eps)
    avg = jnp.mean(std, axis=(1, 2, 3), keepdims=True)    # (N//G, 1, 1, 1)
    feat = jnp.tile(avg[None], (g, 1, h, w, 1))           # (G, N//G, H, W, 1)
    feat = feat.reshape(n, h, w, 1).astype(x.dtype)
    return jnp.concatenate([x, feat], axis=-1)
