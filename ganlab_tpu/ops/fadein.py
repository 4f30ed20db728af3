"""Progressive-growing fade-in blend (ProGAN fig. 2; Karras et al. 2017).

During a resolution transition the network output is
``alpha * new_head + (1 - alpha) * old_head`` with alpha ramping 0 -> 1 as
images are shown. In the TPU design alpha is a *traced* scalar inside the
jitted train step, so the whole fade-in phase runs under a single compiled
program (SURVEY.md 3.3) — no recompile per alpha value.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fade_in(alpha: jax.Array | float, new: jax.Array, old: jax.Array) -> jax.Array:
    """lerp: old + alpha * (new - old); alpha may be a traced scalar."""
    a = jnp.asarray(alpha, new.dtype)
    return old + a * (new - old)
