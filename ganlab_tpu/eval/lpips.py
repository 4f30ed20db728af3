"""LPIPS-style perceptual distance (Zhang et al. 2018) on a functional
VGG16 port — the distance PPL is defined over (eval/ppl.py).

The reference framework has no perceptual metrics at all (SURVEY.md §5:
"no built-in FID"); PPL/LPIPS follow the same pluggable-extractor
pattern as the FID stack (eval/fid.py): a functional-JAX backbone whose
forward math is torch-oracle-tested, pretrained weights loaded from
``$GANLAB_LPIPS_WEIGHTS`` (a torchvision ``vgg16`` state_dict — the
``features.N.{weight,bias}`` convs) when available, and a deterministic
random-weight fallback otherwise (no network egress in this container;
relative comparisons only, same caveat as FID's fallback).

Distance: taps after relu1_2/2_2/3_3/4_3/5_3; each tap's channels are
unit-normalized, the squared difference channel-averaged (official LPIPS
uses learned per-channel "lin" weights — uniform 1/C here, i.e. the
"baseline/fixed" LPIPS variant from the paper, since the lin calibration
isn't fetchable either) and spatially averaged, then summed over taps.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

LPIPS_WEIGHTS_ENV = "GANLAB_LPIPS_WEIGHTS"

# torchvision vgg16.features layout: conv channel widths with 'M' maxpools.
_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512, "M"]
# tap after the relu of these conv indices (0-based over the 13 convs)
_TAP_CONVS = (1, 3, 6, 9, 12)
# torchvision state_dict indices of the 13 convs inside `features.*`
_TORCH_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
# official LPIPS input scaling layer (applied to [-1, 1] RGB)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


def _random_vgg_params(seed: int = 0) -> dict:
    """Deterministic He-initialized VGG16 conv stack (HWIO)."""
    rng = np.random.default_rng(seed)
    params, cin, i = {}, 3, 0
    for v in _VGG_CFG:
        if v == "M":
            continue
        w = rng.standard_normal((3, 3, cin, v)).astype(np.float32)
        params[f"w{i}"] = jnp.asarray(w * np.sqrt(2.0 / (9 * cin)))
        params[f"b{i}"] = jnp.zeros((v,), jnp.float32)
        cin, i = v, i + 1
    return params


def load_torch_vgg16(path: str) -> dict:
    """torchvision ``vgg16`` state_dict -> functional params (HWIO)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    params = {}
    for i, ti in enumerate(_TORCH_IDX):
        w = sd[f"features.{ti}.weight"].numpy()       # OIHW
        params[f"w{i}"] = jnp.asarray(w.transpose(2, 3, 1, 0))
        params[f"b{i}"] = jnp.asarray(sd[f"features.{ti}.bias"].numpy())
    return params


def vgg_features(params: dict, x: jax.Array) -> list[jax.Array]:
    """Tap activations of NHWC images in [-1, 1] (f32, any res >= 32)."""
    h = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
    feats, i = [], 0
    for v in _VGG_CFG:
        if v == "M":
            h = lax.reduce_window(h, -jnp.inf, lax.max, (1, 2, 2, 1),
                                  (1, 2, 2, 1), "VALID")
            continue
        h = lax.conv_general_dilated(
            h, params[f"w{i}"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + params[f"b{i}"]
        h = jnp.maximum(h, 0.0)
        if i in _TAP_CONVS:
            feats.append(h)
        i += 1
    return feats


def lpips_distance(params: dict, x: jax.Array, y: jax.Array) -> jax.Array:
    """(B,) perceptual distances between NHWC image batches in [-1, 1].

    Inputs below 32px (VGG16's five pools need >= 32) are bilinearly
    upsampled to 32 first, so the metric stays defined for the tiny
    progressive phases / test models.
    """
    if x.shape[1] < 32:
        shape = (x.shape[0], 32, 32, x.shape[3])
        x = jax.image.resize(x, shape, "bilinear")
        y = jax.image.resize(y, shape, "bilinear")
    fx, fy = vgg_features(params, x), vgg_features(params, y)
    total = 0.0
    for a, b in zip(fx, fy):
        na = a * jax.lax.rsqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-10)
        nb = b * jax.lax.rsqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-10)
        total = total + jnp.mean((na - nb) ** 2, axis=(1, 2, 3))
    return total


class LPIPSDistance:
    """Callable (x, y) -> np (B,) distances; jitted once per shape."""

    def __init__(self, weights_path: str | None = None, seed: int = 0):
        path = weights_path or os.environ.get(LPIPS_WEIGHTS_ENV)
        if path and os.path.exists(path):
            self.params = load_torch_vgg16(path)
            self.pretrained = True
        else:
            self.params = _random_vgg_params(seed)
            self.pretrained = False
        self.name = ("lpips_vgg16" if self.pretrained
                     else "lpips_vgg16_random")
        # Weights are a jit ARGUMENT, not a closed-over constant: baking
        # ~138M params into the program as literals bloats the compile —
        # a documented TPU-relay hazard (ADVICE r3; house style matches
        # cli.py's build_sample_fn).
        self._fn = jax.jit(lpips_distance)

    def __call__(self, x, y) -> np.ndarray:
        return np.asarray(self._fn(self.params,
                                   jnp.asarray(x, jnp.float32),
                                   jnp.asarray(y, jnp.float32)))
