"""InceptionV3 (FID pool3 variant) as pure JAX functions.

Architecture follows the pytorch-fid package's ``FIDInception*`` blocks —
torchvision's inception_v3 with the TF-compatible pooling changes (avg-pool
excludes padding in Mixed_5b-5d/6b-6e/7b; Mixed_7c's branch-pool is... kept
as exclude-pad avg-pool per pytorch-fid's FIDInceptionE_2 using max-pool).
Parameter tree mirrors torchvision ``state_dict`` naming so pretrained
weights convert by name (OIHW -> HWIO transpose only).

Inference-only: batch norms apply stored running statistics.
"""

from __future__ import annotations

import functools
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

CONV_DIMS = ("NHWC", "HWIO", "NHWC")


# ---------------------------------------------------------------------------
# Primitive layers (functional; params are nested dicts)
# ---------------------------------------------------------------------------

def conv_bn(params: dict, x, stride=1, padding=0):
    """BasicConv2d: conv(no bias) + frozen batchnorm(eps=1e-3) + relu."""
    w = params["conv"]["w"]
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = lax.conv_general_dilated(x, w.astype(x.dtype), (stride, stride),
                                 padding, dimension_numbers=CONV_DIMS)
    bn = params["bn"]
    scale = bn["scale"] * lax.rsqrt(bn["var"] + 1e-3)
    y = y * scale.astype(y.dtype) + (bn["bias"] - bn["mean"] * scale).astype(y.dtype)
    return jax.nn.relu(y)


def max_pool(x, window=3, stride=2, padding="VALID"):
    return lax.reduce_window(x, -jnp.inf, lax.max,
                             (1, window, window, 1), (1, stride, stride, 1),
                             padding)


def avg_pool_exclude_pad(x, window=3, stride=1):
    """SAME avg-pool that divides by the true window size at borders
    (TF semantics; torch's count_include_pad=False)."""
    ones = jnp.ones_like(x[..., :1])
    s = lax.reduce_window(x, 0.0, lax.add, (1, window, window, 1),
                          (1, stride, stride, 1), "SAME")
    n = lax.reduce_window(ones, 0.0, lax.add, (1, window, window, 1),
                          (1, stride, stride, 1), "SAME")
    return s / n


# ---------------------------------------------------------------------------
# Inception blocks
# ---------------------------------------------------------------------------

def inception_a(p, x):
    b1 = conv_bn(p["branch1x1"], x)
    b5 = conv_bn(p["branch5x5_1"], x)
    b5 = conv_bn(p["branch5x5_2"], b5, padding=2)
    b3 = conv_bn(p["branch3x3dbl_1"], x)
    b3 = conv_bn(p["branch3x3dbl_2"], b3, padding=1)
    b3 = conv_bn(p["branch3x3dbl_3"], b3, padding=1)
    bp = avg_pool_exclude_pad(x)
    bp = conv_bn(p["branch_pool"], bp)
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def inception_b(p, x):
    b3 = conv_bn(p["branch3x3"], x, stride=2)
    bd = conv_bn(p["branch3x3dbl_1"], x)
    bd = conv_bn(p["branch3x3dbl_2"], bd, padding=1)
    bd = conv_bn(p["branch3x3dbl_3"], bd, stride=2)
    bp = max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def inception_c(p, x):
    b1 = conv_bn(p["branch1x1"], x)
    b7 = conv_bn(p["branch7x7_1"], x)
    b7 = conv_bn(p["branch7x7_2"], b7, padding=((0, 0), (3, 3)))
    b7 = conv_bn(p["branch7x7_3"], b7, padding=((3, 3), (0, 0)))
    bd = conv_bn(p["branch7x7dbl_1"], x)
    bd = conv_bn(p["branch7x7dbl_2"], bd, padding=((3, 3), (0, 0)))
    bd = conv_bn(p["branch7x7dbl_3"], bd, padding=((0, 0), (3, 3)))
    bd = conv_bn(p["branch7x7dbl_4"], bd, padding=((3, 3), (0, 0)))
    bd = conv_bn(p["branch7x7dbl_5"], bd, padding=((0, 0), (3, 3)))
    bp = avg_pool_exclude_pad(x)
    bp = conv_bn(p["branch_pool"], bp)
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def inception_d(p, x):
    b3 = conv_bn(p["branch3x3_1"], x)
    b3 = conv_bn(p["branch3x3_2"], b3, stride=2)
    b7 = conv_bn(p["branch7x7x3_1"], x)
    b7 = conv_bn(p["branch7x7x3_2"], b7, padding=((0, 0), (3, 3)))
    b7 = conv_bn(p["branch7x7x3_3"], b7, padding=((3, 3), (0, 0)))
    b7 = conv_bn(p["branch7x7x3_4"], b7, stride=2)
    bp = max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def inception_e(p, x, pool: str):
    b1 = conv_bn(p["branch1x1"], x)
    b3 = conv_bn(p["branch3x3_1"], x)
    b3 = jnp.concatenate([
        conv_bn(p["branch3x3_2a"], b3, padding=((0, 0), (1, 1))),
        conv_bn(p["branch3x3_2b"], b3, padding=((1, 1), (0, 0))),
    ], axis=-1)
    bd = conv_bn(p["branch3x3dbl_1"], x)
    bd = conv_bn(p["branch3x3dbl_2"], bd, padding=1)
    bd = jnp.concatenate([
        conv_bn(p["branch3x3dbl_3a"], bd, padding=((0, 0), (1, 1))),
        conv_bn(p["branch3x3dbl_3b"], bd, padding=((1, 1), (0, 0))),
    ], axis=-1)
    if pool == "max":
        # pytorch-fid FIDInceptionE_2 (Mixed_7c): TF uses max pooling here.
        bp = max_pool(x, 3, 1, "SAME")
    else:
        bp = avg_pool_exclude_pad(x)
    bp = conv_bn(p["branch_pool"], bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


# ---------------------------------------------------------------------------
# Full network
# ---------------------------------------------------------------------------

def inception_pool3(params: dict, images) -> jax.Array:
    """images: (N, 299, 299, 3) in [-1, 1] -> (N, 2048) pool3 features."""
    x = images
    x = conv_bn(params["Conv2d_1a_3x3"], x, stride=2)
    x = conv_bn(params["Conv2d_2a_3x3"], x)
    x = conv_bn(params["Conv2d_2b_3x3"], x, padding=1)
    x = max_pool(x)
    x = conv_bn(params["Conv2d_3b_1x1"], x)
    x = conv_bn(params["Conv2d_4a_3x3"], x)
    x = max_pool(x)
    x = inception_a(params["Mixed_5b"], x)
    x = inception_a(params["Mixed_5c"], x)
    x = inception_a(params["Mixed_5d"], x)
    x = inception_b(params["Mixed_6a"], x)
    x = inception_c(params["Mixed_6b"], x)
    x = inception_c(params["Mixed_6c"], x)
    x = inception_c(params["Mixed_6d"], x)
    x = inception_c(params["Mixed_6e"], x)
    x = inception_d(params["Mixed_7a"], x)
    x = inception_e(params["Mixed_7b"], x, pool="avg")
    x = inception_e(params["Mixed_7c"], x, pool="max")
    return jnp.mean(x, axis=(1, 2))  # global average pool -> (N, 2048)


# ---------------------------------------------------------------------------
# Parameter construction / torch conversion
# ---------------------------------------------------------------------------

def _spec():
    """(name, in_ch, out_ch, kh, kw) for every BasicConv2d, in order."""
    spec = [
        ("Conv2d_1a_3x3", 3, 32, 3, 3),
        ("Conv2d_2a_3x3", 32, 32, 3, 3),
        ("Conv2d_2b_3x3", 32, 64, 3, 3),
        ("Conv2d_3b_1x1", 64, 80, 1, 1),
        ("Conv2d_4a_3x3", 80, 192, 3, 3),
    ]

    def a(prefix, cin, pool):
        return [
            (f"{prefix}.branch1x1", cin, 64, 1, 1),
            (f"{prefix}.branch5x5_1", cin, 48, 1, 1),
            (f"{prefix}.branch5x5_2", 48, 64, 5, 5),
            (f"{prefix}.branch3x3dbl_1", cin, 64, 1, 1),
            (f"{prefix}.branch3x3dbl_2", 64, 96, 3, 3),
            (f"{prefix}.branch3x3dbl_3", 96, 96, 3, 3),
            (f"{prefix}.branch_pool", cin, pool, 1, 1),
        ]

    def c(prefix, c7):
        return [
            (f"{prefix}.branch1x1", 768, 192, 1, 1),
            (f"{prefix}.branch7x7_1", 768, c7, 1, 1),
            (f"{prefix}.branch7x7_2", c7, c7, 1, 7),
            (f"{prefix}.branch7x7_3", c7, 192, 7, 1),
            (f"{prefix}.branch7x7dbl_1", 768, c7, 1, 1),
            (f"{prefix}.branch7x7dbl_2", c7, c7, 7, 1),
            (f"{prefix}.branch7x7dbl_3", c7, c7, 1, 7),
            (f"{prefix}.branch7x7dbl_4", c7, c7, 7, 1),
            (f"{prefix}.branch7x7dbl_5", c7, 192, 1, 7),
            (f"{prefix}.branch_pool", 768, 192, 1, 1),
        ]

    def e(prefix, cin):
        return [
            (f"{prefix}.branch1x1", cin, 320, 1, 1),
            (f"{prefix}.branch3x3_1", cin, 384, 1, 1),
            (f"{prefix}.branch3x3_2a", 384, 384, 1, 3),
            (f"{prefix}.branch3x3_2b", 384, 384, 3, 1),
            (f"{prefix}.branch3x3dbl_1", cin, 448, 1, 1),
            (f"{prefix}.branch3x3dbl_2", 448, 384, 3, 3),
            (f"{prefix}.branch3x3dbl_3a", 384, 384, 1, 3),
            (f"{prefix}.branch3x3dbl_3b", 384, 384, 3, 1),
            (f"{prefix}.branch_pool", cin, 192, 1, 1),
        ]

    spec += a("Mixed_5b", 192, 32)
    spec += a("Mixed_5c", 256, 64)
    spec += a("Mixed_5d", 288, 64)
    spec += [
        ("Mixed_6a.branch3x3", 288, 384, 3, 3),
        ("Mixed_6a.branch3x3dbl_1", 288, 64, 1, 1),
        ("Mixed_6a.branch3x3dbl_2", 64, 96, 3, 3),
        ("Mixed_6a.branch3x3dbl_3", 96, 96, 3, 3),
    ]
    spec += c("Mixed_6b", 128) + c("Mixed_6c", 160)
    spec += c("Mixed_6d", 160) + c("Mixed_6e", 192)
    spec += [
        ("Mixed_7a.branch3x3_1", 768, 192, 1, 1),
        ("Mixed_7a.branch3x3_2", 192, 320, 3, 3),
        ("Mixed_7a.branch7x7x3_1", 768, 192, 1, 1),
        ("Mixed_7a.branch7x7x3_2", 192, 192, 1, 7),
        ("Mixed_7a.branch7x7x3_3", 192, 192, 7, 1),
        ("Mixed_7a.branch7x7x3_4", 192, 192, 3, 3),
    ]
    spec += e("Mixed_7b", 1280) + e("Mixed_7c", 2048)
    return spec


def _set(tree, dotted, leaf):
    parts = dotted.split(".")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = leaf


def init_inception_params(seed: int = 0) -> dict:
    """Random He-init params with identity batchnorm (for tests / as a
    deterministic random-feature extractor at full Inception capacity)."""
    rng = np.random.default_rng(seed)
    tree: dict = {}
    for name, cin, cout, kh, kw in _spec():
        fan_in = cin * kh * kw
        w = rng.standard_normal((kh, kw, cin, cout)).astype(np.float32)
        w *= np.sqrt(2.0 / fan_in)
        _set(tree, name, {
            "conv": {"w": jnp.asarray(w)},
            "bn": {"scale": jnp.ones((cout,)), "bias": jnp.zeros((cout,)),
                   "mean": jnp.zeros((cout,)), "var": jnp.ones((cout,))},
        })
    return tree


def load_torch_state_dict(path: str) -> dict:
    """Convert a torchvision/pytorch-fid inception_v3 state_dict file.

    Accepts either a raw state_dict or a checkpoint containing one. Conv
    weights transpose OIHW -> HWIO; batchnorm running stats map to the
    frozen-BN params used by ``conv_bn``.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    tree: dict = {}
    for name, cin, cout, kh, kw in _spec():
        w = sd[f"{name}.conv.weight"].numpy()
        assert w.shape == (cout, cin, kh, kw), (name, w.shape)
        _set(tree, name, {
            "conv": {"w": jnp.asarray(w.transpose(2, 3, 1, 0))},
            "bn": {
                "scale": jnp.asarray(sd[f"{name}.bn.weight"].numpy()),
                "bias": jnp.asarray(sd[f"{name}.bn.bias"].numpy()),
                "mean": jnp.asarray(sd[f"{name}.bn.running_mean"].numpy()),
                "var": jnp.asarray(sd[f"{name}.bn.running_var"].numpy()),
            },
        })
    return tree


def preprocess(images_m11) -> jax.Array:
    """[-1, 1] NHWC at any resolution -> (N, 299, 299, 3) bilinear.

    ``antialias=False`` matches pytorch-fid's
    ``F.interpolate(mode="bilinear", align_corners=False)`` exactly (both
    use half-pixel-center sampling without a low-pass filter; jax defaults
    to antialias=True which diverges when downscaling). Parity is asserted
    against a torch oracle in tests/test_fid.py.
    """
    x = images_m11
    if x.shape[-1] == 1:
        x = jnp.tile(x, (1, 1, 1, 3))
    if x.shape[1] != 299:
        x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear",
                             antialias=False)
    return x


class InceptionExtractor:
    """Batched pool3 feature extraction; callable (N,H,W,C)[-1,1] -> (N,2048)."""

    name = "inception_v3_pool3"
    dim = 2048

    def __init__(self, params: dict | None = None,
                 weights_path: str | None = None, batch: int = 64):
        if params is None:
            if weights_path:
                params = load_torch_state_dict(weights_path)
                self.pretrained = True
            else:
                params = init_inception_params()
                self.pretrained = False
        else:
            self.pretrained = True
        self._params = params
        self._batch = batch
        self._fn = jax.jit(lambda p, x: inception_pool3(p, preprocess(x)))

    def __call__(self, images) -> np.ndarray:
        out = []
        n = images.shape[0]
        for i in range(0, n, self._batch):
            chunk = jnp.asarray(images[i:i + self._batch])
            out.append(np.asarray(self._fn(self._params, chunk)))
        return np.concatenate(out, axis=0)
