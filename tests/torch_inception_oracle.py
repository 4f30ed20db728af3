"""Independent torch implementation of the FID InceptionV3 pool3 network.

Oracle for ``ganlab_tpu/eval/inception.py``: the same architecture spec
(pytorch-fid's FIDInception variant of torchvision inception_v3 — exclude-pad
avg pools in the A/C/E blocks, max pool for Mixed_7c's branch pool), executed
entirely with torch's own conv2d / batch_norm / avg_pool2d / max_pool2d /
interpolate kernels. Every numerically subtle choice the JAX port encodes
(BN eps placement, count_include_pad=False, SAME-window border division,
bilinear half-pixel resize) is exercised against torch's implementation.

Weights come from a shared random state_dict so the parity test needs no
pretrained file (none is fetchable in this container).
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def _conv_bn(sd, name, x, stride=1, padding=0):
    y = F.conv2d(x, sd[f"{name}.conv.weight"], stride=stride, padding=padding)
    y = F.batch_norm(y, sd[f"{name}.bn.running_mean"],
                     sd[f"{name}.bn.running_var"], sd[f"{name}.bn.weight"],
                     sd[f"{name}.bn.bias"], training=False, eps=1e-3)
    return F.relu(y)


def _avg_excl(x):
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


def _block_a(sd, p, x):
    b1 = _conv_bn(sd, f"{p}.branch1x1", x)
    b5 = _conv_bn(sd, f"{p}.branch5x5_1", x)
    b5 = _conv_bn(sd, f"{p}.branch5x5_2", b5, padding=2)
    b3 = _conv_bn(sd, f"{p}.branch3x3dbl_1", x)
    b3 = _conv_bn(sd, f"{p}.branch3x3dbl_2", b3, padding=1)
    b3 = _conv_bn(sd, f"{p}.branch3x3dbl_3", b3, padding=1)
    bp = _conv_bn(sd, f"{p}.branch_pool", _avg_excl(x))
    return torch.cat([b1, b5, b3, bp], 1)


def _block_b(sd, p, x):
    b3 = _conv_bn(sd, f"{p}.branch3x3", x, stride=2)
    bd = _conv_bn(sd, f"{p}.branch3x3dbl_1", x)
    bd = _conv_bn(sd, f"{p}.branch3x3dbl_2", bd, padding=1)
    bd = _conv_bn(sd, f"{p}.branch3x3dbl_3", bd, stride=2)
    return torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)


def _block_c(sd, p, x):
    b1 = _conv_bn(sd, f"{p}.branch1x1", x)
    b7 = _conv_bn(sd, f"{p}.branch7x7_1", x)
    b7 = _conv_bn(sd, f"{p}.branch7x7_2", b7, padding=(0, 3))
    b7 = _conv_bn(sd, f"{p}.branch7x7_3", b7, padding=(3, 0))
    bd = _conv_bn(sd, f"{p}.branch7x7dbl_1", x)
    bd = _conv_bn(sd, f"{p}.branch7x7dbl_2", bd, padding=(3, 0))
    bd = _conv_bn(sd, f"{p}.branch7x7dbl_3", bd, padding=(0, 3))
    bd = _conv_bn(sd, f"{p}.branch7x7dbl_4", bd, padding=(3, 0))
    bd = _conv_bn(sd, f"{p}.branch7x7dbl_5", bd, padding=(0, 3))
    bp = _conv_bn(sd, f"{p}.branch_pool", _avg_excl(x))
    return torch.cat([b1, b7, bd, bp], 1)


def _block_d(sd, p, x):
    b3 = _conv_bn(sd, f"{p}.branch3x3_1", x)
    b3 = _conv_bn(sd, f"{p}.branch3x3_2", b3, stride=2)
    b7 = _conv_bn(sd, f"{p}.branch7x7x3_1", x)
    b7 = _conv_bn(sd, f"{p}.branch7x7x3_2", b7, padding=(0, 3))
    b7 = _conv_bn(sd, f"{p}.branch7x7x3_3", b7, padding=(3, 0))
    b7 = _conv_bn(sd, f"{p}.branch7x7x3_4", b7, stride=2)
    return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)


def _block_e(sd, p, x, pool):
    b1 = _conv_bn(sd, f"{p}.branch1x1", x)
    b3 = _conv_bn(sd, f"{p}.branch3x3_1", x)
    b3 = torch.cat([_conv_bn(sd, f"{p}.branch3x3_2a", b3, padding=(0, 1)),
                    _conv_bn(sd, f"{p}.branch3x3_2b", b3, padding=(1, 0))], 1)
    bd = _conv_bn(sd, f"{p}.branch3x3dbl_1", x)
    bd = _conv_bn(sd, f"{p}.branch3x3dbl_2", bd, padding=1)
    bd = torch.cat([_conv_bn(sd, f"{p}.branch3x3dbl_3a", bd, padding=(0, 1)),
                    _conv_bn(sd, f"{p}.branch3x3dbl_3b", bd, padding=(1, 0))],
                   1)
    if pool == "max":
        bp = F.max_pool2d(x, 3, stride=1, padding=1)
    else:
        bp = _avg_excl(x)
    bp = _conv_bn(sd, f"{p}.branch_pool", bp)
    return torch.cat([b1, b3, bd, bp], 1)


@torch.no_grad()
def torch_pool3(sd: dict, images_nhwc: np.ndarray) -> np.ndarray:
    """(N, 299, 299, 3) [-1, 1] float32 NHWC -> (N, 2048) pool3 features."""
    x = torch.from_numpy(np.asarray(images_nhwc, np.float32)
                         ).permute(0, 3, 1, 2).contiguous()
    x = _conv_bn(sd, "Conv2d_1a_3x3", x, stride=2)
    x = _conv_bn(sd, "Conv2d_2a_3x3", x)
    x = _conv_bn(sd, "Conv2d_2b_3x3", x, padding=1)
    x = F.max_pool2d(x, 3, 2)
    x = _conv_bn(sd, "Conv2d_3b_1x1", x)
    x = _conv_bn(sd, "Conv2d_4a_3x3", x)
    x = F.max_pool2d(x, 3, 2)
    x = _block_a(sd, "Mixed_5b", x)
    x = _block_a(sd, "Mixed_5c", x)
    x = _block_a(sd, "Mixed_5d", x)
    x = _block_b(sd, "Mixed_6a", x)
    x = _block_c(sd, "Mixed_6b", x)
    x = _block_c(sd, "Mixed_6c", x)
    x = _block_c(sd, "Mixed_6d", x)
    x = _block_c(sd, "Mixed_6e", x)
    x = _block_d(sd, "Mixed_7a", x)
    x = _block_e(sd, "Mixed_7b", x, pool="avg")
    x = _block_e(sd, "Mixed_7c", x, pool="max")
    return x.mean(dim=(2, 3)).numpy()


@torch.no_grad()
def torch_resize_299(images_nhwc: np.ndarray) -> np.ndarray:
    """pytorch-fid preprocessing resize: bilinear, align_corners=False."""
    x = torch.from_numpy(np.asarray(images_nhwc, np.float32)
                         ).permute(0, 3, 1, 2)
    x = F.interpolate(x, size=(299, 299), mode="bilinear",
                      align_corners=False)
    return x.permute(0, 2, 3, 1).contiguous().numpy()


def random_state_dict(seed: int = 0) -> dict:
    """Random weights + NONTRIVIAL batchnorm statistics for every
    BasicConv2d in the FID Inception spec. Nontrivial BN stats make the
    parity test sensitive to the exact frozen-BN formula."""
    from ganlab_tpu.eval.inception import _spec

    rng = np.random.default_rng(seed)
    sd = {}
    for name, cin, cout, kh, kw in _spec():
        w = rng.standard_normal((cout, cin, kh, kw)).astype(np.float32)
        w *= np.sqrt(2.0 / (cin * kh * kw))
        sd[f"{name}.conv.weight"] = torch.from_numpy(w)
        sd[f"{name}.bn.weight"] = torch.from_numpy(
            (1.0 + 0.2 * rng.standard_normal(cout)).astype(np.float32))
        sd[f"{name}.bn.bias"] = torch.from_numpy(
            (0.1 * rng.standard_normal(cout)).astype(np.float32))
        sd[f"{name}.bn.running_mean"] = torch.from_numpy(
            (0.1 * rng.standard_normal(cout)).astype(np.float32))
        sd[f"{name}.bn.running_var"] = torch.from_numpy(
            (0.5 + rng.random(cout)).astype(np.float32))
    return sd
