"""Whole-block parity vs an independent torch implementation.

SURVEY.md 7 hard part (g): 'faithful equalized-LR + bias/activation ordering
— tiny constants here silently wreck FID'. Op-level parity is covered in
test_ops_parity.py; these tests compose a full ProGAN generator block and a
mapping-network stack in torch with the SAME weights and require the whole
pipeline (scaling constants, bias placement, activation order, pixelnorm
position, upsample path) to match at fp32 tolerance.
"""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from ganlab_tpu.config import ModelConfig
from ganlab_tpu.models.progan import GBlock, GInputBlock
from ganlab_tpu.models.stylegan import MappingNetwork


def rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def torch_pixel_norm(x, eps=1e-8):
    # x: NCHW
    return x * torch.rsqrt(torch.mean(x * x, dim=1, keepdim=True) + eps)


def torch_equal_conv(x, w_hwio, b, gain=math.sqrt(2.0), padding=1):
    kh, kw, cin, cout = w_hwio.shape
    scale = gain / math.sqrt(kh * kw * cin)
    wt = torch.tensor(w_hwio.transpose(3, 2, 0, 1)) * scale
    return F.conv2d(x, wt, torch.tensor(b), padding=padding)


class TestGBlockOracle:
    def test_full_block_matches_torch(self):
        feats = 8
        block = GBlock(features=feats)
        x_np = rand(2, 4, 4, 6, seed=1)
        params = block.init(jax.random.PRNGKey(0), jnp.array(x_np))
        y = np.asarray(block.apply(params, jnp.array(x_np)))

        p = params["params"]
        w0 = np.asarray(p["conv0"]["w"])   # (3,3,6,8)
        b0 = np.asarray(p["conv0"]["b"])
        w1 = np.asarray(p["conv1"]["w"])
        b1 = np.asarray(p["conv1"]["b"])

        xt = torch.tensor(x_np).permute(0, 3, 1, 2)
        xt = F.interpolate(xt, scale_factor=2, mode="nearest")
        h = torch_equal_conv(xt, w0, b0)
        h = torch_pixel_norm(F.leaky_relu(h, 0.2))
        h = torch_equal_conv(h, w1, b1)
        h = torch_pixel_norm(F.leaky_relu(h, 0.2))
        expected = h.permute(0, 2, 3, 1).numpy()

        assert y.shape == (2, 8, 8, feats)
        np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-5)

    def test_input_block_matches_torch(self):
        feats = 8
        block = GInputBlock(features=feats)
        z_np = rand(3, 16, seed=2)
        params = block.init(jax.random.PRNGKey(1), jnp.array(z_np))
        y = np.asarray(block.apply(params, jnp.array(z_np)))

        p = params["params"]
        wd = np.asarray(p["dense"]["w"])       # (16, 128)
        bd = np.asarray(p["dense"]["b"])
        wc = np.asarray(p["conv"]["w"])
        bc = np.asarray(p["conv"]["b"])

        zt = torch.tensor(z_np)
        zt = zt * torch.rsqrt(torch.mean(zt * zt, dim=1, keepdim=True)
                              + 1e-8)
        # dense with gain sqrt(2)/4 (ProGAN's scaled latent projection)
        scale = (math.sqrt(2.0) / 4.0) / math.sqrt(16)
        h = zt @ (torch.tensor(wd) * scale) + torch.tensor(bd)
        h = h.reshape(3, 4, 4, feats).permute(0, 3, 1, 2)  # NHWC -> NCHW
        h = torch_pixel_norm(F.leaky_relu(h, 0.2))
        h = torch_equal_conv(h, wc, bc)
        h = torch_pixel_norm(F.leaky_relu(h, 0.2))
        expected = h.permute(0, 2, 3, 1).numpy()

        assert y.shape == (3, 4, 4, feats)
        np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-5)


class TestMappingOracle:
    def test_mapping_stack_matches_torch(self):
        cfg = ModelConfig(model="stylegan", latent_dim=16, mapping_layers=3,
                          mapping_lr_mult=0.01)
        m = MappingNetwork(cfg)
        z_np = rand(4, 16, seed=3)
        params = m.init(jax.random.PRNGKey(2), jnp.array(z_np))
        w = np.asarray(m.apply(params, jnp.array(z_np)))

        zt = torch.tensor(z_np)
        h = zt * torch.rsqrt(torch.mean(zt * zt, dim=1, keepdim=True)
                             + 1e-8)
        for i in range(3):
            wi = np.asarray(params["params"][f"fc{i}"]["w"])
            bi = np.asarray(params["params"][f"fc{i}"]["b"])
            # equalized + lr_mult: effective weight = w * c * lr_mult,
            # effective bias = b * lr_mult
            scale = math.sqrt(2.0 / 16.0) * 0.01
            h = h @ (torch.tensor(wi) * scale) + torch.tensor(bi) * 0.01
            h = F.leaky_relu(h, 0.2)
        np.testing.assert_allclose(w, h.numpy(), rtol=1e-4, atol=1e-6)
