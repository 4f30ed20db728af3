"""Math-parity unit tests: each JAX op vs a torch/NumPy CPU oracle.

SURVEY.md section 4: every hot op gets a test comparing the JAX implementation
to an independently-written torch/NumPy reference at fp32 tolerances.
"""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from ganlab_tpu import ops

RTOL = 1e-5
ATOL = 1e-5


def rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


class TestEqualized:
    def test_he_constant(self):
        assert ops.he_constant(512) == pytest.approx(math.sqrt(2.0 / 512.0))
        assert ops.he_constant(9, gain=1.0) == pytest.approx(1.0 / 3.0)

    def test_dense_matches_torch(self):
        x, w, b = rand(4, 64), rand(64, 32, seed=1), rand(32, seed=2)
        y = ops.equalized_dense(jnp.array(x), jnp.array(w), jnp.array(b))
        scale = math.sqrt(2.0 / 64.0)
        yt = F.linear(torch.tensor(x), torch.tensor(w.T) * scale,
                      torch.tensor(b))
        np.testing.assert_allclose(np.asarray(y), yt.numpy(), rtol=RTOL, atol=ATOL)

    def test_dense_lr_mult(self):
        # lr_mult scales both the effective weight and the bias.
        x, w, b = rand(2, 16), rand(16, 8, seed=1), rand(8, seed=2)
        y = ops.equalized_dense(jnp.array(x), jnp.array(w), jnp.array(b),
                                lr_mult=0.01)
        scale = math.sqrt(2.0 / 16.0) * 0.01
        expected = x @ (w * scale) + b * 0.01
        np.testing.assert_allclose(np.asarray(y), expected, rtol=RTOL, atol=ATOL)

    def test_conv_matches_torch(self):
        x = rand(2, 8, 8, 3)           # NHWC
        w = rand(3, 3, 3, 16, seed=1)  # HWIO
        b = rand(16, seed=2)
        y = ops.equalized_conv2d(jnp.array(x), jnp.array(w), jnp.array(b))
        scale = math.sqrt(2.0 / (3 * 3 * 3))
        xt = torch.tensor(x).permute(0, 3, 1, 2)
        wt = torch.tensor(w).permute(3, 2, 0, 1) * scale
        yt = F.conv2d(xt, wt, torch.tensor(b), padding=1)
        np.testing.assert_allclose(
            np.asarray(y), yt.permute(0, 2, 3, 1).numpy(), rtol=RTOL, atol=1e-4)

    def test_conv_stride2(self):
        x = rand(2, 8, 8, 4)
        w = rand(3, 3, 4, 8, seed=1)
        y = ops.equalized_conv2d(jnp.array(x), jnp.array(w), stride=2,
                                 padding=1)
        scale = math.sqrt(2.0 / (3 * 3 * 4))
        xt = torch.tensor(x).permute(0, 3, 1, 2)
        wt = torch.tensor(w).permute(3, 2, 0, 1) * scale
        yt = F.conv2d(xt, wt, stride=2, padding=1)
        np.testing.assert_allclose(
            np.asarray(y), yt.permute(0, 2, 3, 1).numpy(), rtol=RTOL, atol=1e-4)


class TestNormalization:
    def test_pixel_norm(self):
        x = rand(2, 4, 4, 8)
        y = ops.pixel_norm(jnp.array(x))
        expected = x / np.sqrt(np.mean(x**2, axis=-1, keepdims=True) + 1e-8)
        np.testing.assert_allclose(np.asarray(y), expected, rtol=RTOL, atol=ATOL)

    def test_pixel_norm_on_latents(self):
        z = rand(4, 512)
        y = ops.pixel_norm(jnp.array(z))
        expected = z / np.sqrt(np.mean(z**2, axis=-1, keepdims=True) + 1e-8)
        np.testing.assert_allclose(np.asarray(y), expected, rtol=RTOL, atol=ATOL)

    def test_instance_norm_matches_torch(self):
        x = rand(3, 8, 8, 5)
        y = ops.instance_norm(jnp.array(x))
        xt = torch.tensor(x).permute(0, 3, 1, 2)
        yt = F.instance_norm(xt, eps=1e-8)
        np.testing.assert_allclose(
            np.asarray(y), yt.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4)

    def test_adain(self):
        x = rand(2, 4, 4, 6)
        ys, yb = rand(2, 6, seed=1), rand(2, 6, seed=2)
        y = ops.adain(jnp.array(x), jnp.array(ys), jnp.array(yb))
        xt = torch.tensor(x).permute(0, 3, 1, 2)
        normed = F.instance_norm(xt, eps=1e-8).permute(0, 2, 3, 1).numpy()
        expected = normed * ys[:, None, None, :] + yb[:, None, None, :]
        np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-4, atol=1e-4)


class TestMinibatchStddev:
    def _oracle(self, x, eps=1e-8):
        # Whole-batch ProGAN formulation, independent NumPy implementation.
        std = np.sqrt(np.var(x, axis=0) + eps)          # (H, W, C)
        avg = std.mean()
        feat = np.full(x.shape[:3] + (1,), avg, dtype=x.dtype)
        return np.concatenate([x, feat], axis=-1)

    def test_whole_batch(self):
        x = rand(8, 4, 4, 3)
        y = ops.minibatch_stddev(jnp.array(x))
        np.testing.assert_allclose(np.asarray(y), self._oracle(x),
                                   rtol=1e-5, atol=1e-5)

    def test_output_shape_and_constant_channel(self):
        x = rand(6, 8, 8, 4)
        y = np.asarray(ops.minibatch_stddev(jnp.array(x), group_size=3))
        assert y.shape == (6, 8, 8, 5)
        # Within each group the appended channel is constant.
        for g in range(2):
            grp = y[g::2, :, :, -1] if False else None
        # group layout: reshape(g, n//g, ...) means members of group j are
        # x[j], x[j + g], ... — check constancy per contiguous stat block.
        stat = y[:, :, :, -1]
        assert np.unique(np.round(stat, 5)).size <= 2

    def test_zero_variance_batch(self):
        x = np.ones((4, 4, 4, 2), dtype=np.float32)
        y = np.asarray(ops.minibatch_stddev(jnp.array(x)))
        np.testing.assert_allclose(y[..., -1], np.sqrt(1e-8), rtol=1e-3)


class TestUpfirdn:
    def test_binomial_kernel(self):
        k = ops.binomial_kernel()
        expected = np.outer([1, 2, 1], [1, 2, 1]) / 16.0
        np.testing.assert_allclose(k, expected)

    def test_blur_matches_torch(self):
        x = rand(2, 8, 8, 3)
        y = ops.blur2d(jnp.array(x))
        k = torch.tensor(np.outer([1, 2, 1], [1, 2, 1]) / 16.0,
                         dtype=torch.float32)
        w = k[None, None].repeat(3, 1, 1, 1)
        xt = torch.tensor(x).permute(0, 3, 1, 2)
        yt = F.conv2d(xt, w, padding=1, groups=3)
        np.testing.assert_allclose(
            np.asarray(y), yt.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-5)

    def test_upsample_nearest_matches_torch(self):
        x = rand(2, 4, 4, 3)
        y = ops.upsample_nearest_2x(jnp.array(x))
        xt = torch.tensor(x).permute(0, 3, 1, 2)
        yt = F.interpolate(xt, scale_factor=2, mode="nearest")
        np.testing.assert_allclose(
            np.asarray(y), yt.permute(0, 2, 3, 1).numpy(), rtol=1e-6, atol=1e-6)

    def test_downsample_avg_matches_torch(self):
        x = rand(2, 8, 8, 3)
        y = ops.downsample_avg_2x(jnp.array(x))
        xt = torch.tensor(x).permute(0, 3, 1, 2)
        yt = F.avg_pool2d(xt, 2)
        np.testing.assert_allclose(
            np.asarray(y), yt.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-5)

    def test_fused_upsample_blur_equals_composite(self):
        x = rand(2, 6, 6, 4)
        fused = ops.upsample_blur_2x(jnp.array(x))
        composite = ops.blur2d(ops.upsample_nearest_2x(jnp.array(x)))
        assert fused.shape == (2, 12, 12, 4)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(composite),
                                   rtol=1e-5, atol=1e-5)

    def test_fused_blur_downsample_equals_composite(self):
        x = rand(2, 8, 8, 4)
        fused = ops.blur_downsample_2x(jnp.array(x))
        composite = ops.downsample_avg_2x(ops.blur2d(jnp.array(x)))
        assert fused.shape == (2, 4, 4, 4)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(composite),
                                   rtol=1e-5, atol=1e-5)


class TestUp2Conv:
    """The composed upsample+conv equals the two-op form EXACTLY (incl.
    the boundary ring, where the two-op form zero-pads the intermediate)."""

    @pytest.mark.parametrize("taps", [(1.0, 2.0, 1.0), None])
    @pytest.mark.parametrize("polyphase", [False, True])
    def test_forward_matches_two_op(self, taps, polyphase):
        from jax import lax
        from ganlab_tpu.ops.upfirdn import CONV_DIMS

        x = jnp.array(rand(2, 7, 5, 4))
        w = jnp.array(rand(3, 3, 4, 6))
        up = (ops.upsample_nearest_2x if taps is None
              else ops.upsample_blur_2x)
        ref = lax.conv_general_dilated(up(x), w, (1, 1), "SAME",
                                       dimension_numbers=CONV_DIMS)
        got = ops.up2_conv2d(x, w, taps=taps, polyphase=polyphase)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("taps", [(1.0, 2.0, 1.0), None])
    def test_gradients_match_two_op(self, taps):
        from jax import lax
        from ganlab_tpu.ops.upfirdn import CONV_DIMS

        x = jnp.array(rand(2, 6, 6, 3))
        w = jnp.array(rand(3, 3, 3, 5))
        up = (ops.upsample_nearest_2x if taps is None
              else ops.upsample_blur_2x)

        def loss_ref(x, w):
            y = lax.conv_general_dilated(up(x), w, (1, 1), "SAME",
                                         dimension_numbers=CONV_DIMS)
            return jnp.sum(jnp.tanh(y))

        def loss_fused(x, w):
            return jnp.sum(jnp.tanh(ops.up2_conv2d(x, w, taps=taps)))

        for a, b in zip(jax.grad(loss_fused, (0, 1))(x, w),
                        jax.grad(loss_ref, (0, 1))(x, w)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-5, atol=3e-5)

    def test_equalized_wrapper_matches_two_op(self):
        from ganlab_tpu.ops import equalized as eq

        x = jnp.array(rand(2, 8, 8, 4))
        w = jnp.array(rand(3, 3, 4, 6))
        b = jnp.array(rand(6))
        ref = eq.equalized_conv2d(ops.upsample_blur_2x(x), w, b)
        got = eq.equalized_conv2d_up2(x, w, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


class TestFadeIn:
    def test_endpoints_and_midpoint(self):
        old, new = jnp.zeros((2, 4, 4, 3)), jnp.ones((2, 4, 4, 3))
        np.testing.assert_allclose(ops.fade_in(0.0, new, old), 0.0)
        np.testing.assert_allclose(ops.fade_in(1.0, new, old), 1.0)
        np.testing.assert_allclose(ops.fade_in(0.25, new, old), 0.25)

    def test_traced_alpha_no_recompile(self):
        # alpha must be traceable: the same jitted fn serves all alphas.
        traces = []

        @jax.jit
        def f(alpha, new, old):
            traces.append(1)
            return ops.fade_in(alpha, new, old)

        new, old = jnp.ones((2, 2)), jnp.zeros((2, 2))
        f(jnp.float32(0.1), new, old)
        f(jnp.float32(0.9), new, old)
        assert len(traces) == 1


class TestPolyphaseResample:
    """The strided-slice polyphase forms equal the depthwise-conv forms."""

    def test_up_poly_equals_conv(self):
        from ganlab_tpu.ops.upfirdn import upsample_blur_2x_poly

        x = jnp.array(rand(2, 8, 8, 4, seed=21))
        np.testing.assert_allclose(
            np.asarray(upsample_blur_2x_poly(x)),
            np.asarray(ops.upsample_blur_2x(x)), rtol=1e-5, atol=1e-5)

    def test_down_poly_equals_conv(self):
        from ganlab_tpu.ops.upfirdn import blur_downsample_2x_poly

        x = jnp.array(rand(2, 8, 8, 4, seed=22))
        np.testing.assert_allclose(
            np.asarray(blur_downsample_2x_poly(x)),
            np.asarray(ops.blur_downsample_2x(x)), rtol=1e-5, atol=1e-5)

    def test_poly_grads_match(self):
        from ganlab_tpu.ops.upfirdn import (
            blur_downsample_2x_poly,
            upsample_blur_2x_poly,
        )

        x = jnp.array(rand(1, 8, 8, 2, seed=23))
        for poly, conv in ((upsample_blur_2x_poly, ops.upsample_blur_2x),
                           (blur_downsample_2x_poly,
                            ops.blur_downsample_2x)):
            gp = jax.grad(lambda a: jnp.sum(jnp.sin(poly(a))))(x)
            gc = jax.grad(lambda a: jnp.sum(jnp.sin(conv(a))))(x)
            np.testing.assert_allclose(np.asarray(gp), np.asarray(gc),
                                       rtol=1e-5, atol=1e-5)
