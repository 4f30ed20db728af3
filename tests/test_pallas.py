"""Pallas kernels vs their pure-XLA reference implementations (SURVEY.md 4).

On CPU these run through the Pallas interpreter; the same code compiles via
Mosaic on TPU. Gradients are checked against jax.grad of the XLA ops.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ganlab_tpu import ops
from ganlab_tpu.ops.pallas import (
    blur_downsample_2x_pallas,
    minibatch_stddev_pallas,
    pixel_norm_pallas,
    upsample_blur_2x_pallas,
)

I = True  # interpret mode (CPU)


def rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


class TestPixelNormPallas:
    def test_forward_parity(self):
        x = jnp.array(rand(2, 8, 8, 16))
        np.testing.assert_allclose(
            np.asarray(pixel_norm_pallas(x, 1e-8, I)),
            np.asarray(ops.pixel_norm(x)), rtol=1e-6, atol=1e-6)

    def test_forward_parity_2d_latents(self):
        z = jnp.array(rand(4, 64, seed=1))
        np.testing.assert_allclose(
            np.asarray(pixel_norm_pallas(z, 1e-8, I)),
            np.asarray(ops.pixel_norm(z)), rtol=1e-6, atol=1e-6)

    def test_gradient_parity(self):
        x = jnp.array(rand(2, 4, 4, 8, seed=2))

        def loss_p(x):
            return jnp.sum(jnp.sin(pixel_norm_pallas(x, 1e-8, I)))

        def loss_x(x):
            return jnp.sum(jnp.sin(ops.pixel_norm(x)))

        np.testing.assert_allclose(np.asarray(jax.grad(loss_p)(x)),
                                   np.asarray(jax.grad(loss_x)(x)),
                                   rtol=1e-5, atol=1e-6)


class TestResamplePallas:
    @pytest.mark.parametrize("shape", [(2, 8, 8, 4), (1, 16, 16, 8)])
    def test_upsample_blur_parity(self, shape):
        x = jnp.array(rand(*shape, seed=3))
        np.testing.assert_allclose(
            np.asarray(upsample_blur_2x_pallas(x, I)),
            np.asarray(ops.upsample_blur_2x(x)), rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("shape", [(2, 8, 8, 4), (1, 16, 16, 8)])
    def test_blur_downsample_parity(self, shape):
        x = jnp.array(rand(*shape, seed=4))
        np.testing.assert_allclose(
            np.asarray(blur_downsample_2x_pallas(x, I)),
            np.asarray(ops.blur_downsample_2x(x)), rtol=1e-5, atol=1e-5)

    def test_up_gradient_adjoint(self):
        x = jnp.array(rand(1, 8, 8, 4, seed=5))

        def loss_p(x):
            return jnp.sum(jnp.cos(upsample_blur_2x_pallas(x, I)))

        def loss_x(x):
            return jnp.sum(jnp.cos(ops.upsample_blur_2x(x)))

        np.testing.assert_allclose(np.asarray(jax.grad(loss_p)(x)),
                                   np.asarray(jax.grad(loss_x)(x)),
                                   rtol=1e-5, atol=1e-5)

    def test_down_gradient_adjoint(self):
        x = jnp.array(rand(1, 8, 8, 4, seed=6))

        def loss_p(x):
            return jnp.sum(jnp.cos(blur_downsample_2x_pallas(x, I)))

        def loss_x(x):
            return jnp.sum(jnp.cos(ops.blur_downsample_2x(x)))

        np.testing.assert_allclose(np.asarray(jax.grad(loss_p)(x)),
                                   np.asarray(jax.grad(loss_x)(x)),
                                   rtol=1e-5, atol=1e-5)

    def test_row_tiling_path(self):
        """Force multi-tile grids by shrinking the VMEM budget."""
        from ganlab_tpu.ops.pallas import resample

        old = resample._VMEM_BUDGET
        try:
            resample._VMEM_BUDGET = 4 * 8 * 4 * 4 * 64  # tiny
            x = jnp.array(rand(1, 16, 8, 4, seed=7))
            np.testing.assert_allclose(
                np.asarray(upsample_blur_2x_pallas(x, I)),
                np.asarray(ops.upsample_blur_2x(x)), rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(blur_downsample_2x_pallas(x, I)),
                np.asarray(ops.blur_downsample_2x(x)), rtol=1e-5, atol=1e-5)
        finally:
            resample._VMEM_BUDGET = old


class TestMbstdPallas:
    def test_parity(self):
        x = jnp.array(rand(8, 4, 4, 16, seed=8))
        np.testing.assert_allclose(
            np.asarray(minibatch_stddev_pallas(x, 1e-8, I)),
            np.asarray(ops.minibatch_stddev(x)), rtol=1e-5, atol=1e-5)

    def test_gradient_parity_vs_xla(self):
        x = jnp.array(rand(4, 4, 4, 8, seed=9))

        def loss_p(x):
            return jnp.sum(jnp.sin(minibatch_stddev_pallas(x, 1e-8, I)))

        def loss_x(x):
            return jnp.sum(jnp.sin(ops.minibatch_stddev(x)))

        np.testing.assert_allclose(np.asarray(jax.grad(loss_p)(x)),
                                   np.asarray(jax.grad(loss_x)(x)),
                                   rtol=1e-4, atol=1e-5)


class TestBackendDispatch:
    @pytest.mark.slow
    def test_train_step_with_pallas_backend(self):
        """A full StyleGAN train step (grad-of-grad included) runs with the
        Pallas backend enabled and produces finite losses."""
        from ganlab_tpu.ops import pallas as plops
        from ganlab_tpu.config import get_config
        from ganlab_tpu.parallel import make_single_step
        from ganlab_tpu.train.schedule import build_phases
        from ganlab_tpu.train.state import create_train_state
        from ganlab_tpu.train.steps import build_train_step

        cfg = get_config("stylegan-256", **{
            "model.resolution": 8, "model.fmap_base": 64,
            "model.fmap_max": 16, "model.latent_dim": 16,
            "model.mapping_layers": 2, "run.compute_dtype": "float32",
            "schedule.batch_schedule": {8: 4}, "schedule.total_kimg": 1.0,
        })
        phase = build_phases(cfg.schedule, cfg.model)[-1]
        batch = np.random.RandomState(0).randint(
            0, 256, (4, 8, 8, 3), dtype=np.uint8)

        plops.set_backend("pallas")
        try:
            state = create_train_state(cfg, jax.random.PRNGKey(0))
            step = make_single_step(build_train_step(cfg, phase))
            state, m = step(state, batch)
            assert np.isfinite(float(m["d_loss"]))
            assert np.isfinite(float(m["g_loss"]))
            assert np.isfinite(float(m["penalty"]))
        finally:
            plops.set_backend("xla")

    def test_dispatch_changes_impl_only_not_values(self):
        from ganlab_tpu.ops import pallas as plops

        x = jnp.array(rand(2, 8, 8, 4, seed=10))
        ref = np.asarray(ops.upsample_blur_2x(x))
        plops.set_backend("pallas")
        try:
            got = np.asarray(ops.upsample_blur_2x(x))
        finally:
            plops.set_backend("xla")
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


class TestAdainPallas:
    def test_forward_parity(self):
        from ganlab_tpu.ops.pallas import adain_pallas

        x = jnp.array(rand(2, 8, 8, 16, seed=11))
        s = jnp.array(rand(2, 16, seed=12) * 0.5 + 1.0)
        b = jnp.array(rand(2, 16, seed=13))
        np.testing.assert_allclose(
            np.asarray(adain_pallas(x, s, b, 1e-8, I)),
            np.asarray(ops.adain(x, s, b)), rtol=1e-5, atol=1e-5)

    def test_gradient_parity_all_inputs(self):
        from ganlab_tpu.ops.pallas import adain_pallas

        x = jnp.array(rand(2, 4, 4, 8, seed=14))
        s = jnp.array(rand(2, 8, seed=15) * 0.5 + 1.0)
        b = jnp.array(rand(2, 8, seed=16))

        def loss_p(x, s, b):
            return jnp.sum(jnp.sin(adain_pallas(x, s, b, 1e-8, I)))

        def loss_x(x, s, b):
            return jnp.sum(jnp.sin(ops.adain(x, s, b)))

        gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, s, b)
        gx = jax.grad(loss_x, argnums=(0, 1, 2))(x, s, b)
        for a, r in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       rtol=1e-4, atol=1e-5)

    def test_dispatch_in_stylegan_layer(self):
        """ops.adain dispatches to the kernel under the pallas backend and
        values match."""
        from ganlab_tpu.ops import pallas as plops

        x = jnp.array(rand(2, 8, 8, 4, seed=17))
        s = jnp.array(rand(2, 4, seed=18) + 1.0)
        b = jnp.array(rand(2, 4, seed=19))
        ref = np.asarray(ops.adain(x, s, b))
        plops.set_backend("pallas")
        try:
            got = np.asarray(ops.adain(x, s, b))
        finally:
            plops.set_backend("xla")
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
