"""Width-folded evaluation (ops/folded.py): exact parity with the logical
ops and models — the fold is an evaluation-order/layout change only."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import lax

from ganlab_tpu import ops
from ganlab_tpu.config import ModelConfig
from ganlab_tpu.models import build_models
from ganlab_tpu.ops import folded as fd
from ganlab_tpu.ops.upfirdn import CONV_DIMS


def rand(*shape, seed=0):
    return np.random.RandomState(seed + sum(shape)).randn(*shape).astype(
        np.float32)


class TestFoldedOps:
    def test_fold_roundtrip(self):
        x = jnp.array(rand(2, 4, 6, 3))
        np.testing.assert_array_equal(np.asarray(fd.unfold_w(fd.fold_w(x))),
                                      np.asarray(x))

    @pytest.mark.parametrize("kernel", [1, 3])
    def test_conv_folded_matches_logical(self, kernel):
        x = jnp.array(rand(2, 6, 8, 4))
        w = jnp.array(rand(kernel, kernel, 4, 6))
        ref = lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                       dimension_numbers=CONV_DIMS)
        got = fd.unfold_w(fd.conv2d_folded(fd.fold_w(x), w))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_conv_folded_gradients(self):
        x = jnp.array(rand(2, 6, 6, 3))
        w = jnp.array(rand(3, 3, 3, 5))

        def loss_ref(x, w):
            y = lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                         dimension_numbers=CONV_DIMS)
            return jnp.sum(jnp.tanh(y))

        def loss_fold(x, w):
            return jnp.sum(jnp.tanh(fd.conv2d_folded(fd.fold_w(x), w)))

        for a, b in zip(jax.grad(loss_fold, (0, 1))(x, w),
                        jax.grad(loss_ref, (0, 1))(x, w)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-5, atol=3e-5)

    def test_pixel_norm_folded(self):
        x = jnp.array(rand(2, 4, 6, 8))
        ref = ops.pixel_norm(x)
        got = fd.unfold_w(fd.pixel_norm_folded(fd.fold_w(x)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_adain_folded(self):
        x = jnp.array(rand(2, 4, 6, 8))
        ys = jnp.array(rand(2, 8, seed=1))
        yb = jnp.array(rand(2, 8, seed=2))
        ref = ops.adain(x, ys, yb)
        got = fd.unfold_w(fd.adain_folded(fd.fold_w(x), ys, yb))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("blur", [True, False])
    def test_upsample_folded(self, blur):
        x = jnp.array(rand(2, 5, 6, 3))
        ref = (ops.upsample_blur_2x(x) if blur
               else ops.upsample_nearest_2x(x))
        got = fd.unfold_w(fd.upsample_blur_2x_folded(x, blur=blur))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("blur", [True, False])
    def test_downsample_folded(self, blur):
        x = jnp.array(rand(2, 8, 10, 3))
        ref = (ops.blur_downsample_2x(x) if blur
               else ops.downsample_avg_2x(x))
        got = fd.blur_downsample_2x_folded(fd.fold_w(x), blur=blur)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_resample_folded_gradients(self):
        x = jnp.array(rand(2, 6, 6, 3))

        def loss_ref(x):
            y = ops.blur_downsample_2x(ops.upsample_blur_2x(x))
            return jnp.sum(jnp.sin(y))

        def loss_fold(x):
            y = fd.blur_downsample_2x_folded(
                fd.fold_w(fd.unfold_w(fd.upsample_blur_2x_folded(x))))
            return jnp.sum(jnp.sin(y))

        np.testing.assert_allclose(
            np.asarray(jax.grad(loss_fold)(x)),
            np.asarray(jax.grad(loss_ref)(x)), rtol=3e-5, atol=3e-5)


def _cfgs(model):
    kw = dict(model=model, resolution=32, latent_dim=16,
              fmap_base=128, fmap_max=16, mapping_layers=2)
    # fmap_max=16 <= fold_max_channels: EVERY block folds in the first cfg.
    return (ModelConfig(fold_width=True, fold_max_channels=64, **kw),
            ModelConfig(fold_width=False, **kw))


class TestFoldedModels:
    """fold_width changes layout only: same pytree, same outputs — incl.
    StyleGAN noise at matched seeds (the logical noise field is drawn in
    unfolded shape and folded)."""

    @pytest.mark.parametrize("model", ["progan", "stylegan"])
    @pytest.mark.slow
    def test_generator_matches(self, model):
        cfg_f, cfg_p = _cfgs(model)
        assert any(cfg_f.fold_block(lg) for lg in range(3, 6))
        g_f, _ = build_models(cfg_f)
        g_p, _ = build_models(cfg_p)
        params = g_p.init_all(jax.random.PRNGKey(0))
        assert jax.tree.structure(params) == jax.tree.structure(
            g_f.init_all(jax.random.PRNGKey(0)))
        z = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
        for lg, alpha in [(3, 0.4), (5, 1.0)]:
            kwargs = {"rngs": {"noise": jax.random.PRNGKey(2)}} \
                if model == "stylegan" else {}
            a = g_p.apply(params, z, res_log2=lg, alpha=alpha, **kwargs)
            b = g_f.apply(params, z, res_log2=lg, alpha=alpha, **kwargs)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("model", ["progan", "stylegan"])
    @pytest.mark.slow
    def test_discriminator_matches(self, model):
        cfg_f, cfg_p = _cfgs(model)
        _, d_f = build_models(cfg_f)
        _, d_p = build_models(cfg_p)
        params = d_p.init_all(jax.random.PRNGKey(0))
        img = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3))
        for lg, alpha in [(4, 0.6), (5, 1.0)]:
            x = jax.image.resize(img, (2, 2 ** lg, 2 ** lg, 3), "linear")
            a = d_p.apply(params, x, res_log2=lg, alpha=alpha)
            b = d_f.apply(params, x, res_log2=lg, alpha=alpha)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

    @pytest.mark.slow
    def test_discriminator_gradients_match(self):
        cfg_f, cfg_p = _cfgs("stylegan")
        _, d_f = build_models(cfg_f)
        _, d_p = build_models(cfg_p)
        params = d_p.init_all(jax.random.PRNGKey(0))
        img = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3))

        def loss(model, p):
            return jnp.sum(model.apply(p, img, res_log2=5, alpha=1.0))

        ga = jax.grad(lambda p: loss(d_p, p))(params)
        gb = jax.grad(lambda p: loss(d_f, p))(params)
        for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-4)
