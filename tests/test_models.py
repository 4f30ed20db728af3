"""Model unit tests: shapes per phase, parameter counts, channel rule,
noise/style determinism (SURVEY.md 4, unit (model))."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ganlab_tpu.config import ModelConfig, get_config
from ganlab_tpu.models import build_models
from ganlab_tpu.models.stylegan import num_style_layers


def count(params):
    return sum(x.size for x in jax.tree.leaves(params))


class TestChannelRule:
    def test_progan_nf_table(self):
        # ProGAN channel rule with the paper's fmap_base=8192, fmap_max=512:
        # resolutions 4..1024 -> 512,512,512,512,256,128,64,32,16.
        cfg = ModelConfig(model="progan", resolution=1024)
        got = [cfg.nf(stage) for stage in range(1, 10)]
        assert got == [512, 512, 512, 512, 256, 128, 64, 32, 16]


class TestShapesAcrossPhases:
    @pytest.mark.parametrize("model", ["progan", "stylegan"])
    def test_generator_all_resolutions(self, model):
        cfg = ModelConfig(model=model, resolution=32, latent_dim=16,
                          fmap_base=128, fmap_max=16, mapping_layers=2)
        g, d = build_models(cfg)
        pg = g.init_all(jax.random.PRNGKey(0))
        pd = d.init_all(jax.random.PRNGKey(0))
        z = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
        for lg in range(2, 6):
            kwargs = {"rngs": {"noise": jax.random.PRNGKey(2)}} \
                if model == "stylegan" else {}
            img = g.apply(pg, z, res_log2=lg, alpha=0.7, **kwargs)
            assert img.shape == (2, 2 ** lg, 2 ** lg, 3)
            scores = d.apply(pd, img, res_log2=lg, alpha=0.7)
            assert scores.shape == (2,)

    def test_full_pytree_created_at_init(self):
        """Every resolution's blocks and heads exist regardless of phase."""
        cfg = ModelConfig(model="progan", resolution=64, fmap_base=128,
                          fmap_max=16, latent_dim=16)
        g, d = build_models(cfg)
        pg = g.init_all(jax.random.PRNGKey(0))["params"]
        pd = d.init_all(jax.random.PRNGKey(0))["params"]
        for res in (8, 16, 32, 64):
            assert f"block{res}" in pg, sorted(pg)
            assert f"torgb{res}" in pg
            assert f"block{res}" in pd
            assert f"fromrgb{res}" in pd
        assert "torgb4" in pg and "fromrgb4" in pd and "block4_out" in pd


class TestFusedUpConv:
    """model.fused_up_conv changes evaluation order only: same param
    pytree, same outputs (fade-in phases included), for both G families."""

    @pytest.mark.parametrize("model", ["progan", "stylegan"])
    @pytest.mark.slow
    def test_generator_matches_unfused(self, model):
        kw = dict(model=model, resolution=32, latent_dim=16,
                  fmap_base=128, fmap_max=16, mapping_layers=2)
        g_fused, _ = build_models(ModelConfig(fused_up_conv=True, **kw))
        g_plain, _ = build_models(ModelConfig(fused_up_conv=False, **kw))
        params = g_plain.init_all(jax.random.PRNGKey(0))
        assert jax.tree.structure(params) == jax.tree.structure(
            g_fused.init_all(jax.random.PRNGKey(0)))
        z = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
        for lg, alpha in [(3, 0.4), (5, 1.0)]:
            kwargs = {"rngs": {"noise": jax.random.PRNGKey(2)}} \
                if model == "stylegan" else {}
            a = g_plain.apply(params, z, res_log2=lg, alpha=alpha, **kwargs)
            b = g_fused.apply(params, z, res_log2=lg, alpha=alpha, **kwargs)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)


class TestParamCounts:
    @pytest.mark.slow
    def test_stylegan_256_flagship_scale(self):
        """The flagship 256^2 StyleGAN pair lands at the expected scale
        (~26M params each with the paper's channel rule) — a regression
        guard on the architecture wiring."""
        cfg = get_config("stylegan-256").model
        g, d = build_models(cfg)
        n_g = count(g.init_all(jax.random.PRNGKey(0)))
        n_d = count(d.init_all(jax.random.PRNGKey(0)))
        assert 20e6 < n_g < 32e6, n_g
        assert 20e6 < n_d < 32e6, n_d

    def test_mapping_network_size(self):
        # 8 FC layers of 512x512 (+bias) ~= 2.1M params.
        cfg = get_config("stylegan-256").model
        from ganlab_tpu.models.stylegan import MappingNetwork

        m = MappingNetwork(cfg)
        params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 512)))
        n = count(params)
        assert abs(n - 8 * (512 * 512 + 512)) < 1000, n


class TestStyleGANBehavior:
    def _small(self):
        cfg = ModelConfig(model="stylegan", resolution=16, latent_dim=16,
                          fmap_base=128, fmap_max=16, mapping_layers=2)
        g, _ = build_models(cfg)
        return cfg, g, g.init_all(jax.random.PRNGKey(0))

    def test_noise_rng_changes_output(self):
        cfg, g, pg = self._small()
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 16))
        a = g.apply(pg, z, rngs={"noise": jax.random.PRNGKey(2)})
        b = g.apply(pg, z, rngs={"noise": jax.random.PRNGKey(3)})
        c = g.apply(pg, z, rngs={"noise": jax.random.PRNGKey(2)})
        # noise scales init to zero -> identical until trained; the RNG path
        # itself must be deterministic.
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_noise_scale_nonzero_changes_output(self):
        cfg, g, pg = self._small()
        # Force nonzero noise scales.
        import flax

        pg = flax.core.unfreeze(pg) if hasattr(flax.core, "unfreeze") else pg
        pg = jax.tree.map(lambda x: x + 0.1 if x.ndim == 1 else x, pg)
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 16))
        a = g.apply(pg, z, rngs={"noise": jax.random.PRNGKey(2)})
        b = g.apply(pg, z, rngs={"noise": jax.random.PRNGKey(3)})
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_style_layer_count(self):
        assert num_style_layers(2) == 2
        assert num_style_layers(8) == 14   # 256^2
        assert num_style_layers(10) == 18  # 1024^2

    def test_mixing_crossover_extremes(self):
        cfg, g, pg = self._small()
        z1 = jax.random.normal(jax.random.PRNGKey(1), (1, 16))
        z2 = jax.random.normal(jax.random.PRNGKey(2), (1, 16))
        k = {"rngs": {"noise": jax.random.PRNGKey(3)}}
        nl = num_style_layers(cfg.res_log2)
        only_z1 = g.apply(pg, z1, z2=z2, crossover=jnp.int32(nl), **k)
        pure_z1 = g.apply(pg, z1, **k)
        np.testing.assert_allclose(np.asarray(only_z1), np.asarray(pure_z1),
                                   rtol=1e-5, atol=1e-6)
        only_z2 = g.apply(pg, z1, z2=z2, crossover=jnp.int32(0), **k)
        pure_z2 = g.apply(pg, z2, **k)
        np.testing.assert_allclose(np.asarray(only_z2), np.asarray(pure_z2),
                                   rtol=1e-5, atol=1e-6)


def test_stylegan_remat_preserves_values():
    """SynthesisBlock remat must not change generator outputs."""
    outs = []
    for remat in (False, True):
        cfg = ModelConfig(model="stylegan", resolution=16, latent_dim=16,
                          fmap_base=128, fmap_max=16, mapping_layers=2,
                          remat=remat)
        g, _ = build_models(cfg)
        pg = g.init_all(jax.random.PRNGKey(4))
        z = jax.random.normal(jax.random.PRNGKey(5), (2, 16))
        img = g.apply(pg, z, rngs={"noise": jax.random.PRNGKey(6)})
        outs.append(np.asarray(img))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6, atol=1e-6)


class TestStaticAlphaFastPath:
    """alpha=1.0 (static Python float, stabilize phases) must produce
    bitwise the same outputs as the traced-alpha fade program at 1.0 —
    it skips the dead fade branch entirely (HBM + compute win; XLA cannot
    DCE 0*old_head)."""

    def test_progan_g_and_d_match(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from ganlab_tpu.config import ModelConfig
        from ganlab_tpu.models import build_models

        cfg = ModelConfig(model="progan", resolution=16, latent_dim=8,
                          fmap_base=64, fmap_max=8)
        g, d = build_models(cfg)
        pg, pd = g.init_all(jax.random.PRNGKey(0)), d.init_all(
            jax.random.PRNGKey(1))
        z = jax.random.normal(jax.random.PRNGKey(2), (2, 8))
        img_static = g.apply(pg, z, 4, 1.0)
        img_traced = jax.jit(
            lambda p, z_, a: g.apply(p, z_, 4, a))(pg, z, jnp.float32(1.0))
        np.testing.assert_allclose(np.asarray(img_static),
                                   np.asarray(img_traced), atol=1e-6)
        s_static = d.apply(pd, img_static, 4, 1.0)
        s_traced = jax.jit(
            lambda p, x, a: d.apply(p, x, 4, a))(pd, img_static,
                                                 jnp.float32(1.0))
        np.testing.assert_allclose(np.asarray(s_static),
                                   np.asarray(s_traced), atol=1e-5)

    def test_stylegan_synthesis_matches(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from ganlab_tpu.config import ModelConfig
        from ganlab_tpu.models import build_models

        cfg = ModelConfig(model="stylegan", resolution=16, latent_dim=8,
                          fmap_base=64, fmap_max=8, mapping_layers=2)
        g, _ = build_models(cfg)
        pg = g.init_all(jax.random.PRNGKey(0))
        z = jax.random.normal(jax.random.PRNGKey(2), (2, 8))
        key = jax.random.PRNGKey(3)
        a = jax.jit(lambda p, z_: g.apply(p, z_, 4, 1.0,
                                          rngs={"noise": key}))(pg, z)
        b = jax.jit(lambda p, z_, al: g.apply(p, z_, 4, al,
                                              rngs={"noise": key}))(
            pg, z, jnp.float32(1.0))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
