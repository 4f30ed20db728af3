"""StyleGAN2 extension: modulated conv oracle parity, model behavior,
trainer integration (models/stylegan2.py, ops/modulated.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import lax

from ganlab_tpu.config import ModelConfig, get_config
from ganlab_tpu.models import build_models
from ganlab_tpu.ops.modulated import modulated_conv2d
from ganlab_tpu.ops.upfirdn import CONV_DIMS


def rand(*shape, seed=0):
    return np.random.RandomState(seed + sum(shape)).randn(*shape).astype(
        np.float32)


class TestModulatedConv:
    """The activation-side formulation equals the per-sample-weight one."""

    @pytest.mark.parametrize("demod", [True, False])
    def test_matches_per_sample_weights(self, demod):
        n, ci, co, k = 3, 5, 7, 3
        x = jnp.array(rand(n, 6, 6, ci))
        w = jnp.array(rand(k, k, ci, co, seed=1))
        s = jnp.array(rand(n, ci, seed=2) * 0.5 + 1.0)

        got = modulated_conv2d(x, w, s, demodulate=demod,
                               gain=1.0, lr_mult=1.0)

        import math
        scale = 1.0 / math.sqrt(k * k * ci)
        outs = []
        for i in range(n):
            wi = w * scale * s[i][None, None, :, None]
            if demod:
                d = 1.0 / jnp.sqrt(
                    jnp.sum(jnp.square(wi), axis=(0, 1, 2)) + 1e-8)
                wi = wi * d[None, None, None, :]
            outs.append(lax.conv_general_dilated(
                x[i:i + 1], wi, (1, 1), "SAME",
                dimension_numbers=CONV_DIMS)[0])
        ref = jnp.stack(outs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("demod", [True, False])
    def test_matches_torch_oracle(self, demod):
        """Independent torch implementation: per-sample modulated weights
        through F.conv2d (the reference-style formulation)."""
        import math
        import torch
        import torch.nn.functional as F

        n, ci, co, k = 2, 4, 6, 3
        x = rand(n, 5, 5, ci)
        w = rand(k, k, ci, co, seed=1)
        s = rand(n, ci, seed=2) * 0.5 + 1.0

        got = modulated_conv2d(jnp.array(x), jnp.array(w), jnp.array(s),
                               demodulate=demod, gain=1.0, lr_mult=1.0)

        xt = torch.tensor(x).permute(0, 3, 1, 2)           # NCHW
        wt = torch.tensor(w).permute(3, 2, 0, 1)           # OIHW
        st = torch.tensor(s)
        scale = 1.0 / math.sqrt(k * k * ci)
        outs = []
        for i in range(n):
            wi = wt * scale * st[i][None, :, None, None]
            if demod:
                d = torch.rsqrt(wi.pow(2).sum(dim=(1, 2, 3)) + 1e-8)
                wi = wi * d[:, None, None, None]
            outs.append(F.conv2d(xt[i:i + 1], wi, padding=k // 2))
        ref = torch.cat(outs).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(got), ref,
                                   rtol=2e-4, atol=2e-4)

    def test_demodulated_output_unit_variance_scaleish(self):
        # Demodulation makes the output std independent of the style scale.
        x = jnp.array(rand(4, 16, 16, 8))
        w = jnp.array(rand(3, 3, 8, 8, seed=1))
        y1 = modulated_conv2d(x, w, jnp.ones((4, 8)))
        y2 = modulated_conv2d(x, w, jnp.full((4, 8), 10.0))
        s1 = float(jnp.std(y1))
        s2 = float(jnp.std(y2))
        assert abs(s1 - s2) / s1 < 0.05


class TestModulatedLayerGain:
    """ADVICE r2: demodulation cancels the He sqrt(2) folded into the conv
    weight, so ModulatedLayer must re-apply the official fused_bias_act
    lrelu gain sqrt(2) post-activation — without it activations decay
    ~0.65x per layer at init (std 1.0 -> ~0.08 after 6 layers)."""

    def test_activation_scale_preserved_through_deep_stack(self):
        from ganlab_tpu.models.stylegan2 import ModulatedLayer

        layer = ModulatedLayer(features=32)
        x = jnp.array(rand(8, 8, 8, 32, seed=3))
        w_vec = jnp.array(rand(8, 16, seed=4))
        stds = [float(jnp.std(x))]
        for i in range(6):
            p = layer.init(
                {"params": jax.random.PRNGKey(i),
                 "noise": jax.random.PRNGKey(100 + i)}, x, w_vec)
            x = layer.apply(p, x, w_vec,
                            rngs={"noise": jax.random.PRNGKey(200 + i)})
            stds.append(float(jnp.std(x)))
        # With the gain, per-layer std ratio hovers near 1 (lrelu(0.2) on a
        # demodulated unit-variance pre-activation has std ~1/sqrt(2), the
        # gain restores it); without it, std collapses to ~0.08x over 6
        # layers. Allow generous slack for the affine/bias/noise wiggle.
        assert stds[-1] / stds[0] > 0.5, stds
        assert stds[-1] / stds[0] < 2.0, stds

    def test_torgb_unit_gain(self):
        """The non-demodulated toRGB conv must use gain=1.0 (this
        codebase's and the official toRGB convention), not sqrt(2)."""
        from ganlab_tpu.models.stylegan2 import ToRGB

        torgb = ToRGB()
        x = jnp.array(rand(2, 8, 8, 16, seed=5))
        w_vec = jnp.array(rand(2, 12, seed=6))
        p = torgb.init({"params": jax.random.PRNGKey(0)}, x, w_vec)
        got = torgb.apply(p, x, w_vec)
        # Reproduce with the op directly at gain=1.0: the layer's output
        # must match the unit-gain formulation bit-for-bit (styles from
        # the layer's own affine).
        from ganlab_tpu.ops.modulated import modulated_conv2d as mc
        from ganlab_tpu.ops.equalized import equalized_dense

        ap = p["params"]["conv"]["affine"]
        s = equalized_dense(w_vec, ap["w"], ap["b"], gain=1.0)
        ref = mc(x, p["params"]["conv"]["w"], s,
                 demodulate=False, gain=1.0) + p["params"]["conv"]["b"]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def small_cfg(**over):
    kw = dict(model="stylegan2", resolution=32, latent_dim=16,
              fmap_base=128, fmap_max=16, mapping_layers=2, d_resnet=True)
    kw.update(over)
    return ModelConfig(**kw)


class TestStyleGAN2Model:
    def test_shapes_and_resnet_d(self):
        cfg = small_cfg()
        g, d = build_models(cfg)
        pg = g.init_all(jax.random.PRNGKey(0))
        pd = d.init_all(jax.random.PRNGKey(0))
        z = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
        img = g.apply(pg, z, rngs={"noise": jax.random.PRNGKey(2)})
        assert img.shape == (2, 32, 32, 3)
        score = d.apply(pd, img)
        assert score.shape == (2,)
        # resnet D has skip convs
        flat = jax.tree_util.tree_flatten_with_path(pd)[0]
        assert any("skip" in jax.tree_util.keystr(kp) for kp, _ in flat)

    def test_style_mixing_and_truncation_surface(self):
        from ganlab_tpu.models.stylegan import num_style_layers, truncate_ws

        cfg = small_cfg()
        g, _ = build_models(cfg)
        pg = g.init_all(jax.random.PRNGKey(0))
        z1 = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
        z2 = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
        a = g.apply(pg, z1, z2=z2, crossover=1,
                    rngs={"noise": jax.random.PRNGKey(3)})
        b = g.apply(pg, z1, z2=z2, crossover=num_style_layers(5),
                    rngs={"noise": jax.random.PRNGKey(3)})
        assert not np.allclose(np.asarray(a), np.asarray(b))
        # truncation toward w_avg changes the output
        w = g.apply(pg, z1, method="map_latents")
        ws = jnp.repeat(w[:, None, :], num_style_layers(5), axis=1)
        ws_t = truncate_ws(ws, jnp.zeros(16), 0.5, 8)
        ia = g.apply(pg, ws, method="synthesize",
                     rngs={"noise": jax.random.PRNGKey(3)})
        ib = g.apply(pg, ws_t, method="synthesize",
                     rngs={"noise": jax.random.PRNGKey(3)})
        assert not np.allclose(np.asarray(ia), np.asarray(ib))

    def test_skip_rgb_all_resolutions(self):
        cfg = small_cfg()
        g, d = build_models(cfg)
        pg = g.init_all(jax.random.PRNGKey(0))
        pd = d.init_all(jax.random.PRNGKey(0))
        z = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
        for lg in (2, 3, 4, 5):
            img = g.apply(pg, z, res_log2=lg,
                          rngs={"noise": jax.random.PRNGKey(2)})
            assert img.shape == (2, 2 ** lg, 2 ** lg, 3)
            assert d.apply(pd, img, res_log2=lg).shape == (2,)


class TestStyleGAN2Training:
    @pytest.mark.slow
    def test_preset_and_train_steps(self, tmp_path):
        from ganlab_tpu.train.loop import Trainer

        cfg = get_config("stylegan2-256", **{
            "model.resolution": 16, "model.latent_dim": 8,
            "model.fmap_base": 64, "model.fmap_max": 8,
            "model.mapping_layers": 2,
            "data.dataset": "synthetic",
            "loss.penalty_every": 2,
            "run.total_steps": 5, "run.log_every": 2,
            "run.checkpoint_every": 4, "run.sample_every": 0,
            "run.compute_dtype": "float32",
        })
        cfg = cfg.replace(schedule=cfg.schedule.__class__(
            progressive=False, batch_schedule={16: 4}))
        tr = Trainer(cfg, workdir=str(tmp_path), use_mesh=False)
        m = tr.train()
        assert np.isfinite(float(jax.device_get(m["d_loss"])))
        assert int(jax.device_get(tr.state.step)) == 5
        # EMA sampling path (truncation) works for the new family
        tr.save_samples(tag="t")
        tr.close()
