"""Latent projection (image -> latent inversion).

The reference has no projector (SURVEY.md section 2.2 lists none); this
is a beyond-reference capability mirroring the official StyleGAN2
projector surface. Tests run the whole compiled-scan optimization on
tiny models and assert the loss actually collapses toward the target.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganlab_tpu.config import get_config
from ganlab_tpu.models import build_models
from ganlab_tpu.models.stylegan import num_style_layers
from ganlab_tpu.utils.projector import load_image, project, pyramid_loss

TINY_STYLE = {
    "model.resolution": 16, "model.fmap_base": 128, "model.fmap_max": 32,
    "model.latent_dim": 16, "model.mapping_layers": 2,
    "run.compute_dtype": "float32",
}


def _style_target(cfg, params, batch=2, seed=7):
    """Synthesize a target from known latents (fixed noise is irrelevant at
    init: noise-injection scales initialize to zero)."""
    g, _ = build_models(cfg.model)
    z = jax.random.normal(jax.random.PRNGKey(seed),
                          (batch, cfg.model.latent_dim))
    w = g.apply(params, z, method="map_latents")
    ws = jnp.repeat(w[:, None, :], num_style_layers(cfg.model.res_log2), 1)
    img = g.apply(params, ws, cfg.model.res_log2, 1.0, method="synthesize",
                  rngs={"noise": jax.random.PRNGKey(0)})
    return np.asarray(img, np.float32)


def test_project_recovers_stylegan_image():
    cfg = get_config("stylegan-256", **TINY_STYLE)
    g, _ = build_models(cfg.model)
    params = g.init_all(jax.random.PRNGKey(0))
    target = _style_target(cfg, params)
    w_avg = jnp.zeros((cfg.model.latent_dim,))

    res = project(cfg, params, w_avg, target, num_steps=200, seed=0)
    losses = np.asarray(res.losses)
    assert losses.shape == (200,)
    assert res.is_w_space
    nl = num_style_layers(cfg.model.res_log2)
    assert res.latents.shape == (2, nl, cfg.model.latent_dim)
    # The optimization must make real progress toward the target...
    assert losses[-1] < 0.2 * losses[0]
    # ...and the reconstruction must be close in plain MSE.
    mse = float(np.mean((np.asarray(res.images) - target) ** 2))
    assert mse < 0.05, mse


def test_project_shared_w_and_stylegan2():
    cfg = get_config("stylegan2-256", **TINY_STYLE)
    g, _ = build_models(cfg.model)
    params = g.init_all(jax.random.PRNGKey(1))
    target = _style_target(cfg, params, batch=1, seed=3)
    w_avg = jnp.zeros((cfg.model.latent_dim,))

    res = project(cfg, params, w_avg, target, num_steps=60, w_plus=False,
                  seed=0)
    nl = num_style_layers(cfg.model.res_log2)
    # Shared-W result is broadcast to per-layer form for downstream use.
    assert res.latents.shape == (1, nl, cfg.model.latent_dim)
    assert np.asarray(res.losses)[-1] < np.asarray(res.losses)[0]


def test_project_z_space_resnetgan():
    cfg = get_config("resnetgan-cifar10", **{
        "model.resolution": 16, "model.latent_dim": 8,
        "model.base_channels": 8, "run.compute_dtype": "float32"})
    g, _ = build_models(cfg.model)
    params = g.init_all(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(5), (2, 8))
    target = np.asarray(g.apply(params, z), np.float32)

    res = project(cfg, params, jnp.zeros((8,)), target, num_steps=150,
                  lr=0.05, seed=0)
    assert not res.is_w_space
    assert res.latents.shape == (2, 8)
    losses = np.asarray(res.losses)
    assert losses[-1] < 0.2 * losses[0]


def test_pyramid_loss_zero_on_identical():
    img = jnp.ones((1, 16, 16, 3)) * 0.3
    assert float(pyramid_loss(img, img)) == 0.0
    assert float(pyramid_loss(img, -img)) > 0.0


def test_cli_mixgrid(tmp_path):
    from PIL import Image

    from ganlab_tpu.cli import main

    workdir = str(tmp_path / "run")
    out = str(tmp_path / "mix.png")
    rc = main([
        "mixgrid", "--preset", "stylegan-256",
        "--workdir", workdir, "--num", "2", "--crossover", "2",
        "--out", out,
        "--set", "model.resolution=16",
        "--set", "model.fmap_base=128",
        "--set", "model.fmap_max=32",
        "--set", "model.latent_dim=16",
        "--set", "model.mapping_layers=2",
        "--set", "run.compute_dtype=float32",
    ])
    assert rc == 0
    img = np.asarray(Image.open(out))
    # (num+1) x (num+1) grid of 16x16 tiles with 2px padding.
    side = 3 * 16 + 2 * 2
    assert img.shape == (side, side, 3)


def test_cli_interpolate(tmp_path):
    from ganlab_tpu.cli import main

    workdir = str(tmp_path / "run")
    rc = main([
        "interpolate", "--preset", "stylegan-256",
        "--workdir", workdir, "--anchors", "2", "--steps", "3",
        "--set", "model.resolution=16",
        "--set", "model.fmap_base=128",
        "--set", "model.fmap_max=32",
        "--set", "model.latent_dim=16",
        "--set", "model.mapping_layers=2",
        "--set", "run.compute_dtype=float32",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(workdir, "samples",
                                       "interpolation.png"))


def test_cli_project(tmp_path):
    from PIL import Image

    from ganlab_tpu.cli import main

    png = str(tmp_path / "target.png")
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (20, 24, 3), np.uint8)).save(png)

    workdir = str(tmp_path / "run")
    out = str(tmp_path / "proj")
    rc = main([
        "project", "--preset", "stylegan-256",
        "--workdir", workdir, "--images", png, png,
        "--steps", "10", "--out", out,
        "--set", "model.resolution=16",
        "--set", "model.fmap_base=128",
        "--set", "model.fmap_max=32",
        "--set", "model.latent_dim=16",
        "--set", "model.mapping_layers=2",
        "--set", "run.compute_dtype=float32",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "pairs.png"))
    lat = np.load(os.path.join(out, "latents.npy"))
    assert lat.shape == (2, num_style_layers(4), 16)
    # load_image center-crops to square and resizes.
    assert load_image(png, 16).shape == (16, 16, 3)


def test_noise_regularizer_oracle():
    """Numpy oracle of the official rolled-autocorrelation pyramid penalty
    (sum over maps and octaves of mean(n*roll_x(n))^2 + mean(n*roll_y)^2,
    downsampled 2x until < 8), and its key property: white noise scores
    ~0 while a smooth (signal-bearing) map scores large."""
    from ganlab_tpu.utils.projector import noise_regularizer

    rng = np.random.RandomState(0)
    n = rng.standard_normal((2, 16, 16, 1)).astype(np.float32)

    def oracle(x):
        reg = 0.0
        while True:
            reg += (x * np.roll(x, 1, axis=2)).mean() ** 2
            reg += (x * np.roll(x, 1, axis=1)).mean() ** 2
            if x.shape[1] <= 8:
                break
            b, h, w, c = x.shape
            x = x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
        return reg

    got = float(noise_regularizer([jnp.asarray(n)]))
    assert got == pytest.approx(oracle(n), rel=1e-5)

    smooth = np.tile(np.linspace(-1, 1, 16, dtype=np.float32)[None, :, None,
                                                              None],
                     (2, 1, 16, 1)).transpose(0, 2, 1, 3)
    smooth = (smooth - smooth.mean()) / smooth.std()
    assert float(noise_regularizer([jnp.asarray(smooth)])) > 100 * got


def test_explicit_noises_make_synthesis_deterministic():
    """synthesize(ws, noises=...) must be a pure function of its inputs
    for BOTH style families (different rng keys, same explicit noise =>
    identical images), including the remat'd block path."""
    from ganlab_tpu.models import stylegan as sg
    from ganlab_tpu.models import stylegan2 as sg2

    for preset, shapes_fn, extra in (
            ("stylegan-256", sg.noise_shapes, {"model.remat": True}),
            ("stylegan2-256", sg2.noise_shapes, {})):
        cfg = get_config(preset, **{**TINY_STYLE, **extra})
        g, _ = build_models(cfg.model)
        params = g.init_all(jax.random.PRNGKey(0))
        lg = cfg.model.res_log2
        nl = num_style_layers(lg)
        ws = jnp.repeat(jax.random.normal(jax.random.PRNGKey(1),
                                          (2, cfg.model.latent_dim))
                        [:, None, :], nl, 1)
        noises = [jax.random.normal(jax.random.PRNGKey(10 + i), (2, h, w, 1))
                  for i, (h, w) in enumerate(shapes_fn(lg))]
        a = g.apply(params, ws, lg, 1.0, noises, method="synthesize",
                    rngs={"noise": jax.random.PRNGKey(2)})
        b = g.apply(params, ws, lg, 1.0, noises, method="synthesize",
                    rngs={"noise": jax.random.PRNGKey(3)})
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_project_optimize_noise_recovers_noise_bearing_target():
    """VERDICT r3 #8: with nonzero noise-injection strengths, a target
    synthesized with SPECIFIC noise cannot be matched by latent-only
    descent — optimize_noise must reconstruct measurably better."""
    import dataclasses as dc

    cfg = get_config("stylegan-256", **TINY_STYLE)
    g, _ = build_models(cfg.model)
    params = g.init_all(jax.random.PRNGKey(0))
    # Give every noise layer real influence (init is zero strength).
    params = jax.tree_util.tree_map_with_path(
        lambda path, x: jnp.full_like(x, 0.25)
        if any(getattr(p, "key", None) == "noise" for p in path) else x,
        params)
    target = _style_target(cfg, params)
    w_avg = jnp.zeros((cfg.model.latent_dim,))

    common = dict(num_steps=250, seed=0, num_restarts=4, num_candidates=16)
    base = project(cfg, params, w_avg, target, **common)
    opt = project(cfg, params, w_avg, target, optimize_noise=True, **common)

    mse_base = float(np.mean((np.asarray(base.images) - target) ** 2))
    mse_opt = float(np.mean((np.asarray(opt.images) - target) ** 2))
    assert opt.noises is not None and base.noises is None
    assert len(opt.noises) == len(
        __import__("ganlab_tpu.models.stylegan", fromlist=["noise_shapes"])
        .noise_shapes(cfg.model.res_log2))
    assert opt.noises[0].shape[0] == 2          # best restart per target
    # Latent-only descent cannot represent the target's noise realization;
    # noise optimization reconstructs several-fold better (measured at the
    # default noise_weight: 0.098 vs 0.61).
    assert mse_opt < 0.5 * mse_base, (mse_opt, mse_base)
