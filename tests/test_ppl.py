"""Perceptual path length (eval/ppl.py) + the LPIPS-VGG16 port
(eval/lpips.py).

The reference has no quality metrics (SURVEY.md §5); PPL is the
StyleGAN papers' second headline metric next to FID. The VGG16 forward
is proven against an independently-written torch oracle with SHARED
random weights — the same pattern that validated the FID InceptionV3
port (tests/torch_inception_oracle.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ganlab_tpu.config import get_config
from ganlab_tpu.eval.lpips import (
    LPIPSDistance,
    _random_vgg_params,
    lpips_distance,
    vgg_features,
)
from ganlab_tpu.eval.ppl import compute_ppl
from ganlab_tpu.models import build_models

TINY_STYLE = {
    "model.resolution": 32, "model.fmap_base": 128, "model.fmap_max": 32,
    "model.latent_dim": 16, "model.mapping_layers": 2,
    "schedule.progressive": False, "schedule.start_res": 32,
    "run.compute_dtype": "float32",
}


class _SmallDist:
    """Cheap stand-in distance: downsampled MSE (keeps PPL tests fast
    and resolution-independent)."""

    pretrained = True  # silence the fallback warning in tests

    def __call__(self, x, y):
        d = np.asarray(x, np.float32) - np.asarray(y, np.float32)
        return (d ** 2).mean(axis=(1, 2, 3))


def _torch_vgg_forward(params, x_nhwc):
    """Independent torch implementation of the VGG16 tap forward."""
    import torch
    import torch.nn.functional as F

    from ganlab_tpu.eval.lpips import _SCALE, _SHIFT, _TAP_CONVS, _VGG_CFG

    h = torch.from_numpy(np.asarray(x_nhwc, np.float32)).permute(0, 3, 1, 2)
    shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_SCALE).view(1, 3, 1, 1)
    h = (h - shift) / scale
    feats, i = [], 0
    for v in _VGG_CFG:
        if v == "M":
            h = F.max_pool2d(h, 2, 2)
            continue
        w = torch.from_numpy(
            np.asarray(params[f"w{i}"]).transpose(3, 2, 0, 1)).contiguous()
        b = torch.from_numpy(np.asarray(params[f"b{i}"]))
        h = F.relu(F.conv2d(h, w, b, padding=1))
        if i in _TAP_CONVS:
            feats.append(h.permute(0, 2, 3, 1).numpy())
        i += 1
    return feats


@pytest.mark.slow
def test_vgg_forward_matches_torch_oracle():
    params = _random_vgg_params(seed=3)
    x = np.random.default_rng(0).uniform(-1, 1, (2, 64, 64, 3)) \
        .astype(np.float32)
    ours = vgg_features(params, jnp.asarray(x))
    torch_feats = _torch_vgg_forward(params, x)
    assert len(ours) == len(torch_feats) == 5
    for a, b in zip(ours, torch_feats):
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(np.asarray(a) / scale, b / scale,
                                   atol=2e-5)


@pytest.mark.slow
def test_lpips_distance_properties():
    params = _random_vgg_params(seed=1)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    d_xy = np.asarray(lpips_distance(params, x, y))
    assert d_xy.shape == (2,) and (d_xy > 0).all()
    # identical inputs -> exactly zero; symmetric
    np.testing.assert_array_equal(
        np.asarray(lpips_distance(params, x, x)), np.zeros(2))
    np.testing.assert_allclose(
        np.asarray(lpips_distance(params, y, x)), d_xy, rtol=1e-5)
    # a small perturbation is perceptually closer than an unrelated image
    d_near = np.asarray(lpips_distance(params, x, x + 0.01))
    assert (d_near < d_xy).all()


def test_ppl_w_space_runs():
    cfg = get_config("stylegan-256", **TINY_STYLE)
    g, _ = build_models(cfg.model)
    params = g.init_all(jax.random.PRNGKey(0))
    out = compute_ppl(cfg, params, num_samples=8, batch=4,
                      distance=_SmallDist(), seed=0)
    assert np.isfinite(out["ppl"]) and out["ppl"] >= 0
    assert out["num"] == 8 and out["space"] == "w"
    # 'end' sampling and z-space also compile and run
    out_end = compute_ppl(cfg, params, num_samples=4, batch=4,
                          sampling="end", distance=_SmallDist(), seed=0)
    assert np.isfinite(out_end["ppl"])
    out_z = compute_ppl(cfg, params, num_samples=4, batch=4, space="z",
                        distance=_SmallDist(), seed=0)
    assert np.isfinite(out_z["ppl"])


def test_ppl_epsilon_invariance_on_smooth_generator():
    """d/eps^2 normalizes the step size: on an (approximately linear over
    eps) generator, halving eps must leave PPL nearly unchanged."""
    cfg = get_config("stylegan-256", **TINY_STYLE)
    g, _ = build_models(cfg.model)
    params = g.init_all(jax.random.PRNGKey(0))
    a = compute_ppl(cfg, params, num_samples=16, batch=8, epsilon=1e-3,
                    distance=_SmallDist(), seed=5)["ppl"]
    b = compute_ppl(cfg, params, num_samples=16, batch=8, epsilon=5e-4,
                    distance=_SmallDist(), seed=5)["ppl"]
    assert a > 0
    np.testing.assert_allclose(a, b, rtol=0.05)


def test_ppl_z_space_on_non_style_family():
    cfg = get_config("resnetgan-cifar10", **{"model.fmap_base": 64,
                                             "model.latent_dim": 16,
                                             "run.compute_dtype":
                                                 "float32"})
    g, _ = build_models(cfg.model)
    params = g.init_all(jax.random.PRNGKey(0))
    out = compute_ppl(cfg, params, num_samples=4, batch=4, space="z",
                      distance=_SmallDist(), seed=0)
    assert np.isfinite(out["ppl"])
    with pytest.raises(ValueError):
        compute_ppl(cfg, params, space="w", distance=_SmallDist())


def test_random_fallback_distance_smoke():
    # default distance (random VGG) end-to-end at the minimum legal res
    d = LPIPSDistance(seed=0)
    assert not d.pretrained
    x = np.random.default_rng(2).uniform(-1, 1, (2, 32, 32, 3))
    out = d(x, -x)
    assert out.shape == (2,) and np.isfinite(out).all() and (out > 0).all()


def test_cli_eval_ppl_and_metrics_merge(tmp_path):
    """`ganlab eval-ppl` and `eval-fid --metrics ppl` run end-to-end on
    a tiny trained workdir — including the sub-32px LPIPS resize guard
    (resolution 16 < VGG16's five-pool minimum)."""
    from ganlab_tpu.cli import main

    workdir = str(tmp_path / "run")
    common = [
        "--set", "model.resolution=16", "--set", "model.latent_dim=8",
        "--set", "model.base_channels=8",
        "--set", "run.compute_dtype=float32",
        "--set", "schedule.batch_schedule={16: 4}",
        "--set", "schedule.total_kimg=0.1",
        "--set", "data.dataset=synthetic",
    ]
    assert main(["train", "--preset", "resnetgan-cifar10", "--workdir",
                 workdir, "--max-steps", "1", "--no-mesh", *common]) == 0
    assert main(["eval-ppl", "--preset", "resnetgan-cifar10",
                 "--workdir", workdir, "--num-samples", "4",
                 "--space", "z", *common]) == 0
    # eval-fid's ppl merge auto-selects z-space for non-style families
    assert main(["eval-fid", "--preset", "resnetgan-cifar10",
                 "--workdir", workdir, "--num-samples", "8",
                 "--metrics", "ppl", *common]) == 0
