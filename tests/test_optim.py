"""Optimizer construction (train/state.py::make_optimizers): the official
lazy-regularization Adam compensation (mb_ratio = k/(k+1)) and its
interaction with per-resolution lr multipliers."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ganlab_tpu.config import get_config
from ganlab_tpu.train.state import make_optimizers


def _one_update(opt, grad=0.1):
    p = {"w": jnp.ones((4,))}
    g = {"w": jnp.full((4,), grad)}
    st = opt.init(p)
    up, _ = opt.update(g, st, p)
    return float(np.asarray(up["w"][0]))


def test_lazy_adjust_scales_d_lr():
    cfg_eager = get_config("stylegan-256", **{"loss.penalty_every": 1})
    cfg_lazy = get_config("stylegan-256", **{"loss.penalty_every": 16})
    _, d_eager = make_optimizers(cfg_eager)
    _, d_lazy = make_optimizers(cfg_lazy)
    # First-step Adam update is ~ -lr * sign(g) regardless of beta, so the
    # ratio of updates exposes the lr scaling: 16/17.
    r = _one_update(d_lazy) / _one_update(d_eager)
    assert abs(r - 16.0 / 17.0) < 1e-3, r


def test_lazy_adjust_off_restores_raw():
    cfg = get_config("stylegan-256", **{"loss.penalty_every": 16,
                                        "optim.lazy_adjust": False})
    cfg_eager = get_config("stylegan-256", **{"loss.penalty_every": 1})
    _, d = make_optimizers(cfg)
    _, d_eager = make_optimizers(cfg_eager)
    assert abs(_one_update(d) - _one_update(d_eager)) < 1e-9


def test_g_adjust_follows_pl_every():
    cfg = get_config("stylegan2-256", **{"loss.pl_every": 4,
                                         "loss.penalty_every": 1})
    assert cfg.pl_active
    g, d = make_optimizers(cfg)
    cfg0 = cfg.replace(optim=cfg.optim.__class__(
        **{**cfg.optim.__dict__, "lazy_adjust": False}))
    g0, d0 = make_optimizers(cfg0)
    assert abs(_one_update(g) / _one_update(g0) - 4.0 / 5.0) < 1e-3
    assert abs(_one_update(d) - _one_update(d0)) < 1e-9  # k=1: no change


def test_no_penalty_means_no_adjustment():
    cfg = get_config("stylegan-256", **{"loss.penalty": "none",
                                        "loss.penalty_every": 16})
    cfg_raw = cfg.replace(optim=cfg.optim.__class__(
        **{**cfg.optim.__dict__, "lazy_adjust": False}))
    _, d = make_optimizers(cfg)
    _, d_raw = make_optimizers(cfg_raw)
    assert abs(_one_update(d) - _one_update(d_raw)) < 1e-9
