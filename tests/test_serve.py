"""Batch-inference serving API (ganlab_tpu/serve.py::BatchSampler):
checkpoint loading, fixed-batch padding, the index-stable determinism
contract, truncation, and interpolation endpoints."""

import numpy as np
import pytest
import jax

from ganlab_tpu.config import get_config
from ganlab_tpu.serve import BatchSampler


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """A tiny stylegan trained 2 steps with a saved checkpoint."""
    from ganlab_tpu.train.loop import Trainer

    cfg = get_config("stylegan-256", **{
        "model.resolution": 16,
        "model.fmap_base": 128,
        "model.fmap_max": 16,
        "model.latent_dim": 16,
        "model.mapping_layers": 2,
        "run.compute_dtype": "float32",
        "run.total_steps": 2, "run.log_every": 0,
        "run.sample_every": 0, "run.checkpoint_every": 0,
        "schedule.progressive": False,
        "schedule.batch_schedule": {16: 4},
        "schedule.total_kimg": 1.0,
        "loss.penalty_every": 1, "data.dataset": "synthetic",
    })
    wd = str(tmp_path_factory.mktemp("serve"))
    tr = Trainer(cfg, workdir=wd, use_mesh=False)
    tr.train()
    tr.close()
    return cfg, wd


def test_generate_shapes_and_dtype(trained):
    cfg, wd = trained
    s = BatchSampler(cfg, workdir=wd, batch_size=4).warmup()
    imgs = s.generate(6, seed=0)
    assert imgs.shape == (6, 16, 16, 3)
    assert imgs.dtype == np.uint8


def test_index_stable_determinism(trained):
    """generate(3) must be the prefix of generate(6): same seed, same
    batch_size => identical per-index images across request sizes."""
    cfg, wd = trained
    s = BatchSampler(cfg, workdir=wd, batch_size=4)
    a = s.generate(3, seed=7)
    b = s.generate(6, seed=7)
    np.testing.assert_array_equal(a, b[:3])
    # And repeatable.
    np.testing.assert_array_equal(b, s.generate(6, seed=7))
    # Different seed, different images.
    assert not np.array_equal(b, s.generate(6, seed=8))


def test_latents_match_generate(trained):
    """generate() == generate_from_z(latents()) for the first batch
    (same noise stream position)."""
    cfg, wd = trained
    s = BatchSampler(cfg, workdir=wd, batch_size=4)
    z = s.latents(4, seed=3)
    assert z.shape == (4, 16)
    # Index stability of the latent stream itself.
    np.testing.assert_array_equal(z[1:3], s.latents(2, seed=3, start=1))


def test_truncation_psi_changes_output(trained):
    cfg, wd = trained
    s = BatchSampler(cfg, workdir=wd, batch_size=4)
    a = s.generate(4, seed=0, psi=1.0)
    b = s.generate(4, seed=0, psi=0.2)
    assert not np.array_equal(a, b)


def test_interpolate_endpoints(trained):
    cfg, wd = trained
    s = BatchSampler(cfg, workdir=wd, batch_size=4)
    frames = s.interpolate(seed_a=0, seed_b=1, steps=5)
    assert frames.shape == (5, 16, 16, 3)
    za = s.latents(1, seed=0)
    ends = s.generate_from_z(za)
    # slerp(t=0) == za exactly, same noise stream position 0.
    np.testing.assert_array_equal(frames[0], ends[0])


def test_save_grid_and_missing_checkpoint(trained, tmp_path):
    cfg, wd = trained
    s = BatchSampler(cfg, workdir=wd, batch_size=4)
    p = s.save_grid(str(tmp_path / "g.png"), n=4)
    import os

    assert os.path.exists(p)
    with pytest.raises(FileNotFoundError):
        BatchSampler(cfg, workdir=str(tmp_path / "empty"))
    with pytest.raises(ValueError):
        BatchSampler(cfg)  # neither workdir nor state
