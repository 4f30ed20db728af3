"""Portable StableHLO serving artifact (ganlab_tpu/export.py):
roundtrip parity with the live BatchSampler, fixed-batch padding,
traced psi, artifact metadata, and the CLI subcommand."""

import json
import zipfile

import numpy as np
import pytest
import jax

from ganlab_tpu.config import get_config
from ganlab_tpu.export import ExportedSampler, export_sampler
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
    wd = str(tmp_path_factory.mktemp("export"))
    tr = Trainer(cfg, workdir=wd, use_mesh=False)
    tr.train()
    state = tr.state
    tr.close()
    return cfg, wd, state


@pytest.fixture(scope="module")
def artifact(trained, tmp_path_factory):
    cfg, wd, state = trained
    path = str(tmp_path_factory.mktemp("artifact") / "sampler.ganlab.zip")
    # CPU-only: this suite runs on the CPU backend; the default
    # ("tpu", "cpu") is exercised in test_meta_platforms below.
    export_sampler(cfg, state, path, batch_size=4, platforms=("cpu",))
    return path


def test_roundtrip_matches_batch_sampler(trained, artifact):
    """The serialized program reproduces the live sampler's images
    (same seed, batch_size, noise stream) without model code."""
    cfg, wd, state = trained
    live = BatchSampler(cfg, state=state, batch_size=4)
    exported = ExportedSampler(artifact)
    a = live.generate(6, seed=7)
    b = exported.generate(6, seed=7)
    assert b.shape == (6, 16, 16, 3) and b.dtype == np.uint8
    # uint8 conversion happens in-graph in the artifact and on host in
    # BatchSampler; allow a 1-step truncation-boundary difference.
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1
    assert (a == b).mean() > 0.99


def test_index_stable_and_deterministic(artifact):
    s = ExportedSampler(artifact)
    a = s.generate(3, seed=5)
    b = s.generate(6, seed=5)
    np.testing.assert_array_equal(a, b[:3])
    np.testing.assert_array_equal(b, ExportedSampler(artifact).generate(
        6, seed=5))
    assert not np.array_equal(b, s.generate(6, seed=6))


def test_generate_from_z_and_psi(trained, artifact):
    cfg, wd, state = trained
    live = BatchSampler(cfg, state=state, batch_size=4)
    s = ExportedSampler(artifact)
    z = live.latents(6, seed=3)  # n not a multiple of batch: pad + trim
    a = live.generate_from_z(z, psi=0.3)
    b = s.generate_from_z(z, psi=0.3)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1
    # psi is traced: one program serves every truncation setting.
    assert not np.array_equal(b, s.generate_from_z(z, psi=1.0))


def test_meta_and_version_check(artifact, tmp_path):
    with zipfile.ZipFile(artifact) as zf:
        meta = json.loads(zf.read("meta.json"))
    assert meta["resolution"] == 16 and meta["batch_size"] == 4
    assert meta["platforms"] == ["cpu"]
    # Corrupt the version field -> loader refuses.
    bad = str(tmp_path / "bad.zip")
    with zipfile.ZipFile(artifact) as src, \
            zipfile.ZipFile(bad, "w") as dst:
        for name in src.namelist():
            data = src.read(name)
            if name == "meta.json":
                meta2 = json.loads(data)
                meta2["format_version"] = 99
                data = json.dumps(meta2).encode()
            dst.writestr(name, data)
    with pytest.raises(ValueError, match="version"):
        ExportedSampler(bad)


def test_meta_platforms_multi(trained, tmp_path):
    """The default artifact targets tpu AND cpu; it must load and run
    on this CPU backend."""
    cfg, wd, state = trained
    path = str(tmp_path / "multi.zip")
    export_sampler(cfg, state, path, batch_size=2)
    s = ExportedSampler(path)
    assert s.meta["platforms"] == ["tpu", "cpu"]
    imgs = s.generate(2, seed=0)
    assert imgs.shape == (2, 16, 16, 3)


def test_cli_export(trained, tmp_path, capsys):
    cfg, wd, state = trained
    from ganlab_tpu.cli import main

    out = str(tmp_path / "cli_artifact.zip")
    rc = main(["export", "--workdir", wd,
               "--out", out, "--batch", "4", "--platforms", "cpu",
               "--set", "model.resolution=16",
               "--set", "model.fmap_base=128",
               "--set", "model.fmap_max=16",
               "--set", "model.latent_dim=16",
               "--set", "model.mapping_layers=2",
               "--set", "run.compute_dtype=float32",
               "--set", "schedule.progressive=False",
               "--set", "schedule.batch_schedule={16: 4}",
               "--set", "data.dataset=synthetic"])
    assert rc == 0
    assert "exported:" in capsys.readouterr().out
    imgs = ExportedSampler(out).generate(2, seed=0)
    assert imgs.shape == (2, 16, 16, 3)
