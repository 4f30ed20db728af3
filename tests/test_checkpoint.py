"""Checkpoint/resume: orbax save -> restore -> bitwise-equal continuation
(SURVEY.md 4)."""

import numpy as np
import jax

from ganlab_tpu.config import get_config
from ganlab_tpu.parallel import make_single_step
from ganlab_tpu.train.checkpoint import CheckpointManager
from ganlab_tpu.train.schedule import build_phases
from ganlab_tpu.train.state import create_train_state
from ganlab_tpu.train.steps import build_train_step


def tiny_config():
    return get_config("resnetgan-cifar10", **{
        "model.resolution": 16, "model.latent_dim": 16,
        "model.base_channels": 8, "run.compute_dtype": "float32",
        "schedule.batch_schedule": {16: 4}, "schedule.total_kimg": 1.0,
    })


def fake_batch(n=4, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (n, 16, 16, 3), dtype=np.uint8)


def test_save_restore_roundtrip_bitwise(tmp_path):
    cfg = tiny_config()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    mgr.save(0, jax.device_get(state))
    mgr.wait()

    template = create_train_state(cfg, jax.random.PRNGKey(42))  # different
    restored = mgr.restore(template)
    assert restored is not None
    for a, b in zip(jax.tree.leaves(jax.device_get(state)),
                    jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_resume_continuation_equals_uninterrupted(tmp_path):
    """train 2 steps, checkpoint, train 2 more — must equal 4 straight steps."""
    cfg = tiny_config()
    phase = build_phases(cfg.schedule, cfg.model)[-1]
    step = make_single_step(build_train_step(cfg, phase))
    batches = [fake_batch(seed=i) for i in range(4)]

    # Uninterrupted run.
    s = create_train_state(cfg, jax.random.PRNGKey(1))
    for b in batches:
        s, _ = step(s, b)
    straight = jax.device_get(s)

    # Interrupted run.
    s = create_train_state(cfg, jax.random.PRNGKey(1))
    for b in batches[:2]:
        s, _ = step(s, b)
    mgr = CheckpointManager(str(tmp_path / "ckpt2"), keep=1)
    mgr.save(2, jax.device_get(s))
    mgr.wait()

    template = create_train_state(cfg, jax.random.PRNGKey(99))
    resumed = mgr.restore(template)
    assert int(resumed.step) == 2
    for b in batches[2:]:
        resumed, _ = step(resumed, b)
    resumed = jax.device_get(resumed)

    for a, b in zip(jax.tree.leaves(straight), jax.tree.leaves(resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_keep_last_k(tmp_path):
    cfg = tiny_config()
    state = jax.device_get(create_train_state(cfg, jax.random.PRNGKey(0)))
    mgr = CheckpointManager(str(tmp_path / "ckpt3"), keep=2)
    for i in range(4):
        mgr.save(i, state)
    mgr.wait()
    assert mgr.latest_step() == 3
    restored = mgr.restore(state, step=3)
    assert restored is not None
    mgr.close()
