"""Data-parallel correctness on 8 fake CPU devices (SURVEY.md 4).

* the shard_map step runs over a 1-D mesh with the batch sharded and the
  state replicated;
* the returned state is replica-identical (probed by gathering a per-device
  fingerprint through an explicitly sharded output);
* with identical per-device data and RNG, the DP step equals the
  single-device step exactly (validates psum placement: a mean of identical
  per-device gradients must reproduce the local gradient).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ganlab_tpu.config import get_config
from ganlab_tpu.parallel import (
    make_mesh,
    make_parallel_step,
    make_single_step,
    replicate,
    shard_batch,
)
from ganlab_tpu.train.schedule import build_phases
from ganlab_tpu.train.state import create_train_state
from ganlab_tpu.train.steps import build_train_step


def tiny_config(model="resnetgan"):
    presets = {"resnetgan": "resnetgan-cifar10", "stylegan": "stylegan-256"}
    return get_config(presets[model], **{
        "model.resolution": 16,
        "model.fmap_base": 256,
        "model.fmap_max": 32,
        "model.latent_dim": 32,
        "model.base_channels": 16,
        "model.mapping_layers": 2,
        "run.compute_dtype": "float32",
        "schedule.batch_schedule": {16: 2},
        "schedule.total_kimg": 1.0,
    })


def fake_batch(n, res, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(n, res, res, 3), dtype=np.uint8)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() == 8, "conftest must fake 8 CPU devices"
    return make_mesh()


@pytest.mark.parametrize("model", [
    "resnetgan", pytest.param("stylegan", marks=pytest.mark.slow)])
def test_dp_step_runs_and_counts_global_batch(mesh, model):
    cfg = tiny_config(model)
    phase = build_phases(cfg.schedule, cfg.model)[-1]
    step = build_train_step(cfg, phase, axis_name="data")
    par_step = make_parallel_step(step, mesh)

    state = replicate(create_train_state(cfg, jax.random.PRNGKey(0)), mesh)
    batch = shard_batch(fake_batch(16, 16), mesh)   # 2 per device
    state2, metrics = par_step(state, batch)
    assert float(state2.shown_imgs) == 16.0
    for k in ("d_loss", "g_loss", "penalty"):
        assert np.isfinite(float(metrics[k]))


def test_dp_state_replica_identical(mesh):
    """Gather a per-device fingerprint of the post-step params and require
    all replicas to agree bitwise."""
    cfg = tiny_config()
    phase = build_phases(cfg.schedule, cfg.model)[-1]
    step = build_train_step(cfg, phase, axis_name="data")

    def probed(state, batch):
        new_state, metrics = step(state, batch)
        leaves = jax.tree.leaves((new_state.params_g, new_state.params_d,
                                  new_state.params_ema, new_state.w_avg,
                                  new_state.rng.astype(jnp.float32)))
        fp = sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in leaves)
        return new_state, metrics, fp[None]   # (1,) per device -> (8,)

    par = jax.jit(jax.shard_map(
        probed, mesh=mesh, in_specs=(P(), P("data")),
        out_specs=(P(), P(), P("data")), check_vma=False))
    state = replicate(create_train_state(cfg, jax.random.PRNGKey(0)), mesh)
    batch = shard_batch(fake_batch(16, 16), mesh)
    _, _, fingerprints = par(state, batch)
    fingerprints = np.asarray(fingerprints)
    assert fingerprints.shape == (8,)
    assert np.all(fingerprints == fingerprints[0]), fingerprints


def test_dp_equals_single_device_with_identical_shards(mesh):
    """fold_device_rng=False + identical per-device data => the DP update
    must equal the single-device update on one shard, exactly."""
    cfg = tiny_config()
    phase = build_phases(cfg.schedule, cfg.model)[-1]

    # DP path: every device gets the SAME 2-image shard.
    step_dp = build_train_step(cfg, phase, axis_name="data",
                               fold_device_rng=False)
    par = make_parallel_step(step_dp, mesh)
    shard = fake_batch(2, 16, seed=5)
    batch = shard_batch(np.tile(shard, (8, 1, 1, 1)), mesh)
    state0 = create_train_state(cfg, jax.random.PRNGKey(3))
    state_dp, m_dp = par(replicate(state0, mesh), batch)

    # Single-device path on one shard.
    step_1 = make_single_step(build_train_step(cfg, phase))
    state_1, m_1 = step_1(create_train_state(cfg, jax.random.PRNGKey(3)),
                          shard)

    for a, b in zip(jax.tree.leaves(state_dp.params_g),
                    jax.tree.leaves(state_1.params_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(state_dp.params_d),
                    jax.tree.leaves(state_1.params_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    assert float(m_dp["d_loss"]) == pytest.approx(float(m_1["d_loss"]),
                                                  rel=1e-5)
    # Global counter: 8 devices x 2 images vs 2 images.
    assert float(state_dp.shown_imgs) == 16.0
    assert float(state_1.shown_imgs) == 2.0


def test_dp_devices_draw_different_latents(mesh):
    """With folding ON, per-device fakes differ (the whole point of DP)."""
    cfg = tiny_config()
    phase = build_phases(cfg.schedule, cfg.model)[-1]
    from ganlab_tpu.train.steps import build_generator_forward
    _, gen_fwd = build_generator_forward(cfg, cfg.model.res_log2)

    def gen_per_device(params, rng):
        local = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        img, _ = gen_fwd(params, local, local, jnp.float32(1.0), 2)
        return img

    par = jax.jit(jax.shard_map(
        gen_per_device, mesh=mesh, in_specs=(P(), P()),
        out_specs=P("data"), check_vma=False))
    state = replicate(create_train_state(cfg, jax.random.PRNGKey(0)), mesh)
    imgs = np.asarray(par(state.params_g, state.rng))
    assert imgs.shape[0] == 16
    # Device 0's images differ from device 1's.
    assert not np.allclose(imgs[0], imgs[2])


def test_trainer_end_to_end_on_mesh(tmp_path, mesh):
    """Full Trainer loop (prefetch, shard placement, checkpointing) over the
    8-device mesh."""
    from ganlab_tpu.data import SyntheticSource
    from ganlab_tpu.train.loop import Trainer

    cfg = tiny_config()
    src = SyntheticSource(16, num_images=32)
    tr = Trainer(cfg, workdir=str(tmp_path), use_mesh=True, source=src)
    try:
        assert tr.n_dev == 8
        tr.train(max_steps=3)
        assert int(jax.device_get(tr.state.step)) == 3
        # global batch = 2/device * 8 devices = 16 per step
        assert float(jax.device_get(tr.state.shown_imgs)) == 48.0
        import os

        assert os.path.exists(tr.save_samples(tag="dp"))
        assert tr.ckpt.latest_step() == 3
    finally:
        tr.close()


@pytest.mark.slow
def test_fused_step_under_shard_map(mesh):
    """The fused simultaneous update (the stylegan presets' default) must
    hold the same DP guarantees: replica-identical state, exact equality
    with the single-device step on identical shards."""
    from ganlab_tpu.config import apply_overrides

    # Construct through apply_overrides so opting into fused_g_step clears
    # the preset's fused_seq default (the two flags are mutually exclusive;
    # a raw dataclasses.replace would trip the __post_init__ guard).
    cfg = apply_overrides(tiny_config("stylegan"),
                          {"loss.fused_g_step": True})
    assert cfg.loss.fused_g_step and not cfg.loss.fused_seq
    phase = build_phases(cfg.schedule, cfg.model)[-1]

    step_dp = build_train_step(cfg, phase, axis_name="data",
                               fold_device_rng=False)
    par = make_parallel_step(step_dp, mesh)
    shard = fake_batch(2, 16, seed=11)
    batch = shard_batch(np.tile(shard, (8, 1, 1, 1)), mesh)
    state_dp, m_dp = par(replicate(create_train_state(
        cfg, jax.random.PRNGKey(4)), mesh), batch)

    step_1 = make_single_step(build_train_step(cfg, phase))
    state_1, m_1 = step_1(create_train_state(cfg, jax.random.PRNGKey(4)),
                          shard)

    for a, b in zip(jax.tree.leaves(state_dp.params_g),
                    jax.tree.leaves(state_1.params_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(state_dp.params_d),
                    jax.tree.leaves(state_1.params_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    assert float(m_dp["g_loss"]) == pytest.approx(float(m_1["g_loss"]),
                                                  rel=1e-5)
    # w_avg must also stay replica-identical and equal.
    np.testing.assert_allclose(np.asarray(state_dp.w_avg),
                               np.asarray(state_1.w_avg),
                               rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_ema_kimg_device_count_invariant(mesh):
    """VERDICT r2 #4: with optim.ema_kimg set, the G-EMA horizon must be a
    function of the GLOBAL batch only — an 8-device DP run at 2/device and
    a single-device run at batch 16 apply the SAME per-step decay.

    Isolation: lr_g=0 freezes params_g, and params_ema is perturbed away
    from it, so after n steps ema = g + beta^n (ema0 - g) exactly — the
    measured contraction factor IS beta^n, independent of D dynamics."""
    import dataclasses

    cfg = tiny_config("stylegan")
    cfg = cfg.replace(optim=dataclasses.replace(
        cfg.optim, lr_g=0.0, ema_kimg=0.1))   # beta = 0.5**(16/100) ~ 0.895
    phase = build_phases(cfg.schedule, cfg.model)[-1]
    n_steps = 2
    expected = cfg.optim.ema_beta_for(16) ** n_steps

    def perturbed(state):
        return state.replace(params_ema=jax.tree.map(
            lambda x: x + 1.0, state.params_ema))

    def contraction(g, e0, state1):
        e1 = np.asarray(jax.tree.leaves(jax.device_get(state1).params_ema)[0])
        num = (e1 - g).astype(np.float64).ravel()
        den = (e0 - g).astype(np.float64).ravel()
        return float(np.median(num / den))

    # 8-device DP, 2 images/device (global 16).
    par = make_parallel_step(
        build_train_step(cfg, phase, axis_name="data"), mesh)
    s_dp0 = perturbed(create_train_state(cfg, jax.random.PRNGKey(0)))
    # Snapshot before stepping: the steppers donate their input state.
    g0 = np.asarray(jax.tree.leaves(jax.device_get(s_dp0).params_g)[0])
    e0 = np.asarray(jax.tree.leaves(jax.device_get(s_dp0).params_ema)[0])
    s_dp = replicate(s_dp0, mesh)
    for i in range(n_steps):
        s_dp, _ = par(s_dp, shard_batch(fake_batch(16, 16, seed=i), mesh))

    # Single device, batch 16 (same global batch).
    single = make_single_step(build_train_step(cfg, phase))
    s_1 = perturbed(create_train_state(cfg, jax.random.PRNGKey(0)))
    for i in range(n_steps):
        s_1, _ = single(s_1, fake_batch(16, 16, seed=i))

    c_dp = contraction(g0, e0, s_dp)
    c_1 = contraction(g0, e0, s_1)
    assert c_dp == pytest.approx(expected, rel=1e-5)
    assert c_1 == pytest.approx(expected, rel=1e-5)


@pytest.mark.slow
def test_two_process_distributed_matches_single_process(tmp_path):
    """REAL multi-process jax.distributed (SURVEY.md:346-348): two CPU
    processes with 4 fake devices each form one 8-device mesh; each feeds
    its local shard through shard_batch's make_array_from_process_local_data
    branch and state replication goes through the multi-host replicate
    branch. Both processes must agree with each other AND with the
    single-process 8-device run on the same global batches."""
    import json
    import os
    import socket
    import subprocess
    import sys

    from tests import dist_two_process as harness

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = os.path.join(os.path.dirname(__file__), "dist_two_process.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(script))]
        + env.get("PYTHONPATH", "").split(os.pathsep))
    procs = [subprocess.Popen(
        [sys.executable, script, str(pid), str(port), str(tmp_path)],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.PIPE)
        for pid in (0, 1)]
    errs = [p.communicate(timeout=600)[1] for p in procs]
    for p, e in zip(procs, errs):
        assert p.returncode == 0, e.decode()[-2000:]

    results = []
    for pid in (0, 1):
        with open(tmp_path / f"result_p{pid}.json") as f:
            results.append(json.load(f))

    # Reference: the same harness on THIS process's 8 fake devices.
    want = harness.run_dp_steps()

    for got in results:
        assert set(got) == set(want)
        for k, v in want.items():
            assert got[k] == pytest.approx(v, rel=2e-5, abs=1e-6), \
                (k, got[k], v)


@pytest.mark.slow
def test_ema_rampup_device_count_invariant(mesh):
    """VERDICT r3 #7: with optim.ema_rampup set, the warmed-up horizon
    min(ema_kimg*1000, shown*rampup) must ALSO be a function of the global
    batch and the global shown-image counter only — an 8-device DP run at
    2/device and a single-device run at batch 16 apply the same traced
    per-step decay. Counter pre-advanced to 64 imgs so both measured steps
    sit in the rampup regime (beta_t = 0.5^(16/min(100, shown_t*0.5)))."""
    import dataclasses

    cfg = tiny_config("stylegan")
    cfg = cfg.replace(optim=dataclasses.replace(
        cfg.optim, lr_g=0.0, ema_kimg=0.1, ema_rampup=0.5))
    phase = build_phases(cfg.schedule, cfg.model)[-1]
    shown0 = 64.0
    # Pre-step counters 64 then 80: horizons 32 and 40 images.
    expected = 0.5 ** (16 / min(100.0, 64.0 * 0.5)) \
        * 0.5 ** (16 / min(100.0, 80.0 * 0.5))

    def prepared(state):
        import jax.numpy as jnp

        return state.replace(
            params_ema=jax.tree.map(lambda x: x + 1.0, state.params_ema),
            shown_imgs=jnp.float32(shown0))

    def contraction(g, e0, state1):
        e1 = np.asarray(jax.tree.leaves(jax.device_get(state1).params_ema)[0])
        num = (e1 - g).astype(np.float64).ravel()
        den = (e0 - g).astype(np.float64).ravel()
        return float(np.median(num / den))

    par = make_parallel_step(
        build_train_step(cfg, phase, axis_name="data"), mesh)
    s_dp0 = prepared(create_train_state(cfg, jax.random.PRNGKey(0)))
    g0 = np.asarray(jax.tree.leaves(jax.device_get(s_dp0).params_g)[0])
    e0 = np.asarray(jax.tree.leaves(jax.device_get(s_dp0).params_ema)[0])
    s_dp = replicate(s_dp0, mesh)
    for i in range(2):
        s_dp, _ = par(s_dp, shard_batch(fake_batch(16, 16, seed=i), mesh))

    single = make_single_step(build_train_step(cfg, phase))
    s_1 = prepared(create_train_state(cfg, jax.random.PRNGKey(0)))
    for i in range(2):
        s_1, _ = single(s_1, fake_batch(16, 16, seed=i))

    assert float(jax.device_get(s_dp.shown_imgs)) == shown0 + 32.0
    c_dp = contraction(g0, e0, s_dp)
    c_1 = contraction(g0, e0, s_1)
    assert c_dp == pytest.approx(expected, rel=1e-4)
    assert c_1 == pytest.approx(expected, rel=1e-4)
