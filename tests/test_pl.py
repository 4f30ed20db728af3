"""Path-length regularization (StyleGAN2 extension; loss.pl_*):
cadence, running-mean update, scale property, chunked-dispatch parity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ganlab_tpu.config import get_config
from ganlab_tpu.parallel import make_single_step
from ganlab_tpu.train.schedule import build_phases
from ganlab_tpu.train.state import create_train_state
from ganlab_tpu.train.steps import make_chunked_stepper, make_lazy_stepper


def pl_cfg(**over):
    base = {
        "model.model": "stylegan2",
        "model.resolution": 16,
        "model.latent_dim": 8,
        "model.fmap_base": 64,
        "model.fmap_max": 8,
        "model.mapping_layers": 2,
        "schedule.progressive": False,
        "loss.penalty_every": 4,
        "loss.pl_weight": 2.0,
        "loss.pl_every": 2,
        "loss.fused_g_step": True,
        "run.compute_dtype": "float32",
    }
    base.update(over)
    cfg = get_config("stylegan-256", **base)
    return cfg.replace(schedule=cfg.schedule.__class__(
        progressive=False, batch_schedule={16: 4}))


def batches(n, seed=0):
    rng = np.random.RandomState(seed)
    return np.stack([rng.randint(0, 256, (4, 16, 16, 3), np.uint8)
                     for _ in range(n)])


class TestPathLength:
    @pytest.mark.slow
    def test_cadence_and_running_mean(self):
        cfg = pl_cfg()
        phase = build_phases(cfg.schedule, cfg.model)[-1]
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        step = make_lazy_stepper(cfg, phase, make_single_step)
        data = batches(8)
        pl_means, pens, d_pens = [], [], []
        for i in range(8):
            state, m = step(state, jnp.asarray(data[i]))
            pl_means.append(float(jax.device_get(state.pl_mean)))
            pens.append(float(jax.device_get(m["pl_penalty"])))
            d_pens.append(abs(float(jax.device_get(m["penalty"]))))
        # PL fires on steps 0,2,4,6 (pl_every=2); D penalty on 0,4 (k=4)
        for i in range(8):
            if i % 2 == 0:
                assert pens[i] > 0, (i, pens)
            else:
                assert pens[i] == 0, (i, pens)
            if i % 4 == 0:
                assert d_pens[i] > 0, (i, d_pens)
            else:
                assert d_pens[i] == 0, (i, d_pens)
        # running mean only moves on PL steps, toward positive lengths
        assert pl_means[0] > 0
        assert pl_means[1] == pl_means[0]
        assert pl_means[2] > pl_means[1]
        assert np.isfinite(pl_means[-1])

    @pytest.mark.slow
    def test_chunked_with_pl_matches_singles(self):
        cfg = pl_cfg()
        phase = build_phases(cfg.schedule, cfg.model)[-1]
        data = batches(4)

        s1 = create_train_state(cfg, jax.random.PRNGKey(0))
        lazy = make_lazy_stepper(cfg, phase, make_single_step)
        ms1 = []
        for i in range(4):
            s1, m = lazy(s1, jnp.asarray(data[i]))
            ms1.append(m)

        s2 = create_train_state(cfg, jax.random.PRNGKey(0))
        stepper, chunk = make_chunked_stepper(
            cfg, phase, make_single_step, make_single_step)
        assert chunk == 4
        s2, m2 = stepper(s2, jnp.asarray(data))
        assert int(np.asarray(m2["d_loss"]).shape[0]) == 4
        for i in range(4):
            np.testing.assert_allclose(
                float(np.asarray(ms1[i]["pl_penalty"])),
                float(np.asarray(m2["pl_penalty"])[i]),
                rtol=1e-2, atol=2e-3)
        np.testing.assert_allclose(
            float(jax.device_get(s1.pl_mean)),
            float(jax.device_get(s2.pl_mean)), rtol=1e-3, atol=1e-4)

    @pytest.mark.slow
    def test_pl_improves_nothing_breaks_sequential(self):
        # sequential (non-fused) path with PL also runs and updates state
        cfg = pl_cfg(**{"loss.fused_g_step": False})
        phase = build_phases(cfg.schedule, cfg.model)[-1]
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        step = make_lazy_stepper(cfg, phase, make_single_step)
        for i in range(2):
            state, m = step(state, jnp.asarray(batches(2)[i]))
        assert np.isfinite(float(jax.device_get(m["g_loss"])))
        assert float(jax.device_get(state.pl_mean)) > 0

    @pytest.mark.slow
    def test_pl_mean_replica_identical_under_dp(self):
        """CLAUDE.md invariant: every new state update must stay
        replica-identical under DP. pl_mean depends on the per-device PL
        lengths only through a pmean — probe a per-device fingerprint
        with devices drawing DIFFERENT latents (fold_device_rng=True)."""
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P
        from ganlab_tpu.parallel import make_mesh, replicate, shard_batch
        from ganlab_tpu.train.steps import build_train_step

        if jax.device_count() < 8:
            import pytest
            pytest.skip("needs 8 fake devices")
        cfg = pl_cfg()
        phase = build_phases(cfg.schedule, cfg.model)[-1]
        step = build_train_step(cfg, phase, axis_name="data",
                                pl_override=True)

        def probed(state, batch):
            new_state, metrics = step(state, batch)
            return new_state, metrics, new_state.pl_mean[None]

        mesh = make_mesh()
        par = jax.jit(jax.shard_map(
            probed, mesh=mesh, in_specs=(P(), P("data")),
            out_specs=(P(), P(), P("data")), check_vma=False))
        state = replicate(create_train_state(cfg, jax.random.PRNGKey(0)),
                          mesh)
        batch = shard_batch(np.random.RandomState(0).randint(
            0, 256, (32, 16, 16, 3), np.uint8), mesh)
        state, _, fps = par(state, batch)
        fps = np.asarray(fps)
        assert fps.shape == (8,)
        assert fps[0] > 0
        assert np.all(fps == fps[0]), fps

    def test_pre_pl_checkpoint_resumes_into_pl_config(self, tmp_path):
        """A checkpoint written WITHOUT PL (pl_mean=None) must resume
        under a PL-enabled config: restore backfills a fresh zero and the
        first PL step runs (checkpoint.py migration)."""
        from ganlab_tpu.train.checkpoint import CheckpointManager

        cfg_old = pl_cfg(**{"loss.pl_weight": 0.0})
        cfg_new = pl_cfg()
        old_state = create_train_state(cfg_old, jax.random.PRNGKey(0))
        assert old_state.pl_mean is None
        ckpt = CheckpointManager(str(tmp_path / "ck"), keep=1)
        ckpt.save(0, jax.device_get(old_state))
        ckpt.wait()

        template = create_train_state(cfg_new, jax.random.PRNGKey(1))
        restored = ckpt.restore(jax.device_get(template))
        ckpt.close()
        assert restored is not None
        assert restored.pl_mean is not None
        assert float(np.asarray(restored.pl_mean)) == 0.0
        phase = build_phases(cfg_new.schedule, cfg_new.model)[-1]
        step = make_lazy_stepper(cfg_new, phase, make_single_step)
        state, m = step(restored, jnp.asarray(batches(1)[0]))
        assert float(jax.device_get(m["pl_penalty"])) > 0

    def test_pl_rejects_n_critic(self):
        cfg = pl_cfg(**{"loss.d_steps_per_g": 2})
        phase = build_phases(cfg.schedule, cfg.model)[-1]
        from ganlab_tpu.train.steps import build_train_step
        import pytest
        with pytest.raises(ValueError, match="d_steps_per_g"):
            build_train_step(cfg, phase)

    def test_pl_len_scales_with_output(self):
        """Property check of the length math: scaling G's output by c
        scales ||J^T y|| by c, so the first-step running mean scales."""
        from ganlab_tpu.models import build_models

        means = []
        for c in (1.0, 2.0):
            cfg = pl_cfg()
            phase = build_phases(cfg.schedule, cfg.model)[-1]
            state = create_train_state(cfg, jax.random.PRNGKey(0))
            # scale every toRGB weight by c -> output scales by c
            params = jax.device_get(state.params_g)
            flat = jax.tree_util.tree_flatten_with_path(params)
            leaves = []
            for kp, leaf in flat[0]:
                ks = jax.tree_util.keystr(kp)
                scale_it = "torgb" in ks and ks.endswith("['conv']['w']")
                leaves.append(leaf * c if scale_it else leaf)
            params = jax.tree_util.tree_unflatten(flat[1], leaves)
            state = state.replace(params_g=params)
            step = make_lazy_stepper(cfg, phase, make_single_step)
            state, _ = step(state, jnp.asarray(batches(1)[0]))
            means.append(float(jax.device_get(state.pl_mean)))
        np.testing.assert_allclose(means[1], 2.0 * means[0], rtol=0.05)
