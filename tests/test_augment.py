"""ADA discriminator augmentation (ops/augment.py + the aug.* config):
transform math against hand-built params, adaptation dynamics in both
step variants, DP replica identity of ada_p, chunked-path agreement, and
checkpoint migration of the optional leaf."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ganlab_tpu.config import get_config
from ganlab_tpu.ops.augment import (
    AugParams,
    apply_augment,
    augment,
    sample_params,
)
from ganlab_tpu.train.schedule import build_phases
from ganlab_tpu.train.state import create_train_state
from ganlab_tpu.train.steps import build_train_step


def _imgs(b=4, res=16, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-1, 1, (b, res, res, 3)), jnp.float32)


def _identity_params(b, res):
    return AugParams(
        flip=jnp.zeros((b,), bool),
        rot_k=jnp.zeros((b,), jnp.int32),
        trans=jnp.zeros((b, 2), jnp.int32),
        color_mat=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32),
                                   (b, 3, 3)),
        color_bias=jnp.zeros((b, 3), jnp.float32),
    )


class TestAugmentMath:
    def test_p_zero_is_identity(self):
        x = _imgs()
        y = augment(x, 0.0, jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)

    def test_deterministic_per_key(self):
        x = _imgs()
        k = jax.random.PRNGKey(7)
        np.testing.assert_array_equal(np.asarray(augment(x, 0.8, k)),
                                      np.asarray(augment(x, 0.8, k)))
        assert not np.allclose(np.asarray(augment(x, 0.8, k)),
                               np.asarray(augment(x, 0.8,
                                                  jax.random.PRNGKey(8))))

    def test_xflip_exact(self):
        x = _imgs()
        p = _identity_params(4, 16)._replace(flip=jnp.ones((4,), bool))
        np.testing.assert_allclose(np.asarray(apply_augment(x, p)),
                                   np.asarray(x[:, :, ::-1, :]), atol=1e-6)

    def test_rot180_exact(self):
        x = _imgs()
        p = _identity_params(4, 16)._replace(
            rot_k=jnp.full((4,), 2, jnp.int32))
        np.testing.assert_allclose(np.asarray(apply_augment(x, p)),
                                   np.asarray(x[:, ::-1, ::-1, :]),
                                   atol=1e-6)

    def test_rot90_is_quarter_turn_bijection(self):
        x = _imgs()
        for k in (1, 3):
            p = _identity_params(4, 16)._replace(
                rot_k=jnp.full((4,), k, jnp.int32))
            y = np.asarray(apply_augment(x, p))
            # every pixel value preserved exactly (pure permutation)
            np.testing.assert_allclose(np.sort(y.ravel()),
                                       np.sort(np.asarray(x).ravel()),
                                       atol=0)
            assert not np.allclose(y, np.asarray(x))

    def test_translation_reflect_pads(self):
        x = _imgs(b=1, res=8)
        p = _identity_params(1, 8)._replace(
            trans=jnp.asarray([[2, 0]], jnp.int32))  # shift down 2
        y = np.asarray(apply_augment(x, p))[0]
        xs = np.asarray(x)[0]
        np.testing.assert_allclose(y[2:], xs[:-2], atol=1e-6)
        np.testing.assert_allclose(y[0], xs[1], atol=1e-6)  # reflected
        np.testing.assert_allclose(y[1], xs[0], atol=1e-6)

    def test_luma_flip_is_involution_and_preserves_gray(self):
        x = _imgs()
        v = np.ones(3) / np.sqrt(3)
        L = np.eye(3) - 2 * np.outer(v, v)
        p = _identity_params(4, 16)._replace(
            color_mat=jnp.broadcast_to(jnp.asarray(L, jnp.float32),
                                       (4, 3, 3)))
        y = apply_augment(x, p)
        z = apply_augment(y, p)
        np.testing.assert_allclose(np.asarray(z), np.asarray(x), atol=1e-5)
        gray = jnp.broadcast_to(jnp.float32(0.3), (1, 4, 4, 3))
        p1 = _identity_params(1, 4)._replace(
            color_mat=jnp.asarray(L, jnp.float32)[None])
        # gray is on the luma axis: flipping luma negates it
        np.testing.assert_allclose(np.asarray(apply_augment(gray, p1)),
                                   -np.asarray(gray), atol=1e-5)

    def test_gradients_flow(self):
        x = _imgs()
        g = jax.grad(
            lambda x: jnp.sum(augment(x, 0.9, jax.random.PRNGKey(3)) ** 2)
        )(x)
        g = np.asarray(g)
        assert np.isfinite(g).all() and np.abs(g).sum() > 0

    def test_sampled_params_respect_categories(self):
        k = jax.random.PRNGKey(0)
        pb = sample_params(k, 64, 16, 1.0, categories="b")
        assert np.asarray(pb.flip).any()
        np.testing.assert_allclose(np.asarray(pb.color_mat),
                                   np.broadcast_to(np.eye(3), (64, 3, 3)))
        pc = sample_params(k, 64, 16, 1.0, categories="c")
        assert not np.asarray(pc.flip).any()
        assert not np.asarray(pc.trans).any()
        assert (np.abs(np.asarray(pc.color_mat)
                       - np.eye(3)).sum(axis=(1, 2)) > 1e-3).any()

    def test_values_bounded_blit(self):
        # blit-only transforms permute pixels: range preserved exactly
        x = _imgs()
        y = np.asarray(augment(x, 1.0, jax.random.PRNGKey(5),
                               categories="b"))
        assert y.min() >= -1.0 - 1e-6 and y.max() <= 1.0 + 1e-6


def _geom(b, rows):
    return jnp.broadcast_to(jnp.asarray(rows, jnp.float32), (b, 2, 3))


_EYE23 = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]


class TestGeometricAugment:
    """The 'g' category: per-sample inverse affines through the
    two-pass shear resampler (ops/augment.py::_geom_inverse /
    _apply_geom)."""

    def test_p_zero_is_identity_bcg(self):
        x = _imgs()
        y = augment(x, 0.0, jax.random.PRNGKey(1), categories="bcg")
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)

    def test_identity_affine_exact_through_bilinear(self):
        """Bilinear at integer coords is exact: enabling 'g' leaves
        untransformed samples bit-identical to the integer path."""
        x = _imgs()
        p = _identity_params(4, 16)._replace(geom=_geom(4, _EYE23))
        np.testing.assert_array_equal(np.asarray(apply_augment(x, p)),
                                      np.asarray(x))

    def test_quarter_turn_affine_matches_blit_rot90(self):
        """A_inv = [[0,-1],[1,0]] about the center IS the rot_k=1 blit
        (both land on integer coords, so equality is exact)."""
        x = _imgs()
        p_g = _identity_params(4, 16)._replace(
            geom=_geom(4, [[0.0, -1.0, 0.0], [1.0, 0.0, 0.0]]))
        p_b = _identity_params(4, 16)._replace(
            rot_k=jnp.ones((4,), jnp.int32))
        np.testing.assert_allclose(np.asarray(apply_augment(x, p_g)),
                                   np.asarray(apply_augment(x, p_b)),
                                   atol=1e-5)

    def test_integer_translation_affine_matches_blit(self):
        x = _imgs()
        p_g = _identity_params(4, 16)._replace(
            geom=_geom(4, [[1.0, 0.0, -2.0], [0.0, 1.0, -3.0]]))
        p_b = _identity_params(4, 16)._replace(
            trans=jnp.broadcast_to(jnp.asarray([2, 3], jnp.int32), (4, 2)))
        np.testing.assert_allclose(np.asarray(apply_augment(x, p_g)),
                                   np.asarray(apply_augment(x, p_b)),
                                   atol=1e-5)

    def test_bilinear_on_linear_ramp_matches_affine(self):
        """Bilinear interpolation of a linear function is exact: an
        isotropic zoom of a y-ramp must read exactly the mapped
        coordinate wherever no reflection occurs."""
        b, res, s = 2, 16, 1.3
        ramp = jnp.broadcast_to(
            jnp.arange(res, dtype=jnp.float32)[None, :, None, None],
            (b, res, res, 3))
        p = _identity_params(b, res)._replace(
            geom=_geom(b, [[1.0 / s, 0.0, 0.0], [0.0, 1.0 / s, 0.0]]))
        out = np.asarray(apply_augment(ramp, p))
        c0 = (res - 1) / 2.0
        fy = (np.arange(res) - c0) / s + c0
        interior = (fy >= 0) & (fy <= res - 1)
        expect = np.broadcast_to(fy[None, :, None, None],
                                 out.shape)[:, interior]
        np.testing.assert_allclose(out[:, interior], expect, atol=1e-4)

    def test_sampled_geom_respects_categories_and_p(self):
        k = jax.random.PRNGKey(0)
        assert sample_params(k, 8, 16, 1.0, categories="bc").geom is None
        pg = sample_params(k, 64, 16, 1.0, categories="g")
        eye = np.concatenate([np.eye(2), np.zeros((2, 1))], -1)
        dev = np.abs(np.asarray(pg.geom) - eye).sum(axis=(1, 2))
        assert (dev > 1e-3).any()
        # blit/color untouched by the 'g' draws
        assert not np.asarray(pg.flip).any()
        np.testing.assert_allclose(np.asarray(pg.color_mat),
                                   np.broadcast_to(np.eye(3), (64, 3, 3)))
        p0 = sample_params(k, 8, 16, 0.0, categories="g")
        np.testing.assert_allclose(np.asarray(p0.geom),
                                   np.broadcast_to(eye, (8, 2, 3)),
                                   atol=1e-6)

    def test_geom_draws_leave_bc_streams_unchanged(self):
        """Enabling 'g' must not shift the blit/color random streams
        (geom keys derive from a fold_in of the same key)."""
        k = jax.random.PRNGKey(3)
        a = sample_params(k, 16, 16, 0.7, categories="bc")
        b = sample_params(k, 16, 16, 0.7, categories="bcg")
        for fld in ("flip", "rot_k", "trans", "color_mat", "color_bias"):
            np.testing.assert_array_equal(np.asarray(getattr(a, fld)),
                                          np.asarray(getattr(b, fld)))

    def test_rotated_linear_ramp_exact(self):
        """Two-pass shear resampling (like direct bilinear) is EXACT on
        images linear in the coordinates — including under rotations
        that exercise the conditioning quarter-turn and both shear
        passes. The interior of a rotated ramp must read the mapped
        coordinate to fp accuracy."""
        b, res = 2, 16
        c0 = (res - 1) / 2.0
        yy, xx = np.meshgrid(np.arange(res) - c0, np.arange(res) - c0,
                             indexing="ij")
        ramp = jnp.asarray(np.broadcast_to(
            (0.25 * yy + 0.1 * xx)[None, :, :, None], (b, res, res, 3)),
            jnp.float32)
        for theta in (0.4, 1.2, 2.0, -2.8):   # spans all 4 quadrants
            c, s = np.cos(theta), np.sin(theta)
            a_inv = [[c, s, 0.0], [-s, c, 0.0]]
            p = _identity_params(b, res)._replace(geom=_geom(b, a_inv))
            out = np.asarray(apply_augment(ramp, p))
            fy = c * yy + s * xx
            fx = -s * yy + c * xx
            interior = (np.abs(fy) <= c0 - 1) & (np.abs(fx) <= c0 - 1) \
                & (np.abs(yy) <= c0 - 1) & (np.abs(xx) <= c0 - 1)
            expect = 0.25 * fy + 0.1 * fx
            np.testing.assert_allclose(
                out[0, :, :, 0][interior], expect[interior], atol=1e-4,
                err_msg=f"theta={theta}")

    def test_rotation_matches_direct_bilinear_oracle_on_smooth_blob(self):
        """On a smooth Gaussian blob a 35° rotation through the two-pass
        path must agree with a direct 4-tap bilinear numpy oracle to the
        interpolation-error scale (the two filters differ only in their
        second-order terms)."""
        res, sig, theta = 32, 4.0, 0.6
        c0 = (res - 1) / 2.0
        yy, xx = np.meshgrid(np.arange(res) - c0, np.arange(res) - c0,
                             indexing="ij")
        blob = np.exp(-(yy**2 + xx**2) / (2 * sig**2)).astype(np.float32)
        x = jnp.asarray(np.broadcast_to(blob[None, :, :, None],
                                        (1, res, res, 3)))
        c, s = np.cos(theta), np.sin(theta)
        p = _identity_params(1, res)._replace(
            geom=_geom(1, [[c, s, 0.0], [-s, c, 0.0]]))
        out = np.asarray(apply_augment(x, p))[0, :, :, 0]
        # numpy direct bilinear oracle with per-tap reflect
        fy, fx = c * yy + s * xx + c0, -s * yy + c * xx + c0
        y0, x0 = np.floor(fy).astype(int), np.floor(fx).astype(int)
        wy, wx = fy - y0, fx - x0

        def refl(i):
            t = np.mod(i, 2 * res)
            return np.where(t >= res, 2 * res - 1 - t, t)

        oracle = (blob[refl(y0), refl(x0)] * (1 - wy) * (1 - wx)
                  + blob[refl(y0), refl(x0 + 1)] * (1 - wy) * wx
                  + blob[refl(y0 + 1), refl(x0)] * wy * (1 - wx)
                  + blob[refl(y0 + 1), refl(x0 + 1)] * wy * wx)
        assert np.max(np.abs(out - oracle)) < 0.02

    def test_row_blocked_pass_matches_whole(self, monkeypatch):
        """Above ONEHOT_BYTES_LIMIT the shear passes scan over row
        blocks (HBM guard for 512^2+). Forcing the blocked path at a
        tiny shape must reproduce the whole-tensor path bitwise."""
        from ganlab_tpu.ops import augment as aug_mod
        x = _imgs()
        key = jax.random.PRNGKey(7)
        p = sample_params(key, 4, 16, 1.0, categories="bcg")
        whole = np.asarray(apply_augment(x, p))
        monkeypatch.setattr(aug_mod, "ONEHOT_BYTES_LIMIT", 1)
        blocked = np.asarray(apply_augment(x, p))
        np.testing.assert_array_equal(whole, blocked)
        # gradients agree too (einsum VJP under the scan)
        monkeypatch.setattr(aug_mod, "ONEHOT_BYTES_LIMIT", 1)
        g_blk = np.asarray(jax.grad(
            lambda xx: jnp.sum(apply_augment(xx, p) ** 2))(x))
        monkeypatch.setattr(aug_mod, "ONEHOT_BYTES_LIMIT", 1 << 40)
        g_whole = np.asarray(jax.grad(
            lambda xx: jnp.sum(apply_augment(xx, p) ** 2))(x))
        np.testing.assert_allclose(g_blk, g_whole, rtol=1e-6, atol=1e-6)

    def test_gradients_flow_through_bilinear(self):
        x = _imgs()
        g = jax.grad(lambda x: jnp.sum(
            augment(x, 0.9, jax.random.PRNGKey(3), categories="g") ** 2))(x)
        g = np.asarray(g)
        assert np.isfinite(g).all() and np.abs(g).sum() > 0

    def test_train_step_runs_with_geom(self):
        cfg = _ada_cfg(False, **{"aug.categories": "bcg"})
        phase = build_phases(cfg.schedule, cfg.model)[0]
        st = create_train_state(cfg, jax.random.PRNGKey(0))
        step = jax.jit(build_train_step(cfg, phase,
                                        penalty_override=True))
        batch = np.random.default_rng(0).integers(
            0, 255, (4, 16, 16, 3), dtype=np.uint8)
        st, m = step(st, batch)
        assert np.isfinite(float(m["d_loss"]))
        assert np.isfinite(float(m["g_loss"]))


def _ada_cfg(fused, **over):
    base = {
        "model.resolution": 16, "model.fmap_base": 128,
        "model.latent_dim": 16, "model.mapping_layers": 2,
        "schedule.progressive": False, "schedule.start_res": 16,
        "schedule.batch_schedule": {16: 4},
        "aug.mode": "ada", "aug.kimg": 0.5, "aug.target": -2.0,
        "loss.fused_g_step": fused, "loss.penalty_every": 4,
        "run.compute_dtype": "float32",
    }
    base.update(over)
    return get_config("stylegan-256", **base)


class TestAdaAdaptation:
    @pytest.mark.parametrize(
        "fused", [False, pytest.param(True, marks=pytest.mark.slow)])
    def test_p_rises_at_documented_rate(self, fused):
        """target=-2 < rt always, so p must rise by batch/(kimg*1000)
        per step, in BOTH step variants."""
        cfg = _ada_cfg(fused)
        phase = build_phases(cfg.schedule, cfg.model)[0]
        st = create_train_state(cfg, jax.random.PRNGKey(0))
        assert st.ada_p is not None and float(st.ada_p) == 0.0
        on = jax.jit(build_train_step(cfg, phase, penalty_override=True))
        off = jax.jit(build_train_step(cfg, phase, penalty_override=False))
        batch = np.random.default_rng(0).integers(
            0, 255, (4, 16, 16, 3), dtype=np.uint8)
        st, m = on(st, batch)
        for _ in range(5):
            st, m = off(st, batch)
        assert abs(float(st.ada_p) - 6 * 4 / 500.0) < 1e-5
        assert abs(float(m["aug_p"]) - float(st.ada_p)) < 1e-7
        assert float(m["aug_rt"]) >= -1.0

    def test_p_clips_at_zero_and_pmax(self):
        cfg = _ada_cfg(True, **{"aug.target": 2.0})  # rt < target always
        phase = build_phases(cfg.schedule, cfg.model)[0]
        st = create_train_state(cfg, jax.random.PRNGKey(0))
        off = jax.jit(build_train_step(cfg, phase, penalty_override=False))
        batch = np.random.default_rng(0).integers(
            0, 255, (4, 16, 16, 3), dtype=np.uint8)
        st, _ = off(st, batch)
        assert float(st.ada_p) == 0.0  # clipped below
        cfg2 = _ada_cfg(True, **{"aug.p_init": 0.8})  # p_max default 0.8
        st2 = create_train_state(cfg2, jax.random.PRNGKey(0))
        off2 = jax.jit(build_train_step(cfg2, phase,
                                        penalty_override=False))
        st2, _ = off2(st2, batch)
        assert float(st2.ada_p) <= 0.8 + 1e-6  # f32 round of p_max

    def test_fixed_mode_has_no_state_leaf(self):
        cfg = _ada_cfg(True, **{"aug.mode": "fixed", "aug.p_init": 0.3})
        st = create_train_state(cfg, jax.random.PRNGKey(0))
        assert st.ada_p is None
        phase = build_phases(cfg.schedule, cfg.model)[0]
        step = jax.jit(build_train_step(cfg, phase,
                                        penalty_override=False))
        batch = np.random.default_rng(0).integers(
            0, 255, (4, 16, 16, 3), dtype=np.uint8)
        st, m = step(st, batch)
        assert st.ada_p is None and "aug_p" not in m

    def test_dp_replica_identity(self):
        """ada_p must advance identically on all devices (it derives from
        the pmean'd heuristic only)."""
        from ganlab_tpu.parallel import (
            make_mesh, make_parallel_step, replicate, shard_batch)

        cfg = _ada_cfg(True)
        phase = build_phases(cfg.schedule, cfg.model)[0]
        mesh = make_mesh()
        n = mesh.devices.size
        st = replicate(create_train_state(cfg, jax.random.PRNGKey(0)), mesh)
        step = make_parallel_step(
            build_train_step(cfg, phase, axis_name="data",
                             penalty_override=False), mesh)
        batch = shard_batch(np.random.default_rng(0).integers(
            0, 255, (4 * n, 16, 16, 3), dtype=np.uint8), mesh)
        for _ in range(3):
            st, m = step(st, batch)
        shards = [np.asarray(s.data) for s in st.ada_p.addressable_shards]
        assert all(np.array_equal(shards[0], s) for s in shards[1:])
        assert abs(float(shards[0]) - 3 * 4 * n / 500.0) < 1e-5

    @pytest.mark.slow
    def test_chunked_matches_singles_ada_p(self):
        """The scan-chunked path must advance ada_p exactly like the
        single-step dispatcher (same per-step math, rng chain)."""
        from ganlab_tpu.parallel import make_single_step
        from ganlab_tpu.train.steps import (
            make_chunked_stepper, make_lazy_stepper)

        cfg = _ada_cfg(True)
        phase = build_phases(cfg.schedule, cfg.model)[0]
        stack = np.random.default_rng(0).integers(
            0, 255, (8, 4, 16, 16, 3), dtype=np.uint8)

        st_a = create_train_state(cfg, jax.random.PRNGKey(0))
        single = make_lazy_stepper(cfg, phase, make_single_step)
        for i in range(8):
            st_a, _ = single(st_a, jnp.asarray(stack[i]))

        st_b = create_train_state(cfg, jax.random.PRNGKey(0))
        chunked, k = make_chunked_stepper(
            cfg, phase, make_single_step, make_single_step)
        st_b, _ = chunked(st_b, jnp.asarray(stack[:k]))
        st_b, _ = chunked(st_b, jnp.asarray(stack[k:2 * k]))

        assert abs(float(st_a.ada_p) - float(st_b.ada_p)) < 1e-6
        assert float(st_a.ada_p) > 0.0


class TestAdaCheckpoint:
    def test_roundtrip_and_migration(self, tmp_path):
        from ganlab_tpu.train.checkpoint import CheckpointManager

        cfg = _ada_cfg(True, **{"aug.p_init": 0.25})
        st = create_train_state(cfg, jax.random.PRNGKey(0))
        mgr = CheckpointManager(str(tmp_path / "ck"))
        mgr.save(1, st)
        mgr.wait()
        # same-config roundtrip
        back = mgr.restore(create_train_state(cfg, jax.random.PRNGKey(1)))
        assert abs(float(back.ada_p) - 0.25) < 1e-7
        # ada checkpoint -> non-ada config: leaf dropped
        cfg_off = _ada_cfg(True, **{"aug.mode": "off"})
        st_off = create_train_state(cfg_off, jax.random.PRNGKey(1))
        assert st_off.ada_p is None
        back_off = mgr.restore(st_off)
        assert back_off is not None and back_off.ada_p is None
        mgr.close()
        # non-ada checkpoint -> ada config: template value backfilled
        mgr2 = CheckpointManager(str(tmp_path / "ck2"))
        mgr2.save(1, st_off)
        mgr2.wait()
        back_on = mgr2.restore(create_train_state(cfg, jax.random.PRNGKey(2)))
        assert back_on is not None and abs(float(back_on.ada_p) - 0.25) < 1e-7
        mgr2.close()


class TestFilterNoiseCutout:
    """The official ADA pipeline's remaining categories — filter ('f',
    4-band separable FIR via grouped depthwise convs), noise ('n'),
    cutout ('u') — exact semantics against numpy oracles."""

    def test_p_zero_is_identity_full_pipeline(self):
        x = _imgs()
        y = augment(x, 0.0, jax.random.PRNGKey(1), categories="bcgfnu")
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    def test_filter_bank_rows_sum_to_delta(self):
        from ganlab_tpu.ops.augment import _HZ_FBANK
        taps = _HZ_FBANK.shape[1]
        delta = np.zeros(taps)
        delta[taps // 2] = 1.0
        np.testing.assert_allclose(_HZ_FBANK.sum(0), delta, atol=1e-12)
        # rows are symmetric palindromes (zero-phase filters), so the
        # conv-vs-correlation distinction cannot matter
        np.testing.assert_allclose(_HZ_FBANK, _HZ_FBANK[:, ::-1],
                                   atol=1e-12)

    def test_filter_gain_normalization_is_official_expected_power(self):
        """ADVICE r3 (medium): the official imgfilter normalizes each
        band-gain draw by the expected 1/f band power [10,1,1,1]/13 —
        NOT unit mean-square. Oracle the helper directly and require the
        all-ones vector (no gate fired) to be a fixed point."""
        from ganlab_tpu.ops.augment import _normalize_filter_gain

        ep = np.array([10.0, 1.0, 1.0, 1.0]) / 13.0
        t = np.array([[1.0, 1.0, 1.0, 1.0],
                      [4.0, 1.0, 1.0, 1.0],
                      [1.0, 1.0, 1.0, 0.25]])
        oracle = t / np.sqrt((ep * t ** 2).sum(axis=1, keepdims=True))
        out = np.asarray(_normalize_filter_gain(jnp.asarray(t, jnp.float32)))
        np.testing.assert_allclose(out, oracle, rtol=1e-6)
        np.testing.assert_allclose(out[0], np.ones(4), rtol=1e-6)
        # A fired LOW band is now scaled DOWN harder than under uniform
        # weighting (it dominates the expected power).
        uniform = t[1] / np.sqrt((t[1] ** 2).mean())
        assert out[1, 0] < uniform[0]

    def test_filter_matches_numpy_separable_oracle(self):
        from ganlab_tpu.ops.augment import _HZ_FBANK
        x = _imgs(b=2, res=16, seed=2)
        # sample 0: no band fired (must bypass bit-exactly);
        # sample 1: band 3 amplified 2x, official 1/f expected-power
        # normalization ([10,1,1,1]/13 band weights, ADVICE r3)
        ep = np.array([10.0, 1.0, 1.0, 1.0]) / 13.0
        t = np.ones((2, 4))
        t[1, 3] = 2.0
        t = t / np.sqrt((ep * t ** 2).sum(axis=1, keepdims=True))
        filt = jnp.asarray(t @ _HZ_FBANK, jnp.float32)
        p = _identity_params(2, 16)._replace(
            filt=filt, filt_active=jnp.array([False, True]))
        out = apply_augment(x, p)
        np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(x[0]))

        def sep(im, w):
            pad = len(w) // 2
            im = np.pad(im, ((pad, pad), (0, 0), (0, 0)), mode="reflect")
            oh = np.zeros((im.shape[0] - 2 * pad,) + im.shape[1:])
            for k in range(len(w)):
                oh += w[k] * im[k:k + oh.shape[0]]
            im = np.pad(oh, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
            o = np.zeros((im.shape[0], im.shape[1] - 2 * pad, im.shape[2]))
            for k in range(len(w)):
                o += w[k] * im[:, k:k + o.shape[1]]
            return o

        oracle = sep(np.asarray(x[1], np.float64), np.asarray(filt[1]))
        np.testing.assert_allclose(np.asarray(out[1]), oracle, atol=1e-5)

    def test_noise_is_exact_add(self):
        x = _imgs(b=2, res=16)
        field = jnp.asarray(
            np.random.default_rng(3).normal(0, 0.1, (2, 16, 16, 3)),
            jnp.float32)
        p = _identity_params(2, 16)._replace(noise=field)
        np.testing.assert_array_equal(np.asarray(apply_augment(x, p)),
                                      np.asarray(x + field))

    def test_cutout_mask_oracle(self):
        x = _imgs(b=2, res=16, seed=4)
        # sample 0: centered half-res square (exactly 25% zeroed at a
        # multiple-of-4 res); sample 1: size 0 (bit-identical)
        p = _identity_params(2, 16)._replace(
            cutout=jnp.array([[0.5, 0.5, 0.5], [0.5, 0.5, 0.0]]))
        out = np.asarray(apply_augment(x, p))
        np.testing.assert_array_equal(out[1], np.asarray(x[1]))
        coord = (np.arange(16) + 0.5) / 16
        keep = (np.abs(coord - 0.5)[:, None] >= 0.25) \
            | (np.abs(coord - 0.5)[None, :] >= 0.25)
        np.testing.assert_array_equal(
            out[0], np.asarray(x[0]) * keep[:, :, None])
        assert (out[0] == 0).mean() == 0.25

    def test_sampled_params_respect_new_categories(self):
        k = jax.random.PRNGKey(0)
        # 'bc' leaves the new fields None — program arity preserved for
        # every existing non-fnu config
        pbc = sample_params(k, 8, 16, 1.0, categories="bc")
        assert pbc.filt is None and pbc.noise is None \
            and pbc.cutout is None
        pf = sample_params(k, 64, 16, 1.0, categories="fnu")
        assert np.asarray(pf.filt_active).any()
        assert np.abs(np.asarray(pf.noise)).sum() > 0
        assert (np.asarray(pf.cutout)[:, 2] > 0).any()
        # blit/color untouched by the new draws
        assert not np.asarray(pf.flip).any()
        np.testing.assert_allclose(np.asarray(pf.color_mat),
                                   np.broadcast_to(np.eye(3), (64, 3, 3)))
        # p=0: every gate off
        p0 = sample_params(k, 8, 16, 0.0, categories="fnu")
        assert not np.asarray(p0.filt_active).any()
        assert np.abs(np.asarray(p0.noise)).sum() == 0
        assert (np.asarray(p0.cutout)[:, 2] == 0).all()

    def test_new_draws_leave_bc_streams_unchanged(self):
        k = jax.random.PRNGKey(3)
        a = sample_params(k, 16, 16, 0.7, categories="bc")
        b = sample_params(k, 16, 16, 0.7, categories="bcgfnu")
        for fld in ("flip", "rot_k", "trans", "color_mat", "color_bias"):
            np.testing.assert_array_equal(np.asarray(getattr(a, fld)),
                                          np.asarray(getattr(b, fld)))

    def test_gradients_flow_through_fnu(self):
        x = _imgs()
        g = jax.grad(lambda x: jnp.sum(
            augment(x, 0.9, jax.random.PRNGKey(3),
                    categories="fnu") ** 2))(x)
        g = np.asarray(g)
        assert np.isfinite(g).all() and np.abs(g).sum() > 0

    def test_train_step_runs_with_full_pipeline(self):
        cfg = _ada_cfg(False, **{"aug.categories": "bcgfnu"})
        phase = build_phases(cfg.schedule, cfg.model)[0]
        st = create_train_state(cfg, jax.random.PRNGKey(0))
        step = jax.jit(build_train_step(cfg, phase,
                                        penalty_override=True))
        batch = np.random.default_rng(0).integers(
            0, 255, (4, 16, 16, 3), dtype=np.uint8)
        st, m = step(st, batch)
        assert np.isfinite(float(m["d_loss"]))
        assert np.isfinite(float(m["g_loss"]))
