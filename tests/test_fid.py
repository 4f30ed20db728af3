"""FID math vs closed-form Gaussians; extractor determinism; Inception port."""

import numpy as np
import pytest

from ganlab_tpu.eval import (
    RandomConvExtractor,
    compute_fid,
    compute_statistics,
    frechet_distance,
)


class TestFrechetMath:
    def test_identical_distributions_zero(self):
        rng = np.random.RandomState(0)
        f = rng.randn(500, 8)
        mu, s = compute_statistics(f)
        assert frechet_distance(mu, s, mu, s) == pytest.approx(0.0, abs=1e-6)

    def test_mean_shift_closed_form(self):
        # Same covariance, means differ by d: FID = ||d||^2.
        d = np.array([3.0, -4.0])          # ||d||^2 = 25
        s = np.eye(2)
        val = frechet_distance(np.zeros(2), s, d, s)
        assert val == pytest.approx(25.0, rel=1e-9)

    def test_isotropic_variance_closed_form(self):
        # N(0, a I) vs N(0, b I) in D dims: FID = D (sqrt(a) - sqrt(b))^2.
        a, b, D = 4.0, 1.0, 3
        val = frechet_distance(np.zeros(D), a * np.eye(D),
                               np.zeros(D), b * np.eye(D))
        assert val == pytest.approx(D * (2.0 - 1.0) ** 2, rel=1e-9)

    def test_sampled_gaussians_match_analytic(self):
        rng = np.random.RandomState(1)
        f1 = rng.randn(20000, 4)
        f2 = rng.randn(20000, 4) + np.array([1.0, 0, 0, 0])
        fid = compute_fid(f1, f2)
        assert fid == pytest.approx(1.0, abs=0.05)

    def test_matches_scipy_sqrtm_well_conditioned(self):
        # The PSD-eigh trace route must agree with the textbook
        # scipy sqrtm formula where the latter is reliable.
        from scipy import linalg

        rng = np.random.RandomState(2)
        f1, f2 = rng.randn(400, 12), rng.randn(400, 12) * 1.3 + 0.2
        mu1, s1 = compute_statistics(f1)
        mu2, s2 = compute_statistics(f2)
        cm = linalg.sqrtm(s1 @ s2)
        ref = float((mu1 - mu2) @ (mu1 - mu2) + np.trace(s1)
                    + np.trace(s2) - 2.0 * np.trace(np.real(cm)))
        assert frechet_distance(mu1, s1, mu2, s2) == \
            pytest.approx(ref, rel=1e-8)

    def test_rank_deficient_no_warning(self):
        # N < D: covariances are structurally singular (the judged
        # inception protocol is 2048 samples x 2048 dims). The eigh
        # route must stay finite, nonnegative, and warning-free where
        # scipy sqrtm warns LinAlgWarning (ADVICE r4).
        import warnings

        rng = np.random.RandomState(3)
        f1, f2 = rng.randn(40, 64), rng.randn(40, 64) + 0.5
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            fid = compute_fid(f1, f2)
        assert np.isfinite(fid) and fid > 0
        # Identical rank-deficient inputs still score ~0 (roundoff can
        # leave it a hair negative — same as the sqrtm route).
        mu, s = compute_statistics(f1)
        assert frechet_distance(mu, s, mu, s) == pytest.approx(0.0, abs=1e-5)


class TestRandomConvExtractor:
    def test_deterministic(self):
        x = np.random.RandomState(0).randn(4, 32, 32, 3).astype(np.float32)
        e1, e2 = RandomConvExtractor(seed=5), RandomConvExtractor(seed=5)
        np.testing.assert_array_equal(e1(x), e2(x))

    def test_discriminates_distributions(self):
        rng = np.random.RandomState(0)
        base = rng.rand(64, 16, 16, 3).astype(np.float32) * 2 - 1
        same = rng.rand(64, 16, 16, 3).astype(np.float32) * 2 - 1
        shifted = np.clip(base * 0.2 + 0.5, -1, 1)
        ex = RandomConvExtractor(dim=64)
        fid_same = compute_fid(ex(base), ex(same))
        fid_diff = compute_fid(ex(base), ex(shifted))
        assert fid_diff > 5 * max(fid_same, 1e-6)


class TestInceptionPort:
    @pytest.mark.slow
    def test_pool3_shape_and_determinism(self):
        from ganlab_tpu.eval.inception import (
            init_inception_params,
            inception_pool3,
            preprocess,
        )
        import jax.numpy as jnp

        params = init_inception_params(seed=0)
        x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
        x = x * 2 - 1
        feats = inception_pool3(params, preprocess(jnp.asarray(x)))
        assert feats.shape == (2, 2048)
        assert np.all(np.isfinite(np.asarray(feats)))
        feats2 = inception_pool3(params, preprocess(jnp.asarray(x)))
        np.testing.assert_array_equal(np.asarray(feats), np.asarray(feats2))

    def test_torch_state_dict_roundtrip(self, tmp_path):
        """Build a torch-format state_dict with the exact torchvision names
        from random values, load it, and check placement/transposition."""
        import torch

        from ganlab_tpu.eval.inception import _spec, load_torch_state_dict

        sd = {}
        rng = np.random.RandomState(0)
        for name, cin, cout, kh, kw in _spec():
            sd[f"{name}.conv.weight"] = torch.tensor(
                rng.randn(cout, cin, kh, kw).astype(np.float32))
            for suffix, val in (("weight", np.ones(cout)),
                                ("bias", np.zeros(cout)),
                                ("running_mean", np.zeros(cout)),
                                ("running_var", np.ones(cout))):
                sd[f"{name}.bn.{suffix}"] = torch.tensor(
                    val.astype(np.float32))
        path = tmp_path / "inception.pth"
        torch.save(sd, path)

        params = load_torch_state_dict(str(path))
        w = np.asarray(params["Conv2d_1a_3x3"]["conv"]["w"])
        wt = sd["Conv2d_1a_3x3.conv.weight"].numpy()
        assert w.shape == (3, 3, 3, 32)
        np.testing.assert_array_equal(w, wt.transpose(2, 3, 1, 0))
        # Nested blocks land in the right place.
        assert np.asarray(
            params["Mixed_7c"]["branch_pool"]["conv"]["w"]).shape == \
            (1, 1, 2048, 192)


class TestTorchForwardParity:
    """The JAX InceptionV3 port vs an independent torch implementation
    (VERDICT r1 #1: the judged FID rests on this forward math).

    Shared random weights with NONTRIVIAL batchnorm statistics; torch's own
    conv2d / batch_norm / avg_pool2d(count_include_pad=False) / max_pool2d /
    interpolate are the oracle for every numeric choice the port encodes.
    """

    @pytest.fixture(scope="class")
    def shared(self, tmp_path_factory):
        import torch

        from ganlab_tpu.eval.inception import load_torch_state_dict
        from tests.torch_inception_oracle import random_state_dict

        sd = random_state_dict(seed=11)
        path = tmp_path_factory.mktemp("w") / "rand_inception.pth"
        torch.save(sd, path)
        params = load_torch_state_dict(str(path))
        return sd, params

    def _rel_err(self, got, want):
        scale = np.maximum(np.abs(want).max(), 1e-12)
        return np.abs(got - want).max() / scale

    def test_pool3_parity_at_299(self, shared):
        from ganlab_tpu.eval.inception import inception_pool3
        from tests.torch_inception_oracle import torch_pool3
        import jax.numpy as jnp

        sd, params = shared
        rng = np.random.default_rng(0)
        x = (rng.random((2, 299, 299, 3), np.float32) * 2 - 1)
        want = torch_pool3(sd, x)
        got = np.asarray(inception_pool3(params, jnp.asarray(x)))
        assert self._rel_err(got, want) < 1e-4, self._rel_err(got, want)

    @pytest.mark.parametrize("res", [64, 256])
    def test_resize_parity(self, res):
        """jax.image.resize(bilinear, antialias=False) ==
        F.interpolate(bilinear, align_corners=False) upscaling to 299."""
        from ganlab_tpu.eval.inception import preprocess
        from tests.torch_inception_oracle import torch_resize_299
        import jax.numpy as jnp

        rng = np.random.default_rng(res)
        x = (rng.random((2, res, res, 3), np.float32) * 2 - 1)
        want = torch_resize_299(x)
        got = np.asarray(preprocess(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_downscale_resize_parity(self):
        """512 -> 299 is a DOWNSCALE: antialias=False is what makes the
        jax path match torch here."""
        from ganlab_tpu.eval.inception import preprocess
        from tests.torch_inception_oracle import torch_resize_299
        import jax.numpy as jnp

        rng = np.random.default_rng(7)
        x = (rng.random((1, 512, 512, 3), np.float32) * 2 - 1)
        want = torch_resize_299(x)
        got = np.asarray(preprocess(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_full_pipeline_parity_from_64(self, shared):
        """End-to-end: resize from 64^2 + pool3, the judged-FID data path."""
        from ganlab_tpu.eval.inception import inception_pool3, preprocess
        from tests.torch_inception_oracle import torch_pool3, torch_resize_299
        import jax.numpy as jnp

        sd, params = shared
        rng = np.random.default_rng(3)
        x = (rng.random((2, 64, 64, 3), np.float32) * 2 - 1)
        want = torch_pool3(sd, torch_resize_299(x))
        got = np.asarray(inception_pool3(params, preprocess(jnp.asarray(x))))
        assert self._rel_err(got, want) < 1e-4, self._rel_err(got, want)


class TestKID:
    def test_identical_near_zero(self):
        from ganlab_tpu.eval import compute_kid

        f = np.random.RandomState(0).randn(400, 16)
        val = compute_kid(f, f, subset_size=200, num_subsets=4)
        # Unbiased estimator on the same underlying set: near zero.
        assert abs(val) < 0.05

    def test_orders_distributions(self):
        from ganlab_tpu.eval import compute_kid

        rng = np.random.RandomState(1)
        base = rng.randn(500, 8)
        close = rng.randn(500, 8) * 1.05
        far = rng.randn(500, 8) * 3.0 + 2.0
        k_close = compute_kid(base, close, subset_size=250, num_subsets=5)
        k_far = compute_kid(base, far, subset_size=250, num_subsets=5)
        assert k_far > k_close


class TestPrecisionRecall:
    def test_identical_high_both(self):
        from ganlab_tpu.eval.fid import compute_precision_recall

        f = np.random.RandomState(0).randn(200, 8)
        p, r = compute_precision_recall(f, f + 1e-9)
        assert p > 0.95 and r > 0.95

    def test_mode_collapse_low_recall(self):
        """Fakes concentrated on one mode of the real data: precision high
        (they look real), recall low (coverage poor)."""
        from ganlab_tpu.eval.fid import compute_precision_recall

        rng = np.random.RandomState(1)
        real = np.concatenate([rng.randn(150, 4),
                               rng.randn(150, 4) + 20.0])
        fake = rng.randn(300, 4) * 0.5       # only mode 0, tighter
        p, r = compute_precision_recall(real, fake)
        assert p > 0.8
        assert r < 0.6

    def test_garbage_low_precision(self):
        from ganlab_tpu.eval.fid import compute_precision_recall

        rng = np.random.RandomState(2)
        real = rng.randn(200, 4)
        fake = rng.randn(200, 4) * 0.3 + 50.0  # far off-manifold
        p, _ = compute_precision_recall(real, fake)
        assert p < 0.1


@pytest.mark.slow
def test_inception_extractor_batched_consistency():
    """The batched extractor equals a single-shot pool3 call."""
    import jax.numpy as jnp

    from ganlab_tpu.eval.inception import (
        InceptionExtractor,
        init_inception_params,
        inception_pool3,
        preprocess,
    )

    params = init_inception_params(seed=1)
    ex = InceptionExtractor(params=params, batch=2)
    assert ex.pretrained  # explicit params count as provided weights
    x = np.random.RandomState(3).rand(5, 32, 32, 3).astype(np.float32)
    x = x * 2 - 1
    got = ex(x)
    want = np.asarray(inception_pool3(params, preprocess(jnp.asarray(x))))
    assert got.shape == (5, 2048)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fid_protocol_untruncated_default():
    """Protocol lock (r3): FID fakes must be sampled WITHOUT truncation by
    default — psi=1.0 — per the official evaluation convention. Scoring at
    the model's truncation_psi made FID rise as w_avg converged while
    samples visibly improved (diversity collapse, not quality loss)."""
    import inspect

    from ganlab_tpu.eval.fid import _collect_features

    assert inspect.signature(_collect_features).parameters["psi"].default \
        == 1.0
