"""Loss / penalty parity tests vs torch-autograd oracles on tiny tensors."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from ganlab_tpu.ops import losses


def rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


class TestBasicLosses:
    def test_wgan(self):
        r, f = rand(8, seed=1), rand(8, seed=2)
        d = losses.d_loss_wgan(jnp.array(r), jnp.array(f))
        g = losses.g_loss_wgan(jnp.array(f))
        assert float(d) == pytest.approx(f.mean() - r.mean(), rel=1e-5)
        assert float(g) == pytest.approx(-f.mean(), rel=1e-5)

    def test_nonsaturating_matches_torch_bce(self):
        r, f = rand(16, seed=1), rand(16, seed=2)
        d = losses.d_loss_nonsaturating(jnp.array(r), jnp.array(f))
        g = losses.g_loss_nonsaturating(jnp.array(f))
        bce = torch.nn.functional.binary_cross_entropy_with_logits
        rt, ft = torch.tensor(r), torch.tensor(f)
        d_t = bce(rt, torch.ones_like(rt)) + bce(ft, torch.zeros_like(ft))
        g_t = bce(ft, torch.ones_like(ft))
        assert float(d) == pytest.approx(float(d_t), rel=1e-5)
        assert float(g) == pytest.approx(float(g_t), rel=1e-5)

    def test_minimax_g_is_negated_saturating(self):
        f = rand(8)
        g = losses.g_loss_minimax(jnp.array(f))
        # +E[log(1 - sigmoid(f))] = -E[softplus(f)]
        expected = -np.mean(np.logaddexp(0.0, f))
        assert float(g) == pytest.approx(expected, rel=1e-4)

    def test_loss_registries_complete(self):
        for name in ("wgan", "wgan-gp", "nonsaturating", "minimax"):
            assert name in losses.D_LOSSES and name in losses.G_LOSSES


class TestGradientPenalties:
    """Penalties vs torch.autograd.grad oracles using an identical critic."""

    @staticmethod
    def _critic_jax(w):
        # Simple nonlinear critic: sum over a squared projection.
        wj = jnp.array(w)

        def critic(x):
            flat = x.reshape(x.shape[0], -1)
            h = jnp.tanh(flat @ wj)
            return jnp.sum(jnp.square(h), axis=-1)

        return critic

    @staticmethod
    def _critic_torch(w):
        wt = torch.tensor(w)

        def critic(x):
            flat = x.reshape(x.shape[0], -1)
            h = torch.tanh(flat @ wt)
            return torch.sum(h**2, dim=-1)

        return critic

    def test_r1_matches_torch(self):
        x = rand(4, 3, 3, 2, seed=3)
        w = rand(18, 5, seed=4) * 0.3
        val = losses.r1_penalty(self._critic_jax(w), jnp.array(x), gamma=10.0)

        xt = torch.tensor(x, requires_grad=True)
        out = self._critic_torch(w)(xt).sum()
        (grads,) = torch.autograd.grad(out, xt)
        expected = 5.0 * (grads.reshape(4, -1).pow(2).sum(dim=1)).mean()
        assert float(val) == pytest.approx(float(expected), rel=1e-4)

    def test_wgan_gp_matches_torch(self):
        real = rand(4, 3, 3, 2, seed=5)
        fake = rand(4, 3, 3, 2, seed=6)
        w = rand(18, 5, seed=7) * 0.3
        key = jax.random.PRNGKey(0)
        val = losses.wgan_gp(self._critic_jax(w), jnp.array(real),
                             jnp.array(fake), key, lambda_gp=10.0)

        # Reproduce the same interpolation eps in torch.
        eps = np.asarray(
            jax.random.uniform(key, (4, 1, 1, 1), dtype=jnp.float32))
        x_hat = torch.tensor(eps * real + (1 - eps) * fake,
                             requires_grad=True)
        out = self._critic_torch(w)(x_hat).sum()
        (grads,) = torch.autograd.grad(out, x_hat)
        norms = torch.sqrt(grads.reshape(4, -1).pow(2).sum(dim=1) + 1e-12)
        expected = 10.0 * ((norms - 1.0) ** 2).mean()
        assert float(val) == pytest.approx(float(expected), rel=1e-4)

    def test_gp_zero_for_unit_gradient_critic(self):
        # critic(x) = sum(x) has gradient exactly 1 per element; with a
        # 1-element "image" the norm is 1 so the penalty vanishes.
        critic = lambda x: jnp.sum(x.reshape(x.shape[0], -1), axis=-1)
        real = jnp.ones((4, 1, 1, 1))
        fake = jnp.zeros((4, 1, 1, 1))
        val = losses.wgan_gp(critic, real, fake, jax.random.PRNGKey(1))
        assert float(val) == pytest.approx(0.0, abs=1e-6)

    def test_drift_penalty(self):
        r = rand(8, seed=9)
        val = losses.drift_penalty(jnp.array(r), eps_drift=1e-3)
        assert float(val) == pytest.approx(1e-3 * np.mean(r**2), rel=1e-5)

    def test_penalties_jit_and_grad(self):
        """The double-backward must itself be differentiable under jit
        (it sits inside the D loss, which we take grad of)."""
        w = rand(18, 5, seed=10) * 0.3

        @jax.jit
        def d_obj(wp, real, fake, key):
            def critic(x):
                h = jnp.tanh(x.reshape(x.shape[0], -1) @ wp)
                return jnp.sum(jnp.square(h), axis=-1)

            return losses.wgan_gp(critic, real, fake, key)

        g = jax.grad(d_obj)(jnp.array(w), jnp.array(rand(4, 3, 3, 2)),
                            jnp.array(rand(4, 3, 3, 2, seed=11)),
                            jax.random.PRNGKey(2))
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.max(jnp.abs(g))) > 0.0
