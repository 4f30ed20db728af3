"""Batch-inference serving API around the jitted G-EMA sampler.

The reference has no serving surface (sampling is a learner method writing
grids to disk — SURVEY.md 3.4); production deployment needs a stable
batch-inference API. ``BatchSampler`` wraps the flagship sampling path —
the truncation-trick G-EMA sampler (train/steps.py::build_sample_fn) —
as ONE compiled program at a fixed serving batch size, with a
reproducibility contract designed for request/response serving:

* **Index-stable latents**: image ``i`` of stream ``seed`` is the same
  array no matter how many images the request asks for or how requests
  are split — ``z_i = normal(fold_in(key(seed), i))`` per sample, not a
  single ``normal(key, (n, dim))`` draw whose values shift with ``n``.
* **Fixed-batch compilation**: every request runs the same XLA program
  (requests are padded up to ``batch_size`` and trimmed), so serving
  latency is flat and no recompiles happen after ``warmup()``.
* **Noise determinism**: per-layer synthesis noise derives from
  ``fold_in(noise_key(seed), batch_index)`` — deterministic for a fixed
  ``batch_size`` (documented: changing batch_size re-draws noise; the
  latents, and therefore image identity/structure, do not move).

Measured on the single v5e chip (scripts/bench_serve.py): see BASELINE.md.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ganlab_tpu.config import Config
from ganlab_tpu.train.steps import build_sample_fn
from ganlab_tpu.utils.image import save_image_grid, to_uint8
from ganlab_tpu.utils.latents import slerp


class BatchSampler:
    """Fixed-batch G-EMA inference service for one trained model.

    Construct from a training workdir (restores the latest checkpoint's
    EMA generator) or directly from a ``TrainState``::

        s = BatchSampler(cfg, workdir="runs/stylegan256")
        imgs = s.generate(64, seed=0)            # (64, H, W, 3) uint8
        path = s.save_grid("grid.png", n=16)
        frames = s.interpolate(seed_a=0, seed_b=1, steps=30)
    """

    def __init__(self, cfg: Config, workdir: str | None = None, *,
                 state=None, batch_size: int = 64,
                 res_log2: int | None = None):
        if (state is None) == (workdir is None):
            raise ValueError("pass exactly one of workdir= or state=")
        if state is None:
            from ganlab_tpu.train.checkpoint import CheckpointManager
            from ganlab_tpu.train.state import create_train_state

            mgr = CheckpointManager(
                os.path.join(workdir, cfg.run.checkpoint_dir))
            try:
                template = create_train_state(
                    cfg, jax.random.PRNGKey(cfg.run.seed))
                state = mgr.restore(template)
            finally:
                mgr.close()
            if state is None:
                raise FileNotFoundError(
                    f"no checkpoint under {workdir}/{cfg.run.checkpoint_dir}")
        self.cfg = cfg
        self.batch_size = int(batch_size)
        self.res_log2 = cfg.model.res_log2 if res_log2 is None else res_log2
        self.resolution = 2 ** self.res_log2
        self.params = state.params_ema
        self.w_avg = state.w_avg
        self._default_psi = float(cfg.model.truncation_psi)

        sample = build_sample_fn(cfg, self.res_log2)
        zdim = cfg.model.latent_dim

        def gen_idx(params, w_avg, zkey, idx, nkey, psi):
            keys = jax.vmap(lambda i: jax.random.fold_in(zkey, i))(idx)
            z = jax.vmap(
                lambda k: jax.random.normal(k, (zdim,), jnp.float32))(keys)
            return sample(params, w_avg, z, nkey, psi, 1.0)

        def gen_z(params, w_avg, z, nkey, psi):
            return sample(params, w_avg, z, nkey, psi, 1.0)

        # alpha static at 1.0 (serving is always post-fade); psi traced so
        # one program serves every truncation setting.
        self._gen_idx = jax.jit(gen_idx)
        self._gen_z = jax.jit(gen_z)

    # ------------------------------------------------------------------
    def warmup(self) -> "BatchSampler":
        """Compile both serving programs (one fixed-batch shape each)."""
        self.generate(1, seed=0)
        z = jnp.zeros((self.batch_size, self.cfg.model.latent_dim),
                      jnp.float32)
        jax.block_until_ready(self._gen_z(
            self.params, self.w_avg, z, jax.random.PRNGKey(0),
            jnp.float32(self._default_psi)))
        return self

    def _batches(self, n: int):
        for start in range(0, n, self.batch_size):
            yield start, min(self.batch_size, n - start)

    def generate(self, n: int, *, seed: int = 0,
                 psi: float | None = None) -> np.ndarray:
        """n images of stream ``seed`` as (n, H, W, C) uint8.

        Image identity is index-stable: ``generate(3)[i] ==
        generate(100)[i]`` for the same seed and batch_size."""
        psi = self._default_psi if psi is None else float(psi)
        zkey = jax.random.PRNGKey(np.uint32(seed))
        nbase = jax.random.fold_in(zkey, 0x6E6F6973)  # 'nois' stream
        out = []
        for b, (start, size) in enumerate(self._batches(n)):
            idx = jnp.arange(start, start + self.batch_size, dtype=jnp.int32)
            imgs = self._gen_idx(self.params, self.w_avg, zkey, idx,
                                 jax.random.fold_in(nbase, b),
                                 jnp.float32(psi))
            out.append(np.asarray(jax.device_get(imgs))[:size])
        return to_uint8(np.concatenate(out, axis=0))

    def generate_from_z(self, z, *, noise_seed: int = 0,
                        psi: float | None = None) -> np.ndarray:
        """Images for explicit latents z (n, latent_dim) -> uint8."""
        psi = self._default_psi if psi is None else float(psi)
        z = np.asarray(z, np.float32)
        n = z.shape[0]
        nbase = jax.random.PRNGKey(np.uint32(noise_seed))
        out = []
        for b, (start, size) in enumerate(self._batches(n)):
            zb = np.zeros((self.batch_size, z.shape[1]), np.float32)
            zb[:size] = z[start:start + size]
            imgs = self._gen_z(self.params, self.w_avg, jnp.asarray(zb),
                               jax.random.fold_in(nbase, b),
                               jnp.float32(psi))
            out.append(np.asarray(jax.device_get(imgs))[:size])
        return to_uint8(np.concatenate(out, axis=0))

    def latents(self, n: int, *, seed: int = 0, start: int = 0) -> np.ndarray:
        """The index-stable z's generate() uses (for editing/interp)."""
        zkey = jax.random.PRNGKey(np.uint32(seed))
        zdim = self.cfg.model.latent_dim
        keys = jax.vmap(lambda i: jax.random.fold_in(zkey, i))(
            jnp.arange(start, start + n, dtype=jnp.int32))
        return np.asarray(jax.vmap(
            lambda k: jax.random.normal(k, (zdim,), jnp.float32))(keys))

    def interpolate(self, *, seed_a: int = 0, seed_b: int = 1,
                    index_a: int = 0, index_b: int = 0, steps: int = 16,
                    psi: float | None = None,
                    noise_seed: int = 0) -> np.ndarray:
        """slerp walk between two stream images -> (steps, H, W, C) uint8."""
        za = self.latents(1, seed=seed_a, start=index_a)[0]
        zb = self.latents(1, seed=seed_b, start=index_b)[0]
        ts = np.linspace(0.0, 1.0, steps, dtype=np.float32)
        z = np.stack([np.asarray(slerp(jnp.asarray(za), jnp.asarray(zb),
                                       float(t))) for t in ts])
        return self.generate_from_z(z, noise_seed=noise_seed, psi=psi)

    def save_grid(self, path: str, n: int = 16, *, seed: int = 0,
                  psi: float | None = None) -> str:
        imgs = self.generate(n, seed=seed, psi=psi)
        # save_image_grid expects [-1, 1] float; convert back from uint8.
        return save_image_grid(
            imgs.astype(np.float32) / 127.5 - 1.0, path)
