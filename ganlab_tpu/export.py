"""Portable inference artifact: the G-EMA sampler as serialized StableHLO.

The reference has no deployment story — sampling is a learner method that
writes grids to disk (SURVEY.md §3.4), so "deploying" it means shipping a
Python environment plus a pickle checkpoint. On TPU the natural unit of
deployment is a *compiled program*: ``export_sampler`` captures the
truncation-trick G-EMA sampler (train/steps.py::build_sample_fn) with the
trained parameters and w̄ baked in as program constants, lowers it through
``jax.export`` to StableHLO, and writes ONE self-contained zip artifact:

* ``meta.json``    — resolution, latent dim, batch size, default psi,
  model family, target platforms, format version;
* ``gen_idx.bin``  — serialized program: (zkey, idx, nkey, psi) → uint8
  images, producing BatchSampler's index-stable latent stream
  (``z_i = normal(fold_in(zkey, i))``) *inside* the program;
* ``gen_z.bin``    — serialized program: (z, nkey, psi) → uint8 images
  for explicit latents.

Both programs are exported for several platforms at once (default
``("tpu", "cpu")``) — the same artifact serves on a TPU pod and falls
back to CPU for smoke tests — and StableHLO's compatibility guarantees
make it robust to jax version skew between trainer and server.  Images
are converted to uint8 in-graph, so the host transfer is 4× smaller than
shipping floats.

``ExportedSampler`` loads the artifact and exposes the same
request/response contract as ``serve.BatchSampler`` (fixed-batch padding
+ trim, index-stable streams, traced psi) without needing the model code,
the config system, or a checkpoint — only jax itself.
"""

from __future__ import annotations

import json
import zipfile

import jax
import jax.numpy as jnp
import numpy as np

FORMAT_VERSION = 1

# Stream label for the per-request noise key; must match serve.BatchSampler.
_NOISE_STREAM = 0x6E6F6973  # 'nois'


def _to_uint8(x):
    """In-graph float [-1,1] NHWC → uint8 (same math as utils.image.to_uint8)."""
    x = jnp.clip((x.astype(jnp.float32) + 1.0) * 127.5, 0.0, 255.0)
    return x.astype(jnp.uint8)


def export_sampler(cfg, state, path, *, batch_size: int = 16,
                   res_log2: int | None = None,
                   platforms=("tpu", "cpu"),
                   default_psi: float | None = None) -> str:
    """Serialize the G-EMA sampler of ``state`` into a zip artifact.

    ``state`` is a TrainState (or anything with ``params_ema`` and
    ``w_avg``). The exported programs have a FIXED batch dimension
    (``batch_size``) — the loader pads and trims requests, exactly like
    ``serve.BatchSampler``.
    """
    from ganlab_tpu.train.steps import build_sample_fn

    res_log2 = cfg.model.res_log2 if res_log2 is None else res_log2
    sample = build_sample_fn(cfg, res_log2)
    zdim = cfg.model.latent_dim
    params_ema, w_avg = state.params_ema, state.w_avg

    def gen_idx(zkey, idx, nkey, psi):
        keys = jax.vmap(lambda i: jax.random.fold_in(zkey, i))(idx)
        z = jax.vmap(
            lambda k: jax.random.normal(k, (zdim,), jnp.float32))(keys)
        return _to_uint8(sample(params_ema, w_avg, z, nkey, psi, 1.0))

    def gen_z(z, nkey, psi):
        return _to_uint8(sample(params_ema, w_avg, z, nkey, psi, 1.0))

    from jax import export as jax_export

    key_t = jax.ShapeDtypeStruct((2,), jnp.uint32)
    psi_t = jax.ShapeDtypeStruct((), jnp.float32)
    plats = list(platforms)
    exp_idx = jax_export.export(jax.jit(gen_idx), platforms=plats)(
        key_t, jax.ShapeDtypeStruct((batch_size,), jnp.int32), key_t, psi_t)
    exp_z = jax_export.export(jax.jit(gen_z), platforms=plats)(
        jax.ShapeDtypeStruct((batch_size, zdim), jnp.float32), key_t, psi_t)

    meta = {
        "format_version": FORMAT_VERSION,
        "model": cfg.model.model,
        "resolution": 2 ** res_log2,
        "res_log2": res_log2,
        "latent_dim": zdim,
        "batch_size": int(batch_size),
        "default_psi": float(cfg.model.truncation_psi
                             if default_psi is None else default_psi),
        "platforms": plats,
    }
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("meta.json", json.dumps(meta, indent=2))
        zf.writestr("gen_idx.bin", exp_idx.serialize())
        zf.writestr("gen_z.bin", exp_z.serialize())
    return path


class ExportedSampler:
    """Serve images from an ``export_sampler`` artifact.

    Mirrors ``serve.BatchSampler``'s contract — index-stable latents,
    fixed-batch padding + trim, traced truncation psi — with the network
    and weights living entirely inside the serialized StableHLO programs;
    no model code or checkpoint is needed at serve time::

        s = ExportedSampler("sampler.ganlab.zip")
        imgs = s.generate(64, seed=0)        # (64, H, W, 3) uint8
    """

    def __init__(self, path: str):
        from jax import export as jax_export

        with zipfile.ZipFile(path) as zf:
            self.meta = json.loads(zf.read("meta.json"))
            if self.meta.get("format_version") != FORMAT_VERSION:
                raise ValueError(
                    f"unsupported artifact version "
                    f"{self.meta.get('format_version')!r} in {path}")
            self._gen_idx = jax_export.deserialize(zf.read("gen_idx.bin"))
            self._gen_z = jax_export.deserialize(zf.read("gen_z.bin"))
        self.batch_size = int(self.meta["batch_size"])
        self.resolution = int(self.meta["resolution"])
        self.latent_dim = int(self.meta["latent_dim"])
        self._default_psi = float(self.meta["default_psi"])

    def _batches(self, n: int):
        for start in range(0, n, self.batch_size):
            yield start, min(self.batch_size, n - start)

    def generate(self, n: int, *, seed: int = 0,
                 psi: float | None = None) -> np.ndarray:
        """n images of stream ``seed`` as (n, H, W, C) uint8; image ``i``
        is identical to ``BatchSampler.generate``'s image ``i`` for the
        same seed and batch_size."""
        psi = self._default_psi if psi is None else float(psi)
        zkey = jax.random.PRNGKey(np.uint32(seed))
        nbase = jax.random.fold_in(zkey, _NOISE_STREAM)
        out = []
        for b, (start, size) in enumerate(self._batches(n)):
            idx = np.arange(start, start + self.batch_size, dtype=np.int32)
            imgs = self._gen_idx.call(
                np.asarray(zkey), idx,
                np.asarray(jax.random.fold_in(nbase, b)), np.float32(psi))
            out.append(np.asarray(jax.device_get(imgs))[:size])
        return np.concatenate(out, axis=0)

    def generate_from_z(self, z, *, noise_seed: int = 0,
                        psi: float | None = None) -> np.ndarray:
        """Images for explicit latents z (n, latent_dim) → uint8."""
        psi = self._default_psi if psi is None else float(psi)
        z = np.asarray(z, np.float32)
        n = z.shape[0]
        nbase = jax.random.PRNGKey(np.uint32(noise_seed))
        out = []
        for b, (start, size) in enumerate(self._batches(n)):
            zb = np.zeros((self.batch_size, z.shape[1]), np.float32)
            zb[:size] = z[start:start + size]
            imgs = self._gen_z.call(
                zb, np.asarray(jax.random.fold_in(nbase, b)),
                np.float32(psi))
            out.append(np.asarray(jax.device_get(imgs))[:size])
        return np.concatenate(out, axis=0)
