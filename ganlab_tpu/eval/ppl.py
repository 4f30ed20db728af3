"""Perceptual Path Length (StyleGAN, Karras et al. 2018 §4.1) — the
latent-space smoothness metric the StyleGAN papers report next to FID.

The reference framework has no quality metrics at all (SURVEY.md §5);
this completes the eval stack (FID/KID/precision-recall in eval/fid.py)
with the official PPL protocol:

  d = lpips(G(lat(t)), G(lat(t + eps))) / eps^2

averaged over random interpolation endpoints, with the official 1%/99%
outlier filter. ``space='w'`` lerps in W (style families), ``'z'``
slerps on the latent sphere then maps; ``sampling='full'`` draws
t ~ U(0,1), ``'end'`` pins t = 0 (the paper reports both). Both
endpoint images share one noise key (path length must measure the
latent walk, not noise redraws), and sampling is untruncated.

TPU-first: each batch of pairs is ONE jitted program — mapping, both
endpoint syntheses and the interpolation all fused; the LPIPS distance
(eval/lpips.py) is a second jitted program. Host work is the final
percentile filter.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from ganlab_tpu.eval.lpips import LPIPSDistance


def compute_ppl(cfg, params, *, num_samples: int = 5000,
                epsilon: float = 1e-4, space: str | None = None,
                sampling: str = "full", batch: int = 32, seed: int = 0,
                distance=None, res_log2: int | None = None) -> dict:
    """PPL of a generator. Returns ``{"ppl", "num", "space", "sampling"}``.

    ``space=None`` auto-selects: 'w' for style families, 'z' otherwise.
    ``distance``: callable (imgs_a, imgs_b) -> (B,) perceptual
    distances; defaults to :class:`LPIPSDistance` (pretrained when
    ``$GANLAB_LPIPS_WEIGHTS`` is set, random-VGG fallback otherwise —
    relative comparisons only, printed as a warning like FID's).
    """
    from ganlab_tpu.models import build_models
    from ganlab_tpu.models.stylegan import num_style_layers
    from ganlab_tpu.utils.latents import lerp, slerp

    if space not in (None, "w", "z"):
        raise ValueError(f"space {space!r} not in ('w', 'z')")
    if sampling not in ("full", "end"):
        raise ValueError(f"sampling {sampling!r} not in ('full', 'end')")

    g_model, _ = build_models(cfg.model)
    is_style = hasattr(g_model, "map_latents")
    if space is None:
        space = "w" if is_style else "z"
    if space == "w" and not is_style:
        raise ValueError("space='w' needs a style-based family; use "
                         "space='z' for progan/resnetgan")
    lg = cfg.model.res_log2 if res_log2 is None else res_log2
    dist = distance or LPIPSDistance()
    if not getattr(dist, "pretrained", True):
        print("WARNING: no VGG16 weights (set $GANLAB_LPIPS_WEIGHTS); "
              "PPL uses random features — valid for relative comparison "
              "only", flush=True)
    dim = cfg.model.latent_dim
    nl = num_style_layers(lg) if is_style else 0
    eps = jnp.float32(epsilon)

    def synth_p(p, lat, noise_key):
        if is_style:
            ws = jnp.broadcast_to(lat[:, None, :],
                                  (lat.shape[0], nl, lat.shape[-1]))
            img = g_model.apply(p, ws, lg, 1.0, method="synthesize",
                                rngs={"noise": noise_key})
        else:
            img = g_model.apply(p, lat, lg, 1.0)
        return img.astype(jnp.float32)

    # Generator params are a jit ARGUMENT (ADVICE r3): closing over them
    # bakes every weight into the program as a constant — oversized
    # compiles are a documented relay hazard for the big presets.
    @jax.jit
    def pair_batch(p, key):
        kz, kt, kn = jax.random.split(key, 3)
        z = jax.random.normal(kz, (2, batch, dim))
        t = (jax.random.uniform(kt, (batch, 1))
             if sampling == "full" else jnp.zeros((batch, 1)))
        if space == "w":
            w = g_model.apply(p, z.reshape(2 * batch, dim),
                              method="map_latents")
            w = w.astype(jnp.float32).reshape(2, batch, -1)
            lat0 = lerp(w[0], w[1], t)
            lat1 = lerp(w[0], w[1], t + eps)
        else:
            z0 = slerp(z[0], z[1], t)
            z1 = slerp(z[0], z[1], t + eps)
            if is_style:
                zz = jnp.concatenate([z0, z1], 0)
                ww = g_model.apply(p, zz, method="map_latents")
                lat0, lat1 = jnp.split(ww.astype(jnp.float32), 2, 0)
            else:
                lat0, lat1 = z0, z1
        return synth_p(p, lat0, kn), synth_p(p, lat1, kn)

    key = jax.random.PRNGKey(seed)
    dists = []
    done = 0
    while done < num_samples:
        key, k = jax.random.split(key)
        img0, img1 = pair_batch(params, k)
        dists.append(np.asarray(dist(img0, img1), np.float64)
                     / float(epsilon) ** 2)
        done += batch
    d = np.concatenate(dists)[:num_samples]
    # official outlier filter: keep [1st, 99th] percentile
    lo, hi = np.percentile(d, 1), np.percentile(d, 99)
    kept = d[(d >= lo) & (d <= hi)]
    return {"ppl": float(kept.mean()), "num": int(d.size),
            "space": space, "sampling": sampling}


def evaluate_checkpoint_ppl(cfg, workdir: str, *, step: int | None = None,
                            **kw) -> dict:
    """PPL of the latest (or ``step``'s) checkpoint's G-EMA."""
    from ganlab_tpu.train.checkpoint import CheckpointManager
    from ganlab_tpu.train.state import create_train_state

    state = create_train_state(cfg, jax.random.PRNGKey(cfg.run.seed))
    ckpt = CheckpointManager(os.path.join(workdir, cfg.run.checkpoint_dir))
    try:
        restored = ckpt.restore(state, step=step)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint under {workdir}")
        return compute_ppl(cfg, restored.params_ema, **kw)
    finally:
        ckpt.close()
