"""Projector noise-optimization A/B on the trained 256^2 demo checkpoint.

VERDICT r3 #8 done-criterion: measured reconstruction improvement on REAL
targets from a trained model, not just the unit-test tiny net. Targets
are real images drawn from the demo run's own data distribution
(ellipses); each is projected twice from the same seed — latent-only vs
latent+noise (official StyleGAN2 projector) — and scored by plain MSE.

Writes a JSON summary plus target|recon|recon-noise grids under
artifacts/projector_ab/.

Usage: python scripts/project_demo_ab.py [--workdir artifacts/stylegan256_demo]
           [--num 4] [--steps 300]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="artifacts/stylegan256_demo")
    ap.add_argument("--out", default="artifacts/projector_ab")
    ap.add_argument("--num", type=int, default=4)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--restarts", type=int, default=8)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ganlab_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from ganlab_tpu.config import load_config
    from ganlab_tpu.data import make_source
    from ganlab_tpu.train.loop import Trainer
    from ganlab_tpu.utils import save_image_grid
    from ganlab_tpu.utils.projector import project

    cfg = load_config(os.path.join(args.workdir, "config.json"))
    tr = Trainer(cfg, workdir=args.workdir, use_mesh=False)
    try:
        assert tr.ckpt.latest_step() is not None, "demo has no checkpoint"
        res = cfg.model.resolution
        src = make_source(cfg.data, res, seed=12345)
        target = src.batch(args.num, res).astype(np.float32) / 127.5 - 1.0

        state = tr.state
        rows = {}
        recons = {}
        for name, kw in (("latent_only", {}),
                         ("with_noise", {"optimize_noise": True})):
            r = project(cfg, state.params_ema, state.w_avg, target,
                        num_steps=args.steps, num_restarts=args.restarts,
                        seed=0, **kw)
            img = np.asarray(jax.device_get(r.images))
            recons[name] = img
            per = np.mean((img - target) ** 2, axis=(1, 2, 3))
            rows[name] = {"mse_per_target": [round(float(m), 5)
                                             for m in per],
                          "mse_mean": round(float(per.mean()), 5)}
            print(json.dumps({name: rows[name]}), flush=True)

        os.makedirs(args.out, exist_ok=True)
        trip = np.stack([target, recons["latent_only"],
                         recons["with_noise"]], 1).reshape(
            3 * args.num, res, res, 3)
        grid = save_image_grid(trip, os.path.join(args.out, "triplets.png"),
                               ncol=3)
        summary = {
            "workdir": args.workdir, "steps": args.steps,
            "num_targets": args.num, **rows,
            "noise_opt_mse_ratio": round(
                rows["with_noise"]["mse_mean"]
                / max(rows["latent_only"]["mse_mean"], 1e-12), 4),
            "grid": grid,
        }
        with open(os.path.join(args.out, "summary.json"), "w") as f:
            json.dump(summary, f, indent=1)
        print(json.dumps(summary))
    finally:
        tr.close()


if __name__ == "__main__":
    main()
