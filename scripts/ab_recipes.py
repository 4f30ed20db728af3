"""Recipe A/B: strict reference-parity vs the fast recipe, judged by FID.

The fast recipe (lazy R1 k=16 + fused simultaneous G/D update) buys
~1.8x throughput over strict parity (BASELINE.md). Its FID-neutrality
claim is literature-based (StyleGAN2 sec. 5.1); this harness MEASURES it:
two runs from the same seed, same data, same schedule — one per recipe —
evaluated with the same Inception extractor and real-feature set.

Gated on weights: with $GANLAB_INCEPTION_WEIGHTS set (torchvision
inception_v3 state_dict) and a real dataset configured, this produces the
judged numbers. Without weights, ``--extractor inception`` uses the
architecture-true random-init Inception port (forward math proven against
a torch oracle in tests/test_fid.py), and the default ``auto`` uses the
fast random-conv extractor — both valid for RELATIVE comparison between
the two runs, which is exactly what neutrality needs.

Usage:
    python scripts/ab_recipes.py [--res 64] [--kimg 64] [--batch 32]
        [--dataset synthetic] [--data-dir DIR] [--samples 2048]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RECIPES = {
    "parity": {"loss.penalty_every": 1, "loss.fused_g_step": False},
    "fast": {"loss.penalty_every": 16, "loss.fused_g_step": True},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--kimg", type=float, default=64.0)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--dataset", default="synthetic")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--samples", type=int, default=2048)
    ap.add_argument("--workdir", default="ab_runs")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--extractor", choices=("auto", "inception"),
                    default="auto")
    ap.add_argument("--fmap-base", type=int, default=8192)
    ap.add_argument("--latent-dim", type=int, default=512)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ganlab_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ganlab_tpu.config import get_config
    from ganlab_tpu.data import make_source
    from ganlab_tpu.eval.fid import (
        compute_fid,
        compute_kid,
        get_extractor,
        _collect_features,
    )
    from ganlab_tpu.train.loop import Trainer

    if args.extractor == "inception":
        from ganlab_tpu.eval.inception import InceptionExtractor

        extractor = InceptionExtractor(
            weights_path=os.environ.get("GANLAB_INCEPTION_WEIGHTS"))
    else:
        extractor = get_extractor()
    results = {}
    for name, recipe in RECIPES.items():
        over = {
            "model.resolution": args.res,
            "model.fmap_base": args.fmap_base,
            "model.latent_dim": args.latent_dim,
            "schedule.progressive": False,
            "schedule.start_res": args.res,
            "schedule.batch_schedule": {args.res: args.batch},
            "schedule.total_kimg": args.kimg,
            "data.dataset": args.dataset,
            "run.seed": args.seed,
            "run.sample_every": 0, "run.checkpoint_every": 0,
            "run.log_every": 200,
            **recipe,
        }
        if args.data_dir:
            over["data.data_dir"] = args.data_dir
        cfg = get_config("stylegan-256", **over)
        wd = os.path.join(args.workdir, name)
        os.makedirs(wd, exist_ok=True)
        print(f"# training recipe={name} res={args.res} "
              f"kimg={args.kimg} ...", flush=True)
        tr = Trainer(cfg, workdir=wd, use_mesh=False)
        try:
            tr.train()
        finally:
            tr.close()

        real, fake = _collect_features(
            cfg, wd, args.samples, extractor,
            make_source(cfg.data, args.res, seed=args.seed + 99), batch=64)
        results[name] = {
            "fid": round(compute_fid(real, fake), 4),
            "kid": round(compute_kid(real, fake,
                                     subset_size=min(1000, args.samples // 2)),
                         6),
        }
        print(json.dumps({name: results[name]}), flush=True)

    pf, ff = results["parity"]["fid"], results["fast"]["fid"]
    rel = (ff - pf) / max(pf, 1e-9)
    print(json.dumps({
        "metric": "recipe A/B FID",
        "extractor": extractor.name,
        "pretrained_weights": getattr(extractor, "pretrained", False),
        "parity": results["parity"], "fast": results["fast"],
        "fast_vs_parity_fid_rel": round(rel, 4),
        "neutral_within_5pct": bool(abs(rel) <= 0.05),
    }))


if __name__ == "__main__":
    main()
