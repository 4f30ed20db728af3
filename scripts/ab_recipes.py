"""Recipe A/B: strict reference-parity vs the fast recipe, judged by FID.

The fast recipe (lazy R1 k=16 + fused simultaneous G/D update) buys
~1.8x throughput over strict parity (BASELINE.md). Its FID-neutrality
claim is literature-based (StyleGAN2 sec. 5.1); this harness MEASURES it:
per seed, two runs from the same seed, same data, same schedule — one per
recipe — each scored by BOTH feature extractors (FID + KID):

* the architecture-true InceptionV3 port (forward math proven against a
  torch oracle in tests/test_fid.py) — pretrained when
  $GANLAB_INCEPTION_WEIGHTS points at a torchvision inception_v3
  state_dict, random-init otherwise;
* the fast random-conv extractor.

Random-init/random-conv features are valid for RELATIVE comparison
between the two runs — which is exactly what neutrality needs; with the
weights file the same command produces the judged absolute numbers.

Noise control: a single end-of-run FID at short kimg is dominated by
training-curve fluctuation (measured r3: ~27% seed-to-seed spread at
64 kimg — far above the 5% question). Each run is therefore scored at
THREE checkpoints (2/3, 5/6, 1.0 of the budget) and the per-run score is
their mean — time-averaging the fluctuation — with >= 2 seeds on top.

Results are appended per (seed, recipe) to <workdir>/results.json so a
killed run resumes cheaply, and the final summary JSON aggregates the
fast-vs-parity FID deltas across seeds per extractor — with a bootstrap
95% CI of the mean relative delta (VERDICT r3 #2: "within 5%" needs the
noise quantified, not asserted). The CI resamples SEEDS (the independent
unit; checkpoints within a run share a training trajectory) and is
reported alongside a paired per-checkpoint view for transparency.

Usage:
    python scripts/ab_recipes.py [--res 64] [--kimg 192] [--batch 32]
        [--dataset synthetic] [--data-dir DIR] [--samples 2048]
        [--seeds 0,1,2] [--summarize-only]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Every arm pins ALL THREE recipe axes explicitly: the preset default
# changed over the A/B campaign (fused_seq became the r3 default), and
# an arm inheriting a drifting default would silently change meaning.
RECIPES = {
    "parity": {"loss.penalty_every": 1, "loss.fused_g_step": False,
               "loss.fused_seq": False},
    "fast": {"loss.penalty_every": 16, "loss.fused_g_step": True,
             "loss.fused_seq": False},
    # Isolation arms: the fast recipe is TWO deviations; these attribute
    # an observed FID delta to one of them (--recipes lazy16,fused).
    "lazy16": {"loss.penalty_every": 16, "loss.fused_g_step": False,
               "loss.fused_seq": False},
    "fused": {"loss.penalty_every": 1, "loss.fused_g_step": True,
              "loss.fused_seq": False},
    # Shared-batch sequential step (r3): fused's G-forward sharing with
    # sequential (post-update-D) semantics; the single deviation is G
    # scoring the D step's latent batch instead of a fresh one.
    # Measured Finding 5 (BASELINE.md) -> promoted to the preset default.
    "fusedseq": {"loss.penalty_every": 16, "loss.fused_g_step": False,
                 "loss.fused_seq": True},
    # Two-phase lazy regularization (r4, Finding 7 follow-up): the
    # official Dmain/Dreg structure — main loss every step, a
    # penalty-only step on the lazy cadence. Candidate mitigation for
    # lazy16's short-budget FID transient (eager-like gradient timing
    # at near-lazy cost).
    "regsep": {"loss.penalty_every": 16, "loss.fused_g_step": False,
               "loss.fused_seq": False, "loss.reg_separate": True},
    # ADA measurement arms (vs parity, on a SMALL pool via --num-images):
    # quantify the augmentation extension's effect in the D-overfitting
    # regime it was built for — blit+color, and with the geometric
    # category on top ("adag"). Scoring is GENERALIZATION-based (real
    # features always come from the full distribution), so memorizing
    # the pool cannot score well.
    "ada": {"loss.penalty_every": 1, "loss.fused_g_step": False,
            "loss.fused_seq": False, "aug.mode": "ada", "aug.p_init": 0.0},
    "adag": {"loss.penalty_every": 1, "loss.fused_g_step": False,
             "loss.fused_seq": False, "aug.mode": "ada", "aug.p_init": 0.0,
             "aug.categories": "bcg"},
}


def _bootstrap_ci(values: list[float], n_boot: int = 10000,
                  alpha: float = 0.05, seed: int = 0) -> list[float]:
    """Percentile bootstrap CI of the mean, resampling the given values
    (one per independent unit = one per seed) with replacement."""
    import random

    rng = random.Random(seed)
    n = len(values)
    means = sorted(sum(rng.choices(values, k=n)) / n for _ in range(n_boot))
    lo = means[int((alpha / 2) * n_boot)]
    hi = means[min(int((1 - alpha / 2) * n_boot), n_boot - 1)]
    return [round(lo, 4), round(hi, 4)]


def summarize(results: dict, extractors, seeds, args) -> dict:
    """Aggregate per-(seed, arm) rows into the arm-vs-parity summary."""
    arms = sorted({t.split("_", 1)[1] for t in results} - {"parity"})
    summary = {"metric": "recipe A/B FID vs parity",
               "res": args.res, "kimg": args.kimg, "batch": args.batch,
               "samples": args.samples, "eval_fracs": args.eval_fracs,
               "scoring": "mean FID/KID over the eval-frac checkpoints",
               "ci": "bootstrap 95% CI of the mean per-seed relative "
                     "FID delta (seeds resampled; 10k draws)",
               "pretrained_weights": bool(
                   os.environ.get("GANLAB_INCEPTION_WEIGHTS")),
               "seeds": seeds, "arms": arms, "per_extractor": {}}
    for ename in extractors:
        per_arm = {}
        for arm in arms:
            rels, rows, seed_ckpt_rels = [], {}, []
            for seed in seeds:
                pk, ak = f"s{seed}_parity", f"s{seed}_{arm}"
                if pk not in results or ak not in results:
                    continue
                p, a = results[pk][ename], results[ak][ename]
                rel = (a["fid"] - p["fid"]) / max(p["fid"], 1e-9)
                rels.append(rel)
                rows[f"seed{seed}"] = {"parity": p, arm: a,
                                       "fid_rel": round(rel, 4)}
                # Paired per-checkpoint view (same eval fraction in both
                # arms). Checkpoints within a seed share a trajectory, so
                # the CI unit stays the seed: collect each seed's own
                # paired mean and bootstrap over seeds, same as mean_rel.
                pairs = [(ca[ename]["fid"] - cp[ename]["fid"])
                         / max(cp[ename]["fid"], 1e-9)
                         for cp, ca in zip(results[pk]["checkpoints"],
                                           results[ak]["checkpoints"])]
                seed_ckpt_rels.append(sum(pairs) / len(pairs))
            if not rels:
                continue
            mean_rel = sum(rels) / len(rels)
            per_arm[arm] = {
                **rows,
                "mean_fid_rel": round(mean_rel, 4),
                "max_abs_fid_rel": round(max(abs(r) for r in rels), 4),
                "fid_rel_ci95": _bootstrap_ci(rels),
                # Second aggregation (VERDICT r4): equal-weight mean of
                # per-checkpoint relative deltas. Upweights early
                # checkpoints relative to mean_fid_rel (which compares
                # checkpoint-MEAN FIDs, so large-FID early points enter
                # through their absolute delta). Both are reported; the
                # harness's pre-registered primary is mean_fid_rel.
                "ckpt_paired_mean_rel": round(
                    sum(seed_ckpt_rels) / len(seed_ckpt_rels), 4),
                "ckpt_paired_ci95": _bootstrap_ci(seed_ckpt_rels),
                "n_seeds": len(rels),
                "neutral_within_5pct": bool(abs(mean_rel) <= 0.05),
                "ci_excludes_plus_5pct": bool(_bootstrap_ci(rels)[1] < 0.05),
            }
        summary["per_extractor"][ename] = per_arm
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--kimg", type=float, default=192.0)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--eval-fracs", default="0.667,0.833,1.0",
                    help="checkpoint fractions of --kimg scored and averaged")
    ap.add_argument("--dataset", default="synthetic")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--num-images", type=int, default=None,
                    help="pool size for the procedural sources (small = "
                         "the D-overfitting regime; see DataConfig)")
    ap.add_argument("--samples", type=int, default=2048)
    ap.add_argument("--workdir", default="ab_runs")
    ap.add_argument("--seeds", default="0,1",
                    help="comma-separated run seeds (>=2 for spread)")
    ap.add_argument("--recipes", default="parity,fast",
                    help="comma-separated recipe arms to run "
                         f"(available: {','.join(RECIPES)})")
    ap.add_argument("--summarize-only", action="store_true",
                    help="recompute summary.json from existing "
                         "results.json without training anything")
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",") if s != ""]
    recipes = {n: RECIPES[n] for n in args.recipes.split(",") if n}

    if args.summarize_only:
        with open(os.path.join(args.workdir, "results.json")) as f:
            results = json.load(f)
        extractor_names = sorted(next(iter(results.values()))
                                 ["checkpoints"][0].keys() - {"step"})
        summary = summarize(results, extractor_names, seeds, args)
        with open(os.path.join(args.workdir, "summary.json"), "w") as f:
            json.dump(summary, f, indent=1)
        print(json.dumps(summary, indent=1))
        return

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
    from ganlab_tpu.eval.inception import InceptionExtractor
    from ganlab_tpu.train.loop import Trainer

    extractors = {
        "inception": InceptionExtractor(
            weights_path=os.environ.get("GANLAB_INCEPTION_WEIGHTS")),
        "randconv": get_extractor(),
    }

    os.makedirs(args.workdir, exist_ok=True)
    results_path = os.path.join(args.workdir, "results.json")
    results: dict[str, dict] = {}
    if os.path.exists(results_path):
        with open(results_path) as f:
            results = json.load(f)
        print(f"# resuming: {sorted(results)} already scored", flush=True)

    for seed in seeds:
        for name, recipe in recipes.items():
            tag = f"s{seed}_{name}"
            if tag in results:
                continue
            over = {
                "model.resolution": args.res,
                "schedule.progressive": False,
                "schedule.start_res": args.res,
                "schedule.batch_schedule": {args.res: args.batch},
                "schedule.total_kimg": args.kimg,
                "data.dataset": args.dataset,
                "run.seed": seed,
                "run.sample_every": 0, "run.checkpoint_every": 0,
                "run.log_every": 200,
                # Short runs: warm up the G-EMA horizon (StyleGAN2-ADA
                # ema_rampup) so the judged EMA generator isn't anchored
                # to the random init. Same for both recipes.
                "optim.ema_rampup": 0.05,
                # In-training metric curve (run.eval_kimg, r4): FID/KID
                # every 8 kimg in each run's train.jsonl — divergence is
                # visible DURING the run, not just at checkpoint scoring.
                "run.eval_kimg": 8.0,
                "run.eval_samples": 2048,
                "run.eval_extractor": "randconv",
                **recipe,
            }
            if args.data_dir:
                over["data.data_dir"] = args.data_dir
            if args.num_images is not None:
                over["data.num_images"] = args.num_images
            cfg = get_config("stylegan-256", **over)
            wd = os.path.join(args.workdir, tag)
            os.makedirs(wd, exist_ok=True)
            print(f"# training {tag}: res={args.res} kimg={args.kimg} "
                  f"batch={args.batch}", flush=True)
            fracs = [float(x) for x in args.eval_fracs.split(",")]
            targets = [int(round(args.kimg * f * 1000 / args.batch))
                       for f in fracs]
            # checkpoints: one per eval point, via ckpt-averaged scoring.
            # Scoring restores the retained checkpoint NEAREST each target
            # (official untruncated psi=1.0 protocol — eval/fid.py), so a
            # tag resumed from earlier checkpoints rescans cleanly.
            import jax as _jax

            checkpoints: list[dict] = []
            tr = Trainer(cfg, workdir=wd, use_mesh=False)
            try:
                for t in targets:
                    cur = int(_jax.device_get(tr.state.step))
                    if t > cur:
                        tr.train(max_steps=t - cur)
                    tr.save_checkpoint()
                    tr.ckpt.wait()
                    score_step = min(tr.ckpt.steps(),
                                     key=lambda s: abs(s - t))
                    point = {"step": score_step}
                    # Real features come from the FULL underlying
                    # distribution even when training on a --num-images
                    # pool: pool-restricted runs (the ADA experiment)
                    # are judged on generalization, not pool recall —
                    # memorizing the pool must not score well.
                    import dataclasses as _dc

                    eval_data = _dc.replace(cfg.data, num_images=None)
                    for ename, extractor in extractors.items():
                        real, fake = _collect_features(
                            cfg, wd, args.samples, extractor,
                            make_source(eval_data, args.res, seed=seed + 99),
                            batch=64, step=score_step)
                        point[ename] = {
                            "fid": round(compute_fid(real, fake), 4),
                            "kid": round(compute_kid(
                                real, fake,
                                subset_size=min(1000, args.samples // 2)), 6),
                        }
                    checkpoints.append(point)
                    print(json.dumps({f"{tag}@{score_step}": point}),
                          flush=True)
                tr.save_samples(tag="ab_final")
            finally:
                tr.close()

            row = {"checkpoints": checkpoints}
            for ename in extractors:
                row[ename] = {
                    "fid": round(sum(c[ename]["fid"] for c in checkpoints)
                                 / len(checkpoints), 4),
                    "kid": round(sum(c[ename]["kid"] for c in checkpoints)
                                 / len(checkpoints), 6),
                }
            results[tag] = row
            with open(results_path, "w") as f:
                json.dump(results, f, indent=1)
            print(json.dumps({tag: {k: row[k] for k in extractors}}),
                  flush=True)

    # Aggregate: each non-parity arm's relative FID delta vs parity, per
    # extractor, per seed (only over arms whose runs exist in results).
    summary = summarize(results, extractors, seeds, args)
    with open(os.path.join(args.workdir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
