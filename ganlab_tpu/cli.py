"""Command-line interface (reference: ``gan_lab`` console entry, SURVEY.md L6).

Subcommands mirror the reference's surface plus the judged additions:

* ``train``         — train a preset (optionally overridden) config
* ``prepare-data``  — one-time dataset layout (per-resolution npy shards)
* ``sample``        — generate an image grid from a checkpoint (G-EMA,
                      truncation psi)
* ``eval-fid``      — FID between a checkpoint's samples and a dataset

Example:
    python -m ganlab_tpu.cli train --preset stylegan-256 \\
        --set data.dataset=image_folder --set data.data_dir=/data/celeba
"""

from __future__ import annotations

import argparse
import ast
import os
import sys


def _parse_overrides(pairs: list[str]) -> dict:
    out = {}
    for pair in pairs or []:
        if "=" not in pair:
            raise SystemExit(f"--set expects section.field=value, got {pair!r}")
        key, value = pair.split("=", 1)
        try:
            out[key] = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            out[key] = value  # plain string
    return out


def _add_common(p):
    p.add_argument("--preset", default=None,
                   help="named config preset (see ganlab_tpu.config.PRESETS)")
    p.add_argument("--config", default=None, metavar="FILE",
                   help="YAML/JSON config file (may set its own preset)")
    p.add_argument("--set", action="append", metavar="KEY=VAL", dest="sets",
                   help="config override, e.g. --set optim.lr_g=2e-3")
    p.add_argument("--workdir", default="runs/default")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"],
                   help="force a jax platform (default: environment's)")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="ganlab",
                                     description=__doc__.split("\n")[0])
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_train = sub.add_parser("train", help="train a model")
    _add_common(p_train)
    p_train.add_argument("--max-steps", type=int, default=None,
                         help="stop after N optimizer steps (smoke runs)")
    p_train.add_argument("--no-mesh", action="store_true",
                         help="force single-device even with many devices")

    p_prep = sub.add_parser("prepare-data", help="build npy shards")
    p_prep.add_argument("--src", required=True, help="image folder")
    p_prep.add_argument("--out", required=True, help="output dir")
    p_prep.add_argument("--max-res", type=int, required=True)
    p_prep.add_argument("--limit", type=int, default=None)

    p_sample = sub.add_parser("sample", help="sample a grid from a checkpoint")
    _add_common(p_sample)
    p_sample.add_argument("--psi", type=float, default=None,
                          help="truncation psi (StyleGAN)")
    p_sample.add_argument("--num", type=int, default=16)
    p_sample.add_argument("--out", default=None)

    p_fid = sub.add_parser("eval-fid", help="FID of a checkpoint vs dataset")
    _add_common(p_fid)
    p_fid.add_argument("--num-samples", type=int, default=10000)
    p_fid.add_argument("--metrics", default="fid",
                       help="comma list of fid,kid,pr,ppl (default fid)")

    p_ppl = sub.add_parser("eval-ppl",
                           help="perceptual path length of a checkpoint")
    _add_common(p_ppl)
    p_ppl.add_argument("--num-samples", type=int, default=5000)
    p_ppl.add_argument("--space", default=None, choices=["w", "z"],
                       help="latent space (default: w for style "
                            "families, z otherwise)")
    p_ppl.add_argument("--sampling", default="full",
                       choices=["full", "end"])
    p_ppl.add_argument("--epsilon", type=float, default=1e-4)

    p_interp = sub.add_parser("interpolate",
                              help="latent-walk frame grid from a checkpoint")
    _add_common(p_interp)
    p_interp.add_argument("--anchors", type=int, default=4)
    p_interp.add_argument("--steps", type=int, default=8)
    p_interp.add_argument("--psi", type=float, default=None)

    p_mix = sub.add_parser("mixgrid",
                           help="style-mixing grid (StyleGAN figure 3)")
    _add_common(p_mix)
    p_mix.add_argument("--num", type=int, default=4,
                       help="grid side: NUM source-A rows x NUM source-B "
                            "columns")
    p_mix.add_argument("--crossover", type=int, default=4,
                       help="style layer where B takes over (coarse<k<=fine)")
    p_mix.add_argument("--psi", type=float, default=None)
    p_mix.add_argument("--out", default=None)

    p_exp = sub.add_parser("export",
                           help="serialize the G-EMA sampler to a portable "
                                "StableHLO artifact")
    _add_common(p_exp)
    p_exp.add_argument("--out", default=None,
                       help="artifact path (default WORKDIR/export/"
                            "sampler.ganlab.zip)")
    p_exp.add_argument("--batch", type=int, default=16,
                       help="fixed serving batch size compiled into the "
                            "artifact")
    p_exp.add_argument("--platforms", default="tpu,cpu",
                       help="comma list of target platforms")
    p_exp.add_argument("--psi", type=float, default=None,
                       help="default truncation psi stored in the artifact")

    p_proj = sub.add_parser("project",
                            help="invert images into the latent space")
    _add_common(p_proj)
    p_proj.add_argument("--images", nargs="+", required=True,
                        metavar="FILE", help="target image file(s)")
    p_proj.add_argument("--steps", type=int, default=300)
    p_proj.add_argument("--lr", type=float, default=0.1)
    p_proj.add_argument("--w-space", action="store_true",
                        help="optimize one shared w (default: W+ per layer)")
    p_proj.add_argument("--optimize-noise", action="store_true",
                        help="also optimize per-layer noise buffers "
                             "(official StyleGAN2 projector; style "
                             "families only)")
    p_proj.add_argument("--out", default=None,
                        help="output dir (default WORKDIR/projections)")

    args = parser.parse_args(argv)

    if args.cmd == "prepare-data":
        from ganlab_tpu.data import prepare_dataset

        written = prepare_dataset(args.src, args.out, args.max_res,
                                  limit=args.limit)
        for res, path in sorted(written.items()):
            print(f"  {res:5d} -> {path}")
        return 0

    if getattr(args, "platform", None):
        import jax

        jax.config.update("jax_platforms", args.platform)

    # Persistent compile cache (opt out with GANLAB_COMPILE_CACHE=""):
    # re-runs and crash-resumed runs skip recompiling every per-phase
    # program — which on a flaky remote-compile link is the difference
    # between a free retry and minutes per attempt.
    cache_dir = os.environ.get("GANLAB_COMPILE_CACHE",
                                "/tmp/ganlab_jax_cache")
    if cache_dir:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ganlab_tpu.config import apply_overrides, get_config, load_config

    if getattr(args, "config", None):
        cfg = load_config(args.config, preset=args.preset)
    else:
        # A trained workdir carries its full config (Trainer writes
        # config.json). When neither --preset nor --config is given,
        # rebuild from that — a bare `ganlab sample --workdir RUN` must
        # reconstruct the exact trained model, not the default preset.
        saved = os.path.join(getattr(args, "workdir", ""), "config.json") \
            if getattr(args, "workdir", None) else None
        if args.preset is None and saved and os.path.exists(saved):
            print(f"config: {saved}", flush=True)
            cfg = load_config(saved)
        else:
            cfg = get_config(args.preset or "stylegan-256")
    cfg = apply_overrides(cfg, _parse_overrides(args.sets))

    if args.cmd == "train":
        from ganlab_tpu.parallel import initialize_distributed
        from ganlab_tpu.train.loop import Trainer

        initialize_distributed()
        trainer = Trainer(cfg, workdir=args.workdir,
                          use_mesh=(False if args.no_mesh else None))
        try:
            trainer.train(max_steps=args.max_steps)
            path = trainer.save_samples(tag="final")
            print(f"final samples: {path}")
        finally:
            trainer.close()
        return 0

    if args.cmd == "sample":
        import dataclasses

        from ganlab_tpu.train.loop import Trainer

        if args.num:
            cfg = cfg.replace(run=dataclasses.replace(
                cfg.run, num_sample_images=args.num))
        trainer = Trainer(cfg, workdir=args.workdir, use_mesh=False)
        try:
            if trainer.ckpt.latest_step() is None:
                print("WARNING: no checkpoint found; sampling from a "
                      "freshly initialized generator", flush=True)
            path = trainer.save_samples(tag="sample", psi=args.psi,
                                        out=args.out)
            print(f"samples: {path}")
        finally:
            trainer.close()
        return 0

    if args.cmd == "eval-fid":
        from ganlab_tpu.eval.fid import evaluate_checkpoint_metrics

        wanted = tuple(m.strip() for m in args.metrics.split(","))
        scores = {}
        if set(wanted) - {"ppl"}:
            scores = evaluate_checkpoint_metrics(
                cfg, workdir=args.workdir, num_samples=args.num_samples,
                metrics=wanted)
        if "ppl" in wanted:
            from ganlab_tpu.eval.ppl import evaluate_checkpoint_ppl

            # PPL needs no dataset; min(num_samples, 5000) keeps the
            # one-stop call bounded (the official protocol uses 1e5).
            # Seed and the cap note match the dedicated eval-ppl path
            # (ADVICE r3: no silent cap, no seed drift between the two).
            ppl_n = min(args.num_samples, 5000)
            if ppl_n < args.num_samples:
                print(f"note: PPL capped at {ppl_n} samples here; use "
                      "`eval-ppl --num-samples` for more", flush=True)
            scores["ppl"] = evaluate_checkpoint_ppl(
                cfg, workdir=args.workdir, num_samples=ppl_n,
                seed=cfg.run.seed)["ppl"]
        for name, value in scores.items():
            print(f"{name.upper()}: {value:.4f}")
        return 0

    if args.cmd == "eval-ppl":
        from ganlab_tpu.eval.ppl import evaluate_checkpoint_ppl

        out = evaluate_checkpoint_ppl(
            cfg, workdir=args.workdir, num_samples=args.num_samples,
            space=args.space, sampling=args.sampling,
            epsilon=args.epsilon, seed=cfg.run.seed)
        print(f"PPL ({out['space']}-{out['sampling']}, "
              f"n={out['num']}): {out['ppl']:.4f}")
        return 0

    if args.cmd == "interpolate":

        import jax
        import numpy as np

        from ganlab_tpu.train.loop import Trainer
        from ganlab_tpu.train.steps import build_sample_fn
        from ganlab_tpu.utils import save_image_grid
        from ganlab_tpu.utils.latents import interpolation_path

        trainer = Trainer(cfg, workdir=args.workdir, use_mesh=False)
        try:
            zs = interpolation_path(jax.random.PRNGKey(cfg.run.seed + 2),
                                    args.anchors, args.steps,
                                    cfg.model.latent_dim)
            sample = jax.jit(build_sample_fn(cfg, cfg.model.res_log2))
            psi = args.psi if args.psi is not None \
                else cfg.model.truncation_psi
            state = trainer.state
            imgs = sample(state.params_ema, state.w_avg, zs,
                          jax.random.PRNGKey(0), psi, 1.0)
            path = os.path.join(args.workdir, cfg.run.sample_dir,
                                "interpolation.png")
            save_image_grid(np.asarray(jax.device_get(imgs)), path,
                            ncol=args.steps)
            print(f"interpolation: {path}")
        finally:
            trainer.close()
        return 0

    if args.cmd == "mixgrid":

        import jax
        import jax.numpy as jnp
        import numpy as np

        from ganlab_tpu.models import build_models
        from ganlab_tpu.models.stylegan import (num_style_layers,
                                                truncate_ws)
        from ganlab_tpu.train.loop import Trainer
        from ganlab_tpu.utils import save_image_grid

        trainer = Trainer(cfg, workdir=args.workdir, use_mesh=False)
        try:
            g_model, _ = build_models(cfg.model)
            if not hasattr(g_model, "map_latents"):
                print("mixgrid requires a style-based model family")
                return 1
            state = trainer.state
            n, lg = args.num, cfg.model.res_log2
            nl = num_style_layers(lg)
            psi = args.psi if args.psi is not None \
                else cfg.model.truncation_psi
            key = jax.random.PRNGKey(cfg.run.seed + 3)
            ka, kb = jax.random.split(key)
            za = jax.random.normal(ka, (n, cfg.model.latent_dim))
            zb = jax.random.normal(kb, (n, cfg.model.latent_dim))

            @jax.jit
            def make(params, w_avg, za, zb):
                wa = g_model.apply(params, za, method="map_latents")
                wb = g_model.apply(params, zb, method="map_latents")
                wsa = jnp.repeat(wa[:, None, :], nl, 1)
                wsb = jnp.repeat(wb[:, None, :], nl, 1)
                w_avg_ = w_avg.astype(wsa.dtype)
                wsa = truncate_ws(wsa, w_avg_, psi,
                                  cfg.model.truncation_cutoff)
                wsb = truncate_ws(wsb, w_avg_, psi,
                                  cfg.model.truncation_cutoff)
                layer = jnp.arange(nl)[None, None, :, None]
                mixed = jnp.where(layer < args.crossover,
                                  wsa[:, None], wsb[None, :])   # (n, n, L, D)
                ws = jnp.concatenate([wsa, wsb,
                                      mixed.reshape(n * n, nl, -1)], 0)
                imgs = g_model.apply(params, ws, lg, 1.0,
                                     method="synthesize",
                                     rngs={"noise": jax.random.PRNGKey(0)})
                return jnp.clip(imgs.astype(jnp.float32), -1.0, 1.0)

            imgs = np.asarray(jax.device_get(
                make(state.params_ema, state.w_avg, za, zb)))
            a_imgs, b_imgs = imgs[:n], imgs[n:2 * n]
            cells = imgs[2 * n:].reshape(n, n, *imgs.shape[1:])
            # (n+1)x(n+1) grid: corner blank, top row = B (fine source),
            # left column = A (coarse source), cell (i,j) = A_i<xover>B_j.
            blank = np.ones_like(imgs[0])
            rows = [np.stack([blank] + list(b_imgs))]
            for i in range(n):
                rows.append(np.stack([a_imgs[i]] + list(cells[i])))
            grid = np.concatenate(rows, 0)
            path = args.out or os.path.join(args.workdir, cfg.run.sample_dir,
                                            "mixgrid.png")
            save_image_grid(grid, path, ncol=n + 1)
            print(f"mixgrid: {path} (crossover layer {args.crossover}, "
                  f"psi {psi})")
        finally:
            trainer.close()
        return 0

    if args.cmd == "export":

        from ganlab_tpu.export import export_sampler
        from ganlab_tpu.train.loop import Trainer

        trainer = Trainer(cfg, workdir=args.workdir, use_mesh=False)
        try:
            if trainer.ckpt.latest_step() is None:
                print("WARNING: no checkpoint found; exporting a freshly "
                      "initialized generator", flush=True)
            out = args.out
            if out is None:
                out = os.path.join(args.workdir, "export",
                                   "sampler.ganlab.zip")
            os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
            path = export_sampler(
                cfg, trainer.state, out, batch_size=args.batch,
                platforms=tuple(p.strip()
                                for p in args.platforms.split(",")),
                default_psi=args.psi)
            size_mb = os.path.getsize(path) / 1e6
            print(f"exported: {path} ({size_mb:.1f} MB, batch {args.batch}, "
                  f"platforms {args.platforms})")
        finally:
            trainer.close()
        return 0

    if args.cmd == "project":

        import jax
        import numpy as np

        from ganlab_tpu.train.loop import Trainer
        from ganlab_tpu.utils import save_image_grid
        from ganlab_tpu.utils.projector import load_image, project

        trainer = Trainer(cfg, workdir=args.workdir, use_mesh=False)
        try:
            if trainer.ckpt.latest_step() is None:
                print("WARNING: no checkpoint found; projecting into a "
                      "freshly initialized generator", flush=True)
            res = cfg.model.resolution
            target = np.stack([load_image(p, res) for p in args.images])
            state = trainer.state
            result = project(cfg, state.params_ema, state.w_avg, target,
                             num_steps=args.steps, lr=args.lr,
                             w_plus=not args.w_space, seed=cfg.run.seed,
                             optimize_noise=args.optimize_noise)
            out_dir = args.out or os.path.join(args.workdir, "projections")
            os.makedirs(out_dir, exist_ok=True)
            recon = np.asarray(jax.device_get(result.images))
            pairs = np.stack([target, recon], 1).reshape(
                2 * len(target), res, res, 3)
            grid = save_image_grid(pairs, os.path.join(out_dir, "pairs.png"),
                                   ncol=2)
            lat_path = os.path.join(out_dir, "latents.npy")
            np.save(lat_path, np.asarray(jax.device_get(result.latents)))
            if result.noises is not None:
                np.savez(os.path.join(out_dir, "noises.npz"),
                         **{f"noise{i}": np.asarray(jax.device_get(n))
                            for i, n in enumerate(result.noises)})
            losses = np.asarray(jax.device_get(result.losses))
            print(f"projection: {grid} ({'W' if result.is_w_space else 'z'}"
                  f" space; loss {losses[0]:.4f} -> {losses[-1]:.4f}; "
                  f"latents {lat_path})")
        finally:
            trainer.close()
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
