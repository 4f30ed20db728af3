"""Capture a jax.profiler trace of the judged train step and print the
per-op time breakdown (top XLA ops by self time).

Usage: python scripts/profile_step.py [--batch 16] [--steps 12]
           [--set model.fused_up_conv=False ...]

Parses the xplane proto with tensorboard_plugin_profile and aggregates
device self-times by op category/name, so optimization targets are picked
from measurements instead of guesses.
"""

import argparse
import ast
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def summarize_xplane(logdir: str, top: int = 30):
    from tensorboard_plugin_profile.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no xplane.pb found under", logdir)
        return
    agg = {}
    total = 0
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            name = plane.name.lower()
            if "tpu" not in name and "device" not in name and \
                    "xla" not in name:
                continue
            ev_names = dict(plane.event_metadata.items())
            for line in plane.lines:
                for ev in line.events:
                    md = ev_names.get(ev.metadata_id)
                    if md is None:
                        continue
                    dur = ev.duration_ps
                    key = md.name
                    agg[key] = agg.get(key, 0) + dur
                    total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    print(f"{'self_ms':>10}  {'%':>5}  op")
    for name, ps in rows:
        ms = ps / 1e9
        pct = 100.0 * ps / max(total, 1)
        print(f"{ms:10.3f}  {pct:5.1f}  {name[:110]}")
    print(f"total device event time: {total / 1e9:.1f} ms "
          f"(all planes, {len(paths)} xplane files)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--penalty-every", type=int, default=16)
    ap.add_argument("--fused", type=int, default=1)
    ap.add_argument("--preset", default="stylegan-256")
    ap.add_argument("--logdir", default="/tmp/ganlab_profile")
    ap.add_argument("--set", dest="sets", action="append", default=[])
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()

    if args.parse_only:
        summarize_xplane(args.logdir)
        return

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/ganlab_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ganlab_tpu.config import get_config
    from ganlab_tpu.parallel import make_single_step
    from ganlab_tpu.train.schedule import build_phases
    from ganlab_tpu.train.state import create_train_state
    from ganlab_tpu.train.steps import make_lazy_stepper

    over = {"schedule.progressive": False,
            "loss.penalty_every": args.penalty_every,
            "loss.fused_g_step": bool(args.fused)}
    for kv in args.sets:
        key, _, val = kv.partition("=")
        try:
            over[key] = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            over[key] = val
    cfg = get_config(args.preset, **over)
    res = cfg.model.resolution
    cfg = cfg.replace(schedule=cfg.schedule.__class__(
        progressive=False, batch_schedule={res: args.batch}))

    phase = build_phases(cfg.schedule, cfg.model)[-1]
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_lazy_stepper(cfg, phase, make_single_step)

    rng = np.random.RandomState(0)
    batches = [rng.randint(0, 256, (args.batch, res, res, 3),
                           dtype=np.uint8) for _ in range(4)]
    # Warm up / compile both lazy programs.
    for i in range(3):
        state, metrics = step(state, batches[i % 4])
    float(np.asarray(metrics["d_loss"]))

    os.makedirs(args.logdir, exist_ok=True)
    jax.profiler.start_trace(args.logdir)
    for i in range(args.steps):
        state, metrics = step(state, batches[i % 4])
    float(np.asarray(metrics["d_loss"]))
    jax.profiler.stop_trace()
    print(json.dumps({"profiled_steps": args.steps, "logdir": args.logdir}))
    summarize_xplane(args.logdir)


if __name__ == "__main__":
    main()
