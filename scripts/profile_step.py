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


def summarize_xplane(logdir: str, top: int = 30, nsteps: int = 12):
    """Aggregate the 'XLA Ops' line of the Chrome trace by op and category."""
    import collections
    import gzip
    import re

    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace.json.gz found under", logdir)
        return
    with gzip.open(sorted(paths)[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids, tids = {}, {}
    for e in ev:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pids[e["pid"]] = e["args"].get("name", "")
            if e.get("name") == "thread_name":
                tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
    xla = {k for k, v in tids.items() if v == "XLA Ops"}
    rows = collections.defaultdict(lambda: [0, 0, None])
    cat = collections.Counter()
    shp = collections.Counter()
    total = 0
    for e in ev:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in xla:
            continue
        a = e.get("args") or {}
        d = e.get("dur", 0)
        total += d
        cat[a.get("hlo_category", "?")] += d
        n = e["name"]
        rows[n][0] += d
        rows[n][1] += 1
        if rows[n][2] is None:
            rows[n][2] = a.get("long_name", "")
        m = re.findall(r"\d+,(\d+),\1,(\d+)", rows[n][2] or "")
        if m:
            res = max(int(x) for x, _ in m)
            ch = max(int(y) for x, y in m if int(x) == res)
            shp[(res, ch)] += d
    print(f"total XLA-op time {total / 1e3:.1f} ms; "
          f"{total / 1e3 / nsteps:.2f} ms/step over {nsteps} steps")
    print("by category (ms/step):")
    for k, v in cat.most_common(12):
        print(f"  {v / 1e3 / nsteps:7.2f}  {k}")
    print("top ops (ms/step, count, operand shapes):")
    for n, (d, c, ln) in sorted(rows.items(), key=lambda kv: -kv[1][0])[:top]:
        shapes = re.findall(r"(?:bf16|f32|u8)\[([\d,]+)\]", ln or "")[:4]
        print(f"  {d / 1e3 / nsteps:6.2f}  {n[:30]:30s} n={c:3d} {shapes}")


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
        summarize_xplane(args.logdir, nsteps=args.steps)
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
    summarize_xplane(args.logdir, nsteps=args.steps)


if __name__ == "__main__":
    main()
