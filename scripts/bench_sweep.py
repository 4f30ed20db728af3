"""One-config throughput measurement (fresh process per config).

Usage:
    python scripts/bench_sweep.py [--preset stylegan-256] [--batch 16]
        [--penalty-every 16] [--pallas] [--res 256] [--fused] [--steps 20]

Emits one JSON line. Used to pick bench.py's configuration; results are
recorded in BASELINE.md.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("batch", nargs="?", type=int, default=16)
    ap.add_argument("penalty_every", nargs="?", type=int, default=1)
    ap.add_argument("use_pallas", nargs="?", type=int, default=0)
    ap.add_argument("res", nargs="?", type=int, default=None)
    ap.add_argument("fused", nargs="?", type=int, default=0)
    ap.add_argument("--preset", default="stylegan-256")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--set", dest="sets", action="append", default=[],
                    help="extra dotted config overrides, e.g. model.remat=True")
    args = ap.parse_args()

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/ganlab_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ganlab_tpu.config import get_config
    from ganlab_tpu.parallel import make_single_step
    from ganlab_tpu.train.schedule import build_phases
    from ganlab_tpu.train.state import create_train_state
    from ganlab_tpu.train.steps import make_lazy_stepper

    if args.use_pallas:
        from ganlab_tpu.ops import pallas as plops

        plops.set_backend("pallas")

    import ast

    over = {
        "schedule.progressive": False,
        "loss.penalty_every": args.penalty_every,
        "loss.fused_g_step": bool(args.fused),
        # The positional `fused` flag means the PRE-update-D fused step;
        # clear the preset's fused_seq default so the two never collide
        # (mutually exclusive) and `fused=0` measures plain sequential.
        # Opt back in with --set loss.fused_seq=True.
        "loss.fused_seq": False,
    }
    if args.res:
        over["model.resolution"] = args.res
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
    # Device-resident feed, matching the trainer's Prefetcher (which
    # device_puts batches in a worker thread off the critical path) —
    # see the same note in bench.py::run_mode.
    batches = [jax.device_put(rng.randint(0, 256, (args.batch, res, res, 3),
                                          dtype=np.uint8)) for _ in range(4)]

    for i in range(3):
        state, metrics = step(state, batches[i % 4])
    float(np.asarray(metrics["d_loss"]))

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = step(state, batches[i % 4])
    float(np.asarray(metrics["d_loss"]))
    dt = time.perf_counter() - t0

    print(json.dumps({
        "preset": args.preset, "batch": args.batch,
        "penalty_every": args.penalty_every,
        "use_pallas": bool(args.use_pallas), "res": res,
        "fused": bool(args.fused),
        "img_per_sec": round(args.steps * args.batch / dt, 2),
        "ms_per_step": round(dt / args.steps * 1000, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
