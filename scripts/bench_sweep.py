"""One-config throughput measurement (fresh process per config).

Usage: python scripts/bench_sweep.py BATCH PENALTY_EVERY USE_PALLAS [RES]
Emits one JSON line. Used to pick the bench.py configuration; see
BASELINE.md for the sweep results.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    penalty_every = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    use_pallas = bool(int(sys.argv[3])) if len(sys.argv) > 3 else False
    res = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    fused = bool(int(sys.argv[5])) if len(sys.argv) > 5 else False

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/ganlab_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ganlab_tpu.config import get_config
    from ganlab_tpu.parallel import make_single_step
    from ganlab_tpu.train.schedule import build_phases
    from ganlab_tpu.train.state import create_train_state
    from ganlab_tpu.train.steps import make_lazy_stepper

    if use_pallas:
        from ganlab_tpu.ops import pallas as plops

        plops.set_backend("pallas")

    cfg = get_config("stylegan-256", **{
        "model.resolution": res,
        "schedule.batch_schedule": {res: batch},
        "schedule.progressive": False,
        "loss.penalty_every": penalty_every,
        "loss.fused_g_step": fused,
    })
    phase = build_phases(cfg.schedule, cfg.model)[-1]
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_lazy_stepper(cfg, phase, make_single_step)

    rng = np.random.RandomState(0)
    batches = [rng.randint(0, 256, (batch, res, res, 3), dtype=np.uint8)
               for _ in range(4)]

    for i in range(3):
        state, metrics = step(state, batches[i % 4])
    float(np.asarray(metrics["d_loss"]))

    n_steps = 20
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = step(state, batches[i % 4])
    float(np.asarray(metrics["d_loss"]))
    dt = time.perf_counter() - t0

    print(json.dumps({
        "batch": batch, "penalty_every": penalty_every,
        "use_pallas": use_pallas, "res": res, "fused": fused,
        "img_per_sec": round(n_steps * batch / dt, 2),
        "ms_per_step": round(dt / n_steps * 1000, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
