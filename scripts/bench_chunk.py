"""Probe: does scanning K train steps inside ONE compiled program beat K
host dispatches? (The tunneled platform shows ~11 ms/step of host gap:
device 79 ms vs wall 90 ms at the judged recipe.)

Times the penalty-off fused step (the program that runs 15/16 steps under
lazy R1) as K=1 singles vs one scan-of-K program, same total work.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ganlab_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ganlab_tpu.config import get_config
    from ganlab_tpu.train.schedule import build_phases
    from ganlab_tpu.train.state import create_train_state
    from ganlab_tpu.train.steps import build_train_step

    mode_filter = sys.argv[1] if len(sys.argv) > 1 else None
    batch, res, K = 16, 256, 5
    cfg = get_config("stylegan-256", **{
        "schedule.progressive": False,
        "loss.penalty_every": 16,
        "loss.fused_g_step": True,
    })
    cfg = cfg.replace(schedule=cfg.schedule.__class__(
        progressive=False, batch_schedule={res: batch}))
    phase = build_phases(cfg.schedule, cfg.model)[-1]
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = build_train_step(cfg, phase, penalty_override=False)

    single = jax.jit(step, donate_argnums=0)

    @jax.jit
    def chunked(state, stacked):
        def body(st, b):
            st, m = step(st, b)
            return st, m
        return lax.scan(body, state, stacked)

    rng = np.random.RandomState(0)
    one = rng.randint(0, 256, (batch, res, res, 3), dtype=np.uint8)
    stacked = jnp.asarray(np.stack([one] * K))
    one = jnp.asarray(one)

    # compile (only what this process will run)
    if mode_filter != "single":
        state2, m = chunked(state, stacked)
        float(np.asarray(m["d_loss"][0]))
    if mode_filter != "chunked":
        st, m = single(create_train_state(cfg, jax.random.PRNGKey(0)), one)
        float(np.asarray(m["d_loss"]))

    n_rounds = 4
    modes = ("single", "chunked", "single", "chunked")
    if mode_filter:
        modes = (mode_filter,) * 2
    for name in modes:
        st = create_train_state(cfg, jax.random.PRNGKey(0))
        t0 = time.perf_counter()
        steps_done = 0
        for _ in range(n_rounds):
            if name == "single":
                for _ in range(K):
                    st, m = single(st, one)
                steps_done += K
            else:
                st, m = chunked(st, stacked)
                steps_done += K
        last = m["d_loss"] if name == "single" else m["d_loss"][-1]
        float(np.asarray(last))
        dt = time.perf_counter() - t0
        print(json.dumps({
            "mode": name, "ms_per_step": round(dt / steps_done * 1000, 2),
            "img_per_sec": round(steps_done * batch / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
