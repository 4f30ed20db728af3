"""Shared harness for the two-process jax.distributed DP test.

Used two ways (SURVEY.md:346-348, step 7 — the multi-host N0 path):

* as a WORKER SCRIPT: ``python dist_two_process.py <pid> <port> <outdir>``
  initializes ``jax.distributed`` (CPU backend, gloo collectives, 4 fake
  devices per process -> an 8-device 2-process mesh) and runs the DP
  trainer steps, feeding only this process's local batch shard through
  ``shard_batch``'s ``make_array_from_process_local_data`` branch;
* as a LIBRARY from the single-process test: the same ``run_dp_steps`` on
  the 8-fake-device single-process mesh produces the reference result.

Both paths must agree: the per-device computation is identical and the only
cross-device operation is the gradient/metric pmean.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

N_STEPS = 2
BATCH_PER_DEVICE = 4
N_DEVICES = 8  # global


def tiny_cfg():
    from ganlab_tpu.config import get_config

    return get_config("resnetgan-cifar10", **{
        "model.resolution": 16, "model.latent_dim": 8,
        "model.base_channels": 8,
        "run.compute_dtype": "float32",
        "schedule.batch_schedule": {16: BATCH_PER_DEVICE},
        "schedule.total_kimg": 1.0,
    })


def global_batch(step_i: int) -> np.ndarray:
    rng = np.random.RandomState(1000 + step_i)
    return rng.randint(0, 256,
                       (BATCH_PER_DEVICE * N_DEVICES, 16, 16, 3), np.uint8)


def run_dp_steps():
    """Build the DP step over jax.devices() and run N_STEPS; this process
    feeds only its local shard. Returns {metric fingerprints}."""
    import jax
    import jax.numpy as jnp

    from ganlab_tpu.parallel import (
        make_mesh,
        make_parallel_step,
        replicate,
        shard_batch,
    )
    from ganlab_tpu.train.schedule import build_phases
    from ganlab_tpu.train.state import create_train_state
    from ganlab_tpu.train.steps import build_train_step

    cfg = tiny_cfg()
    phase = build_phases(cfg.schedule, cfg.model)[-1]
    assert len(jax.devices()) == N_DEVICES
    mesh = make_mesh()
    state = replicate(create_train_state(cfg, jax.random.PRNGKey(0)), mesh)
    step = make_parallel_step(
        build_train_step(cfg, phase, axis_name="data"), mesh)

    # This host's rows of the global batch: the 1-D mesh follows
    # jax.devices() order (process-major), so host p owns the contiguous
    # middle [p*local : (p+1)*local).
    pid = jax.process_index()
    local_rows = BATCH_PER_DEVICE * len(jax.local_devices())

    metrics = None
    for i in range(N_STEPS):
        gb = global_batch(i)
        local = gb[pid * local_rows:(pid + 1) * local_rows]
        state, metrics = step(state, shard_batch(local, mesh))

    fp_fn = jax.jit(lambda s: {
        "g_sum": sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(s.params_g)),
        "d_sum": sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(s.params_d)),
        "ema_sum": sum(jnp.sum(jnp.abs(x))
                       for x in jax.tree.leaves(s.params_ema)),
        "step": s.step.astype(jnp.float32),
        "shown": s.shown_imgs,
    })
    out = {k: float(jax.device_get(v)) for k, v in fp_fn(state).items()}
    out.update({k: float(jax.device_get(v)) for k, v in metrics.items()})
    return out


def main():
    pid, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_compilation_cache_dir", "/tmp/ganlab_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=pid)
    assert jax.process_count() == 2
    out = run_dp_steps()
    with open(os.path.join(outdir, f"result_p{pid}.json"), "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
