"""Serving-path throughput: BatchSampler images/sec at the judged 256^2.

Measures the full production inference path — index-stable latent
derivation, mapping + truncation + synthesis from the G-EMA weights,
device->host fetch, uint8 conversion — NOT just the raw sampler program,
so the number is what a deployment actually gets.

Usage: python scripts/bench_serve.py [BATCH=64] [RES=256]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ganlab_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ganlab_tpu.config import get_config
    from ganlab_tpu.serve import BatchSampler
    from ganlab_tpu.train.state import create_train_state

    cfg = get_config("stylegan-256", **{"model.resolution": res})
    # Fresh state: serving perf does not depend on the weights' values.
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    s = BatchSampler(cfg, state=state, batch_size=batch).warmup()

    n = 8 * batch
    windows = []
    for _ in range(5):
        t0 = time.perf_counter()
        imgs = s.generate(n, seed=1)
        dt = time.perf_counter() - t0      # generate() host-fetches: a barrier
        assert imgs.shape == (n, res, res, 3)
        windows.append(n / dt)
    import json

    import numpy as np

    print(json.dumps({
        "metric": f"BatchSampler serving throughput {res}^2",
        "batch": batch, "value": round(float(np.median(windows)), 1),
        "unit": "images/sec/chip",
        "windows_img_s": [round(w, 1) for w in windows],
    }))


if __name__ == "__main__":
    main()
