"""Probe: is a width-folded (s2d-W) conv faster than the C=64 original?

Times fwd+bwd of:
  A: conv3x3 64->64 on (16,256,256,64)        -- half-lane, tile-padded
  B: conv(3,2) 128->128 on (16,256,128,128)   -- folded equivalent shape
  C: conv3x3 128->128 on (16,256,128,128)     -- folded + square kernel
     (upper bound: what full lanes buy if kernel shape were free)

B's kernel is the folded equivalent's SHAPE (3 taps x 2 cells, 2C->2C');
entries here are random — this probes the execution ceiling, not parity.
Variants are timed interleaved round-robin (several rounds, median) so
relay drift cancels. One JSON line per variant.
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

    DIMS = ("NHWC", "HWIO", "NHWC")
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)

    def make(shape_x, shape_w):
        x = jnp.asarray(rng.randn(*shape_x) * 0.1, dt)
        w = jnp.asarray(rng.randn(*shape_w) * 0.05, dt)
        return x, w

    cases = {
        "A_64ch": make((16, 256, 256, 64), (3, 3, 64, 64)),
        "B_folded_3x2": make((16, 256, 128, 128), (3, 2, 128, 128)),
        "C_folded_3x3": make((16, 256, 128, 128), (3, 3, 128, 128)),
    }

    fns = {}
    for name, (x, w) in cases.items():
        @jax.jit
        def fb(x, w):
            def f(a, b):
                y = lax.conv_general_dilated(a, b, (1, 1), "SAME",
                                             dimension_numbers=DIMS)
                return jnp.sum(y.astype(jnp.float32) ** 2)
            l, g = jax.value_and_grad(f, argnums=(0, 1))(x, w)
            return l + jnp.sum(g[0].astype(jnp.float32)) + \
                jnp.sum(g[1].astype(jnp.float32))
        fns[name] = fb
        float(np.asarray(fb(x, w)))  # compile

    n_inner, n_rounds = 30, 5
    times = {k: [] for k in cases}
    for _ in range(n_rounds):
        for name, (x, w) in cases.items():
            fb = fns[name]
            # accumulate so the final host fetch forces the whole chain
            t0 = time.perf_counter()
            s = None
            for _ in range(n_inner):
                r = fb(x, w)
                s = r if s is None else s + r
            float(np.asarray(s))
            dt_ms = (time.perf_counter() - t0) / n_inner * 1000
            times[name].append(dt_ms)
    for name, ts in times.items():
        ts = sorted(ts)
        print(json.dumps({"case": name, "ms_median": round(ts[len(ts)//2], 3),
                          "ms_all": [round(t, 3) for t in ts]}), flush=True)


if __name__ == "__main__":
    main()
