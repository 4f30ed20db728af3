#!/bin/bash
# Probe the tunneled TPU relay until it recovers from a hard wedge
# (CLAUDE.md: fresh processes can't finish even a 1024^2 matmul; only
# waiting helps). One bounded fresh-process probe every ~4 min; exits
# when a probe succeeds. Log: $1 (default /tmp/relay_watch.log).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/relay_watch.log}
for i in $(seq 1 60); do
  echo "--- probe $i $(date -u +%H:%M:%S)" >> "$LOG"
  if timeout 240 python - >> "$LOG" 2>&1 <<'EOF'
import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/ganlab_jax_cache")
import jax.numpy as jnp
t0 = time.time()
x = jnp.ones((1024, 1024), jnp.bfloat16)
s = float(np.asarray((x @ x).sum(), dtype=np.float32))
print(f"OK matmul+fetch {time.time()-t0:.1f}s sum={s}")
EOF
  then
    echo "RELAY_HEALTHY $(date -u +%H:%M:%S)" | tee -a "$LOG"
    exit 0
  fi
  sleep 180
done
echo "RELAY_STILL_WEDGED $(date -u +%H:%M:%S)" | tee -a "$LOG"
exit 1
