#!/bin/bash
# StyleGAN-256 judged-preset hardware demo (VERDICT r3 task 3): the FULL
# progressive 8->256 path — per-phase recompiles, chunked stepping, fade
# alphas traced, truncated EMA sampling — on the structured synthetic
# distribution, shortened schedule (48 kimg per phase, 11 phases, 528 kimg).
# Data: the procedural 'ellipses' source — resolution-independent, its
# effectively-infinite pool avoids the D-memorization confound measured on
# the 256-image synthetic pool (BASELINE.md recipe A/B) over a 528-kimg run.
#
# The tunneled TPU relay sometimes wedges on large compiles (CLAUDE.md);
# each attempt is bounded and the CLI resumes from the latest checkpoint in
# a FRESH process, so a wedged compile costs one retry, not the run.
set -u
cd "$(dirname "$0")/.."
WORKDIR=artifacts/stylegan256_demo
mkdir -p "$WORKDIR"
for attempt in 1 2 3 4 5 6; do
  echo "=== demo attempt $attempt $(date -u +%H:%M:%S) ===" | tee -a "$WORKDIR/driver.log"
  timeout 2400 python -m ganlab_tpu.cli train --preset stylegan-256 \
    --set data.dataset=ellipses \
    --set schedule.fade_kimg=48 --set schedule.stabilize_kimg=48 \
    --set run.sample_every=2000 --set run.checkpoint_every=4000 \
    --set run.log_every=500 \
    --workdir "$WORKDIR" >> "$WORKDIR/driver.log" 2>&1
  rc=$?
  echo "=== attempt $attempt rc=$rc ===" | tee -a "$WORKDIR/driver.log"
  if [ $rc -eq 0 ]; then
    echo DEMO_DONE
    exit 0
  fi
done
echo DEMO_INCOMPLETE
exit 1
