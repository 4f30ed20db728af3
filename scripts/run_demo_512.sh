#!/bin/bash
# Progressive >256^2 hardware witness (VERDICT r3 #5): the FULL 8->512
# progressive path — per-phase recompiles, remat'd blocks via the
# 1024-family flags at 512, fade alphas traced, per-phase img/s logged —
# shortened schedule on the procedural 'ellipses' source.
#
# Uniform 12 kimg per phase: 512^2 runs ~20 img/s at batch 4
# (BASELINE.md r1 row) so the top fade+stabilize pair costs ~20 min and
# the whole 8->512 schedule ~45 min. The relay sometimes wedges on large
# compiles (CLAUDE.md); each attempt is bounded and the CLI resumes from
# the latest checkpoint in a fresh process.
set -u
cd "$(dirname "$0")/.."
WORKDIR=artifacts/stylegan512_demo
mkdir -p "$WORKDIR"
for attempt in 1 2 3 4 5 6; do
  echo "=== demo512 attempt $attempt $(date -u +%H:%M:%S) ===" | tee -a "$WORKDIR/driver.log"
  timeout 2400 python -m ganlab_tpu.cli train --preset stylegan-1024 \
    --set model.resolution=512 \
    --set data.dataset=ellipses \
    --set schedule.fade_kimg=12 --set schedule.stabilize_kimg=12 \
    --set schedule.total_kimg=156 \
    --set run.sample_every=2000 --set run.checkpoint_every=2000 \
    --set run.log_every=250 \
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
