#!/bin/bash
# Round-5 refresh of the stylegan-256 flagship hardware demo (VERDICT r4
# #7 stretch): same full progressive 8->256 CLI path as round 3
# (scripts/run_demo_256.sh) but WITH the r4 in-training eval cadence
# (run.eval_kimg) so the flagship artifact carries FID/KID curves in
# train.jsonl, and with a FINITE budget (schedule.total_kimg) so the run
# terminates cleanly instead of exhausting its attempt budget.
#
# Budget: 16 kimg fade + 16 kimg stabilize per resolution step
# (11 phases total ~ 184 kimg through the schedule) + final 256^2
# stabilize to total_kimg=200.
# Checkpoints stay on disk (gitignored) — the projector A/B
# (scripts/project_demo_ab.py, VERDICT r4 weak #5) consumes the final one.
set -u
cd "$(dirname "$0")/.."
WORKDIR=artifacts/stylegan256_demo_r5
mkdir -p "$WORKDIR"
for attempt in 1 2 3 4 5 6; do
  echo "=== demo attempt $attempt $(date -u +%H:%M:%S) ===" | tee -a "$WORKDIR/driver.log"
  timeout 2400 python -m ganlab_tpu.cli train --preset stylegan-256 \
    --set data.dataset=ellipses \
    --set schedule.fade_kimg=16 --set schedule.stabilize_kimg=16 \
    --set schedule.total_kimg=200 \
    --set run.sample_every=2000 --set run.checkpoint_every=4000 \
    --set run.log_every=500 \
    --set run.eval_kimg=20 --set run.eval_samples=2048 \
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
