#!/bin/bash
# Step-level ADA cost re-measure after the r4 channel-transposed warp
# einsum (VERDICT r4 weak #4): aug off / bc / bcg as ADJACENT fresh
# children in ONE relay window, judged config (stylegan-256, b32, k16,
# sequential lazy-R1), p=0.5 fixed — same protocol as the r3 table in
# BASELINE.md "ADA augmentation cost" so the rows are comparable.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-artifacts/sweep_r5/ada_step.log}
mkdir -p "$(dirname "$LOG")"
for arm in off bc bcg; do
  case "$arm" in
    off) EXTRA="" ;;
    bc)  EXTRA="--set aug.mode=fixed --set aug.p_init=0.5 --set aug.categories=bc" ;;
    bcg) EXTRA="--set aug.mode=fixed --set aug.p_init=0.5 --set aug.categories=bcg" ;;
  esac
  echo "=== arm $arm $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
  timeout 1100 python scripts/bench_sweep.py 32 16 0 --steps 32 $EXTRA \
    >> "$LOG" 2>&1
  echo "=== arm $arm rc=$? ===" | tee -a "$LOG"
done
echo ADA_SWEEP_DONE
