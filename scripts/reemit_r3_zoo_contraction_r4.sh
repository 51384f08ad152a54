#!/bin/bash
# Stage D2 (optional, time permitting): re-emit the round-3-validated
# zoo specs' recovery artifacts from their existing checkpoints so every
# committed recovery JSON carries the contraction field (the round-3
# artifacts predate the code that emits it — VERDICT r3 missing #5).
# Amortized-side only: --steps equals the checkpoint step, so no training.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p results/logs

reemit() { # reemit MODEL STEPS CKPT_DIR
  local m=$1 steps=$2 ck=$3 tag=$((${2} / 1000))k
  local out="results/recovery_${m}_${tag}_r4c.json"
  if [ -f "$out" ]; then echo "skip $m ($out exists)"; return; fi
  echo "=== $(date -u +%H:%M:%S) reemit $m @$tag ==="
  timeout 4000 python -m bayesflow_nddms_tpu.apps.recovery_study \
    --model "$m" --steps "$steps" --num-test 2000 --draws 1000 \
    --ckpt-dir "$ck" --no-plots --out "$out" \
    > "results/logs/reemit_${m}_r4c.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) done $m rc=$? ==="
}

reemit single_trial_drift_dc2 40000 trained/single_trial_drift_dc2_40k_r3
reemit single_trial_drift_dc3 20000 trained/single_trial_drift_dc3_20k_r3
reemit single_trial_drift_dc4 20000 trained/single_trial_drift_dc4_20k_r3
reemit single_trial_drift_dc5 40000 trained/single_trial_drift_dc5_40k_r3
reemit single_trial_drift_dc6 80000 trained/single_trial_drift_dc6_80k_r3
reemit single_trial_drift_alpha2 20000 trained/single_trial_drift_alpha2_20k_r3
reemit single_trial_drift_alpha_base 20000 trained/single_trial_drift_alpha_base_20k_r3
echo "REEMIT COMPLETE $(date -u)"
