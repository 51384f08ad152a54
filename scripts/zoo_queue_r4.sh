#!/bin/bash
# Round-4 zoo validation queue (VERDICT r3 "Next round" #1): train every
# zoo spec that lacks a round-3-coordinate checkpoint through the
# established protocol — 20k steps, 2,000 x 1,000 SBC + contraction —
# sequentially through the TPU tunnel (it serializes clients anyway).
# Each run is resumable: recovery_study skips if --out exists, and the
# orbax checkpoint dir restores mid-training state.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

MODELS=(
  # evidence family first (no compatible checkpoint at all, VERDICT #1)
  basic_ddm_dc_evidence
  basic_ddm_dc_evidence2
  basic_ddm_dc_evidence_no_noise
  basic_ddm_dc_evidence_no_noise2
  basic_ddm_dc_evidence_trainlow
  # needed by other round-4 items (eta agreement, misspec suite, imputation)
  basic_ddm_eta_dc
  single_trial_alpha_standard
  single_trial_alpha_standnorm
  single_trial_alpha_fixed
  # the rest of the zoo
  basic_ddm
  single_trial_alpha
  single_trial_alpha_scaled
  single_trial_alpha_sepvar
  single_trial_alpha_mean
  single_trial_alpha_not_scaled2
  single_trial_alpha_not_scaled3
  single_trial_alpha_dc
  single_trial_alpha_dc2
  single_trial_alpha_dc_not_scaled
  single_trial_dc_centered
  single_trial_dc_not_scaled
  single_trial_drift
  single_trial_drift2
  single_trial_drift_alpha
  single_trial_drift_dc
)

mkdir -p results/logs trained
for m in "${MODELS[@]}"; do
  out="results/recovery_${m}_20k_r4.json"
  if [ -f "$out" ]; then echo "skip $m (artifact exists)"; continue; fi
  echo "=== $(date -u +%H:%M:%S) start $m ==="
  timeout 9000 python -m bayesflow_nddms_tpu.apps.recovery_study \
    --model "$m" --steps 20000 --num-test 2000 --draws 1000 \
    --ckpt-dir "trained/${m}_20k_r4" --no-plots \
    --out "$out" > "results/logs/queue_${m}_r4.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) done $m rc=$? ==="
done
echo "QUEUE COMPLETE $(date -u)"
