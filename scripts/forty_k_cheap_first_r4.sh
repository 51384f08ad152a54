#!/bin/bash
# 40k replications, cheap (2-channel, ~8 min) models first so the whole
# flagged set fits in the round; evidence-family 40k runs (35-80 min
# each) last. Waits for any in-flight run on the same tunnel to finish.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p results/logs

# wait for the orphaned no_noise2 40k run (PID recorded by the driver)
# to release the tunnel
NOISE_PID="${1:-0}"
while [ "$NOISE_PID" != "0" ] && kill -0 "$NOISE_PID" 2>/dev/null; do
  sleep 30
done

CHEAP="single_trial_alpha_dc single_trial_alpha_dc2 \
  single_trial_drift_alpha single_trial_alpha_sepvar \
  single_trial_dc_not_scaled basic_ddm single_trial_alpha_scaled \
  single_trial_alpha basic_ddm_eta_dc single_trial_alpha_dc_not_scaled"
HEAVY="basic_ddm_dc_evidence_no_noise2 basic_ddm_dc_evidence_trainlow basic_ddm_dc_evidence_no_noise"

for m in $CHEAP; do
  out="results/recovery_${m}_40k_r4.json"
  if [ -f "$out" ]; then echo "skip $m"; continue; fi
  echo "=== $(date -u +%H:%M:%S) 40k replication: $m ==="
  timeout 10000 python -m bayesflow_nddms_tpu.apps.recovery_study \
    --model "$m" --steps 40000 --num-test 2000 --draws 1000 \
    --ckpt-dir "trained/${m}_40k_r4" --no-plots \
    --out "$out" > "results/logs/queue_${m}_40k_r4.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) done $m rc=$? ==="
done

# r4 re-emit of the round-3-validated specs (study-only, ~5 min each):
# VERDICT r3 #1's done-criterion wants a results/recovery_*_r4.json for
# EVERY zoo entry, with contraction bounds in-artifact
bash scripts/reemit_r3_zoo_contraction_r4.sh

# evidence-family 40k replications, time permitting (35-80 min each)
for m in $HEAVY; do
  out="results/recovery_${m}_40k_r4.json"
  if [ -f "$out" ]; then echo "skip $m"; continue; fi
  echo "=== $(date -u +%H:%M:%S) 40k replication: $m ==="
  timeout 10000 python -m bayesflow_nddms_tpu.apps.recovery_study \
    --model "$m" --steps 40000 --num-test 2000 --draws 1000 \
    --ckpt-dir "trained/${m}_40k_r4" --no-plots \
    --out "$out" > "results/logs/queue_${m}_40k_r4.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) done $m rc=$? ==="
done
echo "40K QUEUE COMPLETE $(date -u)"
