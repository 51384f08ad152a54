#!/bin/bash
# Round-5 serial TPU lane, part D — validate the new exact backend for
# single_trial_drift_dc_base (closed-form drift marginal + TN+ dc
# quadrature, models.exact_loglik_ctx) on hardware:
#   1. PSIS khat certification of the amortized posterior on 64
#      generating-range datasets (the first per-dataset quality signal
#      this model ever had);
#   2. amortized-vs-exact agreement at real ESS (16 datasets, NeuTra
#      over the marginal, 8 chains x 2500).
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p results/logs

log() { echo "=== $(date -u +%H:%M:%S) $*"; }
probe() {
  timeout 120 python -c "import jax, jax.numpy as jnp; \
jnp.ones((8,128)).sum().block_until_ready()" >/dev/null 2>&1
}
probe || { sleep 60; probe || { log "TPU unreachable; abort"; exit 1; }; }

CKPT=trained/single_trial_drift_dc_base_80k_r5

if [ ! -f results/importance_drift_dc_base_r5.json ]; then
  log "PSIS importance check: drift_dc_base"
  timeout 10000 python -m bayesflow_nddms_tpu.apps.importance_check \
    --model single_trial_drift_dc_base --num-datasets 64 --draws 2000 \
    --ckpt-dir "$CKPT" \
    --out results/importance_drift_dc_base_r5.npz \
    --json-out results/importance_drift_dc_base_r5.json \
    > results/logs/importance_drift_dc_base_r5.log 2>&1
  log "importance rc=$?"
fi

if [ ! -f results/agreement_drift_dc_base_neutra_r5.json ]; then
  log "agreement (NeuTra over the quadrature marginal): drift_dc_base"
  timeout 12000 python -m bayesflow_nddms_tpu.apps.agreement \
    --model single_trial_drift_dc_base --num-datasets 16 --draws 2000 \
    --chains 8 --warmup 700 --samples 2500 --max-depth 8 --neutra \
    --ckpt-dir "$CKPT" \
    --nuts-checkpoint results/logs/agreement_drift_dc_base_nuts_r5 \
    --out results/agreement_drift_dc_base_neutra_r5.npz \
    --json-out results/agreement_drift_dc_base_neutra_r5.json \
    > results/logs/agreement_drift_dc_base_neutra_r5.log 2>&1
  log "agreement rc=$?"
fi

log "CHIP LANE R5D COMPLETE"
