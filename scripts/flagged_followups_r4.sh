#!/bin/bash
# Round-4 follow-up chip queue, in value order:
#   1. retrain any zoo spec whose 20k lane pass failed (e.g. the
#      dependent-prior amortizer regression fixed mid-round);
#   2. retry the standnorm imputation (predated the CSV path fallback);
#   3. NeuTra re-fit of the eta agreement (plain NUTS left 2-3 of 16
#      datasets at Rhat up to 14; PSIS khat <= .42 everywhere says the
#      transport is good, so NeuTra should converge the holdouts);
#   4. 40k replications for every flagged SBC marginal (round-3
#      protocol), most-severe flags first.
# Artifact-resumable like the main lane.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p results/logs

# ---- 1. retrains ---------------------------------------------------------
all_models=$(python -c "
import jax; jax.config.update('jax_platforms', 'cpu')
from bayesflow_nddms_tpu.models import zoo
skip = {'basic_ddm_dc', 'single_trial_alpha_not_scaled',
        'single_trial_drift_alpha2', 'single_trial_drift_alpha_base',
        'single_trial_drift_dc2', 'single_trial_drift_dc3',
        'single_trial_drift_dc4', 'single_trial_drift_dc5',
        'single_trial_drift_dc6'}
print(' '.join(m for m in zoo.list_models() if m not in skip))")
for m in $all_models; do
  out="results/recovery_${m}_20k_r4.json"
  if [ -f "$out" ]; then continue; fi
  echo "=== $(date -u +%H:%M:%S) retrain (missing): $m ==="
  timeout 10000 python -m bayesflow_nddms_tpu.apps.recovery_study \
    --model "$m" --steps 20000 --num-test 2000 --draws 1000 \
    --ckpt-dir "trained/${m}_20k_r4" --no-plots \
    --out "$out" > "results/logs/queue_${m}_20k_r4.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) done $m rc=$? ==="
done

# ---- 2. imputation retry -------------------------------------------------
if [ ! -f results/imputation_standnorm_r4.npz ]; then
  echo "=== $(date -u +%H:%M:%S) imputation standnorm retry ==="
  timeout 4000 python -m bayesflow_nddms_tpu.apps.imputation \
    --model single_trial_alpha_standnorm \
    --ckpt-dir trained/single_trial_alpha_standnorm_20k_r4 \
    --out results/imputation_standnorm_r4.npz \
    > results/logs/imputation_standnorm_r4.log 2>&1
  echo "=== done rc=$? ==="
fi

# ---- 3. eta agreement, NeuTra --------------------------------------------
if [ ! -f results/agreement_eta_dc_neutra_r4.json ]; then
  echo "=== $(date -u +%H:%M:%S) agreement eta NeuTra ==="
  timeout 10000 python -m bayesflow_nddms_tpu.apps.agreement \
    --model basic_ddm_eta_dc --num-datasets 16 --draws 2000 \
    --chains 8 --warmup 700 --samples 2500 --max-depth 8 --neutra \
    --ckpt-dir trained/basic_ddm_eta_dc_20k_r4 \
    --nuts-checkpoint results/logs/agreement_eta_neutra_nuts_r4 \
    --out results/agreement_eta_dc_neutra_r4.npz \
    --json-out results/agreement_eta_dc_neutra_r4.json \
    > results/logs/agreement_eta_dc_neutra_r4.log 2>&1
  echo "=== done rc=$? ==="
fi

# ---- 3b. cheap amortized-side extras (minutes each) ----------------------
# misspecification for the second alpha variant (reference duplicates the
# suite into _standard AND _fixed)
if [ ! -f results/misspecification_fixed_r4.npz ]; then
  echo "=== $(date -u +%H:%M:%S) misspecification fixed ==="
  timeout 4000 python -m bayesflow_nddms_tpu.apps.misspecification \
    --model single_trial_alpha_fixed \
    --ckpt-dir trained/single_trial_alpha_fixed_20k_r4 \
    --num-test 500 --draws 1000 --no-plots \
    --out results/misspecification_fixed_r4.npz \
    --json-out results/misspecification_fixed_r4.json \
    > results/logs/misspecification_fixed_r4.log 2>&1
  echo "=== done rc=$? ==="
fi
# PSIS for the SECOND drift-variability model with an exact likelihood
if [ ! -f results/importance_drift2_r4.json ] \
   && [ -d trained/single_trial_drift2_20k_r4 ]; then
  echo "=== $(date -u +%H:%M:%S) importance drift2 ==="
  timeout 4000 python -m bayesflow_nddms_tpu.apps.importance_check \
    --model single_trial_drift2 --num-datasets 64 --draws 2000 \
    --ckpt-dir trained/single_trial_drift2_20k_r4 \
    --out results/importance_drift2_r4.npz \
    --json-out results/importance_drift2_r4.json \
    > results/logs/importance_drift2_r4.log 2>&1
  echo "=== done rc=$? ==="
fi

# ---- 4. 40k replications, most-severe flag first -------------------------
flagged=$(python - <<'PY'
import glob
import json
rows = []
for f in sorted(glob.glob("results/recovery_*_20k_r4.json")):
    d = json.load(open(f))
    bad = {k: round(v, 4) for k, v in d["sbc_pvalues"].items() if v < 0.05}
    if bad:
        print(f"# {d['model']}: {bad}")
        rows.append((min(bad.values()), d["model"]))
print(" ".join(m for _, m in sorted(rows)))
PY
)
echo "$flagged"
models=$(echo "$flagged" | tail -1)
for m in $models; do
  out="results/recovery_${m}_40k_r4.json"
  if [ -f "$out" ]; then echo "skip $m ($out exists)"; continue; fi
  echo "=== $(date -u +%H:%M:%S) 40k replication: $m ==="
  timeout 10000 python -m bayesflow_nddms_tpu.apps.recovery_study \
    --model "$m" --steps 40000 --num-test 2000 --draws 1000 \
    --ckpt-dir "trained/${m}_40k_r4" --no-plots \
    --out "$out" > "results/logs/queue_${m}_40k_r4.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) done $m rc=$? ==="
done
echo "FOLLOWUPS COMPLETE $(date -u)"
