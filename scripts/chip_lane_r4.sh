#!/bin/bash
# Round-4 master chip lane: ALL TPU jobs in one serial stream (the tunnel
# serializes clients; a second client only adds stall time). Every step
# is resumable by artifact existence; trainings also resume from orbax.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p results/logs trained

train() { # train() MODEL [STEPS]
  local m=$1 steps=${2:-20000} tag
  tag=$((steps / 1000))k
  local out="results/recovery_${m}_${tag}_r4.json"
  if [ -f "$out" ]; then echo "skip train $m ($out exists)"; return; fi
  echo "=== $(date -u +%H:%M:%S) train $m ($steps) ==="
  timeout 10000 python -m bayesflow_nddms_tpu.apps.recovery_study \
    --model "$m" --steps "$steps" --num-test 2000 --draws 1000 \
    --ckpt-dir "trained/${m}_${tag}_r4" --no-plots \
    --out "$out" > "results/logs/queue_${m}_${tag}_r4.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) done $m rc=$? ==="
}

run() { # run NAME ARTIFACT -- CMD...
  local name=$1 art=$2; shift; shift; shift   # drop NAME, ARTIFACT, --
  if [ -f "$art" ]; then echo "skip $name ($art exists)"; return; fi
  echo "=== $(date -u +%H:%M:%S) run $name ==="
  timeout 10000 "$@" > "results/logs/${name}.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) done $name rc=$? ==="
}

# ---- stage A: re-emit headline recovery artifacts WITH contraction ------
# (VERDICT r3 #3: amortized-side only, from the round-3 checkpoints)
run recovery_flagship_12000x10000_r4 results/recovery_flagship_12000x10000_r4.json -- \
  python -m bayesflow_nddms_tpu.apps.recovery_study \
    --model single_trial_alpha_not_scaled --steps 100000 \
    --ckpt-dir trained/single_trial_alpha_not_scaled_100k_r3c \
    --num-test 12000 --draws 10000 --stream --study-batch 128 \
    --workdir results/study_flagship_r4 --no-plots \
    --out results/recovery_flagship_12000x10000_r4.json
run recovery_dcddm_12000x10000_r4 results/recovery_dcddm_12000x10000_r4.json -- \
  python -m bayesflow_nddms_tpu.apps.recovery_study \
    --model basic_ddm_dc --steps 100000 \
    --ckpt-dir trained/basic_ddm_dc_100k_r3c \
    --num-test 12000 --draws 10000 --stream --study-batch 128 \
    --workdir results/study_dcddm_r4 --no-plots \
    --out results/recovery_dcddm_12000x10000_r4.json

# ---- stage B1: priority trainings (unlock downstream measured runs) -----
train basic_ddm_eta_dc
train single_trial_alpha_standard
train single_trial_alpha_standnorm
train single_trial_alpha_fixed

# ---- stage C: downstream measured deliverables --------------------------
# eta-family exact backend: agreement at real ESS + PSIS khat (VERDICT #2)
run agreement_eta_dc_r4 results/agreement_eta_dc_r4.json -- \
  python -m bayesflow_nddms_tpu.apps.agreement \
    --model basic_ddm_eta_dc --num-datasets 16 --draws 2000 \
    --chains 8 --warmup 700 --samples 2500 --max-depth 8 --dense-mass \
    --ckpt-dir trained/basic_ddm_eta_dc_20k_r4 \
    --nuts-checkpoint results/logs/agreement_eta_nuts_r4 \
    --out results/agreement_eta_dc_r4.npz \
    --json-out results/agreement_eta_dc_r4.json
run importance_eta_dc_r4 results/importance_eta_dc_r4.json -- \
  python -m bayesflow_nddms_tpu.apps.importance_check \
    --model basic_ddm_eta_dc --num-datasets 64 --draws 2000 \
    --ckpt-dir trained/basic_ddm_eta_dc_20k_r4 \
    --out results/importance_eta_dc_r4.npz \
    --json-out results/importance_eta_dc_r4.json
# misspecification suite for an alpha variant (VERDICT #4)
run misspecification_standard_r4 results/misspecification_standard_r4.npz -- \
  python -m bayesflow_nddms_tpu.apps.misspecification \
    --model single_trial_alpha_standard \
    --ckpt-dir trained/single_trial_alpha_standard_20k_r4 \
    --num-test 500 --draws 1000 --no-plots \
    --out results/misspecification_standard_r4.npz
# imputation parity for standnorm (VERDICT #5)
run imputation_standnorm_r4 results/imputation_standnorm_r4.npz -- \
  python -m bayesflow_nddms_tpu.apps.imputation \
    --model single_trial_alpha_standnorm \
    --ckpt-dir trained/single_trial_alpha_standnorm_20k_r4 \
    --out results/imputation_standnorm_r4.npz

# ---- stage B2: the rest of the zoo --------------------------------------
for m in basic_ddm single_trial_alpha single_trial_alpha_scaled \
         single_trial_alpha_sepvar single_trial_alpha_mean \
         single_trial_alpha_not_scaled2 single_trial_alpha_not_scaled3 \
         single_trial_alpha_dc single_trial_alpha_dc2 \
         single_trial_alpha_dc_not_scaled single_trial_dc_centered \
         single_trial_dc_not_scaled single_trial_drift \
         single_trial_drift2 single_trial_drift_alpha \
         single_trial_drift_dc basic_ddm_dc_evidence2 \
         basic_ddm_dc_evidence_no_noise basic_ddm_dc_evidence_trainlow \
         basic_ddm_dc_evidence_no_noise2; do
  train "$m"
done

# ---- stage D: cheap measurement artifacts -------------------------------
run pallas_kbig_sweep_r4 results/pallas_kbig_sweep_r4.json -- python scripts/kbig_sweep_r4.py
run train_step_ms_r4 results/train_step_ms_r4.json -- python scripts/train_step_ms_r4.py
run evidence_mask_bench_r4 results/evidence_mask_bench_r4.json -- python scripts/evidence_mask_bench_r4.py

echo "CHIP LANE COMPLETE $(date -u)"
