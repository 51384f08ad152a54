#!/bin/bash
# Round-5 serial TPU lane — every chip job in ONE queue (the tunnel
# serializes clients; see CLAUDE.md). Artifact-existence checks make every
# stage restart-safe: rerun this script after any interruption.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p results/logs trained

log() { echo "=== $(date -u +%H:%M:%S) $*"; }

probe() {
  timeout 120 python -c "import jax, jax.numpy as jnp; \
jnp.ones((8,128)).sum().block_until_ready(); print('tpu ok')" \
    >/dev/null 2>&1
}
if ! probe; then
  log "first TPU probe failed; retrying once (tunnel may be busy)"
  sleep 60
  probe || { log "TPU unreachable; aborting lane"; exit 1; }
fi

# ---- 1. Pallas kernel tests on hardware (validates the new path kernel
#         BEFORE any training consumes it) -------------------------------
if [ ! -f results/pallas_tpu_tests_r5.ok ]; then
  log "pallas TPU test suite"
  NDDMS_TEST_TPU=1 timeout 3600 python -m pytest tests/test_pallas_tpu.py \
    -q -m '' > results/logs/pallas_tpu_tests_r5.log 2>&1 \
    && touch results/pallas_tpu_tests_r5.ok
  log "pallas tests rc=$? ($(tail -1 results/logs/pallas_tpu_tests_r5.log))"
fi

# If the path-kernel tests did not pass, train the evidence family on the
# validated XLA path instead (slow but correct); the main Pallas kernel
# (separately validated) stays on.
if [ ! -f results/pallas_tpu_tests_r5.ok ]; then
  log "path-kernel tests NOT green; disabling the path Pallas kernel"
  export NDDMS_DISABLE_PATH_PALLAS=1
fi

# ---- 2. Evidence Pallas bench (speedup artifact) ------------------------
if [ ! -f results/evidence_pallas_bench_r5.json ]; then
  log "evidence pallas bench"
  timeout 3600 python scripts/evidence_pallas_bench_r5.py \
    > results/logs/evidence_pallas_bench_r5.log 2>&1
  log "evidence bench rc=$?"
fi

# ---- 3. Close the zoo: the newly registered model -----------------------
m=single_trial_drift_dc_base
if [ ! -f "results/recovery_${m}_20k_r5.json" ]; then
  log "20k training + study: $m"
  timeout 10000 python -m bayesflow_nddms_tpu.apps.recovery_study \
    --model "$m" --steps 20000 --num-test 2000 --draws 1000 \
    --ckpt-dir "trained/${m}_20k_r5" --no-plots \
    --out "results/recovery_${m}_20k_r5.json" \
    > "results/logs/queue_${m}_20k_r5.log" 2>&1
  log "done $m 20k rc=$?"
fi
# 40k replication iff any marginal flagged at 20k (the round-4 protocol)
if [ -f "results/recovery_${m}_20k_r5.json" ] && \
   [ ! -f "results/recovery_${m}_40k_r5.json" ]; then
  flagged=$(python - <<'PY'
import json
d = json.load(open("results/recovery_single_trial_drift_dc_base_20k_r5.json"))
print(int(any(p < 0.05 for p in d["sbc_pvalues"].values())))
PY
)
  if [ "$flagged" = "1" ]; then
    log "40k replication: $m (flagged at 20k)"
    cp -r "trained/${m}_20k_r5" "trained/${m}_40k_r5" 2>/dev/null || true
    timeout 10000 python -m bayesflow_nddms_tpu.apps.recovery_study \
      --model "$m" --steps 40000 --num-test 2000 --draws 1000 \
      --ckpt-dir "trained/${m}_40k_r5" --no-plots \
      --out "results/recovery_${m}_40k_r5.json" \
      > "results/logs/queue_${m}_40k_r5.log" 2>&1
    log "done $m 40k rc=$?"
  else
    log "$m clean at 20k; no 40k needed"
  fi
fi

# ---- 4. Outstanding evidence-family 40k replications --------------------
# (no_noise2 resumes its part-trained round-4 checkpoint)
for m in basic_ddm_dc_evidence_no_noise2 basic_ddm_dc_evidence_trainlow \
         basic_ddm_dc_evidence_no_noise; do
  out="results/recovery_${m}_40k_r4.json"
  if [ -f "$out" ]; then log "skip $m (artifact exists)"; continue; fi
  log "40k replication: $m"
  timeout 12000 python -m bayesflow_nddms_tpu.apps.recovery_study \
    --model "$m" --steps 40000 --num-test 2000 --draws 1000 \
    --ckpt-dir "trained/${m}_40k_r4" --no-plots \
    --out "$out" > "results/logs/queue_${m}_40k_r5.log" 2>&1
  log "done $m rc=$?"
done

# ---- 5. Flagship 200k (Stahl accuracy certification, VERDICT #3) --------
FS=single_trial_alpha_not_scaled
FS200=trained/${FS}_200k_r5
if [ ! -d "$FS200" ] && [ -d "trained/${FS}_100k_r3c" ]; then
  log "seeding 200k dir from the r3c 100k checkpoint"
  cp -r "trained/${FS}_100k_r3c" "$FS200"
fi
if [ ! -f results/recovery_flagship_200k_r5.json ]; then
  log "flagship 100k -> 200k continued training + study"
  timeout 12000 python -m bayesflow_nddms_tpu.apps.recovery_study \
    --model "$FS" --steps 200000 --num-test 2000 --draws 1000 \
    --ckpt-dir "$FS200" --no-plots \
    --out results/recovery_flagship_200k_r5.json \
    > results/logs/flagship_200k_r5.log 2>&1
  log "flagship 200k rc=$?"
fi

# ---- 6. Stahl accuracy PSIS with the 200k net ---------------------------
if [ -f results/recovery_flagship_200k_r5.json ] && \
   [ ! -f results/stahl_psis_accuracy_invert_200k_r5.json ]; then
  log "accuracy PSIS re-certification (200k net)"
  timeout 7200 python -m bayesflow_nddms_tpu.apps.fit_stahl \
    --csv stahl_data/accuracy_data.csv --covariate invert --psis \
    --draws 2000 --ckpt-dir "$FS200" --no-plots \
    --json-out results/stahl_psis_accuracy_invert_200k_r5.json \
    --out results/stahl_psis_accuracy_invert_200k_r5.npz \
    > results/logs/stahl_accuracy_200k_r5.log 2>&1
  log "accuracy PSIS rc=$?"
fi

# ---- 7. Standard imputation pipeline artifact (VERDICT #6) --------------
if [ ! -f results/imputation_standard_r5.json ]; then
  log "imputation through single_trial_alpha_standard"
  timeout 3600 python - > results/logs/imputation_standard_r5.log 2>&1 <<'PY'
import json
from bayesflow_nddms_tpu.apps.imputation import main
m = main(["--model", "single_trial_alpha_standard",
          "--ckpt-dir", "trained/single_trial_alpha_standard_20k_r4",
          "--draws", "1000", "--out",
          "results/imputation_standard_r5.npz"])
with open("results/imputation_standard_r5.json", "w") as f:
    json.dump({"model": "single_trial_alpha_standard",
               "imputation_recovery": m}, f, indent=2)
PY
  log "imputation standard rc=$?"
fi

# ---- 8. Zoo-wide multiplicity artifact (CPU, pools the new studies) -----
log "zoo multiplicity pooling"
python scripts/zoo_multiplicity_r5.py > results/logs/zoo_multiplicity_r5.log 2>&1

# ---- 9. Bench -----------------------------------------------------------
log "bench"
timeout 1800 python bench.py > results/logs/bench_r5.log 2>&1
tail -1 results/logs/bench_r5.log

log "CHIP LANE R5 COMPLETE"
