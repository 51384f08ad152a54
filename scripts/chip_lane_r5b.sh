#!/bin/bash
# Round-5 serial TPU lane, part B — run AFTER chip_lane_r5.sh completes.
# Bounds the residual bias of debiased amortized means on the Stahl
# accuracy condition (VERDICT r4 #3's fallback arm): exact NeuTra/plain
# refits of a RANDOM participant sample (not worst-K), reporting
# per-parameter |dz| of debiased amortized means vs exact.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p results/logs

log() { echo "=== $(date -u +%H:%M:%S) $*"; }

FS200=trained/single_trial_alpha_not_scaled_200k_r5
CKPT="$FS200"
[ -d "$FS200" ] || CKPT=trained/single_trial_alpha_not_scaled_100k_r3c

if [ ! -f results/stahl_accuracy_random_refit_r5.json ]; then
  # seed-stable random sample of 8 accuracy participants
  IDS=$(python - <<'PY'
import numpy as np, pandas as pd
from bayesflow_nddms_tpu.data.stahl import resolve_csv
df = pd.read_csv(resolve_csv("stahl_data/accuracy_data.csv"))
parts = np.unique(df["subj_idx"])
rng = np.random.default_rng(2025)
print(",".join(str(p) for p in sorted(rng.choice(parts, 8, replace=False))))
PY
)
  log "accuracy random-sample exact refits (participants $IDS, ckpt $CKPT)"
  timeout 14000 python -m bayesflow_nddms_tpu.apps.fit_stahl \
    --csv stahl_data/accuracy_data.csv --covariate invert --psis \
    --draws 2000 --ckpt-dir "$CKPT" --no-plots \
    --refit-participants "$IDS" \
    --json-out results/stahl_accuracy_random_refit_r5.json \
    --out results/stahl_accuracy_random_refit_r5.npz \
    > results/logs/stahl_accuracy_random_refit_r5.log 2>&1
  log "random refits rc=$?"
fi

# Independent-seed study replications from the SAME checkpoints for the
# marginals flagged at 40k (dc2 precedent: a sub-.05 p that moves between
# replications of one checkpoint is the n=2000 chi-square straddling its
# detection threshold, not a persistent miscalibration)
for m in basic_ddm_dc_evidence_no_noise2 single_trial_drift_dc_base; do
  ck="trained/${m}_40k_r4"; [ -d "$ck" ] || ck="trained/${m}_40k_r5"
  out="results/recovery_${m}_40k_seed7_r5.json"
  if [ -f "$out" ] || [ ! -d "$ck" ]; then continue; fi
  log "independent-seed study replication: $m ($ck)"
  timeout 6000 python -m bayesflow_nddms_tpu.apps.recovery_study \
    --model "$m" --steps 40000 --num-test 2000 --draws 1000 --seed 7 \
    --ckpt-dir "$ck" --no-plots --out "$out" \
    > "results/logs/queue_${m}_40k_seed7_r5.log" 2>&1
  log "done $m seed7 rc=$?"
done

# 80k replication of the new model's persistent-but-small beta flag
# (dc6 precedent: beta p recovered at 80k while the ~+2pt conservative
# 50%-coverage stays — measured family trait, not a bug)
m=single_trial_drift_dc_base
if [ ! -f "results/recovery_${m}_80k_r5.json" ]; then
  log "80k replication: $m"
  cp -r "trained/${m}_40k_r5" "trained/${m}_80k_r5" 2>/dev/null || true
  timeout 12000 python -m bayesflow_nddms_tpu.apps.recovery_study \
    --model "$m" --steps 80000 --num-test 2000 --draws 1000 \
    --ckpt-dir "trained/${m}_80k_r5" --no-plots \
    --out "results/recovery_${m}_80k_r5.json" \
    > "results/logs/queue_${m}_80k_r5.log" 2>&1
  log "done $m 80k rc=$?"
fi

# Standard-imputation artifact (timed out in lane A behind a concurrent
# CPU pytest run starving the one-core host; retried on a quiet machine)
if [ ! -f results/imputation_standard_r5.json ]; then
  log "imputation through single_trial_alpha_standard (retry)"
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

log "zoo multiplicity re-pool"
python scripts/zoo_multiplicity_r5.py \
  > results/logs/zoo_multiplicity_r5.log 2>&1

log "CHIP LANE R5B COMPLETE"
