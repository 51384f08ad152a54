#!/bin/bash
# Round-5 serial TPU lane, part C — reference-scale upgrades now that
# every VERDICT item is closed: 12,000 x 10,000 streaming studies for
# the new model and the 200k flagship, and 200k-net PSIS for the Stahl
# base/speed conditions (README parity for all three conditions).
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

# ---- 1. drift_dc_base at reference study scale ---------------------------
m=single_trial_drift_dc_base
out="results/recovery_${m}_80k_12000x10000_r5.json"
if [ ! -f "$out" ]; then
  log "12000x10000 streaming study: $m (80k ckpt)"
  timeout 10000 python -m bayesflow_nddms_tpu.apps.recovery_study \
    --model "$m" --steps 80000 --num-test 12000 --draws 10000 \
    --stream --workdir "results/study_${m}_r5" \
    --ckpt-dir "trained/${m}_80k_r5" --no-plots --out "$out" \
    > "results/logs/study_${m}_12000_r5.log" 2>&1
  log "done $m 12000x10000 rc=$?"
fi

# ---- 2. flagship 200k at reference study scale ---------------------------
out=results/recovery_flagship_200k_12000x10000_r5.json
if [ ! -f "$out" ]; then
  log "12000x10000 streaming study: flagship 200k"
  timeout 10000 python -m bayesflow_nddms_tpu.apps.recovery_study \
    --model single_trial_alpha_not_scaled --steps 200000 \
    --num-test 12000 --draws 10000 \
    --stream --workdir results/study_flagship_200k_r5 \
    --ckpt-dir trained/single_trial_alpha_not_scaled_200k_r5 \
    --no-plots --out "$out" \
    > results/logs/study_flagship_200k_12000_r5.log 2>&1
  log "done flagship 12000x10000 rc=$?"
fi

# ---- 3. Stahl base + speed PSIS with the 200k net ------------------------
for cond in base speed; do
  out="results/stahl_psis_${cond}_invert_200k_r5.json"
  if [ -f "$out" ]; then continue; fi
  log "$cond PSIS (200k net)"
  timeout 7200 python -m bayesflow_nddms_tpu.apps.fit_stahl \
    --csv "stahl_data/${cond}_data.csv" --covariate invert --psis \
    --draws 2000 --ckpt-dir trained/single_trial_alpha_not_scaled_200k_r5 \
    --no-plots \
    --json-out "$out" --out "results/stahl_psis_${cond}_invert_200k_r5.npz" \
    > "results/logs/stahl_${cond}_200k_r5.log" 2>&1
  log "done $cond PSIS rc=$?"
done

log "CHIP LANE R5C COMPLETE"
