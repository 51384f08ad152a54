"""Measure the evidence family's Pallas path-kernel speedup (VERDICT r4
weak #6 / next #4).

Round 5 added ``first_passage_with_path_pallas``: the 4,000-step dt=.001
EM walk with 200-400 recorded path samples now runs from VMEM with the
hardware PRNG (Box-Muller) instead of XLA threefry, with per-block tail
early exit. This times ``ModelSpec.simulate`` (mask on, realistic trial
counts) for the 200-channel and 400-channel configurations on both
backends, plus the full fused train step, and writes one artifact.

Run from the repo root on the TPU:
    python scripts/evidence_pallas_bench_r5.py
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bayesflow_nddms_tpu.models import zoo                     # noqa: E402
from bayesflow_nddms_tpu.models.spec import sample_n_trials, \
    trial_mask                                                  # noqa: E402


def measure_sim(model: str, use_pallas: bool, *, batch=256, reps=3) -> float:
    if use_pallas:
        os.environ.pop("NDDMS_DISABLE_PALLAS", None)
    else:
        os.environ["NDDMS_DISABLE_PALLAS"] = "1"
    spec = zoo.get_model(model)
    n_pad = spec.n_max
    key = jax.random.PRNGKey(0)

    @jax.jit
    def run(k):
        k_t, k_n, k_s = jax.random.split(k, 3)
        theta = spec.sample_prior(k_t, batch)
        n = sample_n_trials(k_n, spec, batch)
        mask = trial_mask(n, n_pad)
        data = spec.simulate(k_s, theta, n_pad, active=mask)
        return jnp.abs(data).sum() * 1e-20 + mask.sum()

    jax.block_until_ready(run(key))     # compile
    best = 0.0
    for rep in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(jax.random.fold_in(key, rep + 1)))
        dt = time.perf_counter() - t0
        best = max(best, batch * n_pad / dt)
    os.environ.pop("NDDMS_DISABLE_PALLAS", None)
    return best


def measure_train_step(model: str, *, batch=256, reps=3) -> float:
    """Seconds per fused 10-step dispatch / 10 (sim + net fwd/bwd)."""
    from bayesflow_nddms_tpu.train.trainer import TrainConfig, Trainer
    cfg = TrainConfig(batch_size=batch, steps=10, inner_steps=10,
                      warmup=5, val_size=batch)
    tr = Trainer(zoo.get_model(model), cfg)
    state = tr.init()
    jax.block_until_ready(tr._chunk(state)[0].params)   # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        state, _ = tr._chunk(state)
        jax.block_until_ready(state.params)
        best = min(best, (time.perf_counter() - t0) / cfg.inner_steps)
    return best


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 \
        else "results/evidence_pallas_bench_r5.json"
    result = {"platform": jax.devices()[0].platform, "models": {}}
    for model in ("basic_ddm_dc_evidence", "basic_ddm_dc_evidence_no_noise2"):
        pallas = measure_sim(model, True)
        xla = measure_sim(model, False)
        result["models"][model] = {
            "lanes_per_sec_pallas": round(pallas, 1),
            "lanes_per_sec_xla": round(xla, 1),
            "sim_speedup": round(pallas / xla, 3),
        }
    result["train_step_ms_evidence_pallas"] = round(
        measure_train_step("basic_ddm_dc_evidence") * 1e3, 3)
    result["note"] = ("256 datasets x 300 padded lanes, N ~ U{60..300}, "
                      "mask on; pallas = HW-PRNG VMEM path kernel "
                      "(round 5), xla = threefry scan twin")
    print(json.dumps(result, indent=2))
    with open(out_path + ".tmp", "w") as f:
        json.dump(result, f, indent=2)
    os.replace(out_path + ".tmp", out_path)


if __name__ == "__main__":
    main()
