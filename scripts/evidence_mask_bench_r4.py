"""Measure the evidence family's padded-lane saving (VERDICT r3 weak #4).

Round 4 made ``first_passage_with_path`` honor the trial mask: padded
lanes are born-done and the post-record tail runs in chunks with an
all-done early exit. This measures ``ModelSpec.simulate`` throughput for
``basic_ddm_dc_evidence`` (dt=.001, 4,000-step cap, 200-sample path)
with realistic per-dataset trial counts:

  * ``masked``   — the round-4 path (padded lanes born-done);
  * ``unmasked`` — all lanes walk to absorption or the 4 s cap, the
    pre-round-4 behavior's cost envelope.

Run from the repo root on the TPU:
    python scripts/evidence_mask_bench_r4.py
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


def measure(use_mask: bool, *, batch=256, reps=3) -> float:
    spec = zoo.get_model("basic_ddm_dc_evidence")
    n_pad = spec.n_max
    key = jax.random.PRNGKey(0)

    @jax.jit
    def run(k):
        k_t, k_n, k_s = jax.random.split(k, 3)
        theta = spec.sample_prior(k_t, batch)
        n = sample_n_trials(k_n, spec, batch)
        mask = trial_mask(n, n_pad)
        data = spec.simulate(k_s, theta, n_pad,
                             active=mask if use_mask else None)
        return jnp.abs(data).sum() * 1e-20 + mask.sum()

    jax.block_until_ready(run(key))     # compile
    best = 0.0
    for rep in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(jax.random.fold_in(key, rep + 1)))
        dt = time.perf_counter() - t0
        best = max(best, batch * n_pad / dt)
    return best


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 \
        else "results/evidence_mask_bench_r4.json"
    masked = measure(True)
    unmasked = measure(False)
    result = {
        "model": "basic_ddm_dc_evidence",
        "lanes_per_sec_masked": round(masked, 1),
        "lanes_per_sec_unmasked": round(unmasked, 1),
        "speedup": round(masked / unmasked, 3),
        "platform": jax.devices()[0].platform,
        "note": "256 datasets x 300 padded lanes, N ~ U{60..300}; "
                "masked = padded lanes born-done + chunked tail early "
                "exit (round 4), unmasked = every lane walks to "
                "absorption/cap (pre-round-4 cost envelope)",
    }
    print(json.dumps(result, indent=2))
    with open(out_path + ".tmp", "w") as f:
        json.dump(result, f, indent=2)
    os.replace(out_path + ".tmp", out_path)


if __name__ == "__main__":
    main()
