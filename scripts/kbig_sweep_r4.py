"""On-chip sweep of the Pallas kernel's big-tier step multiple ``kbig``.

Backs the KBIG = 3.0 default in ops/ddm_pallas.py (ADVICE r3 #1: the
round-3 sweep was never recorded as an artifact). Measures raw kernel
throughput on prior-drawn dcDDM parameter batches — the same workload
shape the trainer feeds the kernel — for kbig in {1 (no-tier control),
2, 3, 4, 6, 8} and one cfar variant. Writes one JSON artifact.

Run from the repo root on the TPU:  python scripts/kbig_sweep_r4.py
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bayesflow_nddms_tpu.models import zoo                     # noqa: E402
from bayesflow_nddms_tpu.ops.ddm_pallas import first_passage_pallas  # noqa


def measure(kbig: float, cfar: float, *, batch=4096, n_trials=300,
            inner=4, reps=3) -> float:
    spec = zoo.get_model("basic_ddm_dc")
    key = jax.random.PRNGKey(0)
    theta = spec.sample_prior(key, batch)
    drift = theta[:, 0:1]
    bound = theta[:, 1:2]
    beta = theta[:, 2:3]
    dc = theta[:, 4:5]
    shape = (batch, n_trials)

    @jax.jit
    def run(seed0):
        def gen(carry, i):
            fp = first_passage_pallas(
                seed0 + i, drift, bound, beta, dc, shape=shape,
                dt=spec.dt, max_steps=spec.max_steps,
                kbig=kbig, cfar=cfar)
            return carry + fp.steps.sum() + fp.frac.sum() * 1e-9, None
        total, _ = jax.lax.scan(gen, jnp.zeros(()), jnp.arange(inner))
        return total

    jax.block_until_ready(run(jnp.int32(1)))    # compile
    rates = []
    for rep in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(jnp.int32(100 + rep * inner)))
        dt = time.perf_counter() - t0
        rates.append(batch * n_trials * inner / dt)
    return max(rates)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 \
        else "results/pallas_kbig_sweep_r4.json"
    rows = []
    for kbig, cfar in [(1.0, 2.5), (2.0, 2.5), (3.0, 2.5), (3.5, 2.5),
                       (4.0, 2.5), (6.0, 2.5), (8.0, 2.5), (3.0, 3.0)]:
        rate = measure(kbig, cfar)
        rows.append({"kbig": kbig, "cfar": cfar,
                     "walks_per_sec": round(rate, 1)})
        print(f"kbig={kbig} cfar={cfar}: {rate:.3e} walks/s", flush=True)
    base = next(r["walks_per_sec"] for r in rows
                if r["kbig"] == 1.0 and r["cfar"] == 2.5)
    for r in rows:
        r["vs_no_tier"] = round(r["walks_per_sec"] / base, 3)
    result = {
        "workload": "prior-drawn dcDDM batches, 4096 x 300 walks, "
                    "best-of-3 fused x4 dispatches",
        "platform": jax.devices()[0].platform,
        "rows": rows,
    }
    print(json.dumps(result, indent=2))
    with open(out_path + ".tmp", "w") as f:
        json.dump(result, f, indent=2)
    os.replace(out_path + ".tmp", out_path)


if __name__ == "__main__":
    main()
