"""Weak-scaling table on the virtual n-device CPU mesh (VERDICT r3 #7).

Multi-chip hardware is not reachable from this environment, so this is
the scaling evidence the environment permits: per-device work is held
CONSTANT while the mesh grows 1 -> 8 virtual devices
(--xla_force_host_platform_device_count). All virtual devices share one
physical CPU core, so ideal weak scaling here is wall-clock growing
LINEARLY with the device count (total work grows with the mesh); the
reported ``overhead`` column is time(n) / (time(1) * n) — anything
materially above 1.0 would be sharding/collective overhead, which is the
quantity this table can honestly measure. Correctness of the sharded
programs themselves is covered by __graft_entry__.dryrun_multichip.

Run:  python scripts/weak_scaling_r4.py [out.json]
"""

import json
import os
import subprocess
import sys

_CHILD = r"""
import time
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from bayesflow_nddms_tpu.models import zoo
from bayesflow_nddms_tpu.parallel.mesh import make_mesh
from bayesflow_nddms_tpu.train.trainer import TrainConfig, Trainer
from bayesflow_nddms_tpu.diagnostics.recovery import \
    run_recovery_study_streaming

n_dev = N_DEV
mesh = make_mesh(n_dev)
spec = zoo.get_model("single_trial_alpha_not_scaled")

# fused DP trainer: 8 datasets / device / step, 10-step chunks
cfg = TrainConfig(batch_size=8 * n_dev, n_pad=128, steps=20,
                  inner_steps=10, warmup=1, val_size=n_dev, seed=0)
tr = Trainer(spec, cfg, mesh=mesh)
state = tr.init()
state, losses = tr._chunk(state)           # compile + warm
jax.block_until_ready(losses)
t0 = time.perf_counter()
state, losses = tr._chunk(state)
jax.block_until_ready(losses)
t_train = time.perf_counter() - t0

# sharded streaming study chunk: 16 datasets / device, 256 draws
study_kw = dict(num_test=16 * n_dev, n_draws=256, batch=16 * n_dev,
                n_pad=128, log_every=0, mesh=mesh)
run_recovery_study_streaming(spec, tr.amortizer, state.params,
                             jax.random.PRNGKey(1), **study_kw)  # warm
t0 = time.perf_counter()
run_recovery_study_streaming(spec, tr.amortizer, state.params,
                             jax.random.PRNGKey(1), **study_kw)
t_study = time.perf_counter() - t0

print("RESULT", n_dev, t_train, t_study)
"""


def run(n_dev: int):
    env = dict(os.environ)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = here
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={n_dev}")
    env["XLA_FLAGS"] = " ".join(flags)
    code = _CHILD.replace("N_DEV", str(n_dev))
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=here,
                          capture_output=True, text=True, timeout=3600)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr)
        raise RuntimeError(f"n_dev={n_dev} failed")
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT"):
            _, n, t_train, t_study = line.split()
            return float(t_train), float(t_study)
    raise RuntimeError(f"no RESULT line for n_dev={n_dev}")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "results/weak_scaling_r4.json"
    rows = {}
    for n in (1, 2, 4, 8):
        t_train, t_study = run(n)
        rows[n] = {"train_chunk_s": t_train, "study_chunk_s": t_study}
        print(f"n_dev={n}: train {t_train:.3f}s study {t_study:.3f}s",
              flush=True)
    base_t, base_s = rows[1]["train_chunk_s"], rows[1]["study_chunk_s"]
    table = {
        "note": ("virtual CPU mesh: all devices share ONE physical core, "
                 "so ideal weak scaling is time growing linearly with "
                 "n_dev; overhead = time(n)/(time(1)*n) measures the "
                 "sharding/collective cost. Multi-chip correctness: "
                 "__graft_entry__.dryrun_multichip."),
        "per_device_work": {"train": "8 datasets x 10 steps",
                            "study": "16 datasets x 256 draws"},
        "rows": [
            {"n_dev": n,
             **rows[n],
             "train_overhead": rows[n]["train_chunk_s"] / (base_t * n),
             "study_overhead": rows[n]["study_chunk_s"] / (base_s * n)}
            for n in rows],
    }
    print(json.dumps(table, indent=2))
    with open(out + ".tmp", "w") as f:
        json.dump(table, f, indent=2)
    os.replace(out + ".tmp", out)


if __name__ == "__main__":
    main()
