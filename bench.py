"""Headline benchmark: simulated DDM trials/sec on one chip.

Workload matches the reference's training hot loop (``basic_ddm_dc.py:
85-125`` via SURVEY.md §6): draw priors, draw per-dataset trial counts
N ~ U{60..300}, run the exact-in-law first-passage walks (exact Gaussian
transitions + Brownian-bridge crossing test + GIG crossing-time draws,
ops/ddm_sim.py), emit (rt, choice) channels. We count ACTIVE
(non-padding) trials only.

Baseline: the north-star target 1e8 trials/sec (BASELINE.md); the
reference's own envelope is ~2.9e9 trials over a 30 h SLURM allocation
(~2.7e4 trials/sec effective on CPU+numba).

Prints one JSON line.
"""

import json
import subprocess
import sys
import time


def _tunnel_alive(timeout_s: float = 120.0) -> bool:
    """Probe device init in a subprocess with a hard timeout.

    The tunneled TPU relay can die permanently mid-session; every client
    afterwards hangs forever inside ``jax.devices()`` (it is not
    restartable from inside the VM). A second, measured failure mode is a
    HALF-dead tunnel: device enumeration succeeds but every execution
    hangs — so the probe must actually run a computation, not just list
    devices. The probe inherits this process's exact environment, so it
    exercises the same plugin path the bench would; on failure we fall
    back to CPU so the bench always emits its JSON line instead of
    hanging the driver. The tunnel also SERIALIZES clients — another
    client's multi-minute compile makes a healthy tunnel time a probe
    out — so try twice before concluding death (measured 2026-08-19:
    two probes timed out, minutes later the bench ran on-chip).
    """
    for _ in range(2):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; jax.devices(); "
                 "jnp.ones((8, 128)).sum().block_until_ready()"],
                timeout=timeout_s, capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
    return False


_TUNNEL_OK = _tunnel_alive()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if not _TUNNEL_OK:
    # Must be the in-process config call: the axon plugin's sitecustomize
    # update beats the JAX_PLATFORMS env var (same recipe as
    # tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")

from bayesflow_nddms_tpu.models import zoo
from bayesflow_nddms_tpu.models.spec import generate_training_batch

# North star: >=1e8 trials/sec on v5e-8 (BASELINE.json). The bench runs on
# ONE chip, so the per-chip target is 1e8 / 8.
NORTH_STAR = 1e8 / 8


def main():
    spec = zoo.get_model("basic_ddm_dc")
    batch, n_pad, inner, iters = 8192, 300, 8, 4
    reps = 5
    if not _TUNNEL_OK:
        # fallback sizing: the TPU workload is ~1.2e9 trials; on one CPU
        # core that is tens of minutes. Keep the measurement honest but
        # bounded.
        batch, inner, iters, reps = 512, 2, 2, 3

    @jax.jit
    def run(key):
        # ``inner`` generations fused into one dispatch via lax.scan — the
        # exact shape of the fused trainer's hot loop (trainer.py inner
        # chunks). One dispatch per *chunk* keeps the ~9 ms host/tunnel
        # round-trip off the measurement, same as in real training, where
        # 100 steps share a dispatch (measured round-2 profile: dispatch
        # overhead was ~40% of a one-batch-per-call bench).
        def gen(carry, i):
            theta, data, mask, log_n = generate_training_batch(
                spec, jax.random.fold_in(key, i), batch, n_pad)
            # fold data into the result so the simulation cannot be DCE'd
            return carry + mask.sum() + 1e-20 * jnp.abs(data).sum(), None
        total, _ = jax.lax.scan(gen, jnp.zeros(()), jnp.arange(inner))
        return total

    key = jax.random.PRNGKey(0)
    out = run(key)
    jax.block_until_ready(out)  # warmup/compile

    # Async pipelined dispatch with one final sync. Tunneled devices show
    # large run-to-run load variance; the headline is the best of 5 reps
    # (steady-state estimate on a time-shared tunnel), with the median
    # reported alongside (VERDICT r2 Next #4).
    rates = []
    for rep in range(reps):
        t0 = time.perf_counter()
        outs = [run(jax.random.fold_in(key, rep * 1000 + i))
                for i in range(iters)]
        total_active = float(sum(jax.block_until_ready(outs)))
        dt = time.perf_counter() - t0
        rates.append(total_active / dt)
    rates.sort()
    trials_per_sec = rates[-1]

    out = {
        "metric": "simulated_ddm_trials_per_sec",
        "value": round(trials_per_sec, 1),
        "unit": "trials/s/chip",
        "vs_baseline": round(trials_per_sec / NORTH_STAR, 4),
        "value_median": round(rates[len(rates) // 2], 1),
        "platform": jax.devices()[0].platform,
    }
    if not _TUNNEL_OK:
        out["note"] = ("TPU tunnel unreachable; CPU fallback. Last "
                       "on-chip measurement: 1.31e8 best / 1.30e8 median "
                       "trials/s/chip (docs/DESIGN.md s11)")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
