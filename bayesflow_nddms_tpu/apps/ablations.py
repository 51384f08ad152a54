"""Measured ablations: experience replay vs online, and bf16 vs f32
summary compute.

Two questions the round-1 review left open:

  * ``replay``: BayesFlow trains with an experience-replay buffer
    (``basic_ddm_dc.py:199-202``); on TPU the simulator is fused into the
    train step and nearly free, so online training should match or beat
    replay at equal step budgets (``train/replay.py`` docstring claim).
    This measures both: steps/sec and end recovery on the same model.
  * ``bf16``: the DeepSet trial stack supports bfloat16 compute
    (``nets/amortizer.py summary_dtype``); this measures the train-step
    speedup and any recovery cost.

    python -m bayesflow_nddms_tpu.apps.ablations replay --steps 4000
    python -m bayesflow_nddms_tpu.apps.ablations bf16 --steps 2000
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from ..diagnostics.recovery import run_recovery_study
from ..models import zoo
from ..nets.amortizer import AmortizedPosterior, build_amortizer
from ..train.trainer import TrainConfig, Trainer


def _train_and_study(spec, cfg, amortizer=None, num_test=512, draws=1000,
                     seed=7):
    trainer = Trainer(spec, cfg, amortizer=amortizer)
    t0 = time.time()
    state, hist = trainer.train()
    train_sec = time.time() - t0
    # steady-state steps/sec EXCLUDING the first chunk: the remote-TPU
    # compile of the fused 100-step program can take minutes and varies
    # between programs, which made whole-run timing compare compile
    # services, not training (both arms run ~4 ms/step once compiled)
    if len(hist["sec"]) >= 2:
        steady = ((hist["step"][-1] - hist["step"][0])
                  / (hist["sec"][-1] - hist["sec"][0]))
    else:
        steady = cfg.steps / train_sec
    study = run_recovery_study(spec, trainer.amortizer, state.params,
                               jax.random.PRNGKey(seed), num_test=num_test,
                               n_draws=draws)
    return {
        "steps_per_sec_steady": steady,
        "train_sec_incl_compile": train_sec,
        "final_val_loss": hist["val_loss"][-1],
        "rho": {k: v["rho"] for k, v in study.metrics.items()},
    }


def run_replay(args):
    spec = zoo.get_model(args.model)
    base = dict(batch_size=args.batch_size, steps=args.steps,
                n_pad=spec.n_max, seed=args.seed)
    out = {
        "online": _train_and_study(spec, TrainConfig(**base)),
        f"replay_{args.slots}": _train_and_study(
            spec, TrainConfig(**base, replay_slots=args.slots)),
    }
    print(json.dumps(out, indent=2))
    return out


def run_bf16(args):
    spec = zoo.get_model(args.model)
    base = dict(batch_size=args.batch_size, steps=args.steps,
                n_pad=spec.n_max, seed=args.seed)
    m, s = spec.prior_moments()
    mk = lambda dt: AmortizedPosterior(
        n_params=spec.n_params,
        theta_mean=tuple(float(x) for x in m),
        theta_std=tuple(float(x) for x in s),
        summary_dim=spec.summary_dim, summary_dtype=dt)
    out = {
        "f32": _train_and_study(spec, TrainConfig(**base),
                                amortizer=mk(jnp.float32)),
        "bf16": _train_and_study(spec, TrainConfig(**base),
                                 amortizer=mk(jnp.bfloat16)),
    }
    print(json.dumps(out, indent=2))
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("replay", "bf16"):
        q = sub.add_parser(name)
        q.add_argument("--model", default="basic_ddm_dc",
                       choices=zoo.list_models())
        q.add_argument("--steps", type=int, default=4000)
        q.add_argument("--batch-size", type=int, default=256)
        q.add_argument("--seed", type=int, default=11)
        if name == "replay":
            q.add_argument("--slots", type=int, default=32)
    args = p.parse_args(argv)
    return run_replay(args) if args.cmd == "replay" else run_bf16(args)


if __name__ == "__main__":
    main()
