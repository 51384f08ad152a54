"""Misspecification study driver for the flagship model.

Replaces the ``test_misspecification`` suite embedded in
``single_trial_alpha_not_scaled.py:879-1889``: the amortizer trained on
the flagship generative model is confronted with data from ALTERNATIVE
ground truths and the bias in recovered parameters (especially the
proportion-of-cognitive-variance summary) is reported:

  * ``self``      — data from the fitted model itself (sanity, :879-894)
  * ``trial_dc``  — trial-wise diffusion coefficient instead of trial-wise
                    boundary (:899-1056); zoo model single_trial_dc_not_scaled
  * ``scaled``    — covariate loading gamma ~ U(0,2) instead of 1
                    (:1205-1463); zoo model single_trial_alpha_scaled
  * ``scaled2``   — fixed loading gamma = 2 (:1466-1700)
  * ``fine_dt``   — same model simulated at dt=.001 / 4000 steps, the
                    Brown et al. (2006) EM-accuracy check (:1702-1765)
"""

from __future__ import annotations

import argparse
import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

from ..diagnostics.recovery import pearson, rsquared_pred
from ..models import zoo
from ..models.spec import generate_training_batch
from ..train.trainer import TrainConfig, Trainer
from .fit_stahl import prop_cognitive_variance

FLAGSHIP = "single_trial_alpha_not_scaled"


def _scaled2_spec():
    """Flagship generator with the covariate loading FIXED at 2
    (single_trial_alpha_not_scaled.py:1466-1577)."""
    base = zoo.get_model(FLAGSHIP)

    def obs_fn(key, th, trial, t_dec, choice):
        choicert = choice.astype(jnp.float32) * (th["ter"][:, None] + t_dec)
        ext = 2.0 * trial.boundary + th["sigma1"][:, None] * \
            jax.random.normal(key, trial.boundary.shape)
        return jnp.stack([choicert, ext], axis=-1)

    return dataclasses.replace(base, name=FLAGSHIP + "_scaled2",
                               obs_fn=obs_fn)


def alternative_truths():
    base = zoo.get_model(FLAGSHIP)
    return {
        "self": base,
        "trial_dc": zoo.get_model("single_trial_dc_not_scaled"),
        "scaled": zoo.get_model("single_trial_alpha_scaled"),
        "scaled2": _scaled2_spec(),
        "fine_dt": dataclasses.replace(base, name=FLAGSHIP + "_fine",
                                       dt=0.001, max_steps=4000),
    }


# how each alternative truth's parameter vector maps onto the flagship's
# 7 slots for recovery comparison (None = no comparable truth)
_PARAM_MAP = {
    "self": list(range(7)),
    "fine_dt": list(range(7)),
    "scaled": list(range(7)),        # extra gamma ignored
    "scaled2": list(range(7)),
    # trial_dc params: drift, alpha, beta, ter, std_dc, mu_dc, sigma1
    # flagship slots:  drift, mu_alpha, beta, ter, std_alpha, dc, sigma1
    "trial_dc": [0, 1, 2, 3, None, None, 6],
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt-dir", default=f"checkpoint/{FLAGSHIP}")
    p.add_argument("--cases", nargs="*",
                   default=["self", "trial_dc", "scaled", "scaled2",
                            "fine_dt"])
    p.add_argument("--num-test", type=int, default=500)
    p.add_argument("--draws", type=int, default=1000)
    p.add_argument("--seed", type=int, default=2023)
    args = p.parse_args(argv)

    spec = zoo.get_model(FLAGSHIP)
    cfg = TrainConfig(batch_size=256, steps=1, n_pad=spec.n_max,
                      ckpt_dir=args.ckpt_dir)
    trainer = Trainer(spec, cfg)
    state = trainer.maybe_restore(trainer.init())

    truths = alternative_truths()
    results = {}
    for case in args.cases:
        alt = truths[case]
        key = jax.random.PRNGKey(args.seed)
        theta, data, mask, log_n = generate_training_batch(
            alt, jax.random.fold_in(key, 1), args.num_test, spec.n_max)
        post = np.asarray(trainer.sample(
            state, jax.random.fold_in(key, 2), data, mask, log_n,
            args.draws))
        post_mean = post.mean(axis=1)
        theta = np.asarray(theta)

        per_param = {}
        for slot, src in enumerate(_PARAM_MAP[case]):
            name = spec.param_names[slot]
            if src is None:
                per_param[name] = None
                continue
            per_param[name] = {
                "r2": rsquared_pred(theta[:, src], post_mean[:, slot]),
                "rho": pearson(theta[:, src], post_mean[:, slot]),
                "bias": float((post_mean[:, slot] - theta[:, src]).mean()),
            }
        pcv = prop_cognitive_variance(post)
        results[case] = {
            "per_param": per_param,
            "prop_cog_var_mean": float(pcv.mean()),
        }
        print(f"[{case}] prop_cog_var = {pcv.mean():.3f}", flush=True)

    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
