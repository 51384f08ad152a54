"""Misspecification study driver for the trial-level boundary models.

Replaces the ``test_misspecification`` suites embedded in the reference's
model scripts — the flagship's (``single_trial_alpha_not_scaled.py:
879-1889``) and its 1,750+-LoC duplicates for the alpha variants
(``retired_models/single_trial_alpha_standard.py:750-1560``,
``single_trial_alpha_fixed.py``; SURVEY.md §2.5). One ``--model`` flag
selects the fitted model; the five alternative ground truths are built
for that model's own covariate-centering convention:

  * ``self``      — data from the fitted model itself (sanity, :879-894)
  * ``trial_dc``  — trial-wise diffusion coefficient instead of trial-wise
                    boundary (:899-1056): covariate tracks ``dc_trial``
                    with the model's centering (``1*dc_trial - center``,
                    single_trial_alpha_standard.py:854, _fixed.py:849)
  * ``scaled``    — covariate loading gamma ~ U(0,2) instead of 1, center
                    scaled along (:1205-1463; _standard.py:1151)
  * ``scaled2``   — fixed loading gamma = 2 (:1466-1700; _standard.py:1379)
  * ``fine_dt``   — same model simulated at dt=.001 / 4000 steps, the
                    Brown et al. (2006) EM-accuracy check (:1702-1765)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..diagnostics.recovery import pearson, rsquared_pred
from ..models import zoo
from ..models.spec import generate_training_batch
from ..train.trainer import TrainConfig, Trainer
from .fit_stahl import prop_cognitive_variance

FLAGSHIP = "single_trial_alpha_not_scaled"

# covariate centering per supported model: the term subtracted from the
# (loading * bound_trial) covariate mean
#   not_scaled: nothing (ext ~ N(g*bound, s1))
#   standard:   g * mu_alpha (ext mean is zero by construction, :113-117)
#   fixed:      g * 1        (centered at -1 when g = 1, _fixed.py:111-113)
_CENTERING = {FLAGSHIP: "none",
              "single_trial_alpha_standard": "mu",
              "single_trial_alpha_fixed": "one"}


def _center(kind, mu):
    if kind == "none":
        return 0.0
    return mu if kind == "mu" else 1.0


def _trial_dc_spec(model):
    """Trial-wise-dc alternative truth with the model's centering
    (covariate tracks dc_trial: _standard.py:854 / _fixed.py:849)."""
    kind = _CENTERING[model]
    if kind == "none":
        return zoo.get_model("single_trial_dc_not_scaled")
    if kind == "mu":
        return zoo.get_model("single_trial_dc_centered")
    base = zoo.get_model("single_trial_dc_not_scaled")

    def obs_fn(key, th, trial, t_dec, choice):
        choicert = choice.astype(jnp.float32) * (th["ter"][:, None] + t_dec)
        ext = (trial.dc - 1.0) + th["sigma1"][:, None] * \
            jax.random.normal(key, trial.dc.shape)
        return jnp.stack([choicert, ext], axis=-1)

    return dataclasses.replace(base, name=model + "_trial_dc",
                               obs_fn=obs_fn)


def _scaled_spec(model, gamma_fixed=None):
    """gamma-scaled alternative truth: ext ~ N(g*bound - g*center, sigma1)
    with g ~ U(0,2) (or fixed). _standard.py:1151/1379, _fixed.py:1146/
    1374, flagship :1205-1463/:1466-1577."""
    kind = _CENTERING[model]
    base = zoo.get_model(model)
    from ..utils import dists

    def obs_fn(key, th, trial, t_dec, choice):
        choicert = choice.astype(jnp.float32) * (th["ter"][:, None] + t_dec)
        g = (jnp.float32(gamma_fixed) if gamma_fixed is not None
             else th["gamma"][:, None])
        c = _center(kind, th["mu_alpha"][:, None])
        ext = g * (trial.boundary - c) + th["sigma1"][:, None] * \
            jax.random.normal(key, trial.boundary.shape)
        return jnp.stack([choicert, ext], axis=-1)

    if gamma_fixed is not None:
        return dataclasses.replace(base, name=f"{model}_scaled2",
                                   obs_fn=obs_fn)
    return dataclasses.replace(
        base, name=f"{model}_scaled", obs_fn=obs_fn,
        param_names=base.param_names + ("gamma",),
        prior=base.prior + (dists.uniform(0.0, 2.0),))


def alternative_truths(model):
    base = zoo.get_model(model)
    return {
        "self": base,
        "trial_dc": _trial_dc_spec(model),
        "scaled": (zoo.get_model("single_trial_alpha_scaled")
                   if model == FLAGSHIP else _scaled_spec(model)),
        "scaled2": _scaled_spec(model, gamma_fixed=2.0),
        "fine_dt": dataclasses.replace(base, name=model + "_fine",
                                       dt=0.001, max_steps=4000),
    }


# how each alternative truth's parameter vector maps onto the fitted
# model's 7 slots for recovery comparison (None = no comparable truth)
_PARAM_MAP = {
    "self": list(range(7)),
    "fine_dt": list(range(7)),
    "scaled": list(range(7)),        # extra gamma ignored
    "scaled2": list(range(7)),
    # trial_dc params: drift, alpha, beta, ter, std_dc, mu_dc, sigma1
    # fitted slots:    drift, mu_alpha, beta, ter, std_alpha, dc, sigma1
    "trial_dc": [0, 1, 2, 3, None, None, 6],
}


def _true_pcv(case: str, theta: np.ndarray) -> np.ndarray | None:
    """Ground-truth proportion of covariate variance explained by cognition
    per test dataset, where the alternative truth defines one
    (single_trial_alpha_not_scaled.py:1108-1129). Centering shifts the
    covariate's mean only, so the variance decomposition is shared by
    all three model conventions."""
    if case in ("self", "fine_dt"):
        # std_alpha^2 / (std_alpha^2 + sigma1^2), slots 4 and 6
        return theta[:, 4] ** 2 / (theta[:, 4] ** 2 + theta[:, 6] ** 2)
    if case == "trial_dc":
        # covariate tracks trial dc, not boundary: cognitive share of the
        # covariate VARIANCE is std_dc^2/(std_dc^2+sigma1^2) but none of it
        # reflects BOUNDARY variability — the reference treats 0 as the
        # "no boundary link" truth (:1108-1129)
        return np.zeros(theta.shape[0])
    if case == "scaled":
        # ext = N(g*(bound-c), sigma1): cognition explains g^2 std_alpha^2
        # of the covariate variance (gamma is the LAST slot)
        g = theta[:, 7]
        return (g * theta[:, 4]) ** 2 / (
            (g * theta[:, 4]) ** 2 + theta[:, 6] ** 2)
    if case == "scaled2":
        return (2 * theta[:, 4]) ** 2 / (
            (2 * theta[:, 4]) ** 2 + theta[:, 6] ** 2)
    return None


def _quantiles(x: np.ndarray) -> dict:
    q = np.quantile(x, [0.025, 0.25, 0.5, 0.75, 0.975])
    return {"mean": float(x.mean()), "sd": float(x.std()),
            "q2.5": float(q[0]), "q25": float(q[1]), "median": float(q[2]),
            "q75": float(q[3]), "q97.5": float(q[4])}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=FLAGSHIP, choices=list(_CENTERING))
    p.add_argument("--ckpt-dir", default=None,
                   help="default: trained/<model> (falling back to "
                        "checkpoint/<model>)")
    p.add_argument("--cases", nargs="*",
                   default=["self", "trial_dc", "scaled", "scaled2",
                            "fine_dt"])
    p.add_argument("--num-test", type=int, default=500)
    p.add_argument("--draws", type=int, default=1000)
    p.add_argument("--seed", type=int, default=2023)
    p.add_argument("--plot-dir", default="recovery_plots")
    p.add_argument("--no-plots", action="store_true")
    p.add_argument("--out", default=None,
                   help="npz path for the full per-dataset distributions")
    p.add_argument("--json-out", default=None,
                   help="summary JSON path (per-case metrics)")
    args = p.parse_args(argv)
    if args.out and os.path.exists(args.out):
        # artifact-existence resume (alpha_not_scaled.py:52,230-256)
        print(f"output exists at {args.out}, skipping (delete to re-run)")
        return None

    spec = zoo.get_model(args.model)
    ckpt = args.ckpt_dir
    if ckpt is None:
        ckpt = f"trained/{args.model}"
        if not os.path.isdir(ckpt):
            ckpt = f"checkpoint/{args.model}"
    cfg = TrainConfig(batch_size=256, steps=1, n_pad=spec.n_max,
                      ckpt_dir=ckpt)
    trainer = Trainer(spec, cfg)
    state = trainer.maybe_restore(trainer.init())
    if int(state.step) == 0:
        raise SystemExit(f"no checkpoint under {ckpt}")

    truths = alternative_truths(args.model)
    results, dists_npz = {}, {}
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
        # per-dataset posterior-mean prop_cog_var DISTRIBUTION and its bias
        # against each dataset's ground truth (the reference reports these
        # as histograms, single_trial_alpha_not_scaled.py:1042-1200)
        pcv = prop_cognitive_variance(post)        # (T, draws)
        pcv_mean = pcv.mean(axis=1)                # (T,)
        tpcv = _true_pcv(case, theta)
        results[case] = {
            "per_param": per_param,
            "prop_cog_var": _quantiles(pcv_mean),
            "prop_cog_var_bias": (_quantiles(pcv_mean - tpcv)
                                  if tpcv is not None else None),
        }
        dists_npz[f"{case}_pcv_mean"] = pcv_mean
        if tpcv is not None:
            dists_npz[f"{case}_pcv_true"] = tpcv
        print(f"[{case}] prop_cog_var = {pcv_mean.mean():.3f} "
              f"(bias {np.mean(pcv_mean - tpcv):+.3f})" if tpcv is not None
              else f"[{case}] prop_cog_var = {pcv_mean.mean():.3f}",
              flush=True)

        if not args.no_plots:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            from ..diagnostics import plots
            pdir = os.path.join(args.plot_dir, args.model,
                                "misspecification")
            os.makedirs(pdir, exist_ok=True)
            # per-case recovery scatter over the mapped slots (:1042-1100)
            srcs = [s for s in _PARAM_MAP[case] if s is not None]
            slots = [i for i, s in enumerate(_PARAM_MAP[case])
                     if s is not None]
            names = [spec.param_names[i] for i in slots]
            fig = plots.recovery_scatter(
                theta[:, srcs], post_mean[:, slots], names,
                figsize=(4 * len(names), 4))
            fig.savefig(f"{pdir}/{case}_recovery.png", dpi=120)
            # prop-cog-var distribution (and bias when truth defined)
            fig, ax = plt.subplots(1, 2 if tpcv is not None else 1,
                                   figsize=(10, 4), squeeze=False)
            ax[0, 0].hist(pcv_mean, bins=40, color="steelblue")
            ax[0, 0].set_xlabel("posterior-mean prop_cog_var")
            if tpcv is not None:
                ax[0, 1].hist(pcv_mean - tpcv, bins=40, color="firebrick")
                ax[0, 1].set_xlabel("bias (posterior mean - truth)")
                ax[0, 1].axvline(0, color="k", lw=1)
            fig.suptitle(f"{args.model}: {case}")
            fig.savefig(f"{pdir}/{case}_prop_cog_var.png", dpi=120)
            plt.close("all")

    print(json.dumps(results, indent=2))
    if args.out:
        np.savez(args.out, **dists_npz)
    if args.json_out:
        with open(args.json_out + ".tmp", "w") as f:
            json.dump({"model": args.model, **results}, f, indent=2)
        os.replace(args.json_out + ".tmp", args.json_out)
    return results


if __name__ == "__main__":
    main()
