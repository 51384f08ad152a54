"""Cross-backend agreement study: amortized vs exact-likelihood posteriors
on the SAME simulated dcDDM datasets.

The reference's implicit end-to-end integration test (SURVEY.md §4.2) is
that its three backends — BayesFlow (``basic_ddm_dc.py``), JAGS
(``basic_ddm_dc_pyjags.py:103-137``) and Stan (``basic_ddm_dc_pystan2.py:
106-177``) — produce agreeing posteriors under matched priors. This app
makes that check explicit and quantitative: simulate datasets from the
``basic_ddm_dc`` prior, fit each with (a) the trained amortizer and
(b) NUTS on the exact WFPT density with the /dc rescaling
(``basic_ddm_dc_pyjags.py:133``) under the *identical* priors
(``mcmc/models._PRIORS`` == the spec's prior), and report per-parameter
|Δ posterior mean| in units of the exact posterior SD plus interval
agreement.

Because the per-dataset priors are independent, all datasets are fitted in
ONE NUTS run: each dataset is a "participant" of the hierarchical model
(``mcmc/models.make_logprob``), whose joint posterior factorizes.

Known asymmetry, same as the reference's: the amortizer is trained on the
Euler-Maruyama simulator (dt=.01) and sees capped/missing trials
(choice=0), while the WFPT likelihood is the exact continuous-time density
over boundary-crossing trials only. The reported gap therefore bounds
discretization + missingness effects too.

    python -m bayesflow_nddms_tpu.apps.agreement --num-datasets 32 \
        --draws 2000 --chains 4 --samples 1500 --dense-mass
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..diagnostics.convergence import diagnostic
from ..mcmc import models as M
from ..mcmc import nuts as N
from ..models import zoo
from ..models.spec import generate_training_batch
from ..train.trainer import TrainConfig, Trainer

MODEL = "basic_ddm_dc"
# spec order (drift, alpha, beta, ter, dc) -> mcmc model names
_NAME_MAP = {"drift": "delta", "alpha": "alpha", "beta": "beta",
             "ter": "ndt", "dc": "varsigma"}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--num-datasets", type=int, default=32)
    p.add_argument("--draws", type=int, default=2000,
                   help="amortized posterior draws per dataset")
    p.add_argument("--chains", type=int, default=4)
    p.add_argument("--warmup", type=int, default=700)
    p.add_argument("--samples", type=int, default=1500)
    p.add_argument("--thin", type=int, default=1)
    p.add_argument("--max-depth", type=int, default=8)
    p.add_argument("--dense-mass", action="store_true",
                   help="full-covariance mass (recommended: aligns NUTS "
                        "with the alpha/varsigma ridge)")
    p.add_argument("--chunk", type=int, default=50)
    p.add_argument("--ckpt-dir", default=f"trained/{MODEL}")
    p.add_argument("--seed", type=int, default=2024)
    p.add_argument("--out", default=None, help=".npz output path")
    p.add_argument("--prior-draws", action="store_true",
                   help="draw test parameters from the full prior instead "
                        "of the reference's MCMC generating ranges. The "
                        "full prior includes near-degenerate datasets "
                        "(tiny dc -> nearly all trials missing) whose "
                        "posterior geometry freezes gradient-based "
                        "samplers; the reference only ever runs JAGS/Stan "
                        "inside the narrow ranges "
                        "(basic_ddm_dc_pyjags.py:56-78)")
    args = p.parse_args(argv)
    if args.out and os.path.exists(args.out):
        # artifact-existence resume (alpha_not_scaled.py:52,230-256): an
        # already-produced output means this expensive step is done
        print(f"output exists at {args.out}, skipping (delete to re-run)")
        return None

    spec = zoo.get_model(MODEL)
    key = jax.random.PRNGKey(args.seed)

    # --- shared datasets -------------------------------------------------
    from ..models.spec import sample_n_trials, trial_mask
    k1, k2, k3 = jax.random.split(jax.random.fold_in(key, 1), 3)
    if args.prior_draws:
        theta, data, mask, log_n = generate_training_batch(
            spec, jax.random.fold_in(key, 1), args.num_datasets, spec.n_max)
    else:
        # the reference's MCMC generating ranges
        # (basic_ddm_dc_pyjags.py:56-78): uniform per-dataset parameters
        rng = np.random.default_rng(args.seed)
        M_ = args.num_datasets
        theta = jnp.asarray(np.stack([
            rng.uniform(-4.0, 4.0, M_),     # drift
            rng.uniform(0.8, 1.4, M_),      # alpha
            rng.uniform(0.3, 0.7, M_),      # beta
            rng.uniform(0.15, 0.6, M_),     # ter
            rng.uniform(0.8, 1.4, M_),      # dc
        ], axis=-1), jnp.float32)
        n = sample_n_trials(k2, spec, M_)
        mask = trial_mask(n, spec.n_max)
        data = spec.simulate(k3, theta, spec.n_max, active=mask)
        log_n = jnp.log(n.astype(jnp.float32))[:, None]
    theta_np = np.asarray(theta)
    d = np.asarray(data)
    m = np.asarray(mask)
    rt, choice = d[..., 0], d[..., 1]
    valid = m & (choice != 0)          # boundary-crossing trials only
    n_missing = int((m & (choice == 0)).sum())
    print(f"{args.num_datasets} datasets, {int(m.sum())} trials "
          f"({n_missing} capped/missing excluded from the exact "
          f"likelihood)", flush=True)

    # --- backend A: amortized --------------------------------------------
    cfg = TrainConfig(batch_size=256, steps=1, n_pad=spec.n_max,
                      ckpt_dir=args.ckpt_dir)
    trainer = Trainer(spec, cfg)
    state = trainer.maybe_restore(trainer.init())
    if int(state.step) == 0:
        raise SystemExit(f"no checkpoint under {args.ckpt_dir}; train one "
                         f"with apps.recovery_study first")
    post = np.asarray(trainer.sample(
        state, jax.random.fold_in(key, 2), data, mask, log_n, args.draws))
    amort_mean, amort_sd = post.mean(axis=1), post.std(axis=1)

    # --- backend B: exact WFPT + NUTS ------------------------------------
    ds_idx, tr_idx = np.nonzero(valid)
    y = (choice[ds_idx, tr_idx] * rt[ds_idx, tr_idx]).astype(np.float32)
    mdata = M.DcDDMData(y=jnp.asarray(y),
                        participant=jnp.asarray(ds_idx, jnp.int32),
                        nparts=args.num_datasets)
    logprob, _, dim = M.make_logprob(mdata)
    # A near-degenerate prior draw can leave a dataset with zero
    # boundary-crossing trials; its exact posterior is then the prior and
    # any finite min_rt works for initialization — never .min() an empty
    # slice (ADVICE r2 #1).
    min_rt = np.array([np.abs(y[ds_idx == i]).min()
                       if np.any(ds_idx == i) else 1.0
                       for i in range(args.num_datasets)])
    q0 = M.initial_positions(jax.random.fold_in(key, 3), mdata, args.chains,
                             jnp.asarray(min_rt, jnp.float32))
    # AMORTIZED PRECONDITIONING — a capability the reference's JAGS/Stan
    # backends cannot have: the amortizer's per-dataset posterior SDs,
    # mapped to the sampler's unconstrained space through the sigmoid
    # Jacobian at the posterior mean, seed window-1 inverse mass. Without
    # it, unit mass on this stiff multiscale posterior (ndt SD ~1e-3 s at
    # N up to 300 trials) adapts eps to ~1e-3 and trajectories U-turn at
    # depth ~2: chains freeze (measured; see docs/DESIGN.md).
    init_var = np.empty(dim, np.float32)
    spec_idx = {"delta": 0, "alpha": 1, "beta": 2, "ndt": 3, "varsigma": 4}
    for b, mname in enumerate(M._PARAM_ORDER):
        i = spec_idx[mname]
        mean_x, sd_x = amort_mean[:, i], amort_sd[:, i]
        if mname == "delta":
            var_z = sd_x ** 2
        else:
            lo, hi = M._BOUNDS[mname]
            s = np.clip((mean_x - lo) / (hi - lo), 1e-3, 1 - 1e-3)
            dz_dx = 1.0 / ((hi - lo) * s * (1.0 - s))
            var_z = (sd_x * dz_dx) ** 2
        init_var[b * args.num_datasets:(b + 1) * args.num_datasets] = \
            np.clip(var_z, 1e-6, 1e2)
    print(f"NUTS over {dim} parameters, {args.chains} chains "
          f"(dense_mass={args.dense_mass}, amortizer-preconditioned "
          f"mass)...", flush=True)
    res = N.run_chains_chunked(
        logprob, q0, jax.random.fold_in(key, 4), n_warmup=args.warmup,
        n_samples=args.samples, thin=args.thin, max_depth=args.max_depth,
        chunk=args.chunk, progress=True, dense_mass=args.dense_mass,
        init_inv_mass=jnp.asarray(init_var))
    sdict = {k: np.asarray(v) for k, v in
             M.samples_to_dict(np.asarray(res.samples), mdata).items()}
    diags = diagnostic(sdict)

    # --- comparison -------------------------------------------------------
    report = {}
    npz = {"theta_true": theta_np, "amort_mean": amort_mean,
           "amort_sd": amort_sd}
    for i, pname in enumerate(spec.param_names):
        mname = _NAME_MAP[pname]
        ex = sdict[mname]                     # (M, S, C)
        ex_mean = ex.mean(axis=(1, 2))
        ex_sd = ex.std(axis=(1, 2))
        dz = (amort_mean[:, i] - ex_mean) / ex_sd
        # 95% central interval overlap (Jaccard) per dataset
        a_lo, a_hi = np.quantile(post[:, :, i], [0.025, 0.975], axis=1)
        e_lo = np.quantile(ex.reshape(ex.shape[0], -1), 0.025, axis=1)
        e_hi = np.quantile(ex.reshape(ex.shape[0], -1), 0.975, axis=1)
        inter = np.maximum(0.0, np.minimum(a_hi, e_hi)
                           - np.maximum(a_lo, e_lo))
        union = np.maximum(a_hi, e_hi) - np.minimum(a_lo, e_lo)
        report[pname] = {
            "mean_abs_dz": float(np.abs(dz).mean()),
            "max_abs_dz": float(np.abs(dz).max()),
            "mean_bias_z": float(dz.mean()),
            "ci95_jaccard": float((inter / union).mean()),
            "exact_max_rhat": float(np.nanmax(diags[mname]["rhat"])),
            "exact_min_neff": float(np.nanmin(diags[mname]["neff"])),
        }
        npz[f"exact_mean_{pname}"] = ex_mean
        npz[f"exact_sd_{pname}"] = ex_sd
    summary = {
        "num_datasets": args.num_datasets,
        "missing_trials_excluded": n_missing,
        "per_param": report,
        "overall_mean_abs_dz": float(np.mean(
            [report[p]["mean_abs_dz"] for p in spec.param_names])),
    }
    print(json.dumps(summary, indent=2))
    if args.out:
        np.savez(args.out, **npz)
    return summary


if __name__ == "__main__":
    main()
