"""Cross-backend agreement study: amortized vs exact-likelihood posteriors
on the SAME simulated datasets.

The reference's implicit end-to-end integration test (SURVEY.md §4.2) is
that its backends — BayesFlow (``basic_ddm_dc.py``), JAGS
(``basic_ddm_dc_pyjags.py:103-137``) and Stan (``basic_ddm_dc_pystan2.py:
106-177``) — produce agreeing posteriors under matched priors. This app
makes that check explicit and quantitative, for two model families:

  * ``--model basic_ddm_dc``: the dcDDM, NUTS on the exact WFPT density
    with the /dc rescaling (``basic_ddm_dc_pyjags.py:133``) under the
    identical priors. Each dataset is a "participant" of
    ``mcmc/models.make_logprob`` (the joint posterior factorizes).
  * ``--model single_trial_alpha_not_scaled``: the FLAGSHIP trial-level
    boundary-variability model, against ``make_logprob_flagship`` — NUTS
    over the 7 globals PLUS one latent boundary per trial, a check the
    reference never had for any trial-level model (its JAGS/Stan runs
    cover only the dcDDM; the flagship's real-data claims,
    ``fitting_stahl_data.py:45-49``, rested on simulation-only checks).

Per parameter the report gives |Δ posterior mean| in exact-posterior-SD
units (dz) TOGETHER with each dataset's Monte-Carlo standard error of
that dz (1/sqrt(neff)), so the reader can see which gaps are resolved
above sampler noise — round 2's study had neff ~ 23 where MCSE ~ 0.21 SD
swamped the dz values themselves (VERDICT r2 Weak #2). Target
``--samples``/``--chains`` so that per-dataset neff >= 200.

Both backends see data from the exact simulator (ops/ddm_sim.py), so
there is no discretization asymmetry left: the amortizer trains on
continuous-time-exact draws and WFPT is the continuous-time density.
Capped/missing trials (choice 0) are excluded from the exact likelihood;
for the flagship their covariate channel still informs the latents.

    python -m bayesflow_nddms_tpu.apps.agreement --num-datasets 32 \
        --draws 2000 --chains 16 --samples 3000 --dense-mass
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

# spec order -> mcmc model names (dcDDM); the flagship uses spec names
_NAME_MAP = {"drift": "delta", "alpha": "alpha", "beta": "beta",
             "ter": "ndt", "dc": "varsigma"}

# the reference's MCMC generating ranges for the dcDDM
# (basic_ddm_dc_pyjags.py:56-78), and analogous moderate ranges for the
# flagship (which the reference never fit exactly; ranges mirror its
# simulation studies, single_trial_alpha_not_scaled.py:178-193)
_GEN_RANGES = {
    "basic_ddm_dc": [(-4.0, 4.0), (0.8, 1.4), (0.3, 0.7), (0.15, 0.6),
                     (0.8, 1.4)],
    "single_trial_alpha_not_scaled": [
        (-3.0, 3.0), (0.8, 1.8), (0.3, 0.7), (0.15, 0.6), (0.3, 1.0),
        (0.8, 1.4), (0.5, 2.0)],
    # eta family (round 4): moderate ranges mirroring the reference's
    # simulation studies (retired_models/basic_ddm_eta_dc.py:66-79,
    # single_trial_drift2.py) — exact backend = closed-form Gaussian-
    # drift-marginal WFPT (mcmc/wfpt.py)
    "basic_ddm_eta_dc": [
        (-3.0, 3.0), (0.8, 1.8), (0.3, 0.7), (0.15, 0.6), (0.3, 1.2),
        (0.8, 1.4)],
    "single_trial_drift2": [
        (-3.0, 3.0), (0.8, 1.8), (0.3, 0.7), (0.15, 0.6), (0.3, 1.2),
        (0.8, 1.4), (0.5, 2.0)],
    # round 5: trial drift AND trial dc, no covariates — exact backend =
    # closed-form drift marginal + TN+ quadrature over trial dc
    # (models.exact_loglik_ctx); params (mu_drift, alpha, beta, ter,
    # eta, mu_dc, var_dc)
    "single_trial_drift_dc_base": [
        (-3.0, 3.0), (0.8, 1.8), (0.3, 0.7), (0.15, 0.6), (0.3, 1.2),
        (0.8, 1.4), (0.3, 1.0)],
}

# models whose channel 0 is already the signed choicert (vs (rt, choice))
_SIGNED_CH0 = {"single_trial_alpha_not_scaled", "single_trial_drift2"}

# models fit exactly through the generic spec-driven batched targets
_SPEC_PLAIN = {"basic_ddm_eta_dc", "single_trial_drift2",
               "single_trial_drift_dc_base"}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="basic_ddm_dc",
                   choices=list(_GEN_RANGES))
    p.add_argument("--num-datasets", type=int, default=32)
    p.add_argument("--draws", type=int, default=2000,
                   help="amortized posterior draws per dataset")
    p.add_argument("--chains", type=int, default=16)
    p.add_argument("--warmup", type=int, default=700)
    p.add_argument("--samples", type=int, default=3000)
    p.add_argument("--thin", type=int, default=1)
    p.add_argument("--max-depth", type=int, default=8)
    p.add_argument("--dense-mass", action="store_true",
                   help="full-covariance mass (recommended for the dcDDM: "
                        "aligns NUTS with the alpha/varsigma ridge; not "
                        "for the flagship, whose dim is 7P+trials)")
    p.add_argument("--parameterization", default="natural",
                   choices=["natural", "ridge"],
                   help="flagship only: 'ridge' samples in the "
                        "likelihood-aligned (drift/dc, log(mu_alpha/dc), "
                        "log(std_alpha/dc), log dc) coordinates where the "
                        "Wiener scale ridge is a single axis (the dcDDM "
                        "path gets the equivalent treatment from "
                        "--dense-mass, which its 5P dim can afford)")
    p.add_argument("--marginal", action="store_true",
                   help="flagship only: integrate the per-trial latent "
                        "boundary out analytically + by quantile "
                        "quadrature (make_logprob_flagship_marginal) — "
                        "NUTS runs over 7 globals per dataset instead of "
                        "7 + n_trials, making dense mass and large "
                        "dataset counts affordable")
    p.add_argument("--n-quad", type=int, default=24,
                   help="Gauss-Legendre nodes for --marginal")
    p.add_argument("--per-dataset", action="store_true",
                   help="flagship --marginal only: fit each dataset's "
                        "dim-7 posterior in its OWN NUTS run instead of "
                        "one joint dim-7P run. The joint posterior "
                        "factorizes over datasets, but a joint NUTS run "
                        "shares one step size across all coordinate "
                        "blocks, and heterogeneous datasets force "
                        "max-depth trees (measured: Rhat 145 for the "
                        "joint latent fit at 12 datasets; ~22 s/"
                        "transition for joint marginal at 6). Per-dataset "
                        "runs adapt step size and dense mass to each "
                        "posterior alone")
    p.add_argument("--psis", action="store_true",
                   help="add a PSIS-debiased amortized column: importance-"
                        "reweight the amortized draws against the exact "
                        "likelihood (mcmc/importance.py) and report "
                        "debiased-vs-exact dz next to raw-vs-exact dz, "
                        "plus per-dataset khat")
    p.add_argument("--only-datasets", default=None,
                   help="comma-separated dataset indices: simulate the "
                        "full --num-datasets batch (so the seed-determined "
                        "data is unchanged), then fit and compare only "
                        "these. Typical use: exact-NUTS re-fits of exactly "
                        "the datasets whose PSIS khat failed certification "
                        "plus certified controls")
    p.add_argument("--chunk", type=int, default=50)
    p.add_argument("--tempered", type=int, default=0,
                   help="replica-exchange NUTS with this many temperatures "
                        "(nuts.run_chains_tempered; 0/1 = plain NUTS). For "
                        "the posteriors single-temperature NUTS measurably "
                        "cannot traverse at budget — the flagship datasets "
                        "with large true trial-level boundary variability, "
                        "whose slow curved ridges leave chains in "
                        "disconnected log-posterior basins (ROUND3.md)")
    p.add_argument("--beta-min", type=float, default=0.2,
                   help="coldest-to-hottest inverse-temperature ratio for "
                        "--tempered (geometric ladder 1 -> beta_min)")
    p.add_argument("--neutra", action="store_true",
                   help="flagship --marginal --per-dataset only: run NUTS "
                        "in the amortizer flow's base coordinates "
                        "(mcmc/neutra.py). The exact posterior is pulled "
                        "back through the flow's transport map (with its "
                        "exact log-Jacobian), so the ridge geometry that "
                        "defeats natural/ridge/tempered NUTS becomes "
                        "~N(0, I) wherever PSIS certifies the flow — the "
                        "measured fix for the NUTS-hard datasets "
                        "(ROUND3.md). Identity mass; --parameterization "
                        "is ignored for the exact side")
    p.add_argument("--nuts-checkpoint", default=None,
                   help=".npz path for chunk-level NUTS state checkpoints: "
                        "a killed run resumes bit-identically at the last "
                        "completed chunk (nuts.run_chains_chunked)")
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--seed", type=int, default=2024)
    p.add_argument("--out", default=None, help=".npz output path")
    p.add_argument("--json-out", default=None, help="summary JSON path")
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
    if args.per_dataset and args.model != "single_trial_alpha_not_scaled":
        raise SystemExit("--per-dataset applies to the flagship marginal "
                         "formulation only (the dcDDM joint posterior is "
                         "low-dimensional and dense mass already handles "
                         "it; see --dense-mass)")
    if (args.neutra and args.model == "single_trial_alpha_not_scaled"
            and not args.per_dataset):
        raise SystemExit("--neutra requires --marginal --per-dataset for "
                         "the flagship (the transport map is conditioned "
                         "on one dataset); for basic_ddm_dc it implies a "
                         "per-dataset refit loop")
    if args.out and os.path.exists(args.out):
        # artifact-existence resume (alpha_not_scaled.py:52,230-256): an
        # already-produced output means this expensive step is done
        print(f"output exists at {args.out}, skipping (delete to re-run)")
        return None

    spec = zoo.get_model(args.model)
    ckpt_dir = args.ckpt_dir or f"trained/{args.model}"
    key = jax.random.PRNGKey(args.seed)

    # --- shared datasets -------------------------------------------------
    from ..models.spec import sample_n_trials, trial_mask
    k1, k2, k3 = jax.random.split(jax.random.fold_in(key, 1), 3)
    if args.prior_draws:
        theta, data, mask, log_n = generate_training_batch(
            spec, jax.random.fold_in(key, 1), args.num_datasets, spec.n_max)
    else:
        rng = np.random.default_rng(args.seed)
        M_ = args.num_datasets
        theta = jnp.asarray(np.stack(
            [rng.uniform(lo, hi, M_) for lo, hi in _GEN_RANGES[args.model]],
            axis=-1), jnp.float32)
        n = sample_n_trials(k2, spec, M_)
        mask = trial_mask(n, spec.n_max)
        data = spec.simulate(k3, theta, spec.n_max, active=mask)
        log_n = jnp.log(n.astype(jnp.float32))[:, None]
    theta_np = np.asarray(theta)
    d = np.asarray(data)
    m = np.asarray(mask)
    rt, choice = d[..., 0], d[..., 1]
    if args.model in _SIGNED_CH0:
        # channel 0 is already the signed choicert, channel 1 the covariate
        signed_y = rt
        valid = m & (signed_y != 0)
    else:
        # dcDDM/eta_dc channels are (rt, choice); missing trials: choice 0
        signed_y = None
        valid = m & (choice != 0)
    n_missing = int(m.sum() - valid.sum())
    print(f"{args.num_datasets} datasets, {int(m.sum())} trials "
          f"({n_missing} capped/missing excluded from the exact "
          f"likelihood)", flush=True)

    # --- backend A: amortized --------------------------------------------
    cfg = TrainConfig(batch_size=256, steps=1, n_pad=spec.n_max,
                      ckpt_dir=ckpt_dir)
    trainer = Trainer(spec, cfg)
    state = trainer.maybe_restore(trainer.init())
    if int(state.step) == 0:
        raise SystemExit(f"no checkpoint under {ckpt_dir}; train one "
                         f"with apps.recovery_study first")
    post_dev = trainer.sample(
        state, jax.random.fold_in(key, 2), data, mask, log_n, args.draws)
    post = np.asarray(post_dev)
    amort_mean, amort_sd = post.mean(axis=1), post.std(axis=1)

    deb_mean = khat = None
    if args.psis:
        from ..mcmc import importance as I_
        from ..inference import amortized_logw
        logw = amortized_logw(
            spec, trainer, state, post_dev, data, mask, log_n,
            kind=args.model, n_quad=args.n_quad)
        logw, n_degen = I_.sanitize_logw(logw)
        smoothed, khat = I_.psis_smooth(logw)
        deb_mean, _ = I_.weighted_moments(post.astype(np.float64), smoothed)
        print(f"PSIS: khat median {np.median(khat):.3f}, max "
              f"{khat.max():.3f}, {int((khat < 0.7).sum())}/"
              f"{len(khat)} certified"
              + (f", {int(n_degen.sum())} boundary-degenerate draws "
                 f"zero-weighted" if n_degen.any() else ""), flush=True)

    if args.only_datasets:
        sel = [int(s) for s in args.only_datasets.split(",")]
        theta_np, d, m, valid = theta_np[sel], d[sel], m[sel], valid[sel]
        rt, choice = rt[sel], choice[sel]
        if signed_y is not None:
            signed_y = signed_y[sel]
        post = post[sel]
        amort_mean, amort_sd = amort_mean[sel], amort_sd[sel]
        log_n = jnp.asarray(np.asarray(log_n)[sel])
        if khat is not None:
            khat, deb_mean = khat[sel], deb_mean[sel]
        args.num_datasets = len(sel)
        print(f"fitting only datasets {sel}", flush=True)

    def _run_nuts(logprob_fn, q0s, key_, init_iv, ckpt):
        """Dispatch one exact fit: plain chunked NUTS, or replica-exchange
        NUTS when --tempered > 1 (same warmup/sampling budget per
        temperature; cold-chain samples come back in the same layout)."""
        common = dict(n_warmup=args.warmup, n_samples=args.samples,
                      thin=args.thin, max_depth=args.max_depth,
                      chunk=args.chunk, progress=True,
                      dense_mass=args.dense_mass, init_inv_mass=init_iv,
                      checkpoint_path=ckpt)
        if args.tempered > 1:
            res = N.run_chains_tempered(
                logprob_fn, q0s, key_, n_temps=args.tempered,
                beta_min=args.beta_min, **common)
            print(f"  swap acceptance per ladder pair: "
                  f"{np.round(np.asarray(res.swap_accept), 3)}", flush=True)
            return res
        return N.run_chains_chunked(logprob_fn, q0s, key_, **common)

    def _batched_neutra_fit(flagship: bool):
        """Every selected dataset's NeuTra fit as ONE compiled NUTS
        program: the per-dataset targets differ only by data, which
        enters the chunked driver as a traced per-chain context
        (nuts.run_chains_chunked ctx=...) instead of a new closure —
        one compile for the whole set instead of one multi-minute
        remote compile per dataset. Returns sdict {name: (M, S, C)}.
        Capped trials keep their observed covariate channel in the
        flagship likelihood (the certification target's semantics)."""
        from ..mcmc import neutra as NT
        D = args.num_datasets
        if flagship:
            lp, push, ctx, dim = NT.make_logprob_flagship_neutra_batched(
                trainer.amortizer, state.params, jnp.asarray(d),
                jnp.asarray(m), log_n, n_quad=args.n_quad)
        else:
            lp, push, ctx, dim = NT.make_logprob_dcddm_neutra_batched(
                trainer.amortizer, state.params, jnp.asarray(d),
                jnp.asarray(m), log_n)
        q0 = NT.neutra_initial_positions(jax.random.fold_in(key, 300),
                                         D * args.chains, dim)
        print(f"{D} datasets x {args.chains} chains: batched NeuTra "
              f"NUTS (dim {dim}), one compiled program", flush=True)
        res = N.run_chains_chunked(
            lp, q0, jax.random.fold_in(key, 400), n_warmup=args.warmup,
            n_samples=args.samples, thin=args.thin,
            max_depth=args.max_depth, chunk=args.chunk, progress=True,
            dense_mass=False, init_inv_mass=jnp.ones(dim, jnp.float32),
            checkpoint_path=args.nuts_checkpoint,
            ctx=NT.replicate_ctx(ctx, args.chains))
        n_kept = res.samples.shape[1]
        eps = jnp.asarray(np.asarray(res.samples).reshape(
            D, args.chains, n_kept, dim))
        theta = np.asarray(jax.vmap(push)(eps, ctx))   # (D, C, S, P)
        return {name: np.transpose(theta[..., j], (0, 2, 1))
                for j, name in enumerate(spec.param_names)}

    # --- backend B: exact likelihood + NUTS ------------------------------
    ds_idx, tr_idx = np.nonzero(valid)
    if args.model == "single_trial_alpha_not_scaled" and args.per_dataset:
        if not args.marginal:
            raise SystemExit("--per-dataset requires --marginal (the "
                             "latent formulation's dim varies with each "
                             "dataset's trial count)")
        y = signed_y[ds_idx, tr_idx].astype(np.float32)
        ext = d[..., 1][ds_idx, tr_idx].astype(np.float32)
        min_rt = np.array([np.abs(y[ds_idx == i]).min()
                           if np.any(ds_idx == i) else 1.0
                           for i in range(args.num_datasets)])
        if args.neutra and args.tempered <= 1:
            sdict = _batched_neutra_fit(flagship=True)
            name_map = {n_: n_ for n_ in spec.param_names}
            sdict_parts = None
        else:
            sdict_parts = []
        for i in (range(args.num_datasets) if sdict_parts is not None
                  else ()):
            sel = ds_idx == i
            n_i = int(sel.sum())
            data_i = M.FlagshipData(
                y=jnp.asarray(y[sel]), ext=jnp.asarray(ext[sel]),
                participant=jnp.zeros(n_i, jnp.int32), nparts=1,
                valid=jnp.ones(n_i, bool))
            if args.neutra:
                from ..mcmc import neutra as NT
                logprob_i, push_i, dim_i = NT.make_logprob_flagship_neutra(
                    data_i, trainer.amortizer, state.params,
                    jnp.asarray(d[i]), jnp.asarray(m[i]), log_n[i],
                    n_quad=args.n_quad)
                q0_i = NT.neutra_initial_positions(
                    jax.random.fold_in(key, 300 + i), args.chains, dim_i)
                # in flow coordinates the target is ~N(0, I) wherever the
                # flow is good — identity mass IS the preconditioning
                iv = np.ones(dim_i, np.float32)
            else:
                logprob_i, _, dim_i = M.make_logprob_flagship_marginal(
                    data_i, parameterization=args.parameterization,
                    n_quad=args.n_quad)
                q0_i = M.flagship_initial_positions(
                    jax.random.fold_in(key, 300 + i), data_i, args.chains,
                    jnp.asarray(min_rt[i:i + 1], jnp.float32),
                    parameterization=args.parameterization,
                    include_latents=False)
                if args.parameterization == "ridge":
                    iv = _flagship_ridge_mass(1, post[i:i + 1], dim_i)
                else:
                    iv = _flagship_mass(1, amort_mean[i:i + 1],
                                        amort_sd[i:i + 1], dim_i)
            print(f"dataset {i}: NUTS over {dim_i} parameters, "
                  f"{n_i} trials, {args.chains} chains "
                  f"(dense_mass={args.dense_mass}, "
                  f"neutra={args.neutra})", flush=True)
            ck_i = (f"{args.nuts_checkpoint}.ds{i}.npz"
                    if args.nuts_checkpoint else None)
            res_i = _run_nuts(logprob_i, q0_i,
                              jax.random.fold_in(key, 400 + i),
                              jnp.asarray(iv), ck_i)
            if args.neutra:
                d_i = NT.neutra_samples_to_dict(
                    np.asarray(res_i.samples), push_i, spec.param_names)
            else:
                d_i = M.flagship_samples_to_dict(
                    np.asarray(res_i.samples), data_i,
                    parameterization=args.parameterization)
            sdict_parts.append({k: np.asarray(v) for k, v in d_i.items()})
        if sdict_parts is not None:
            sdict = {k: np.concatenate([p_[k] for p_ in sdict_parts],
                                       axis=0)
                     for k in sdict_parts[0]}
            name_map = {n_: n_ for n_ in spec.param_names}
    elif args.model == "single_trial_alpha_not_scaled":
        y = signed_y[ds_idx, tr_idx].astype(np.float32)
        ext = d[..., 1][ds_idx, tr_idx].astype(np.float32)
        mdata = M.FlagshipData(
            y=jnp.asarray(y), ext=jnp.asarray(ext),
            participant=jnp.asarray(ds_idx, jnp.int32),
            nparts=args.num_datasets,
            valid=jnp.ones(len(y), bool))
        if args.marginal:
            logprob, _, dim = M.make_logprob_flagship_marginal(
                mdata, parameterization=args.parameterization,
                n_quad=args.n_quad)
        else:
            logprob, _, dim = M.make_logprob_flagship(
                mdata, parameterization=args.parameterization)
        min_rt = np.array([np.abs(y[ds_idx == i]).min()
                           if np.any(ds_idx == i) else 1.0
                           for i in range(args.num_datasets)])
        q0 = M.flagship_initial_positions(
            jax.random.fold_in(key, 3), mdata, args.chains,
            jnp.asarray(min_rt, jnp.float32),
            parameterization=args.parameterization,
            include_latents=not args.marginal)
        if args.parameterization == "ridge":
            init_var = _flagship_ridge_mass(args.num_datasets, post, dim)
        else:
            init_var = _flagship_mass(args.num_datasets, amort_mean,
                                      amort_sd, dim)
        to_dict = lambda s: M.flagship_samples_to_dict(
            s, mdata, parameterization=args.parameterization)
        name_map = {n_: n_ for n_ in spec.param_names}
    elif args.model in _SPEC_PLAIN:
        # eta family: every dataset's exact posterior (trial drifts
        # integrated out in closed form — dim = spec.n_params, no
        # latents) fits as ONE compiled batched-ctx NUTS program, in the
        # spec's unconstrained coordinates or (--neutra) the flow's base
        # coordinates. First exact backend any eta model ever had.
        from ..mcmc import neutra as NT
        if args.tempered > 1:
            raise SystemExit("--tempered does not compose with the "
                             "batched eta-family path")
        D = args.num_datasets
        if args.neutra:
            lp, push_s, ctx, dim = NT.make_logprob_spec_neutra_batched(
                spec, trainer.amortizer, state.params, jnp.asarray(d),
                jnp.asarray(m), log_n)
            q0 = NT.neutra_initial_positions(jax.random.fold_in(key, 300),
                                             D * args.chains, dim)
            push = lambda eps, c: push_s(eps, c)
            iv = jnp.ones(dim, jnp.float32)
        else:
            lp, push_plain, ctx, dim = M.make_logprob_spec_plain_batched(
                spec, jnp.asarray(d), jnp.asarray(m))
            # overdispersed inits: prior draws mapped to unconstrained z
            thp = np.asarray(spec.sample_prior(
                jax.random.fold_in(key, 300), D * args.chains))
            cols = []
            for j, dist_j in enumerate(spec.prior):
                lo, hi = dist_j.support
                if np.isfinite(lo) and np.isfinite(hi):
                    s = np.clip((thp[:, j] - lo) / (hi - lo), 1e-4,
                                1 - 1e-4)
                    cols.append(np.log(s) - np.log1p(-s))
                else:
                    cols.append(thp[:, j])
            q0 = jnp.asarray(np.stack(cols, axis=-1), jnp.float32)
            push = lambda eps, c: push_plain(eps)
            iv = jnp.ones(dim, jnp.float32)
        print(f"{D} datasets x {args.chains} chains: batched "
              f"{'NeuTra' if args.neutra else 'plain'} NUTS over the "
              f"closed-form eta-marginal likelihood (dim {dim}), one "
              f"compiled program", flush=True)
        res = N.run_chains_chunked(
            lp, q0, jax.random.fold_in(key, 400), n_warmup=args.warmup,
            n_samples=args.samples, thin=args.thin,
            max_depth=args.max_depth, chunk=args.chunk, progress=True,
            dense_mass=args.dense_mass, init_inv_mass=iv,
            checkpoint_path=args.nuts_checkpoint,
            ctx=NT.replicate_ctx(ctx, args.chains))
        n_kept = res.samples.shape[1]
        eps = jnp.asarray(np.asarray(res.samples).reshape(
            D, args.chains, n_kept, dim))
        theta_s = np.asarray(jax.vmap(push)(eps, ctx))  # (D, C, S, P)
        sdict = {name: np.transpose(theta_s[..., j], (0, 2, 1))
                 for j, name in enumerate(spec.param_names)}
        name_map = {n_: n_ for n_ in spec.param_names}
    elif args.neutra:
        # batched per-dataset NeuTra refits of the dcDDM — the designed
        # exact fallback for full-prior datasets whose PSIS certification
        # fails (importance_dcddm_prior_r3: khat up to 32 on the
        # near-degenerate tail) and whose geometry freezes plain NUTS.
        # All selected datasets sample in ONE compiled program.
        if args.tempered > 1:
            raise SystemExit("--tempered does not compose with the "
                             "batched --neutra path")
        sdict = _batched_neutra_fit(flagship=False)
        name_map = {n_: n_ for n_ in spec.param_names}
    else:
        y = (choice[ds_idx, tr_idx] * rt[ds_idx, tr_idx]).astype(np.float32)
        mdata = M.DcDDMData(y=jnp.asarray(y),
                            participant=jnp.asarray(ds_idx, jnp.int32),
                            nparts=args.num_datasets)
        logprob, _, dim = M.make_logprob(mdata)
        # A near-degenerate prior draw can leave a dataset with zero
        # boundary-crossing trials; its exact posterior is then the prior
        # and any finite min_rt works for initialization — never .min() an
        # empty slice (ADVICE r2 #1).
        min_rt = np.array([np.abs(y[ds_idx == i]).min()
                           if np.any(ds_idx == i) else 1.0
                           for i in range(args.num_datasets)])
        q0 = M.initial_positions(jax.random.fold_in(key, 3), mdata,
                                 args.chains,
                                 jnp.asarray(min_rt, jnp.float32))
        init_var = _dcddm_mass(args.num_datasets, amort_mean, amort_sd,
                               dim)
        to_dict = lambda s: M.samples_to_dict(s, mdata)
        name_map = _NAME_MAP

    per_dataset_fit = ((args.model == "single_trial_alpha_not_scaled"
                        and args.per_dataset)
                       or (args.model == "basic_ddm_dc" and args.neutra)
                       or args.model in _SPEC_PLAIN)
    if not per_dataset_fit:
        print(f"NUTS over {dim} parameters, {args.chains} chains "
              f"(dense_mass={args.dense_mass}, amortizer-preconditioned "
              f"mass)...", flush=True)
        res = _run_nuts(logprob, q0, jax.random.fold_in(key, 4),
                        jnp.asarray(init_var), args.nuts_checkpoint)
        sdict = {k: np.asarray(v)
                 for k, v in to_dict(np.asarray(res.samples)).items()}
    diags = diagnostic(sdict)

    # --- comparison -------------------------------------------------------
    report = {}
    # raw datasets ride along (few tens of KB) so a later run — possibly
    # on a different backend whose float paths flip borderline trials —
    # can compare against EXACTLY these observations
    npz = {"theta_true": theta_np, "amort_mean": amort_mean,
           "amort_sd": amort_sd, "data": d, "mask": m,
           "log_n": np.asarray(log_n)}
    for i, pname in enumerate(spec.param_names):
        mname = name_map[pname]
        ex = sdict[mname]                     # (M, S, C)
        ex_mean = ex.mean(axis=(1, 2))
        ex_sd = ex.std(axis=(1, 2))
        dz = (amort_mean[:, i] - ex_mean) / ex_sd
        # per-dataset MC standard error of dz (in exact-SD units): the MC
        # error of the exact posterior mean is ex_sd/sqrt(neff), so
        # sd(dz) ~= 1/sqrt(neff) (VERDICT r2 Next #2)
        neff = np.asarray(diags[mname]["neff"], np.float64)
        mcse_z = 1.0 / np.sqrt(np.maximum(neff, 1.0))
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
            "mean_mcse_z": float(mcse_z.mean()),
            "max_mcse_z": float(mcse_z.max()),
            "bias_z_se": float(mcse_z.mean() / np.sqrt(len(dz))),
            # empirical SE of the pooled bias across datasets: includes the
            # per-dataset amortization error itself, which for trial-level
            # models dominates the sampler MCSE — this is the honest
            # uncertainty on mean_bias_z when num_datasets is moderate
            "bias_z_empirical_se": float(
                dz.std(ddof=1) / np.sqrt(len(dz))) if len(dz) > 1 else None,
            "ci95_jaccard": float((inter / union).mean()),
            "exact_max_rhat": float(np.nanmax(diags[mname]["rhat"])),
            "exact_min_neff": float(np.nanmin(neff)),
            "exact_median_neff": float(np.nanmedian(neff)),
            "pct_neff_ge_200": float((neff >= 200).mean()),
        }
        if deb_mean is not None:
            dz_deb = (deb_mean[:, i] - ex_mean) / ex_sd
            report[pname]["mean_abs_dz_debiased"] = float(
                np.abs(dz_deb).mean())
            report[pname]["mean_bias_z_debiased"] = float(dz_deb.mean())
            report[pname]["bias_z_debiased_empirical_se"] = float(
                dz_deb.std(ddof=1) / np.sqrt(len(dz_deb))) \
                if len(dz_deb) > 1 else None
            npz[f"dz_debiased_{pname}"] = dz_deb
        npz[f"exact_mean_{pname}"] = ex_mean
        npz[f"exact_sd_{pname}"] = ex_sd
        npz[f"neff_{pname}"] = neff
        npz[f"dz_{pname}"] = dz
    summary = {
        "model": args.model,
        "num_datasets": args.num_datasets,
        "chains": args.chains,
        "samples": args.samples,
        "missing_trials_excluded": n_missing,
        "per_param": report,
        "overall_mean_abs_dz": float(np.mean(
            [report[p_]["mean_abs_dz"] for p_ in spec.param_names])),
        "overall_mean_mcse_z": float(np.mean(
            [report[p_]["mean_mcse_z"] for p_ in spec.param_names])),
    }
    if khat is not None:
        summary["khat_median"] = float(np.median(khat))
        summary["khat_max"] = float(np.max(khat))
        summary["frac_khat_below_0.7"] = float((khat < 0.7).mean())
        npz["khat"] = khat
    print(json.dumps(summary, indent=2))
    if args.out:
        np.savez(args.out, **npz)
    if args.json_out:
        with open(args.json_out + ".tmp", "w") as f:
            json.dump(summary, f, indent=2)
        os.replace(args.json_out + ".tmp", args.json_out)
    return summary


def _dcddm_mass(nparts, amort_mean, amort_sd, dim):
    """AMORTIZED PRECONDITIONING — a capability the reference's JAGS/Stan
    backends cannot have: the amortizer's per-dataset posterior SDs,
    mapped to the sampler's unconstrained space through the sigmoid
    Jacobian at the posterior mean, seed window-1 inverse mass. Without
    it, unit mass on this stiff multiscale posterior (ndt SD ~1e-3 s at
    N up to 300 trials) adapts eps to ~1e-3 and trajectories U-turn at
    depth ~2: chains freeze (measured; see docs/DESIGN.md)."""
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
        init_var[b * nparts:(b + 1) * nparts] = np.clip(var_z, 1e-6, 1e2)
    return init_var


def _flagship_ridge_mass(nparts, post, dim):
    """Amortized preconditioning in the ridge coordinates: instead of a
    delta-method sigmoid Jacobian, the window-1 inverse mass is the
    EMPIRICAL variance of the amortized joint draws pushed through the
    exact sampler-space transform — the draws carry the (drift, mu_alpha,
    std_alpha, dc) correlations the ridge coordinates decouple."""
    drift, mu_a, beta, ter = (post[..., 0], post[..., 1], post[..., 2],
                              post[..., 3])
    std_a, dc, sigma1 = post[..., 4], post[..., 5], post[..., 6]
    dc = np.maximum(dc, 1e-4)

    def logit(x, lo, hi):
        s = np.clip((x - lo) / (hi - lo), 1e-5, 1 - 1e-5)
        return np.log(s) - np.log1p(-s)

    zs = [drift / dc, np.log(np.maximum(mu_a, 1e-4) / dc),
          logit(beta, 0.0, 1.0), logit(ter, 0.0, 1.5),
          np.log(np.maximum(std_a, 1e-4) / dc), np.log(dc),
          logit(sigma1, 0.0, 5.0)]
    init_var = np.ones(dim, np.float32)
    for b, z in enumerate(zs):
        init_var[b * nparts:(b + 1) * nparts] = \
            np.clip(z.var(axis=1), 1e-6, 1e2)
    return init_var


def _flagship_mass(nparts, amort_mean, amort_sd, dim):
    """Same amortized preconditioning for the flagship globals; the
    quantile-space latents are O(1) by construction and keep unit mass."""
    init_var = np.ones(dim, np.float32)
    for b, mname in enumerate(M._FLAG_ORDER):
        mean_x, sd_x = amort_mean[:, b], amort_sd[:, b]
        if mname == "drift":
            var_z = sd_x ** 2
        else:
            lo, hi = M._FLAG_BOUNDS[mname]
            s = np.clip((mean_x - lo) / (hi - lo), 1e-3, 1 - 1e-3)
            dz_dx = 1.0 / ((hi - lo) * s * (1.0 - s))
            var_z = (sd_x * dz_dx) ** 2
        init_var[b * nparts:(b + 1) * nparts] = np.clip(var_z, 1e-6, 1e2)
    return init_var


if __name__ == "__main__":
    main()
