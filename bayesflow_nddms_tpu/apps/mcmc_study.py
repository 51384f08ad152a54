"""Exact-likelihood MCMC study driver.

Replaces ``basic_ddm_dc_pyjags.py`` / ``basic_ddm_dc_pystan2.py`` /
``alpha_not_scaled.py``: generates hierarchical dcDDM test data with the
exact sampler (the reference uses ``simulratcliff``, pyjags:45-94), fits
the hierarchical model with vmapped HMC chains (instead of JAGS threads /
Stan n_jobs), prints split-Rhat / ESS diagnostics, and reports recovery of
the per-participant parameters. ``--covariate`` switches on the joint
external-covariate model of ``alpha_not_scaled.py`` with its four test
regimes sigma in {.5, .1, .01, .2-unlinked} (:73-81).

    python -m bayesflow_nddms_tpu.apps.mcmc_study --nparts 20 \
        --ntrials 100 --chains 6 --covariate --test-num 2
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..diagnostics.convergence import diagnostic
from ..diagnostics.recovery import pearson, rsquared_pred
from ..mcmc import hmc as H
from ..mcmc import models as M
from ..mcmc import nuts as N
from ..ops.exact_sampler import simulate_participants

_COV_SIGMA = {1: 0.5, 2: 0.1, 3: 0.01, 4: 0.2}  # alpha_not_scaled.py:73-81


def generate_data(seed: int, nparts: int, ntrials: int,
                  covariate: bool = False, test_num: int = 2):
    """Hierarchical test data with the generating ranges of
    basic_ddm_dc_pyjags.py:56-78 (uniform per-participant parameters)."""
    rng = np.random.default_rng(seed)
    ndt = rng.uniform(0.15, 0.6, nparts)
    alpha = rng.uniform(0.8, 1.4, nparts)
    beta = rng.uniform(0.3, 0.7, nparts)
    delta = rng.uniform(-4, 4, nparts)
    varsigma = rng.uniform(0.8, 1.4, nparts)
    eta = rng.uniform(0, 2, nparts)

    y = np.asarray(simulate_participants(
        jax.random.PRNGKey(seed), nparts, ntrials,
        jnp.asarray(alpha, jnp.float32), jnp.asarray(ndt, jnp.float32),
        jnp.asarray(delta, jnp.float32), jnp.asarray(beta, jnp.float32),
        jnp.asarray(eta, jnp.float32), jnp.asarray(varsigma, jnp.float32)))

    truth = dict(ndt=ndt, alpha=alpha, beta=beta, delta=delta,
                 varsigma=varsigma, eta=eta)
    extdata = None
    if covariate:
        sigma = _COV_SIGMA[test_num]
        loc = alpha if test_num != 4 else np.ones(nparts)
        extdata = rng.normal(loc, sigma)   # alpha_not_scaled.py:103-106
        truth["sigma"] = sigma
    return y, truth, extdata


def _amortized_mass(args, y, flat_y, part, dim):
    """Window-1 inverse mass from the trained dcDDM amortizer's posterior
    SDs per participant, mapped through the sigmoid Jacobian into the
    sampler's unconstrained space (same recipe as apps/agreement.py).
    The amortizer was trained without trial drift variability (eta), so
    under the hierarchical generator this is a deliberately approximate
    preconditioner — scale is what matters for warmup."""
    from ..models import zoo
    from ..train.trainer import TrainConfig, Trainer
    spec = zoo.get_model("basic_ddm_dc")
    tr = Trainer(spec, TrainConfig(batch_size=256, steps=1,
                                   n_pad=spec.n_max,
                                   ckpt_dir=args.precondition_ckpt))
    state = tr.maybe_restore(tr.init())
    if int(state.step) == 0:
        import warnings
        warnings.warn(
            f"--precondition requested but no checkpoint under "
            f"{args.precondition_ckpt}; falling back to UNIT mass "
            f"(ADVICE r2 #4)", stacklevel=2)
        return None
    P, T = args.nparts, args.ntrials
    rt = np.abs(y).astype(np.float32)                  # (P, T)
    choice = np.sign(y).astype(np.float32)
    data = jnp.asarray(np.stack([rt, choice], axis=-1))
    mask = jnp.ones((P, T), bool)
    log_n = jnp.full((P, 1), np.log(T), jnp.float32)
    post = np.asarray(tr.sample(state, jax.random.PRNGKey(0), data, mask,
                                log_n, 500))
    mean, sd = post.mean(axis=1), post.std(axis=1)
    spec_idx = {"delta": 0, "alpha": 1, "beta": 2, "ndt": 3, "varsigma": 4}
    init_var = np.ones(dim, np.float32)
    for b, mname in enumerate(M._PARAM_ORDER):
        i = spec_idx[mname]
        if mname == "delta":
            var_z = sd[:, i] ** 2
        else:
            lo, hi = M._BOUNDS[mname]
            s = np.clip((mean[:, i] - lo) / (hi - lo), 1e-3, 1 - 1e-3)
            var_z = (sd[:, i] / ((hi - lo) * s * (1.0 - s))) ** 2
        init_var[b * P:(b + 1) * P] = np.clip(var_z, 1e-6, 1e2)
    print("amortized preconditioning: mass range "
          f"[{init_var.min():.2e}, {init_var.max():.2e}]")
    return jnp.asarray(init_var)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--nparts", type=int, default=20)
    p.add_argument("--ntrials", type=int, default=100)
    p.add_argument("--chains", type=int, default=6)
    p.add_argument("--warmup", type=int, default=500)
    p.add_argument("--samples", type=int, default=1000)
    p.add_argument("--thin", type=int, default=1)
    p.add_argument("--sampler", default="nuts", choices=["nuts", "hmc"])
    p.add_argument("--max-depth", type=int, default=8,
                   help="NUTS tree depth; >8 can exhaust remote-compile "
                        "TPU workers (mcmc/nuts.py NOTE)")
    p.add_argument("--covariate", action="store_true")
    p.add_argument("--test-num", type=int, default=2, choices=[1, 2, 3, 4])
    p.add_argument("--seed", type=int, default=2021)
    p.add_argument("--out", default=None, help=".npz output path")
    p.add_argument("--dense-mass", action="store_true",
                   help="adapt a full covariance mass matrix (tames the "
                        "alpha/varsigma ridge of the no-covariate model)")
    p.add_argument("--shard-chains", action="store_true",
                   help="distribute chains over the device mesh "
                        "(TPU-native pyjags threads=6 equivalent)")
    p.add_argument("--precondition", action="store_true",
                   help="seed the warmup inverse mass from amortized "
                        "per-participant posterior SDs (trained "
                        "basic_ddm_dc net) — stabilizes stiff multiscale "
                        "warmup; a JAGS/Stan-impossible capability")
    p.add_argument("--precondition-ckpt", default="trained/basic_ddm_dc_100k")
    p.add_argument("--parameterization", default="natural",
                   choices=["natural", "ridge"],
                   help="'ridge' samples per-participant (log(alpha/"
                        "varsigma), delta/varsigma, log varsigma) — the "
                        "likelihood-aligned coordinates that make the "
                        "alpha/varsigma scale ridge a coordinate axis")
    p.add_argument("--chunk", type=int, default=50)
    args = p.parse_args(argv)
    if args.out and os.path.exists(args.out):
        # artifact-existence resume (alpha_not_scaled.py:52,230-256): an
        # already-produced output means this expensive step is done
        print(f"output exists at {args.out}, skipping (delete to re-run)")
        return None

    y, truth, extdata = generate_data(args.seed, args.nparts, args.ntrials,
                                      args.covariate, args.test_num)
    part = np.repeat(np.arange(args.nparts), args.ntrials)
    flat_y = y.ravel()
    data = M.DcDDMData(
        y=jnp.asarray(flat_y, jnp.float32),
        participant=jnp.asarray(part, jnp.int32),
        nparts=args.nparts,
        extdata=None if extdata is None
        else jnp.asarray(extdata, jnp.float32))

    logprob, _, dim = M.make_logprob(
        data, parameterization=args.parameterization)
    min_rt = np.array([np.abs(flat_y[part == i]).min()
                       for i in range(args.nparts)])
    q0 = M.initial_positions(
        jax.random.PRNGKey(args.seed + 1), data, args.chains,
        jnp.asarray(min_rt, jnp.float32),
        parameterization=args.parameterization)
    print(f"Running {args.chains} {args.sampler.upper()} chains over {dim} "
          f"parameters ({args.nparts} participants x {args.ntrials} "
          f"trials)...", flush=True)
    init_inv_mass = None
    effective_precondition = "none"
    if args.precondition:
        if args.parameterization == "ridge":
            # the amortized-SD mapping targets the natural sigmoid
            # coordinates; ridge coordinates are benign enough that the
            # windowed warmup adapts fine from unit mass
            import warnings
            warnings.warn(
                "--precondition is ignored under --parameterization ridge; "
                "sampling with unit initial mass (ADVICE r2 #4)",
                stacklevel=2)
        else:
            init_inv_mass = _amortized_mass(args, y, flat_y, part, dim)
            if init_inv_mass is not None:
                effective_precondition = "amortized"
    mesh = None
    if args.shard_chains:
        from ..parallel.mesh import make_mesh
        n_dev = len(jax.devices())
        use = n_dev
        while args.chains % use:
            use -= 1
        mesh = make_mesh(use)
        print(f"sharding {args.chains} chains over {use} devices")
    if args.sampler == "nuts":
        # chunked dispatches: long monolithic XLA executions can trip
        # remote-worker watchdogs (see mcmc/nuts.py)
        res = N.run_chains_chunked(
            logprob, q0, jax.random.PRNGKey(args.seed + 2),
            n_warmup=args.warmup, n_samples=args.samples,
            thin=args.thin, max_depth=args.max_depth, chunk=args.chunk,
            progress=True, dense_mass=args.dense_mass, mesh=mesh,
            init_inv_mass=init_inv_mass)
        print(f"accept: {np.asarray(res.accept_prob).round(2).tolist()} "
              f"depth: {np.asarray(res.mean_depth).round(1).tolist()}")
    else:
        res = H.run_chains(logprob, q0, jax.random.PRNGKey(args.seed + 2),
                           n_warmup=args.warmup, n_samples=args.samples,
                           thin=args.thin)
        print(f"accept rates: "
              f"{np.asarray(res.accept_rate).round(2).tolist()}")

    sdict = M.samples_to_dict(np.asarray(res.samples), data,
                              parameterization=args.parameterization)
    sdict = {k: np.asarray(v) for k, v in sdict.items()}
    diags = diagnostic(sdict)

    metrics = {}
    for name in ["alpha", "ndt", "beta", "delta", "varsigma"]:
        post_mean = sdict[name].mean(axis=(1, 2))
        metrics[name] = {
            "r2": rsquared_pred(truth[name], post_mean),
            "rho": pearson(truth[name], post_mean),
            "max_rhat": float(np.nanmax(diags[name]["rhat"])),
            "min_neff": float(np.nanmin(diags[name]["neff"])),
        }
    if args.covariate:
        metrics["sigma_posterior_mean"] = float(sdict["sigma"].mean())
        metrics["sigma_true"] = truth["sigma"]
    metrics["effective_precondition"] = effective_precondition
    print(json.dumps(metrics, indent=2))
    if args.out:
        np.savez(args.out, **sdict,
                 effective_precondition=effective_precondition,
                 **{f"true_{k}": v for k, v in truth.items()})
    return metrics


if __name__ == "__main__":
    main()
