"""Per-dataset amortized-posterior QA: PSIS k-hat + exact-likelihood
debiasing.

The reference framework's amortized backend (BayesFlow usage in
``basic_ddm_dc.py:163-207``) has no per-dataset quality signal at all —
its recovery studies certify the POPULATION, not the posterior you just
computed for one dataset. This app closes that gap with the machinery of
``mcmc/importance.py``: for every dataset it draws S amortized samples,
evaluates the EXACT unnormalized posterior at each draw (WFPT likelihood
for the dcDDM; the Rao-Blackwellized marginal for the flagship), and
Pareto-smooths the importance weights. Outputs per dataset:

  * ``khat`` — the Pareto tail index of the amortization error. khat
    below 0.7 certifies that reweighting repairs the posterior; khat
    above it flags THIS dataset for an exact-MCMC re-fit (the agreement
    app provides one).
  * raw vs debiased posterior means, with the shift in posterior-SD
    units — i.e. a direct measurement of the flow's per-dataset bias that
    population SBC cannot see — and weight-ESS.

Usage:

    python -m bayesflow_nddms_tpu.apps.importance_check \
        --model basic_ddm_dc --num-datasets 64 --draws 2000

Cites: reference validation strategy ``single_trial_alpha_not_scaled.py:
1545-1700`` (simulation-only); PSIS = Vehtari et al. 2015/2021 (public
method).
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..inference import amortized_logw
from ..mcmc import importance as I
from ..models import zoo
from ..models.spec import generate_training_batch, sample_n_trials, \
    trial_mask
from ..train.trainer import TrainConfig, Trainer
from .agreement import _GEN_RANGES


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="basic_ddm_dc",
                   choices=list(_GEN_RANGES))
    p.add_argument("--num-datasets", type=int, default=64)
    p.add_argument("--draws", type=int, default=2000)
    p.add_argument("--draw-chunk", type=int, default=64,
                   help="likelihood evaluation chunk over draws (memory)")
    p.add_argument("--n-quad", type=int, default=24)
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--seed", type=int, default=2024)
    p.add_argument("--prior-draws", action="store_true",
                   help="draw test parameters from the full prior instead "
                        "of the reference's generating ranges")
    p.add_argument("--out", default=None)
    p.add_argument("--json-out", default=None)
    args = p.parse_args(argv)
    if args.out and os.path.exists(args.out):
        print(f"output exists at {args.out}, skipping (delete to re-run)")
        return None

    spec = zoo.get_model(args.model)
    assert spec.prior_transform is None, \
        "prior_log_prob is defined on raw draws for dependent-prior models"
    from .agreement import _SIGNED_CH0
    signed_ch0 = args.model in _SIGNED_CH0
    key = jax.random.PRNGKey(args.seed)

    # --- datasets (same construction as apps/agreement.py) ---------------
    k1, k2, k3 = jax.random.split(jax.random.fold_in(key, 1), 3)
    if args.prior_draws:
        theta, data, mask, log_n = generate_training_batch(
            spec, jax.random.fold_in(key, 1), args.num_datasets, spec.n_max)
    else:
        rng = np.random.default_rng(args.seed)
        B = args.num_datasets
        theta = jnp.asarray(np.stack(
            [rng.uniform(lo, hi, B) for lo, hi in _GEN_RANGES[args.model]],
            axis=-1), jnp.float32)
        n = sample_n_trials(k2, spec, B)
        mask = trial_mask(n, spec.n_max)
        data = spec.simulate(k3, theta, spec.n_max, active=mask)
        log_n = jnp.log(n.astype(jnp.float32))[:, None]
    B = args.num_datasets
    m_np = np.asarray(mask)
    # signed-y channel for signed-ch0 models, choice channel otherwise
    ch = np.asarray(data[..., 0 if signed_ch0 else 1])
    n_excl = int(m_np.sum() - (m_np & (ch != 0)).sum())
    print(f"{B} datasets, {int(m_np.sum())} trials "
          f"({n_excl} capped/missing excluded from the Wiener term)",
          flush=True)

    # --- amortized draws + exact flow density ----------------------------
    cfg = TrainConfig(batch_size=256, steps=1, n_pad=spec.n_max,
                      ckpt_dir=args.ckpt_dir or f"trained/{args.model}")
    trainer = Trainer(spec, cfg)
    state = trainer.maybe_restore(trainer.init())
    if int(state.step) == 0:
        raise SystemExit(f"no checkpoint under {cfg.ckpt_dir}")
    draws = trainer.sample(state, jax.random.fold_in(key, 2), data, mask,
                           log_n, args.draws)          # (B, S, P)
    logw = amortized_logw(spec, trainer, state, draws, data, mask, log_n,
                          kind=args.model, n_quad=args.n_quad,
                          draw_chunk=args.draw_chunk)
    logw, n_degenerate = I.sanitize_logw(logw)
    smoothed, khat = I.psis_smooth(logw)
    ess = I.weight_ess(smoothed)
    draws_np = np.asarray(draws, np.float64)
    raw_mean, raw_sd = draws_np.mean(1), draws_np.std(1)
    deb_mean, deb_sd = I.weighted_moments(draws_np, smoothed)
    shift_z = (deb_mean - raw_mean) / np.maximum(raw_sd, 1e-12)
    theta_np = np.asarray(theta, np.float64)
    raw_err_z = (raw_mean - theta_np) / np.maximum(raw_sd, 1e-12)
    deb_err_z = (deb_mean - theta_np) / np.maximum(deb_sd, 1e-12)

    ok = khat < 0.7
    report = {}
    for i, pname in enumerate(spec.param_names):
        if not np.any(ok):
            report[pname] = {"note": "no dataset with khat < 0.7"}
            continue
        report[pname] = {
            "mean_abs_shift_z": float(np.abs(shift_z[ok, i]).mean()),
            "max_abs_shift_z": float(np.abs(shift_z[ok, i]).max()),
            "rms_err_z_raw": float(np.sqrt((raw_err_z[ok, i] ** 2).mean())),
            "rms_err_z_debiased": float(
                np.sqrt((deb_err_z[ok, i] ** 2).mean())),
        }
    summary = {
        "model": args.model,
        "num_datasets": B,
        "draws": args.draws,
        "khat_median": float(np.median(khat)),
        "khat_q90": float(np.quantile(khat, 0.9)),
        "khat_max": float(np.max(khat)),
        "frac_khat_below_0.5": float((khat < 0.5).mean()),
        "frac_khat_below_0.7": float(ok.mean()),
        "weight_ess_median": float(np.median(ess)),
        "degenerate_draws_total": int(n_degenerate.sum()),
        "per_param": report,
    }
    print(json.dumps(summary, indent=2))
    if not ok.all():
        flagged = np.nonzero(~ok)[0]
        print(f"routing: khat >= 0.7 on datasets "
              f"{flagged.tolist()} — their PSIS estimates are unreliable; "
              f"re-fit exactly with apps.agreement --neutra "
              f"--only-datasets {','.join(map(str, flagged.tolist()))} "
              f"(same --seed/--num-datasets reproduces this batch)",
              flush=True)
    if args.out:
        np.savez(args.out, khat=khat, ess=ess, theta_true=theta_np,
                 raw_mean=raw_mean, raw_sd=raw_sd, deb_mean=deb_mean,
                 deb_sd=deb_sd, logw=logw.astype(np.float32))
    if args.json_out:
        with open(args.json_out + ".tmp", "w") as f:
            json.dump(summary, f, indent=2)
        os.replace(args.json_out + ".tmp", args.json_out)
    return summary


if __name__ == "__main__":
    main()
