"""Real-data fitting driver: amortized per-participant dcDDM-alpha fits to
the Stahl et al. (2015) EEG+behavior data.

Replaces ``fitting_stahl_data.py``: loads the CSV, residualizes Ne from
Pe, rescales to alpha-like units, and fits the flagship
``single_trial_alpha_not_scaled`` amortizer — but as ONE batched TPU call
over all participants (the reference loops them one at a time, :196-211).
Outputs per-participant posterior draws, the derived *proportion of
covariate variance explained by cognition*
``std_alpha^2 / (std_alpha^2 + sigma1^2)`` (:214-219), and the jellyfish /
2-D / 3-D figure suite (:244-409).

``--psis`` additionally certifies every per-participant fit against the
EXACT Rao-Blackwellized flagship likelihood (PSIS k-hat,
``mcmc/importance.py``) and debiases both the parameters and the derived
proportion — the reference fits real data with no per-fit quality signal
at all; on data without ground truth this certificate is the only
evidence the posterior can be trusted.

    python -m bayesflow_nddms_tpu.apps.fit_stahl \
        --csv stahl_data/base_data.csv --covariate invert \
        --ckpt-dir checkpoint/single_trial_alpha_not_scaled
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.stahl import load_stahl_csv, to_padded_batch
from ..diagnostics import plots
from ..models import zoo
from ..train.trainer import TrainConfig, Trainer

FLAGSHIP = "single_trial_alpha_not_scaled"


def fit_participants(trainer, state, data, mask, log_n, n_draws=1000,
                     key=None):
    """Batched amortized posterior draws: (P, n_draws, n_params)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    return np.asarray(trainer.sample(
        state, key, jnp.asarray(data), jnp.asarray(mask),
        jnp.asarray(log_n), n_draws))


def prop_cognitive_variance(post: np.ndarray, std_alpha_idx=4, sigma1_idx=6):
    """std_alpha^2 / (std_alpha^2 + sigma1^2) per draw
    (fitting_stahl_data.py:214-219). The tiny denominator floor defines
    0/0 (both variance draws at the support lower bound 0, possible since
    draws are clamped to prior support) as 0 — no cognitive variance."""
    cog = post[..., std_alpha_idx] ** 2
    tot = cog + post[..., sigma1_idx] ** 2
    return cog / np.maximum(tot, 1e-12)


def explore_stahl(stahl, plot_dir: str) -> dict:
    """Pre-fit data exploration (the reference's ``explore`` flag,
    fitting_stahl_data.py:125-155): first-participant histograms of the
    three engineered covariates and the correlation heatmap across the
    engineered columns. Returns the printed summary stats."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(plot_dir, exist_ok=True)
    first = stahl.subj == stahl.participants[0]
    cols = {"alpha_like_pe": stahl.alpha_like_pe,
            "alpha_invert_pe": stahl.alpha_invert_pe,
            "alpha_like_fake": stahl.alpha_like_fake}
    out = {}
    fig, axes = plt.subplots(1, 3, figsize=(13, 4), tight_layout=True)
    for ax, (name, col) in zip(axes, cols.items()):
        v = col[first]
        ax.hist(v, bins=20)
        ax.set_title(f"{name}\nmean {v.mean():.3f} sd {v.std():.3f}")
        out[name] = {"mean": float(v.mean()), "sd": float(v.std()),
                     "any_nan": bool(np.any(np.isnan(col)))}
    fig.savefig(os.path.join(plot_dir, "explore_covariate_hists.png"),
                dpi=120)
    plt.close(fig)

    mat = np.stack([stahl.choicert, np.abs(stahl.choicert),
                    stahl.normalized_ne, stahl.alpha_like_pe,
                    stahl.alpha_invert_pe, stahl.alpha_like_fake])
    labels = ["choicert", "rt", "normalized_ne", "alpha_like_pe",
              "alpha_invert_pe", "alpha_like_fake"]
    corr = np.corrcoef(mat)
    fig, ax = plt.subplots(figsize=(7, 6), tight_layout=True)
    im = ax.imshow(corr, vmin=-1, vmax=1, cmap="coolwarm")
    ax.set_xticks(range(len(labels)), labels, rotation=45, ha="right")
    ax.set_yticks(range(len(labels)), labels)
    for i in range(len(labels)):
        for j in range(len(labels)):
            ax.text(j, i, f"{corr[i, j]:.2f}", ha="center", va="center",
                    fontsize=8)
    fig.colorbar(im)
    fig.savefig(os.path.join(plot_dir, "explore_corr_heatmap.png"), dpi=120)
    plt.close(fig)
    out["corr"] = corr.tolist()
    print(json.dumps({k: v for k, v in out.items() if k != "corr"},
                     indent=2))
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--csv", default="stahl_data/base_data.csv")
    p.add_argument("--covariate", default="invert",
                   choices=["pe", "invert", "fake", "ne"])
    p.add_argument("--explore", action="store_true",
                   help="emit the pre-fit data-exploration plots "
                        "(fitting_stahl_data.py:125-155)")
    p.add_argument("--ckpt-dir", default=f"checkpoint/{FLAGSHIP}")
    p.add_argument("--train-steps", type=int, default=0,
                   help="train this many steps if no checkpoint exists")
    p.add_argument("--draws", type=int, default=1000)
    p.add_argument("--plot-dir", default="data_plots")
    p.add_argument("--out", default=None, help="npz output path")
    p.add_argument("--psis", action="store_true",
                   help="PSIS-certify every per-participant fit against "
                        "the exact Rao-Blackwellized flagship likelihood "
                        "and report debiased estimates — real data has no "
                        "ground truth, so this is the only per-fit quality "
                        "signal available (the reference has none, "
                        "fitting_stahl_data.py:196-219)")
    p.add_argument("--n-quad", type=int, default=24,
                   help="quadrature nodes for the exact marginal "
                        "likelihood under --psis")
    p.add_argument("--refit-flagged", type=int, default=0, metavar="K",
                   help="exactly re-fit the K worst-khat uncertified "
                        "participants with flow-preconditioned (NeuTra) "
                        "NUTS — the designed route when PSIS refuses to "
                        "certify (requires --psis)")
    p.add_argument("--refit-warmup", type=int, default=400)
    p.add_argument("--refit-samples", type=int, default=1000)
    p.add_argument("--refit-chains", type=int, default=8)
    p.add_argument("--refit-max-depth", type=int, default=8)
    p.add_argument("--refit-chunk", type=int, default=50)
    p.add_argument("--rhat-escalate", type=float, default=1.1,
                   help="a NeuTra refit whose max Rhat exceeds this "
                        "re-fits in plain coordinates (stuck chains are "
                        "batch-composition-dependent; the plain tier's "
                        "Laplace preconditioning has converged on every "
                        "real-data participant tried)")
    p.add_argument("--refit-participants", default=None, metavar="IDS",
                   help="comma-separated participant ids to exactly "
                        "re-fit in addition to the --refit-flagged "
                        "worst (khat near saturation is draw-dependent, "
                        "so naming pins a participant across runs); "
                        "each routes by its own khat band")
    p.add_argument("--khat-neutra-max", type=float, default=3.0,
                   help="khat band edge for refit routing: below -> "
                        "NeuTra (flow coordinates), at/above -> plain "
                        "natural coordinates (measured bands, ROUND3.md)")
    p.add_argument("--nuts-checkpoint", default=None,
                   help=".npz prefix for chunk-level refit NUTS state "
                        "checkpoints (resumable)")
    p.add_argument("--trim-fast", type=float, default=None, metavar="T",
                   help="exclude trials with |rt| < T seconds "
                        "(anticipatory contaminants). Measured on the "
                        "base condition at T=0.25: affected participants' "
                        "khat median drops 0.68 -> 0.26 while untouched "
                        "participants move by exactly 0 — the "
                        "certification failures these trials cause are "
                        "data contamination, not flow error")
    p.add_argument("--json-out", default=None)
    p.add_argument("--no-plots", action="store_true")
    args = p.parse_args(argv)
    if (args.refit_flagged or args.refit_participants) and not args.psis:
        raise SystemExit("--refit-flagged/--refit-participants require "
                         "--psis (the khat certification decides who "
                         "gets re-fit, and how)")
    if args.out and os.path.exists(args.out):
        # artifact-existence resume (alpha_not_scaled.py:52,230-256): an
        # already-produced output means this expensive step is done
        print(f"output exists at {args.out}, skipping (delete to re-run)")
        return None

    spec = zoo.get_model(FLAGSHIP)
    stahl = load_stahl_csv(args.csv)
    if args.explore:
        explore_stahl(stahl, os.path.join(args.plot_dir, "explore"))
    # pad to the LARGEST participant so no trial is dropped (the reference
    # fits every trial, fitting_stahl_data.py:196-211; largest Stahl
    # participant has 337 > n_max=300). The DeepSet is mask-aware so a
    # buffer longer than the training n_pad is fine; log N extrapolates
    # the conditioning slightly, exactly as the reference's BayesFlow net
    # (trained on N in [60,300]) does when fitting those participants.
    data, mask, log_n, parts, counts = to_padded_batch(
        stahl, which=args.covariate, n_pad=None)
    assert int(mask.sum()) == int(counts.sum()), "trials were dropped"
    n_trimmed = 0
    if args.trim_fast is not None:
        fast = (np.abs(data[..., 0]) < args.trim_fast) & mask
        n_trimmed = int(fast.sum())
        mask = mask & ~fast
        data = np.where(mask[..., None], data, 0.0).astype(np.float32)
        log_n = np.log(np.maximum(mask.sum(1), 1)
                       ).astype(np.float32)[:, None]
    print(f"{len(parts)} participants, {int(mask.sum())} trials "
          f"(buffer {data.shape[1]}, "
          + (f"{n_trimmed} contaminant-fast trimmed at "
             f"{args.trim_fast}s" if n_trimmed else "zero dropped")
          + f"), covariate={args.covariate}")

    cfg = TrainConfig(batch_size=256, steps=max(args.train_steps, 1),
                      n_pad=spec.n_max, ckpt_dir=args.ckpt_dir)
    trainer = Trainer(spec, cfg)
    state = trainer.maybe_restore(trainer.init())
    if int(state.step) == 0 and args.train_steps > 0:
        state, _ = trainer.train(state)

    post = fit_participants(trainer, state, data, mask, log_n, args.draws)
    pcv = prop_cognitive_variance(post)
    all_post = np.concatenate([post, pcv[..., None]], axis=-1)

    names = list(spec.param_names) + ["prop_cog_var"]
    summary = {n: {"mean": float(all_post[..., i].mean()),
                   "sd": float(all_post[..., i].std())}
               for i, n in enumerate(names)}
    out_npz = {"posteriors": all_post, "participants": parts,
               "param_names": np.array(names)}
    report = {"covariate": args.covariate, "participants": len(parts),
              "trim_fast": args.trim_fast,
              "trimmed_fast_trials": n_trimmed,
              "posterior_summary": summary}

    if args.psis:
        # Certify each participant's amortized posterior against the exact
        # likelihood (mcmc/importance.py). The headline real-data quantity
        # — the proportion of covariate variance explained by cognition
        # (fitting_stahl_data.py:214-219) — is a per-draw derived quantity,
        # so the same smoothed weights debias it directly.
        from ..inference import amortized_logw
        from ..mcmc import importance as I
        logw = amortized_logw(spec, trainer, state, jnp.asarray(post),
                              data, mask, jnp.asarray(log_n),
                              flagship=True, n_quad=args.n_quad)
        logw, n_degenerate = I.sanitize_logw(logw)
        smoothed, khat = I.psis_smooth(logw)
        ess = I.weight_ess(smoothed)
        deb_mean, deb_sd = I.weighted_moments(
            all_post.astype(np.float64), smoothed)
        raw_mean = all_post.mean(axis=1)
        raw_sd = all_post.std(axis=1)
        shift_z = (deb_mean - raw_mean) / np.maximum(raw_sd, 1e-12)
        ok = khat < 0.7
        pcv_i = names.index("prop_cog_var")
        report["psis"] = {
            "khat_per_participant": [round(float(k), 3) for k in khat],
            "khat_median": float(np.median(khat)),
            "khat_max": float(np.max(khat)),
            "frac_certified": float(ok.mean()),
            "weight_ess_median": float(np.median(ess)),
            # draws the clamp parked on the prior-support boundary, whose
            # importance weight is exactly 0 (sanitize_logw)
            "degenerate_draws_total": int(n_degenerate.sum()),
            "participants_with_degenerate_draws": int(
                (n_degenerate > 0).sum()),
            "mean_abs_shift_z_certified": {
                n: float(np.abs(shift_z[ok, i]).mean()) if ok.any()
                else None for i, n in enumerate(names)},
            "prop_cog_var_raw_mean": [round(float(v), 4)
                                      for v in raw_mean[:, pcv_i]],
            "prop_cog_var_debiased_mean": [round(float(v), 4)
                                           for v in deb_mean[:, pcv_i]],
        }
        out_npz.update(khat=khat, weight_ess=ess, deb_mean=deb_mean,
                       deb_sd=deb_sd, logw=logw.astype(np.float32))

        if (args.refit_flagged > 0 and (~ok).any()) \
                or args.refit_participants:
            # Exact re-fits of the worst uncertified participants: real
            # data has no truth, so the refit IS the ground truth the
            # amortized fit is judged against. Routing follows the
            # measured khat bands (ROUND3.md, same as
            # inference.certified_posterior): khat < 3 -> NeuTra NUTS in
            # the flow's coordinates (preconditions its own moderate
            # errors); saturated/extreme khat -> PLAIN natural
            # coordinates (there the flow transport itself is broken —
            # measured Rhat 27/87 on exactly such participants — and
            # NeuTra inherits the breakage). khat = inf sorts first.
            from ..inference import (refit_exact_batch, refit_plain_batch,
                                     split_refits_by_khat)
            flagged = np.nonzero(~ok)[0]
            sel, _, _ = split_refits_by_khat(
                khat, flagged, args.refit_flagged, args.khat_neutra_max)
            if args.refit_participants:
                # explicitly named participants join the refit set
                # (khat near its ~6 saturation point is draw-dependent,
                # so a participant flagged in one run can rank lower in
                # the next; naming it pins the refit)
                named = {pid.strip()
                         for pid in args.refit_participants.split(",")}
                unknown = named - {str(p) for p in parts}
                if unknown:
                    raise SystemExit(f"--refit-participants: unknown "
                                     f"participant ids {sorted(unknown)}")
                idx = np.asarray([i for i, p in enumerate(parts)
                                  if str(p) in named], np.int64)
                sel = np.unique(np.concatenate(
                    [np.asarray(sel, np.int64), idx]))
            # (re-)split the final set so every member routes by its
            # own khat band (boundary-clamped draws force the plain
            # tier — clamp activation proves the transport map is
            # broken for that participant); k = |sel| keeps everyone
            sel, neutra_sel, plain_sel = split_refits_by_khat(
                khat, sel, len(sel), args.khat_neutra_max,
                n_degenerate=n_degenerate)
            key = jax.random.PRNGKey(17)
            common = dict(n_quad=args.n_quad, warmup=args.refit_warmup,
                          samples=args.refit_samples,
                          chains=args.refit_chains,
                          max_depth=args.refit_max_depth,
                          chunk=args.refit_chunk, progress=True)
            refit_map = {}
            if neutra_sel:
                print(f"refitting participants "
                      f"{[str(parts[i]) for i in neutra_sel]} (khat "
                      f"{np.round(khat[neutra_sel], 2).tolist()}): "
                      f"batched NeuTra NUTS, {args.refit_chains} chains "
                      f"each, one compiled program", flush=True)
                ck = (f"{args.nuts_checkpoint}.neutra.npz"
                      if args.nuts_checkpoint else None)
                refit_map.update(refit_exact_batch(
                    spec, trainer, state, data, mask, log_n, neutra_sel,
                    key, checkpoint_path=ck, **common))
            # NeuTra refits that failed to converge escalate to plain
            # coordinates (a stuck chain is batch-composition-dependent:
            # the same participant measured Rhat 1.001 in one batch and
            # 134 in another; the Laplace-preconditioned plain refit
            # converged on every real-data participant tried)
            escalate = [i for i, r in refit_map.items()
                        if r.method == "neutra"
                        and r.rhat_max > args.rhat_escalate]
            esc_rhat = {i: refit_map[i].rhat_max for i in escalate}
            if escalate:
                print(f"escalating participants "
                      f"{[str(parts[i]) for i in escalate]} (NeuTra rhat "
                      f"{[round(esc_rhat[i], 2) for i in escalate]}"
                      f" > {args.rhat_escalate}) to plain coordinates",
                      flush=True)
                plain_sel = plain_sel + escalate
            if plain_sel:
                print(f"refitting participants "
                      f"{[str(parts[i]) for i in plain_sel]} (khat "
                      f"{np.round(khat[plain_sel], 2).tolist()}): "
                      f"batched plain-coordinate NUTS (Laplace-"
                      f"preconditioned)", flush=True)
                ck = (f"{args.nuts_checkpoint}.plain.npz"
                      if args.nuts_checkpoint else None)
                refit_map.update(refit_plain_batch(
                    spec, trainer, state, data, mask, log_n, plain_sel,
                    jax.random.fold_in(key, 1),
                    amort_mean=post.mean(axis=1), amort_sd=post.std(axis=1),
                    init_draws=post, checkpoint_path=ck, **common))
                for i, r0 in esc_rhat.items():
                    refit_map[i].escalated_from_rhat = r0
            refits = []
            for i in map(int, sel):
                r = refit_map[i]
                pid = str(parts[i])
                n_i = int((mask[i] & (data[i][:, 0] != 0)).sum())
                # (S*C, P) chain-major flat -> (S, C, P+1) with the derived
                # prop_cog_var column, the serial-era npz layout
                ex = r.samples.reshape(args.refit_chains,
                                       args.refit_samples, -1)
                ex = np.transpose(ex, (1, 0, 2))
                ex = np.concatenate(
                    [ex, prop_cognitive_variance(ex)[..., None]], axis=-1)
                ex_flat = ex.reshape(-1, ex.shape[-1])     # (S*C, 8)
                ex_mean, ex_sd = ex_flat.mean(0), ex_flat.std(0)
                row = {
                    "participant": pid,
                    "n_trials": n_i,
                    "khat": round(float(khat[i]), 3),
                    "method": r.method,
                    **({"escalated_from_neutra_rhat":
                        round(r.escalated_from_rhat, 3)}
                       if r.escalated_from_rhat is not None else {}),
                    "rhat_max": round(r.rhat_max, 3),
                    "neff_min": round(r.neff_min, 1),
                    "exact_mean": {n: round(float(ex_mean[j]), 4)
                                   for j, n in enumerate(names)},
                    "exact_sd": {n: round(float(ex_sd[j]), 4)
                                 for j, n in enumerate(names)},
                    "amortized_dz": {
                        n: round(float((raw_mean[i, j] - ex_mean[j])
                                       / max(ex_sd[j], 1e-12)), 3)
                        for j, n in enumerate(names)},
                }
                refits.append(row)
                out_npz[f"refit_samples_p{pid}"] = ex.astype(np.float32)
            report["psis"]["refits"] = refits

    print(json.dumps(report, indent=2))
    if args.json_out:
        with open(args.json_out + ".tmp", "w") as f:
            json.dump(report, f, indent=2)
        os.replace(args.json_out + ".tmp", args.json_out)
    if args.out:
        np.savez(args.out, **out_npz)

    if not args.no_plots:
        pdir = os.path.join(args.plot_dir, FLAGSHIP, args.covariate)
        os.makedirs(pdir, exist_ok=True)
        for i, n in enumerate(names):
            # jellyfish over participants: (P, draws) -> (P, draws, 1)
            fig = plots.jellyfish(all_post[:, :, i][:, :, None])
            fig.savefig(f"{pdir}/jellyfish_{n}.png", dpi=120)
        fig = plots.plot_posterior2d(
            all_post[:12, :, 4], all_post[:12, :, 6],
            ["std_alpha", "sigma1"])
        fig.savefig(f"{pdir}/2d_stdalpha_sigma1.png", dpi=120)
        fig = plots.plot_posterior3d(all_post[0][:, [0, 1, 5]],
                                     ["drift", "mu_alpha", "dc"])
        fig.savefig(f"{pdir}/3d_drift_alpha_dc.png", dpi=120)
        import matplotlib.pyplot as plt
        plt.close("all")
    return all_post, parts


if __name__ == "__main__":
    main()
