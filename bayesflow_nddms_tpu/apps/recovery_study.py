"""Recovery-study driver: train (or restore) an amortizer, then validate
parameter recovery on fresh simulated datasets.

Replaces the flag-gated top half of every reference model script
(``basic_ddm_dc.py:197-357``: train_fitter / make_recovery_plots): one
command trains any zoo model, runs the batched recovery study, writes the
recovery_scatter / per-parameter recovery / 2-D and 3-D posterior figures
into ``recovery_plots/<model>/`` (same artifact layout), and prints the
per-parameter R^2 / Pearson rho plus SBC p-values as JSON.

    python -m bayesflow_nddms_tpu.apps.recovery_study \
        --model basic_ddm_dc --steps 3000 --num-test 500 --draws 1000
"""

from __future__ import annotations

import argparse
import json
import os

import jax

from ..diagnostics import plots
from ..diagnostics.recovery import (benjamini_hochberg, contraction_identity,
                                    run_recovery_study,
                                    run_recovery_study_streaming, sbc_ranks,
                                    sbc_interval_coverage,
                                    sbc_uniformity_pvalue)
from ..models import zoo
from ..train.trainer import TrainConfig, Trainer


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="basic_ddm_dc",
                   choices=zoo.list_models())
    p.add_argument("--steps", type=int, default=30_000)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--num-test", type=int, default=500)
    p.add_argument("--draws", type=int, default=1000)
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--plot-dir", default="recovery_plots")
    p.add_argument("--seed", type=int, default=2023)
    p.add_argument("--no-plots", action="store_true")
    p.add_argument("--stream", action="store_true",
                   help="streaming study: reduce posterior stats + SBC "
                        "ranks on device per chunk (required for "
                        "reference-scale 12,000 x 10,000 runs); resumable "
                        "at chunk granularity via --workdir")
    p.add_argument("--study-batch", type=int, default=128,
                   help="datasets per device chunk in --stream mode")
    p.add_argument("--workdir", default=None,
                   help="chunk-artifact dir for resumable --stream studies")
    p.add_argument("--out", default=None,
                   help="results JSON path; if it already exists the whole "
                        "run is skipped (artifact-existence resume, "
                        "alpha_not_scaled.py:52,230-256)")
    args = p.parse_args(argv)

    if args.out and os.path.exists(args.out):
        print(f"results exist at {args.out}, skipping (delete to re-run)")
        with open(args.out) as f:
            return json.load(f)

    spec = zoo.get_model(args.model)
    ckpt = args.ckpt_dir or f"checkpoint/{args.model}"
    cfg = TrainConfig(batch_size=args.batch_size, steps=args.steps,
                      n_pad=spec.n_max, ckpt_dir=ckpt, seed=args.seed)
    trainer = Trainer(spec, cfg)
    state, history = trainer.train(
        log_fn=lambda r: print(f"step {r['step']:>7} loss {r['loss']:+.3f} "
                               f"val {r['val_loss']:+.3f}", flush=True))

    names = list(spec.param_names)
    if args.stream:
        study = run_recovery_study_streaming(
            spec, trainer.amortizer, state.params,
            jax.random.PRNGKey(args.seed), num_test=args.num_test,
            n_draws=args.draws, batch=args.study_batch,
            workdir=args.workdir,
            fingerprint_extra={"ckpt_step": int(state.step)})
        ranks, post_mean = study.ranks, study.post_mean
        post_sd = study.post_sd
        sample_subset = study.sample_subset
        true_subset = study.true_params[:len(sample_subset)] \
            if sample_subset is not None else None
    else:
        study = run_recovery_study(
            spec, trainer.amortizer, state.params,
            jax.random.PRNGKey(args.seed), num_test=args.num_test,
            n_draws=args.draws)
        ranks = sbc_ranks(study.true_params, study.param_samples)
        post_mean = study.param_samples.mean(axis=1)
        post_sd = study.param_samples.std(axis=1)
        sample_subset = study.param_samples[:500]
        true_subset = study.true_params[:500]
    sbc_p = sbc_uniformity_pvalue(ranks, args.draws)
    sbc_q = benjamini_hochberg(sbc_p)   # within-model multiplicity control
    cov = sbc_interval_coverage(ranks, args.draws)

    result = {
        "model": args.model,
        "steps": int(state.step),
        "num_test": int(len(study.true_params)),
        "draws": args.draws,
        "final_val_loss": history["val_loss"][-1] if history["val_loss"]
        else None,
        "metrics": study.metrics,
        "sbc_pvalues": {n: float(v) for n, v in zip(names, sbc_p)},
        "sbc_qvalues": {n: float(v) for n, v in zip(names, sbc_q)},
        "interval_coverage": {
            n: {"50": float(cov[0, i]), "90": float(cov[1, i]),
                "95": float(cov[2, i])} for i, n in enumerate(names)},
        "mean_trials": float(study.n_trials.mean()),
        # posterior-bound vs estimator-bound attribution of each rho
        "contraction": contraction_identity(
            study.true_params, post_mean, post_sd, names),
    }
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out + ".tmp", "w") as f:
            json.dump(result, f, indent=2)
        os.replace(args.out + ".tmp", args.out)

    if not args.no_plots:
        pdir = os.path.join(args.plot_dir, args.model)
        os.makedirs(pdir, exist_ok=True)
        fig = plots.recovery_scatter(study.true_params, post_mean, names,
                                     figsize=(4 * len(names), 4))
        fig.savefig(f"{pdir}/{args.model}_recovery_short.png", dpi=120)
        if sample_subset is not None:
            fig = plots.plot_recovery(sample_subset, true_subset, names)
            fig.savefig(f"{pdir}/{args.model}_true_vs_estimate.png", dpi=120)
            for i, n in enumerate(names):
                fig = plots.recovery(sample_subset[:, :, i, None],
                                     true_subset[:, i])
                fig.savefig(f"{pdir}/{args.model}_{n}.png", dpi=120)
        if history["loss"]:
            fig = plots.plot_losses(history["loss"], history["val_loss"])
            fig.savefig(f"{pdir}/{args.model}_validation.png", dpi=120)
        # pairwise joint posteriors for the first parameters (2d) and a 3-D
        # drift/boundary/dc figure when the model has those axes
        if sample_subset is not None and spec.n_params >= 2:
            fig = plots.plot_posterior2d(
                sample_subset[:12, :, 0], sample_subset[:12, :, 1],
                [names[0], names[1]],
                true_params=true_subset[:12, :2], highlight=3)
            fig.savefig(f"{pdir}/{args.model}_2d_posteriors.png", dpi=120)
        if sample_subset is not None and spec.n_params >= 3:
            fig = plots.plot_posterior3d(
                sample_subset[3][:, :3], names[:3])
            fig.savefig(f"{pdir}/{args.model}_3d_posterior.png", dpi=120)
        import matplotlib.pyplot as plt
        plt.close("all")
    return result


if __name__ == "__main__":
    main()
