"""Pure-simulation figure drivers.

Replaces ``simulations/Basic_DDM_simulations.py`` and
``simulations/mean_RT_accuracy_effects.py``:

  * ``identifiability_demo`` — the paper's central demonstration that
    (drift, boundary, dc) are only identified up to a scalar from
    choice-RT data alone: scalar-multiplied parameter sets give identical
    predictions and identical EZ-diffusion estimates
    (Basic_DDM_simulations.py:163-209);
  * ``plot_paths`` — recorded evidence-accumulation trajectories
    (:21-70), via the path-recording TPU kernel;
  * ``parameter_sweeps`` — the 3x3 mean-accuracy / mean-RT / RT-variance
    sweep over dc, drift, and boundary (mean_RT_accuracy_effects.py:
    37-306), as one vectorized TPU call per axis instead of 50x200x300
    nested Python loops.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.ddm_sim import first_passage, first_passage_with_path
from ..ops.ez_diffusion import ez_diffusion

Array = jax.Array


def identifiability_demo(n: int = 100_000, seed: int = 2023) -> dict:
    """Three scalar-multiplied parameter sets -> same behavior, same EZ
    estimates; plus a dc manipulation that masquerades as drift+boundary
    effects (Basic_DDM_simulations.py:163-209)."""
    cases = {
        "base (a=1.2, v=1.5, dc=1)": (1.2, 1.5, 1.0),
        "x2   (a=2.4, v=3.0, dc=2)": (2.4, 3.0, 2.0),
        "x5/6 (a=1.0, v=1.25, dc=.833)": (1.0, 1.25, 5.0 / 6.0),
        "dc-effect (a=1.2, v=3, dc=2)": (1.2, 3.0, 2.0),
        "dc-masked (a=1.2, v=1.5, dc=.5)": (1.2, 1.5, 0.5),
    }
    out = {}
    for label, (a, v, dc) in cases.items():
        fp = first_passage(jax.random.PRNGKey(seed), v, a, 0.5, dc,
                           shape=(1, n), dt=0.001, max_steps=8000)
        ch = np.asarray(fp.choice[0]).astype(int)
        t = np.asarray(fp.decision_time(0.001)[0])
        hit = ch != 0
        acc = (ch[hit] == 1).astype(float)
        est = ez_diffusion(t[hit], acc)
        out[label] = {
            "accuracy": float(acc.mean()),
            "mean_rt": float(t[hit].mean()),
            "ez_drift": float(est.drift),
            "ez_boundary": float(est.boundary),
        }
    return out


def plot_paths(n_paths: int = 10, boundary: float = 1.2, drift: float = 1.5,
               dc: float = 1.0, dt: float = 0.001, n_record: int = 3000,
               seed: int = 2023):
    """Evidence trajectories for path figures (Basic_DDM_simulations.py:
    21-70). Returns (times, paths (n_paths, n_record), fp)."""
    fp, paths = first_passage_with_path(
        jax.random.PRNGKey(seed), drift, boundary,
        jnp.full((1, n_paths), 0.5), dc, dt=dt, max_steps=n_record,
        n_record=n_record)
    times = np.arange(1, n_record + 1) * dt
    return times, np.asarray(paths[0]), fp


def parameter_sweeps(n_points: int = 50, n_trials: int = 4096,
                     seed: int = 0) -> dict:
    """Mean accuracy / mean RT / RT variance as functions of dc, drift, and
    boundary (mean_RT_accuracy_effects.py 3x3 figure). One batched kernel
    call per swept axis."""
    key = jax.random.PRNGKey(seed)
    base = dict(drift=1.0, boundary=1.2, dc=1.0)
    sweeps = {
        "dc": np.linspace(0.5, 2.0, n_points),
        "drift": np.linspace(-4.0, 4.0, n_points),
        "boundary": np.linspace(0.5, 2.0, n_points),
    }
    results = {}
    for axis_idx, (axis, values) in enumerate(sweeps.items()):
        params = {k: jnp.full((n_points, 1), v) for k, v in base.items()}
        params[axis] = jnp.asarray(values, jnp.float32)[:, None]
        fp = first_passage(jax.random.fold_in(key, axis_idx),
                           params["drift"], params["boundary"],
                           jnp.float32(0.5), params["dc"],
                           shape=(n_points, n_trials), dt=0.01,
                           max_steps=300)
        ch = np.asarray(fp.choice).astype(int)
        t = np.asarray(fp.decision_time(0.01))
        hit = ch != 0
        acc = np.where(hit, (ch == 1).astype(float), np.nan)
        rts = np.where(hit, t, np.nan)
        results[axis] = {
            "values": values.tolist(),
            "accuracy": np.nanmean(acc, axis=1).tolist(),
            "mean_rt": np.nanmean(rts, axis=1).tolist(),
            "var_rt": np.nanvar(rts, axis=1).tolist(),
        }
    return results


def view_simulation(model: str = "single_trial_alpha_not_scaled",
                    num_test: int = 2000, seed: int = 2023,
                    plot_path: str | None = None):
    """Simulator sanity panel (the reference's ``view_simulation`` flag,
    single_trial_alpha_not_scaled.py:194-243): KDEs of per-dataset
    covariate means/variances, RT means, choice rates, and the RT
    distributions by choice ("should look like a shifted Wald"). Returns
    the summary dict; optionally saves the figure."""
    from ..models import zoo
    from ..models.spec import generate_training_batch

    spec = zoo.get_model(model)
    key = jax.random.PRNGKey(seed)
    theta, data, mask, log_n = generate_training_batch(
        spec, key, num_test, spec.n_max)
    data = np.asarray(data)
    mask = np.asarray(mask)
    c0 = data[..., 0]
    m = mask & (c0 != 0)
    rt_means = np.array([np.abs(c0[i][m[i]]).mean() for i in range(num_test)])
    choice_means = np.array([(0.5 + 0.5 * np.sign(c0[i][m[i]])).mean()
                             for i in range(num_test)])
    summary = {"rt_mean": float(rt_means.mean()),
               "choice_rate_mean": float(choice_means.mean()),
               "missing_rate": float((mask & (c0 == 0)).sum() / mask.sum())}
    if data.shape[-1] > 1:
        ext = data[..., 1]
        ext_means = np.array([ext[i][mask[i]].mean() for i in range(num_test)])
        ext_vars = np.array([ext[i][mask[i]].var() for i in range(num_test)])
        summary["ext_mean"] = float(ext_means.mean())
        summary["ext_var"] = float(ext_vars.mean())
    # min RT must exceed... equal the NDT floor (reference checks min RT
    # against the drawn ndt, :241-243)
    i0 = 0
    ndt_idx = spec.param_names.index("ter") if "ter" in spec.param_names \
        else (spec.param_names.index("tau") if "tau" in spec.param_names
              else None)
    if ndt_idx is not None:
        rts0 = np.abs(c0[i0][m[i0]])
        summary["min_rt_vs_ndt"] = (float(rts0.min()),
                                    float(np.asarray(theta)[i0, ndt_idx]))
    if plot_path:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(2, 3, figsize=(13, 7))
        panels = [("per-dataset mean |RT|", rt_means),
                  ("per-dataset choice rate", choice_means)]
        if data.shape[-1] > 1:
            panels += [("covariate means", ext_means),
                       ("covariate variances", ext_vars)]
        rts0 = np.abs(c0[i0][m[i0]])
        sign0 = np.sign(c0[i0][m[i0]])
        panels += [("RTs | upper (shifted-Wald-like)", rts0[sign0 > 0]),
                   ("RTs | lower (shifted-Wald-like)", rts0[sign0 < 0])]
        for ax, (title, vals) in zip(axes.ravel(), panels):
            if len(vals) > 1:
                ax.hist(vals, bins=40, density=True, alpha=0.7,
                        color="#3182bd")
            ax.set_title(title, fontsize=9)
        fig.tight_layout()
        fig.savefig(plot_path, dpi=120)
        plt.close(fig)
    return summary


def identifiability_figure(plot_dir: str = "simulation_plots",
                           seed: int = 2023) -> str:
    """The paper's composed 3x2 identifiability figure
    (Basic_DDM_simulations.py:217-472): single evidence paths for three
    scalar-multiplied parameter triples that share delta/varsigma and
    alpha/varsigma (rows 1-2 left/right + row 3 left) plus the dc-effect
    walk that masquerades as a drift+boundary change (row 3 right). Each
    panel is annotated with its (delta, alpha, varsigma) and the invariant
    ratios, sharing the x-axis like the reference figure."""
    import os

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cases = [
        ("a", 1.5, 1.2, 1.0), ("b", 3.0, 2.4, 2.0),
        ("c", 1.25, 1.0, 5.0 / 6.0), ("d", 3.0, 1.2, 2.0),
    ]
    fig, axarr = plt.subplots(2, 2, sharex=True, figsize=(15, 10),
                              tight_layout=True)
    fontsize = 16
    for k, (label, v, a, dc) in enumerate(cases):
        ax = axarr[k // 2][k % 2]
        # simulate a handful of candidate walks and show the slowest one
        # that still crosses — the reference hand-picked seeds producing
        # long wandering paths for the same visual effect
        fp, paths = first_passage_with_path(
            jax.random.fold_in(jax.random.PRNGKey(seed), k), v, a,
            jnp.full((1, 24), 0.5), dc, dt=0.001, max_steps=2000,
            n_record=2000)
        all_steps = np.asarray(fp.steps)[0]
        crossed = np.asarray(fp.choice)[0] != 0
        pick = int(np.argmax(np.where(crossed, all_steps, -1)))
        steps = int(all_steps[pick])
        path = np.asarray(paths)[0, pick, :steps]
        t = np.arange(1, steps + 1) * 0.001
        ax.plot(t, path)
        ax.axhline(a, color="k")
        ax.axhline(0.0, color="k")
        ax.set_xlim([0, 2])
        ax.set_ylabel("Evidence", fontsize=fontsize, labelpad=-20)
        ax.set_yticks([0, a])
        lines = [f"$\\delta$={v}", f"$\\alpha$={a}",
                 f"$\\varsigma$={round(dc, 3)}",
                 f"$\\delta/\\varsigma$={round(v / dc, 2)}",
                 f"$\\alpha/\\varsigma$={round(a / dc, 2)}"]
        for j, txt in enumerate(lines):
            ax.text(0.01, 0.8 - 0.125 * j, txt, transform=ax.transAxes,
                    size=fontsize, ha="left", va="center")
        ax.text(-0.12, 0.97, label, weight="bold", transform=ax.transAxes,
                size=fontsize, ha="left", va="center")
    for ax in axarr[1]:
        ax.set_xlabel("Time (s)", fontsize=fontsize)
    os.makedirs(plot_dir, exist_ok=True)
    out = os.path.join(plot_dir, "identifiability_2x2.png")
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--what", default="identifiability",
                   choices=["identifiability", "sweeps", "paths",
                            "identifiability-figure"])
    p.add_argument("--plot-dir", default="simulation_plots")
    args = p.parse_args(argv)
    if args.what == "identifiability-figure":
        print("saved", identifiability_figure(args.plot_dir))
    elif args.what == "identifiability":
        print(json.dumps(identifiability_demo(), indent=2))
    elif args.what == "sweeps":
        res = parameter_sweeps()
        import os
        os.makedirs(args.plot_dir, exist_ok=True)
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(3, 3, figsize=(12, 10))
        for col, (axis, r) in enumerate(res.items()):
            for row, stat in enumerate(["accuracy", "mean_rt", "var_rt"]):
                axes[row][col].plot(r["values"], r[stat])
                axes[row][col].set_xlabel(axis)
                axes[row][col].set_ylabel(stat)
        fig.tight_layout()
        fig.savefig(f"{args.plot_dir}/mean_rt_accuracy_effects.png", dpi=120)
        print(f"saved {args.plot_dir}/mean_rt_accuracy_effects.png")
    else:
        times, paths, fp = plot_paths()
        import os
        os.makedirs(args.plot_dir, exist_ok=True)
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(9, 5))
        for i in range(paths.shape[0]):
            ax.plot(times, paths[i], lw=0.8)
        ax.axhline(1.2, color="k")
        ax.axhline(0.0, color="k")
        ax.set_xlabel("time (s)")
        ax.set_ylabel("evidence")
        fig.savefig(f"{args.plot_dir}/ddm_paths.png", dpi=120)
        print(f"saved {args.plot_dir}/ddm_paths.png")


if __name__ == "__main__":
    main()
