"""Plotting parity with ``pyhddmjagsutils.py`` and the BayesFlow natives.

Functions mirror the reference's figure tooling (same names, same visual
content, re-implemented):

  * ``jellyfish``        — mirrored-KDE posterior panels (:408-490)
  * ``recovery``         — true value vs posterior credible intervals (:493-548)
  * ``recovery_scatter`` — true-vs-posterior-mean grid with R^2 / Pearson rho
                           annotations (:553-646), the repo's headline figure
  * ``plot_posterior2d`` — grid of pairwise joint-posterior scatters with
                           true-value overlay + highlight (:649-752)
  * ``plot_posterior3d`` — the 3-D drift/boundary/dc joint-posterior figure
                           (basic_ddm_dc.py:366-414)
  * ``plot_losses``      — train/validation loss curves
                           (bf.diagnostics.plot_losses, basic_ddm_dc.py:204)
  * ``plot_recovery``    — BayesFlow-native per-parameter recovery scatter
                           (bf.diagnostics.plot_recovery, basic_ddm_dc.py:230)

All functions return the matplotlib Figure so callers can save it.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from .recovery import pearson, rsquared_pred  # noqa: E402


def _kde(x: np.ndarray, grid: np.ndarray) -> np.ndarray:
    """Gaussian KDE with Scott's rule (no scipy dependency in the hot path)."""
    x = np.asarray(x, np.float64).ravel()
    n = x.size
    bw = x.std(ddof=1) * n ** (-1 / 5) + 1e-12
    z = (grid[:, None] - x[None, :]) / bw
    return np.exp(-0.5 * z * z).sum(axis=1) / (n * bw * math.sqrt(2 * math.pi))


def jellyfish(possamps: np.ndarray, param_names: Optional[Sequence[str]] = None,
              ax=None):
    """Mirrored-KDE plot of posteriors over (dims..., nsamps, nchains)."""
    x = np.asarray(possamps, np.float64)
    flat = x.reshape((-1, np.prod(x.shape[-2:])))
    nvar = flat.shape[0]
    if ax is None:
        fig, ax = plt.subplots(figsize=(8, max(3, 0.5 * nvar)))
    else:
        fig = ax.figure
    order = np.argsort(np.median(flat, axis=1))
    for row, v in enumerate(order):
        s = flat[v]
        lo, hi = np.quantile(s, [0.001, 0.999])
        grid = np.linspace(lo, hi, 200)
        dens = _kde(s, grid)
        dens = 0.4 * dens / (dens.max() + 1e-12)
        ax.fill_between(grid, row - dens, row + dens, alpha=0.6,
                        color="#3182bd")
        q = np.quantile(s, [0.005, 0.025, 0.5, 0.975, 0.995])
        ax.plot([q[1], q[3]], [row, row], color="k", lw=2)
        ax.plot([q[0], q[4]], [row, row], color="k", lw=0.8)
        ax.plot(q[2], row, "o", color="k", ms=3)
        ax.plot(s.mean(), row, "^", color="#d95f02", ms=4)
    labels = (list(param_names) if param_names is not None
              else [str(i) for i in range(nvar)])
    ax.set_yticks(range(nvar))
    ax.set_yticklabels([labels[v] for v in order])
    return fig


def recovery(possamps: np.ndarray, truevals: np.ndarray, ax=None):
    """True value vs posterior 95%/99% CIs + median, per dataset
    (pyhddmjagsutils.py:493-548): x = truth, vertical bar = CI."""
    x = np.asarray(possamps, np.float64)
    flat = x.reshape((x.shape[0], -1))
    t = np.asarray(truevals, np.float64).ravel()
    if ax is None:
        fig, ax = plt.subplots(figsize=(6, 5))
    else:
        fig = ax.figure
    q = np.quantile(flat, [0.005, 0.025, 0.5, 0.975, 0.995], axis=1)
    ax.vlines(t, q[0], q[4], color="#c6dbef", lw=1)
    ax.vlines(t, q[1], q[3], color="#6baed6", lw=2)
    ax.plot(t, q[2], "o", ms=2, color="#08306b")
    lims = [min(t.min(), q[0].min()), max(t.max(), q[4].max())]
    ax.plot(lims, lims, "k--", lw=1)
    return fig


def recovery_scatter(theta_true: np.ndarray, theta_est: np.ndarray,
                     param_names: Sequence[str], figsize=(20, 4),
                     font_size: int = 12, color: str = "#3182bdff",
                     alpha: float = 0.75, grantB1: bool = False):
    """Grid of true-vs-estimated scatters annotated with R^2 and Pearson rho
    (pyhddmjagsutils.py:553-646) — the repo's headline recovery figure."""
    theta_true = np.asarray(theta_true)
    theta_est = np.asarray(theta_est)
    P = theta_true.shape[1]
    fig, axes = plt.subplots(1, P, figsize=figsize)
    axes = np.atleast_1d(axes)
    for i, ax in enumerate(axes):
        t, e = theta_true[:, i], theta_est[:, i]
        ax.scatter(t, e, s=8, color=color, alpha=alpha, edgecolors="none")
        lims = [min(t.min(), e.min()), max(t.max(), e.max())]
        ax.plot(lims, lims, "k--", lw=1)
        r2 = rsquared_pred(t, e)
        rho = pearson(t, e)
        ax.text(0.05, 0.9, f"$R^2$ = {r2:.2f}", transform=ax.transAxes,
                fontsize=font_size)
        ax.text(0.05, 0.8, rf"$\rho$ = {rho:.2f}", transform=ax.transAxes,
                fontsize=font_size)
        ax.set_title(param_names[i], fontsize=font_size)
        ax.set_xlabel("True", fontsize=font_size)
        if i == 0:
            ax.set_ylabel("Estimated", fontsize=font_size)
    fig.tight_layout()
    return fig


def plot_posterior2d(samples_x: np.ndarray, samples_y: np.ndarray,
                     param_names: Sequence[str],
                     true_params: Optional[np.ndarray] = None,
                     font_size: int = 16, alpha: float = 0.25,
                     figsize=(20, 8), color: str = "#ABB0B8",
                     color2: str = "black", highlight: Optional[int] = None):
    """Grid of pairwise joint-posterior scatter plots for several datasets
    (pyhddmjagsutils.py:649-752)."""
    sx = np.asarray(samples_x)
    sy = np.asarray(samples_y)
    n = sx.shape[0]
    ncols = min(n, 6)
    nrows = -(-n // ncols)
    fig, axes = plt.subplots(nrows, ncols, figsize=figsize, squeeze=False)
    for i in range(nrows * ncols):
        ax = axes[i // ncols][i % ncols]
        if i >= n:
            ax.axis("off")
            continue
        ax.scatter(sx[i], sy[i], s=4, alpha=alpha, color=color,
                   edgecolors="none")
        if true_params is not None:
            ax.plot(true_params[i, 0], true_params[i, 1], "o", color=color2,
                    ms=6)
        if highlight is not None and i == highlight:
            for spine in ax.spines.values():
                spine.set_linewidth(3)
    axes[-1][0].set_xlabel(param_names[0], fontsize=font_size)
    axes[-1][0].set_ylabel(param_names[1], fontsize=font_size)
    fig.tight_layout()
    return fig


def plot_posterior3d(samples: np.ndarray, param_names: Sequence[str],
                     elev: int = 20, azim: int = -30, figsize=(10, 10),
                     color: str = "#332288", color2: str = "#ABB0B8",
                     alpha: float = 0.25):
    """3-D joint posterior with 2-D projections on the box faces
    (basic_ddm_dc.py:366-414)."""
    s = np.asarray(samples)  # (n_draws, 3)
    fig = plt.figure(figsize=figsize)
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(s[:, 0], s[:, 1], s[:, 2], alpha=alpha, color=color)
    ax.scatter(s[:, 0], s[:, 1], s[:, 2].min(), alpha=alpha, color=color2)
    ax.scatter(s[:, 0], s[:, 1].max(), s[:, 2], alpha=alpha, color=color2)
    ax.scatter(s[:, 0].min(), s[:, 1], s[:, 2], alpha=alpha, color=color2)
    ax.set_xlabel(param_names[0], fontsize=16, labelpad=10)
    ax.set_ylabel(param_names[1], fontsize=16, labelpad=10)
    ax.set_zlabel(param_names[2], fontsize=16, labelpad=10)
    ax.view_init(elev=elev, azim=azim)
    return fig


def plot_losses(train_losses, val_losses=None):
    """Loss curves (bf.diagnostics.plot_losses parity)."""
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.plot(train_losses, label="train", lw=1)
    if val_losses is not None:
        xs = np.linspace(0, len(train_losses) - 1, len(val_losses))
        ax.plot(xs, val_losses, label="validation", lw=1.5)
    ax.set_xlabel("step")
    ax.set_ylabel("NLL")
    ax.legend()
    fig.tight_layout()
    return fig


def plot_recovery(param_samples: np.ndarray, true_params: np.ndarray,
                  param_names: Sequence[str], figsize=None):
    """BayesFlow-native recovery plot parity: posterior mean +- std vs truth
    per parameter (bf.diagnostics.plot_recovery, basic_ddm_dc.py:230-232)."""
    samples = np.asarray(param_samples)
    truths = np.asarray(true_params)
    P = truths.shape[1]
    ncols = min(P, 4)
    nrows = -(-P // ncols)
    fig, axes = plt.subplots(nrows, ncols,
                             figsize=figsize or (4 * ncols, 4 * nrows),
                             squeeze=False)
    means = samples.mean(axis=1)
    stds = samples.std(axis=1)
    for i in range(nrows * ncols):
        ax = axes[i // ncols][i % ncols]
        if i >= P:
            ax.axis("off")
            continue
        ax.errorbar(truths[:, i], means[:, i], yerr=stds[:, i], fmt="o",
                    ms=2, alpha=0.5, elinewidth=0.5, color="#3182bd")
        lims = [truths[:, i].min(), truths[:, i].max()]
        ax.plot(lims, lims, "k--", lw=1)
        ax.set_title(param_names[i])
        ax.text(0.05, 0.9, f"$R^2$={rsquared_pred(truths[:, i], means[:, i]):.2f}",
                transform=ax.transAxes)
    fig.tight_layout()
    return fig
