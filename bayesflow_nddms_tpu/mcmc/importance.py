"""Pareto-smoothed importance reweighting of amortized posteriors.

A production-grade safety net the reference framework lacks entirely: its
amortized (BayesFlow) backend has no per-dataset quality signal — the only
validation is population-level simulation-based calibration (e.g.
``single_trial_alpha_not_scaled.py`` recovery studies), which says nothing
about THIS dataset's posterior. Here the normalizing flow is not just a
sampler but an exact density (``nets/amortizer.py:log_prob``), so for any
dataset with a tractable likelihood we can importance-weight the amortized
draws against the exact unnormalized posterior

    log w_s = log p(theta_s) + log L(data | theta_s) - log q(theta_s | data)

and (a) diagnose the amortization error via the Pareto tail index of the
weights (k-hat; Vehtari, Simpson, Gelman, Yao & Gabry, "Pareto smoothed
importance sampling", 2015/2021 — public method, implemented from the
paper's equations), and (b) REPAIR the posterior by smoothed-weight
resampling, which is asymptotically exact as draws grow whenever
k-hat < 0.7. This turns the amortizer + exact-likelihood pair into a
self-correcting system: the flow proposes, the WFPT density corrects.

Exact likelihoods available: the dcDDM (``mcmc/wfpt.diffusion_logpdf``)
and the flagship via the Rao-Blackwellized marginal
(``mcmc/models.flagship_marginal_loglik`` — trial-level boundaries
integrated out analytically + by quantile quadrature).

All tail fitting runs vectorized over datasets in float64 numpy (host
side; the expensive part — the likelihood at every draw — runs batched
on the device).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

__all__ = ["psis_smooth", "pareto_khat", "weight_ess",
           "weighted_moments", "importance_resample"]


def _gpd_fit_zhang_stephens(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Generalized-Pareto fit to exceedances, batched.

    ``x``: (B, M) positive exceedances sorted ascending per row. Returns
    (xi, sigma) per row in the STANDARD parameterization
    F(y) = 1 - (1 + xi y / sigma)^(-1/xi) (xi > 0 = heavy tail).

    Zhang & Stephens (2009): profile the likelihood over a deterministic
    grid of b = xi_zs/sigma (their k = -xi), weight grid points by
    normalized profile likelihood, and plug the weighted mean b back in.
    Quadrature over a fixed grid — no iteration, fully vectorized.
    """
    x = np.asarray(x, np.float64)
    B, n = x.shape
    m = 30 + int(np.floor(np.sqrt(n)))
    j = np.arange(1, m + 1, dtype=np.float64)
    xstar = x[:, max(int(n / 4 + 0.5) - 1, 0)][:, None]      # lower quartile
    b = (1.0 / x[:, -1][:, None]
         + (1.0 - np.sqrt(m / (j - 0.5)))[None, :] / (3.0 * xstar))
    # k_zs(b) = -mean_i log(1 - b x_i); keep 1 - b x strictly positive
    one_m_bx = np.maximum(1.0 - b[:, :, None] * x[:, None, :], 1e-30)
    k_zs = -np.mean(np.log(one_m_bx), axis=2)                # (B, m)
    k_zs = np.where(np.abs(k_zs) < 1e-12, 1e-12, k_zs)
    with np.errstate(divide="ignore", invalid="ignore"):
        log_lik = n * (np.log(np.abs(b / k_zs)) + k_zs - 1.0)
    log_lik = np.where(b / k_zs > 0, log_lik, -np.inf)
    log_lik -= log_lik.max(axis=1, keepdims=True)
    w = np.exp(log_lik)
    w /= w.sum(axis=1, keepdims=True)
    b_hat = (w * b).sum(axis=1)                              # (B,)
    one_m_bx = np.maximum(1.0 - b_hat[:, None] * x, 1e-30)
    k_hat_zs = -np.mean(np.log(one_m_bx), axis=1)
    xi = -k_hat_zs
    sigma = np.where(np.abs(b_hat) > 1e-30, k_hat_zs / b_hat, np.inf)
    return xi, sigma


def _gpd_quantile(p: np.ndarray, xi: np.ndarray,
                  sigma: np.ndarray) -> np.ndarray:
    """Inverse CDF of the standard GPD; broadcasts (B, 1) params vs
    (1, M) probabilities."""
    small = np.abs(xi) < 1e-9
    xi_safe = np.where(small, 1.0, xi)
    q = sigma / xi_safe * (np.power(1.0 - p, -xi) - 1.0)
    return np.where(small, -sigma * np.log1p(-p), q)


def sanitize_logw(logw: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Zero out the importance weight of degenerate draws.

    The amortizer's dead-backstop clamp (nets/amortizer.py) can park a
    draw exactly ON the prior-support boundary — a degenerate corner of
    parameter space (dc = 0, ter = 0, beta at an edge) where the Wiener
    density is a 0/0 series (NaN log-likelihood) and the flow's own
    density can vanish (+inf raw weight). The clamp turns the proposal
    into an atom there, and the continuous exact posterior puts zero mass
    on any atom, so the importance weight of such a draw is exactly 0.
    Replaces NaN/+inf entries with -inf. Returns ``(sanitized logw,
    per-row replaced count)`` — report the count: a high rate means the
    flow is off-manifold for that dataset and khat alone understates it.
    (First seen on the 13-trial Stahl participant 22, whose amortized
    posterior legitimately reaches the clamp at 2000 draws.)
    """
    logw = np.asarray(logw, np.float64)
    bad = np.isnan(logw) | np.isposinf(logw)
    return np.where(bad, -np.inf, logw), bad.sum(axis=-1)


def psis_smooth(logw: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Pareto-smooth importance log-weights.

    ``logw``: (B, S) raw log-weights (any additive constant). Returns
    (smoothed logw, khat (B,)): the M = min(0.2 S, 3 sqrt(S)) largest
    weights per row are replaced by expected order statistics of the
    fitted generalized Pareto, truncated at the raw maximum; khat is the
    regularized tail index ((M khat + 5)/(M + 10), the 2021 paper's
    small-sample prior). khat <= 0.7 certifies the reweighted estimate.
    """
    logw = np.asarray(logw, np.float64)
    if logw.ndim == 1:
        sm, k = psis_smooth(logw[None, :])
        return sm[0], k[0]
    B, S = logw.shape
    out = logw - logw.max(axis=1, keepdims=True)             # stabilize
    M = int(min(np.ceil(0.2 * S), np.ceil(3.0 * np.sqrt(S))))
    if M < 5 or S < 16:
        return out, np.full(B, np.inf)
    order = np.argsort(out, axis=1)
    rows = np.arange(B)[:, None]
    tail_idx = order[:, -M:]                                 # ascending tail
    w_sorted = np.exp(out[rows, tail_idx])                   # (B, M)
    u = np.exp(out[np.arange(B), order[:, -M - 1]])[:, None]  # cut point
    exceed = np.maximum(w_sorted - u, 1e-300)
    xi, sigma = _gpd_fit_zhang_stephens(exceed)
    p = (np.arange(1, M + 1, dtype=np.float64) - 0.5) / M
    repl = u + _gpd_quantile(p[None, :], xi[:, None], sigma[:, None])
    repl = np.minimum(repl, np.exp(out[rows, order[:, -1:]]))
    good = np.isfinite(xi) & np.isfinite(sigma) & (sigma > 0)
    new_tail = np.where(good[:, None], np.log(np.maximum(repl, 1e-300)),
                        out[rows, tail_idx])
    smoothed = out.copy()
    smoothed[rows, tail_idx] = new_tail
    # shrink toward 0.5 with 10 pseudo-observations (Vehtari et al. 2021)
    khat = np.where(good, (M * xi + 10.0 * 0.5) / (M + 10.0), np.inf)
    return smoothed, khat


def pareto_khat(logw: np.ndarray) -> np.ndarray:
    """Tail index only (diagnostic without smoothing)."""
    return psis_smooth(logw)[1]


def weight_ess(logw: np.ndarray) -> np.ndarray:
    """Importance-weight effective sample size (Kong 1992) per row."""
    logw = np.asarray(logw, np.float64)
    if logw.ndim == 1:
        logw = logw[None, :]
    w = np.exp(logw - logw.max(axis=1, keepdims=True))
    w /= w.sum(axis=1, keepdims=True)
    return 1.0 / (w ** 2).sum(axis=1)


def weighted_moments(draws: np.ndarray, logw: np.ndarray
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Self-normalized weighted mean and SD.

    ``draws``: (B, S, P); ``logw``: (B, S). Returns ((B, P), (B, P)).
    """
    logw = np.asarray(logw, np.float64)
    w = np.exp(logw - logw.max(axis=1, keepdims=True))
    w /= w.sum(axis=1, keepdims=True)
    mean = np.einsum("bs,bsp->bp", w, draws)
    var = np.einsum("bs,bsp->bp", w,
                    (draws - mean[:, None, :]) ** 2)
    return mean, np.sqrt(var)


def importance_resample(key, draws: np.ndarray, logw: np.ndarray,
                        n_out: int) -> np.ndarray:
    """Systematic resampling of (B, S, P) draws by smoothed weights —
    returns (B, n_out, P) equal-weight draws from the corrected posterior.
    ``key``: numpy Generator or int seed."""
    rng = key if isinstance(key, np.random.Generator) \
        else np.random.default_rng(key)
    logw = np.asarray(logw, np.float64)
    B, S = logw.shape
    w = np.exp(logw - logw.max(axis=1, keepdims=True))
    w /= w.sum(axis=1, keepdims=True)
    cdf = np.cumsum(w, axis=1)
    cdf[:, -1] = 1.0
    u = (rng.uniform(size=(B, 1)) + np.arange(n_out)[None, :]) / n_out
    idx = np.stack([np.searchsorted(cdf[b], u[b]) for b in range(B)])
    idx = np.minimum(idx, S - 1)
    return np.take_along_axis(draws, idx[:, :, None], axis=1)
