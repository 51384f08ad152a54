"""MCMC convergence diagnostics: split-chain Rhat, effective sample size,
posterior summaries.

Parity with ``pyhddmjagsutils.py``: ``diagnostic()`` (:180-331), ``summary()``
(:334-388) and ``flipstanout()`` (:391-405), using the same array convention
``(dim_1, ..., dim_n, iterations, chains)``. The implementation is fully
vectorized (the reference loops variable-by-variable in Python with a
variogram while-loop); the ESS estimator follows Gelman et al. (2014)
eq. 11.7-11.8 with the same positive-pair stopping rule, computed via FFT
autocorrelation.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["split_rhat", "ess", "diagnostic", "summary", "flipstanout",
           "stuck_chains"]


def _to_matrix(x: np.ndarray) -> np.ndarray:
    """(dims..., nsamps, nchains) -> (nvars, nsamps, nchains)."""
    x = np.asarray(x, dtype=np.float64)
    return x.reshape((-1,) + x.shape[-2:])


def _split_chains(x: np.ndarray) -> np.ndarray:
    """(v, n, m) -> (v, n//2, 2m): each chain split in half
    (pyhddmjagsutils.py:237-243)."""
    v, n, m = x.shape
    h = n // 2
    return np.concatenate([x[:, :h, :], x[:, h:2 * h, :]], axis=-1)


def split_rhat(x: np.ndarray) -> np.ndarray:
    """Split-chain Gelman-Rubin Rhat over (dims..., nsamps, nchains)."""
    dims = np.asarray(x).shape[:-2]
    s = _split_chains(_to_matrix(x))
    n = s.shape[1]
    chain_mean = s.mean(axis=1)                      # (v, 2m)
    grand = chain_mean.mean(axis=1, keepdims=True)   # (v, 1)
    B = n * ((chain_mean - grand) ** 2).sum(axis=1) / (s.shape[2] - 1)
    W = s.var(axis=1, ddof=1).mean(axis=1)
    var_hat = (n - 1) / n * W + B / n
    with np.errstate(divide="ignore", invalid="ignore"):
        r = np.sqrt(var_hat / W)
    return r.reshape(dims)


def _autocov_fft(s: np.ndarray) -> np.ndarray:
    """Per-chain autocovariance via FFT; s is (v, n, m) -> (v, n, m)."""
    v, n, m = s.shape
    centered = s - s.mean(axis=1, keepdims=True)
    nfft = int(2 ** np.ceil(np.log2(2 * n)))
    f = np.fft.rfft(centered, n=nfft, axis=1)
    acov = np.fft.irfft(f * np.conj(f), n=nfft, axis=1)[:, :n, :]
    return acov / n


def ess(x: np.ndarray) -> np.ndarray:
    """Effective sample size (Gelman et al. 2014, eq. 11.8) with the
    positive-pair stopping rule the reference uses
    (pyhddmjagsutils.py:294-317), over (dims..., nsamps, nchains)."""
    dims = np.asarray(x).shape[:-2]
    s = _split_chains(_to_matrix(x))
    v, n, m = s.shape
    W = s.var(axis=1, ddof=1).mean(axis=1)                       # (v,)
    chain_mean = s.mean(axis=1)
    B_over_n = chain_mean.var(axis=1, ddof=1)
    var_hat = (n - 1) / n * W + B_over_n                          # (v,)

    acov = _autocov_fft(s).mean(axis=2)                           # (v, n)
    with np.errstate(divide="ignore", invalid="ignore"):
        rho = 1.0 - (W[:, None] - acov) / var_hat[:, None]        # (v, n)
    rho[:, 0] = 1.0

    # positive-pair rule: sum rho_t while rho_{2k} + rho_{2k+1} > 0
    tmax = n if n % 2 == 0 else n - 1
    pair = rho[:, 1:tmax - 1].reshape(v, -1, 2).sum(axis=2)       # (v, pairs)
    positive = np.cumprod(pair > 0, axis=1).astype(bool)
    tau = 1.0 + 2.0 * np.where(positive, pair, 0.0).sum(axis=1) \
        + rho[:, 0] - 1.0  # rho_0 term folded in
    n_eff = m * n / np.maximum(tau, 1e-12)
    n_eff = np.minimum(n_eff, m * n * 10.0)  # cap silly antithetic values
    return n_eff.reshape(dims)


def diagnostic(insamples: Dict[str, np.ndarray],
               verbose: bool = True) -> Dict[str, dict]:
    """Per-variable Rhat/ESS/mean/std; prints max Rhat and min Neff like
    the reference (pyhddmjagsutils.py:322-330). Keys starting with '_' are
    skipped (same convention)."""
    result = {}
    max_rhat, max_key = -np.inf, None
    min_neff, min_key = np.inf, None
    for key, x in insamples.items():
        if key.startswith("_"):
            continue
        x = np.asarray(x)
        r = split_rhat(x)
        ne = np.round(ess(x))
        flat = x.reshape(x.shape[:-2] + (-1,))
        result[key] = {
            "rhat": r, "neff": ne,
            "mean": flat.mean(axis=-1), "std": flat.std(axis=-1),
        }
        if np.nanmax(r) > max_rhat:
            max_rhat, max_key = float(np.nanmax(r)), key
        if np.nanmin(ne) < min_neff:
            min_neff, min_key = float(np.nanmin(ne)), key
    if verbose and result:
        print(f"Maximum Rhat was {max_rhat:3.2f} for variable {max_key}")
        print(f"Minimum number of effective samples was {min_neff:.0f} "
              f"for variable {min_key}")
    return result


def summary(insamples: Dict[str, np.ndarray]) -> Dict[str, dict]:
    """Posterior mean/std/median and 95%/99% credible intervals
    (pyhddmjagsutils.py:334-388)."""
    result = {}
    for key, x in insamples.items():
        if key.startswith("_"):
            continue
        x = np.asarray(x, dtype=np.float64)
        flat = x.reshape(x.shape[:-2] + (-1,))
        result[key] = {
            "mean": flat.mean(axis=-1),
            "std": flat.std(axis=-1),
            "median": np.quantile(flat, 0.5, axis=-1),
            "95lower": np.quantile(flat, 0.025, axis=-1),
            "95upper": np.quantile(flat, 0.975, axis=-1),
            "99lower": np.quantile(flat, 0.005, axis=-1),
            "99upper": np.quantile(flat, 0.995, axis=-1),
        }
    return result


def stuck_chains(logprob_fn, samples, threshold: float = 20.0,
                 tail: int = 20):
    """Identify chains stranded in a low-probability basin.

    A single stuck chain inflates split-Rhat and deflates ESS for EVERY
    parameter, which is indistinguishable from genuine multimodality in
    the Rhat number alone. This settles it by evidence: evaluate
    ``logprob_fn`` at each chain's last ``tail`` states and compare the
    per-chain mean log-posterior to the best chain. A gap larger than
    ``threshold`` nats (default 20 — far beyond MC noise of a mean over
    ``tail`` draws, tiny against real basin separations, which measured
    ~65 nats when this was built; see results/ROUND3.md) marks the chain
    stuck rather than exploring a competing mode of comparable mass.

    ``samples``: (chains, n, dim) unconstrained draws (the layout of
    ``NUTSResult.samples`` and of NUTS chunk checkpoints). Returns
    ``(stuck_mask (chains,), mean_logpost (chains,))``. Chains flagged
    here should be dropped AND disclosed; if several chains split into
    basins of similar log-posterior, that is real multimodality and no
    chain should be dropped.
    """
    import jax
    import jax.numpy as jnp

    s = np.asarray(samples)[:, -int(tail):, :]       # (C, t, dim)
    flat = jnp.asarray(s.reshape(-1, s.shape[-1]), jnp.float32)
    lp = np.asarray(jax.jit(jax.vmap(logprob_fn))(flat), np.float64)
    lp = lp.reshape(s.shape[0], s.shape[1]).mean(axis=1)
    return (lp < lp.max() - threshold), lp


def flipstanout(insamples: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Reorder (iterations, chains, dims...) -> (dims..., iterations, chains)
    (pyhddmjagsutils.py:391-405)."""
    out = {}
    for key, x in insamples.items():
        if key.startswith("_"):
            continue
        x = np.asarray(x)
        x = np.moveaxis(x, 0, -1)   # iterations to back
        x = np.moveaxis(x, 0, -1)   # chains behind iterations
        out[key] = x
    return out
