"""Exact first-passage sampler via analytic inverse-CDF — the simulator
oracle.

Capability parity with ``simulratcliff`` (``pyhddmjagsutils.py:47-176``,
the Tuerlinckx et al. 2001 rejection method with trial variability in
drift (Eta), NDT range, bias range, and diffusion coefficient Varsigma).
The reference's triple-nested rejection loops are hostile to accelerators;
here we sample EXACTLY in distribution with static shapes instead:

  1. draw per-trial drift  nu_i ~ N(Nu, Eta), bias and NDT uniform ranges;
  2. choose the boundary with the analytic absorption probability;
  3. draw the decision time from the conditional first-passage CDF by
     inverse-CDF lookup on a dense time grid of the Navarro-Fuss density
     (``mcmc/wfpt.py``), with linear interpolation.

Grid resolution controls accuracy (default 2048 points over [0, t_max]);
errors are O(grid spacing), far below the statistical noise of any test.
Used as ground truth for the EM kernel's moment tests and to generate
MCMC test data like ``basic_ddm_dc_pyjags.py:45-94`` does.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..mcmc.wfpt import wfpt_logpdf_lower

Array = jax.Array


def _p_lower(v: Array, a: Array, w: Array) -> Array:
    """Analytic P(absorb at lower bound) for unit dc.

    P(upper) = expm1(-2 v a w) / expm1(-2 v a): numerator and denominator
    always share a sign, so this is stable for either drift direction;
    the v -> 0 limit is w, and very negative drift (x2 > 30) switches to
    the asymptotic exp(x1 - x2) form to dodge f32 overflow.
    """
    x1 = -2.0 * v * a * w
    x2 = -2.0 * v * a
    small = jnp.abs(x2) < 1e-6
    big = x2 > 30.0
    x2_safe = jnp.where(small | big, 1.0, x2)
    x1_safe = jnp.where(big, 0.0, x1)
    p_up = jnp.where(
        small, w,
        jnp.where(big, jnp.exp(x1 - x2),
                  jnp.expm1(x1_safe) / jnp.expm1(x2_safe)))
    return jnp.clip(1.0 - p_up, 0.0, 1.0)


@functools.partial(jax.jit,
                   static_argnames=("n", "grid_size", "t_max"))
def simulate_exact(
    key: Array,
    n: int = 100,
    alpha: float = 1.0,
    tau: float = 0.4,
    nu: float = 1.0,
    beta: float = 0.5,
    range_tau: float = 0.0,
    range_beta: float = 0.0,
    eta: float = 0.3,
    varsigma: float = 1.0,
    grid_size: int = 2048,
    t_max: float = 20.0,
) -> Array:
    """Signed RTs (+upper / -lower), simulratcliff's output convention
    (pyhddmjagsutils.py:93-95). Parameter semantics match simulratcliff,
    including the clamps |Nu|<=5 and Eta<=3 (:102-109)."""
    nu = jnp.clip(jnp.asarray(nu, jnp.float32), -5.0, 5.0)
    eta = jnp.minimum(jnp.asarray(eta, jnp.float32), 3.0)

    k_nu, k_beta, k_tau, k_choice, k_t = jax.random.split(key, 5)
    nu_i = nu + eta * jax.random.normal(k_nu, (n,))
    beta_i = beta + range_beta * (jax.random.uniform(k_beta, (n,)) - 0.5)
    tau_i = tau + range_tau * (jax.random.uniform(k_tau, (n,)) - 0.5)

    # rescale to unit diffusion coefficient (the dc identity the whole
    # reference is about): a' = alpha/dc, v' = nu/dc
    a = alpha / varsigma
    v_i = nu_i / varsigma

    p_lo = _p_lower(v_i, a, beta_i)
    to_lower = jax.random.uniform(k_choice, (n,)) < p_lo

    # conditional FPT density on a grid, per trial (drift varies)
    ts = jnp.linspace(t_max / grid_size, t_max, grid_size)       # (G,)
    w_eff = jnp.where(to_lower, beta_i, 1.0 - beta_i)
    v_eff = jnp.where(to_lower, v_i, -v_i)
    logf = wfpt_logpdf_lower(ts[None, :], v_eff[:, None],
                             jnp.float32(a), w_eff[:, None])     # (n, G)
    pdf = jnp.exp(logf)
    # trapezoidal cumulative (a right-Riemann cumsum biases draws LOW by up
    # to one grid step); f(0) = 0 closes the first interval
    pdf_prev = jnp.concatenate(
        [jnp.zeros_like(pdf[:, :1]), pdf[:, :-1]], axis=1)
    cdf = jnp.cumsum(0.5 * (pdf + pdf_prev), axis=1)
    cdf = cdf / cdf[:, -1:]
    u = jax.random.uniform(k_t, (n, 1))
    idx = jnp.sum(cdf < u, axis=1)                               # (n,)
    idx = jnp.clip(idx, 1, grid_size - 1)
    # linear interpolation between grid points
    c_hi = jnp.take_along_axis(cdf, idx[:, None], 1)[:, 0]
    c_lo = jnp.take_along_axis(cdf, idx[:, None] - 1, 1)[:, 0]
    t_hi = ts[idx]
    t_lo = ts[idx - 1]
    frac = (u[:, 0] - c_lo) / jnp.maximum(c_hi - c_lo, 1e-12)
    t_dec = t_lo + frac * (t_hi - t_lo)

    rt = t_dec + tau_i
    return jnp.where(to_lower, -rt, rt)


def simulate_participants(key: Array, nparts: int, ntrials: int,
                          alpha: Array, tau: Array, nu: Array, beta: Array,
                          eta: Array, varsigma: Array,
                          grid_size: int = 2048) -> Array:
    """(nparts, ntrials) signed RTs with per-participant parameters — the
    MCMC test-data generator (basic_ddm_dc_pyjags.py:45-94), vmapped."""
    keys = jax.random.split(key, nparts)

    def one(k, al, ta, nu_, be, et, vs):
        return simulate_exact(k, n=ntrials, alpha=al, tau=ta, nu=nu_,
                              beta=be, eta=et, varsigma=vs,
                              grid_size=grid_size)

    return jax.vmap(one)(keys, alpha, tau, nu, beta, eta, varsigma)
