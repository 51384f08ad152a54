"""Wiener first-passage-time (WFPT) log-density in pure JAX.

TPU-native replacement for the C++ densities the reference links against:
jags-wiener's ``dwiener`` (loaded at ``basic_ddm_dc_pyjags.py:149-153``)
and Stan's ``wiener_lpdf`` wrapped by ``diffusion_lpdf``
(``basic_ddm_dc_pystan2.py:106-133``).

Density of the first passage through the LOWER bound at time t for a
Wiener process with drift v, boundary separation a, relative start w, and
unit diffusion coefficient (Navarro & Fuss 2009, J. Math. Psych.):

    f(t | v, a, w) = (1/a^2) * exp(-v*a*w - v^2 t / 2) * f_0(t/a^2 | w)

with f_0 evaluated by a small-time or large-time series. For jit we
evaluate BOTH series with fixed term counts and select via the
Navarro-Fuss accuracy criterion — branch-free, static shapes.

The free diffusion coefficient ``dc`` enters by the same rescaling the
reference uses everywhere (``basic_ddm_dc_pyjags.py:133``,
``basic_ddm_dc_pystan2.py:123-128``): a -> a/dc, v -> v/dc.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array

_K_SMALL = 10   # series terms, small-time expansion (k = -K..K over odd idx)
_K_LARGE = 10   # series terms, large-time expansion

_LOG_2PI = math.log(2.0 * math.pi)


def _fpt_small(tt: Array, w: Array) -> Array:
    """Small-time series for f_0(tt|w) * sqrt(2*pi*tt^3)-style scaling.

    f_0(tt|w) = (2*pi*tt^3)^(-1/2) * sum_k (w+2k) exp(-(w+2k)^2 / (2 tt))
    """
    ks = jnp.arange(-_K_SMALL, _K_SMALL + 1, dtype=jnp.float32)
    wk = w[..., None] + 2.0 * ks                      # (..., 2K+1)
    tt_ = tt[..., None]
    terms = wk * jnp.exp(-(wk * wk) / (2.0 * tt_))
    s = terms.sum(-1)
    dens = s / jnp.sqrt(2.0 * math.pi * tt**3)
    return jnp.maximum(dens, 0.0)


def _fpt_large(tt: Array, w: Array) -> Array:
    """Large-time series: f_0(tt|w) = pi * sum_k k exp(-k^2 pi^2 tt / 2)
    * sin(k pi w)."""
    ks = jnp.arange(1, _K_LARGE + 1, dtype=jnp.float32)
    tt_ = tt[..., None]
    terms = ks * jnp.exp(-(ks * ks) * (math.pi ** 2) * tt_ / 2.0) * \
        jnp.sin(ks * math.pi * w[..., None])
    dens = math.pi * terms.sum(-1)
    return jnp.maximum(dens, 0.0)


def _wfpt_log_lower_scaled(t: Array, delta: Array, alpha: Array, w: Array,
                           dc: Array, eps: float = 1e-29) -> Array:
    """log f(t) at the LOWER boundary for drift ``delta``, separation
    ``alpha``, relative start ``w`` and diffusion coefficient ``dc``
    (i.e. the process before the a -> a/dc, v -> v/dc rescaling).

    The small-time branch is evaluated in LOG space with the exponent of
    term k grouped exactly as

        -((w+2k)*alpha + delta*t)^2 / (2 t dc^2) + 2k*delta*alpha/dc^2

    instead of the expanded ``-v*a*w - v^2 t/2 - wk^2 a^2/(2t)``. The
    expanded form is a cancellation of +-(delta*alpha/dc^2)-scale terms
    that reach ~1e6 nats at small ``dc`` while their sum is O(1): in
    float32 the series factor underflows and the leftovers are garbage
    (measured: spurious log-densities of +1e6/trial and a fake +1e30
    posterior mode on near-deterministic datasets — results/ROUND3.md).
    Grouping keeps every catastrophic cancellation inside
    ``(w+2k)*alpha + delta*t``, an O(1)-scale sum, so the density stays
    accurate arbitrarily far into the dc -> 0 needle regime. Exact
    algebra, not an approximation; at dc = 1 it reproduces the classic
    Navarro-Fuss evaluation (tested against it).
    """
    t = jnp.asarray(t, jnp.float32)
    w = jnp.asarray(w, jnp.float32)
    delta = jnp.asarray(delta, jnp.float32)
    alpha = jnp.asarray(alpha, jnp.float32)
    dc = jnp.asarray(dc, jnp.float32)
    # broadcast everything up front: the log-space series indexes with
    # [..., None], which needs a common array shape
    t, delta, alpha, w, dc = jnp.broadcast_arrays(t, delta, alpha, w, dc)
    dc2 = dc * dc
    tt = jnp.maximum(t * dc2 / (alpha * alpha), 1e-9)  # normalized time

    # --- small-time series, signed logsumexp ----------------------------
    ks = jnp.arange(-_K_SMALL, _K_SMALL + 1, dtype=jnp.float32)
    wk = w[..., None] + 2.0 * ks                       # (..., 2K+1)
    num = wk * alpha[..., None] + (delta * t)[..., None]   # O(1) scale
    m = (jnp.log(jnp.maximum(jnp.abs(wk) * alpha[..., None], 1e-30))
         - jnp.log(dc)[..., None]
         - 1.5 * jnp.log(t)[..., None] - 0.5 * _LOG_2PI
         - num * num / (2.0 * (t * dc2))[..., None]
         + (2.0 * ks) * (delta * alpha / dc2)[..., None])
    m_max = jnp.max(m, axis=-1)
    s = jnp.sum(jnp.sign(wk) * jnp.exp(m - m_max[..., None]), axis=-1)
    log_small = m_max + jnp.log(jnp.maximum(s, 1e-30))

    # --- large-time series (only selected at tt >= 0.35, where the
    # rescaled magnitudes are moderate and linear space is safe) ---------
    f_large = _fpt_large(tt, w)
    log_large = (jnp.log(jnp.maximum(f_large, eps))
                 - jnp.log(alpha * alpha / dc2)
                 - (delta * alpha * w + delta * delta * t / 2.0) / dc2)

    # Navarro-Fuss: ks(tt) and kl(tt) term counts; prefer the cheaper one.
    # For fixed K we switch at the classic crossover tt ~ 0.35 where both
    # series are well within K=10 accuracy.
    return jnp.where(tt < 0.35, log_small, log_large)


def wfpt_logpdf_lower(t: Array, v: Array, a: Array, w: Array,
                      eps: float = 1e-29) -> Array:
    """log f(t) for absorption at the LOWER boundary at decision time t > 0,
    unit diffusion coefficient. All args broadcast."""
    one = jnp.ones((), jnp.float32)
    return _wfpt_log_lower_scaled(t, v, a, w, one, eps=eps)


def diffusion_logpdf(y: Array, boundary: Array, ndt: Array, beta: Array,
                     drift: Array, dc: Array) -> Array:
    """Log-density of a signed choice-RT observation, dcDDM parameterization.

    ``y`` = rt * choice (positive = upper boundary, negative = lower), the
    reference's data convention (``basic_ddm_dc_pyjags.py:74``). Mirrors the
    Stan ``diffusion_lpdf`` exactly (``basic_ddm_dc_pystan2.py:119-131``):

      * |y| < ndt is remapped to decision time 1e-4 (the reference evaluates
        at ter + 1e-4, i.e. decision time 1e-4) PLUS a steep linear penalty
        -1e4 * (ndt - |y|). The remap alone (pystan2:122-124) leaves the
        density FINITE and tunable in the impossible region, which creates a
        spurious global mode at ndt > max|y| (every trial evaluated at
        t_dec = 1e-4 with boundary/dc and beta driven to the corner where
        that density is enormous — observed: flagship NUTS chains converging
        to ter ~ 1.5 with all RTs < 1.2). Stan's real wiener_lpdf and JAGS
        dwiener simply REJECT rt <= ndt; the penalty is that rejection made
        HMC-differentiable, and is identically ZERO whenever ndt < |y| for
        every trial, i.e. in the entire support of the true posterior;
      * upper-boundary hits use the reflection (w -> 1-w, v -> -v);
      * dc rescaling: a/dc, v/dc — applied INSIDE the log-space density
        (``_wfpt_log_lower_scaled``) where the dc -> 0 cancellations are
        grouped exactly; prescaling here would reintroduce the float32
        breakdown the grouped form removes.
    """
    rt = jnp.abs(y)
    t_dec = jnp.maximum(rt - ndt, 1e-4)   # |y| < ter guard (pystan2:122-124)
    penalty = -1e4 * jnp.maximum(ndt - rt, 0.0)
    upper = y >= 0
    # lower-boundary density of the (possibly reflected) process
    w = jnp.where(upper, 1.0 - beta, beta)
    vv = jnp.where(upper, -drift, drift)
    return _wfpt_log_lower_scaled(t_dec, vv, boundary, w, dc) + penalty


def wfpt_logpdf(t: Array, choice: Array, drift: Array, boundary: Array,
                beta: Array, ndt: Array, dc: Array) -> Array:
    """Convenience wrapper over decision-time/choice encoding
    (choice in {-1, +1})."""
    y = jnp.where(choice > 0, t, -t)
    return diffusion_logpdf(y, boundary, ndt, beta, drift, dc)


# ---------------------------------------------------------------------------
# Gaussian-drift-marginal WFPT (the classic full-DDM eta extension)
# ---------------------------------------------------------------------------
#
# In the Navarro-Fuss form the trial drift delta enters the lower-boundary
# density ONLY through the factor exp(-delta*A - delta^2*B) with
# A = a*w/dc^2 and B = t/(2 dc^2); the series part f_0 is drift-free. So
# for trial drifts delta ~ N(m, s2) (the law of basic_ddm_eta_dc.py:81-107
# and single_trial_drift{,2}.py — an UNtruncated normal), the marginal over
# delta is the drift-0 density times a closed-form Gaussian integral:
#
#   E_delta[exp(-delta*A - delta^2*B)]
#     = (1 + 2 B s2)^(-1/2) * exp((A^2 s2 - 2 m A - 2 B m^2)/(2(1+2B s2)))
#
# (complete the square; finite for all s2 >= 0 since B > 0). This is the
# classic closed form behind the "full DDM" eta extension (Tuerlinckx 2004);
# the drift-0 part reuses the log-space-grouped series above, so the
# needle-regime (dc -> 0) hardening carries over unchanged.


def _gaussian_drift_factor(A: Array, B: Array, m: Array, s2: Array) -> Array:
    """log E_{delta ~ N(m, s2)}[exp(-delta*A - delta^2*B)] (exact)."""
    den = 1.0 + 2.0 * B * s2
    return (-0.5 * jnp.log(den)
            + (A * A * s2 - 2.0 * m * A - 2.0 * B * m * m) / (2.0 * den))


def diffusion_eta_logpdf(y: Array, boundary: Array, ndt: Array, beta: Array,
                         mu_drift: Array, eta: Array, dc: Array) -> Array:
    """Marginal log-density of a signed choice-RT under trial drift
    variability: delta_i ~ N(mu_drift, eta), observation y = rt * choice.

    Exact marginal of the ``basic_ddm_eta_dc`` generative model
    (``retired_models/basic_ddm_eta_dc.py:81-107``); the reference never
    had an exact-likelihood backend for any eta model. Same |y| < ndt
    guard-and-penalty semantics as :func:`diffusion_logpdf`.

    Upper-boundary hits use the reflection (w -> 1-w) under which the
    trial drift reflects too: delta -> -delta, i.e. m -> -m with eta
    unchanged.
    """
    rt = jnp.abs(y)
    t_dec = jnp.maximum(rt - ndt, 1e-4)
    penalty = -1e4 * jnp.maximum(ndt - rt, 0.0)
    upper = y >= 0
    w = jnp.where(upper, 1.0 - beta, beta)
    m = jnp.where(upper, -mu_drift, mu_drift)
    zero = jnp.zeros((), jnp.float32)
    log_f0 = _wfpt_log_lower_scaled(t_dec, zero, boundary, w, dc)
    dc2 = dc * dc
    A = boundary * w / dc2
    B = t_dec / (2.0 * dc2)
    return log_f0 + _gaussian_drift_factor(A, B, m, eta * eta) + penalty


def diffusion_eta_cov_logpdf(y: Array, ext: Array, boundary: Array,
                             ndt: Array, beta: Array, mu_drift: Array,
                             eta: Array, dc: Array, sigma1: Array,
                             observed: Array | None = None) -> Array:
    """Joint marginal log-density of (signed choice-RT, drift covariate)
    with the trial drift integrated out — the ``single_trial_drift2``
    observation model (``retired_models/single_trial_drift2.py``, channel
    ``ext_i ~ N(delta_i, sigma1)``, ``single_trial_drift.py:126-156``).

    Marginalizing delta_i ~ N(mu_drift, eta^2) jointly over both channels
    stays closed-form: the covariate contributes the evidence factor
    N(ext; mu_drift, eta^2 + sigma1^2) and updates the drift law to
    N(m*, s*^2) with 1/s*^2 = 1/eta^2 + 1/sigma1^2 and
    m* = s*^2 (mu/eta^2 + ext/sigma1^2), which then enters the same
    Gaussian-drift factor as :func:`diffusion_eta_logpdf`.

    ``observed`` (bool, optional): trials whose walk hit the step cap
    (choice 0 in the simulator, ``basic_ddm_dc.py:111``) have no RT
    density; following the flagship marginal's convention
    (``make_logprob_flagship_marginal``) they contribute their covariate
    evidence term ONLY. Pass ``observed = (choice != 0)`` and the Wiener
    part is masked out for capped trials while the evidence part is kept.
    """
    rt = jnp.abs(y)
    t_dec = jnp.maximum(rt - ndt, 1e-4)
    penalty = -1e4 * jnp.maximum(ndt - rt, 0.0)
    eta2 = eta * eta
    s1_2 = sigma1 * sigma1
    tot = eta2 + s1_2
    # covariate evidence: ext ~ N(mu_drift, eta^2 + sigma1^2)
    resid = ext - mu_drift
    log_ev = -0.5 * (_LOG_2PI + jnp.log(tot)) - resid * resid / (2.0 * tot)
    # conditional drift law given ext
    s_star2 = eta2 * s1_2 / tot
    m_star = (mu_drift * s1_2 + ext * eta2) / tot
    upper = y >= 0
    w = jnp.where(upper, 1.0 - beta, beta)
    m = jnp.where(upper, -m_star, m_star)
    zero = jnp.zeros((), jnp.float32)
    log_f0 = _wfpt_log_lower_scaled(t_dec, zero, boundary, w, dc)
    dc2 = dc * dc
    A = boundary * w / dc2
    B = t_dec / (2.0 * dc2)
    wiener = log_f0 + _gaussian_drift_factor(A, B, m, s_star2) + penalty
    if observed is not None:
        wiener = jnp.where(observed, wiener, 0.0)
    return log_ev + wiener
