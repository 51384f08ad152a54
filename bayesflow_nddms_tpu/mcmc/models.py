"""Hierarchical dcDDM posteriors for the exact-likelihood MCMC backend.

Rebuilds the reference's JAGS/Stan models as JAX log-densities:

  * ``hierarchical_dcddm``: per-participant (alpha, ndt, beta, delta,
    varsigma) with the priors of ``basic_ddm_dc_pyjags.py:103-137`` /
    ``basic_ddm_dc_pystan2.py:140-176`` and the dwiener likelihood with
    /dc rescaling (pyjags line 133).
  * ``hierarchical_dcddm_covariate``: adds the participant-level external
    covariate ``extdata[p] ~ N(1*alpha[p], sigma^2)`` with
    sigma ~ TN(3,1,[0,10]) — the joint model of ``alpha_not_scaled.py:
    138-181`` (covariate line :165).

Sampling runs in unconstrained space; each bounded parameter uses a
sigmoid reparameterization whose log-Jacobian is included, so the HMC
sampler (``mcmc/hmc.py``) needs no constraint handling.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import dists
from .wfpt import diffusion_logpdf

Array = jax.Array

_PARAM_ORDER = ("alpha", "ndt", "beta", "delta", "varsigma")
_BOUNDS = {"alpha": (0.0, 10.0), "ndt": (0.0, 1.5), "beta": (0.0, 1.0),
           "varsigma": (0.0, 10.0), "sigma": (0.0, 10.0)}

_PRIORS = {
    "alpha": dists.truncnorm(1.0, 0.5, 0.0, 10.0),
    "ndt": dists.truncnorm(0.5, 0.25, 0.0, 1.5),
    "beta": dists.beta(2.0, 2.0),
    "delta": dists.normal(0.0, 2.0),
    "varsigma": dists.truncnorm(1.0, 0.5, 0.0, 10.0),
    "sigma": dists.truncnorm(3.0, 1.0, 0.0, 10.0),  # alpha_not_scaled.py:142
}


def _sigmoid_transform(z: Array, low: float, high: float):
    """Unconstrained z -> (low, high), returning (x, log|dx/dz|)."""
    s = jax.nn.sigmoid(z)
    x = low + (high - low) * s
    log_jac = math.log(high - low) + jax.nn.log_sigmoid(z) + \
        jax.nn.log_sigmoid(-z)
    return x, log_jac


class DcDDMData(NamedTuple):
    y: Array              # (N,) signed choice-RT
    participant: Array    # (N,) int32 in [0, nparts)
    nparts: int
    extdata: Optional[Array] = None   # (nparts,) covariate or None


def make_logprob(data: DcDDMData, parameterization: str = "natural"):
    """Returns (logprob_fn, unflatten, dim) for HMC over the flattened
    unconstrained parameter vector.

    ``parameterization``:

      * ``"natural"`` — per-parameter sigmoid transforms (the round-1
        coordinates). The alpha/varsigma scale ridge (the likelihood only
        constrains alpha/varsigma and delta/varsigma, pyjags:133) is a
        CURVED valley in these coordinates, so even a dense mass matrix
        mixes it slowly (measured: Rhat ~6 at a 1800-transition budget).
      * ``"ridge"`` — likelihood-aligned coordinates per participant:
        u1 = log(alpha/varsigma), u2 = log(varsigma), u3 = delta/varsigma.
        The likelihood depends only on (u1, u3, ndt, beta); u2 appears in
        the prior alone, so its conditional is smooth and unimodal and the
        ridge is EXACTLY a coordinate axis. Priors stay the model's
        (alpha, varsigma, delta) TN/normal densities, with the smooth
        normal pdf standing in for TN[0,10] (the upper truncation holds
        ~1e-80 prior mass) and log-Jacobian log(alpha) + 2 log(varsigma).
    """
    P = data.nparts
    has_cov = data.extdata is not None
    dim = 5 * P + (1 if has_cov else 0)
    assert parameterization in ("natural", "ridge")

    def unflatten(z: Array):
        out = {}
        for i, name in enumerate(_PARAM_ORDER):
            out[name] = z[i * P:(i + 1) * P]
        if has_cov:
            out["sigma"] = z[5 * P]
        return out

    def constrain(raw):
        """Map unconstrained values to the model space + total Jacobian."""
        th, jac = {}, 0.0
        if parameterization == "ridge":
            # raw slots: alpha->u1, varsigma->u2, delta->u3
            u1, u2, u3 = raw["alpha"], raw["varsigma"], raw["delta"]
            varsigma = jnp.exp(u2)
            alpha = jnp.exp(u1 + u2)
            delta = u3 * varsigma
            th["alpha"], th["varsigma"], th["delta"] = alpha, varsigma, delta
            jac = jac + jnp.sum(jnp.log(alpha) + 2.0 * u2)
            rest = ("ndt", "beta")
        else:
            th["delta"] = raw["delta"]
            rest = ("alpha", "varsigma", "ndt", "beta")
        if "sigma" in raw:
            rest = rest + ("sigma",)
        for name in rest:
            lo, hi = _BOUNDS[name]
            x, j = _sigmoid_transform(raw[name], lo, hi)
            th[name] = x
            jac = jac + jnp.sum(j)
        return th, jac

    def _prior_lp(name, x):
        if parameterization == "ridge" and name in ("alpha", "varsigma"):
            # smooth untruncated normal pdf, mean 1 sd .5 (see docstring)
            return jnp.sum(-0.5 * ((x - 1.0) / 0.5) ** 2
                           - math.log(0.5) - 0.5 * math.log(2 * math.pi))
        return jnp.sum(_PRIORS[name].log_prob(x))

    def logprob(z: Array) -> Array:
        raw = unflatten(z)
        th, jac = constrain(raw)
        lp = jac
        # priors (basic_ddm_dc_pyjags.py:112-124). Truncation normalizers
        # are parameter-independent constants here, so plain pdfs suffice.
        for name in _PARAM_ORDER:
            lp = lp + _prior_lp(name, th[name])
        if has_cov:
            lp = lp + _PRIORS["sigma"].log_prob(th["sigma"])
            # extdata[p] ~ N(1*alpha[p], sigma^2) (alpha_not_scaled.py:165)
            resid = (data.extdata - th["alpha"]) / th["sigma"]
            lp = lp + jnp.sum(-0.5 * resid**2 - jnp.log(th["sigma"])
                              - 0.5 * math.log(2 * math.pi))
        # Wiener likelihood with /dc rescaling (pyjags:133)
        idx = data.participant
        ll = diffusion_logpdf(
            data.y, th["alpha"][idx], th["ndt"][idx], th["beta"][idx],
            th["delta"][idx], th["varsigma"][idx])
        return lp + jnp.sum(ll)

    return logprob, unflatten, dim


def initial_positions(key: Array, data: DcDDMData, n_chains: int,
                      min_rt: Optional[Array] = None,
                      parameterization: str = "natural") -> Array:
    """Random overdispersed inits mirroring the reference's chain inits
    (``basic_ddm_dc_pyjags.py:186-197``): ndt below min RT / 2."""
    P = data.nparts
    has_cov = data.extdata is not None
    dim = 5 * P + (1 if has_cov else 0)

    def logit(x, lo, hi):
        p = (x - lo) / (hi - lo)
        p = jnp.clip(p, 1e-4, 1 - 1e-4)
        return jnp.log(p) - jnp.log1p(-p)

    keys = jax.random.split(key, 6)
    alpha = jax.random.uniform(keys[0], (n_chains, P), minval=0.5, maxval=2.0)
    if min_rt is None:
        ndt = jax.random.uniform(keys[1], (n_chains, P), minval=0.1,
                                 maxval=0.4)
    else:
        ndt = jax.random.uniform(keys[1], (n_chains, P), minval=0.02,
                                 maxval=1.0) * (min_rt[None, :] / 2.0)
    beta = jax.random.uniform(keys[2], (n_chains, P), minval=0.2, maxval=0.8)
    delta = jax.random.uniform(keys[3], (n_chains, P), minval=-3.0,
                               maxval=3.0)
    varsigma = jax.random.uniform(keys[4], (n_chains, P), minval=0.5,
                                  maxval=2.0)
    if parameterization == "ridge":
        cols = [jnp.log(alpha / varsigma), logit(ndt, 0, 1.5),
                logit(beta, 0, 1), delta / varsigma, jnp.log(varsigma)]
    else:
        cols = [logit(alpha, 0, 10), logit(ndt, 0, 1.5), logit(beta, 0, 1),
                delta, logit(varsigma, 0, 10)]
    z = jnp.concatenate(cols, axis=1)
    if has_cov:
        sigma = jax.random.uniform(keys[5], (n_chains, 1), minval=0.5,
                                   maxval=3.0)
        z = jnp.concatenate([z, logit(sigma, 0, 10)], axis=1)
    return z


def samples_to_dict(samples: Array, data: DcDDMData,
                    parameterization: str = "natural") -> dict:
    """(chains, n_samples, dim) unconstrained -> dict of constrained arrays
    in the reference layout (dims..., nsamps, nchains) for diagnostics."""
    P = data.nparts
    has_cov = data.extdata is not None
    out = {}
    C, S, _ = samples.shape

    def constrain_block(block, name):
        if name == "delta":
            return block
        lo, hi = _BOUNDS[name]
        return lo + (hi - lo) * jax.nn.sigmoid(block)

    blocks = {name: samples[..., i * P:(i + 1) * P]
              for i, name in enumerate(_PARAM_ORDER)}    # (C, S, P) each
    if parameterization == "ridge":
        varsigma = jnp.exp(blocks["varsigma"])
        constrained = {
            "alpha": jnp.exp(blocks["alpha"]) * varsigma,
            "varsigma": varsigma,
            "delta": blocks["delta"] * varsigma,
            "ndt": constrain_block(blocks["ndt"], "ndt"),
            "beta": constrain_block(blocks["beta"], "beta"),
        }
    else:
        constrained = {name: constrain_block(blocks[name], name)
                       for name in _PARAM_ORDER}
    for name in _PARAM_ORDER:
        out[name] = jnp.moveaxis(constrained[name],
                                 (0, 1, 2), (2, 1, 0))   # (P, S, C)
    if has_cov:
        x = constrain_block(samples[..., 5 * P], "sigma")  # (C, S)
        out["sigma"] = jnp.moveaxis(x, (0, 1), (1, 0))     # (S, C)
    return {k: jnp.asarray(v) for k, v in out.items()}


# ---------------------------------------------------------------------------
# Exact-likelihood flagship model (trial-level boundary variability)
# ---------------------------------------------------------------------------

_FLAG_ORDER = ("drift", "mu_alpha", "beta", "ter", "std_alpha", "dc",
               "sigma1")
_FLAG_BOUNDS = {"mu_alpha": (0.0, 10.0), "beta": (0.0, 1.0),
                "ter": (0.0, 1.5), "std_alpha": (0.0, 3.0),
                "dc": (0.0, 10.0), "sigma1": (0.0, 5.0)}
_FLAG_PRIORS = {
    "drift": dists.normal(0.0, 2.0),
    "mu_alpha": dists.truncnorm(1.0, 0.5, 0.0, 10.0),
    "beta": dists.beta(2.0, 2.0),
    "ter": dists.truncnorm(0.5, 0.25, 0.0, 1.5),
    "std_alpha": dists.truncnorm(1.0, 0.5, 0.0, 3.0),
    "dc": dists.truncnorm(1.0, 0.5, 0.0, 10.0),
    "sigma1": dists.uniform(0.0, 5.0),
}


def _smooth_normal_lp(x):
    """Smooth untruncated N(1, .5) pdf standing in for TN(1, .5, [0, hi])
    in exp coordinates (the unreachable truncations hold <= 3e-5 mass)."""
    return jnp.sum(-0.5 * ((x - 1.0) / 0.5) ** 2
                   - math.log(0.5) - 0.5 * math.log(2.0 * math.pi))


def _flagship_globals_lp(raw, ridge: bool):
    """Constrain the 7 flagship global blocks and accumulate their prior +
    transform-Jacobian log-density. Shared by the latent-boundary posterior
    (``make_logprob_flagship``) and the marginalized one
    (``make_logprob_flagship_marginal``)."""
    if ridge:
        # raw slots: drift -> drift/dc, mu_alpha -> log(mu_alpha/dc),
        # std_alpha -> log(std_alpha/dc), dc -> log dc
        dc = jnp.exp(raw["dc"])
        th = {"dc": dc,
              "drift": raw["drift"] * dc,
              "mu_alpha": jnp.exp(raw["mu_alpha"]) * dc,
              "std_alpha": jnp.exp(raw["std_alpha"]) * dc}
        # triangular Jacobian of (drift/dc, log(mu/dc), log(std/dc),
        # log dc) -> (drift, mu_alpha, std_alpha, dc)
        lp = jnp.sum(jnp.log(th["mu_alpha"]) + jnp.log(th["std_alpha"])
                     + 2.0 * raw["dc"])
        lp = (lp + jnp.sum(_FLAG_PRIORS["drift"].log_prob(th["drift"]))
              + _smooth_normal_lp(th["mu_alpha"])
              + _smooth_normal_lp(th["std_alpha"])
              + _smooth_normal_lp(th["dc"]))
        sigmoid_names = ("beta", "ter", "sigma1")
    else:
        th = {"drift": raw["drift"]}
        lp = jnp.sum(_FLAG_PRIORS["drift"].log_prob(th["drift"]))
        sigmoid_names = _FLAG_ORDER[1:]
    for name in sigmoid_names:
        lo, hi = _FLAG_BOUNDS[name]
        x, j = _sigmoid_transform(raw[name], lo, hi)
        th[name] = x
        lp = lp + jnp.sum(j) + jnp.sum(_FLAG_PRIORS[name].log_prob(x))
    return th, lp


class FlagshipData(NamedTuple):
    """Per-trial observations of ``single_trial_alpha_not_scaled`` datasets.

    ``y``: signed choice-RT; ``ext``: raw covariate channel; ``valid``:
    False for capped/missing trials, whose Wiener term is excluded (their
    covariate still informs the latent boundary).
    """

    y: Array               # (N,)
    ext: Array             # (N,)
    participant: Array     # (N,) int32 in [0, nparts)
    nparts: int
    valid: Array           # (N,) bool


def make_logprob_flagship(data: FlagshipData,
                          parameterization: str = "natural"):
    """Exact posterior of the FLAGSHIP generative model — a check no
    reference backend has: JAGS/Stan were only ever run on the dcDDM
    (``basic_ddm_dc_pyjags.py``); the trial-level-variability models were
    validated by simulation only (``single_trial_alpha_not_scaled.py``).

    Model (single_trial_alpha_not_scaled.py:107-142): per dataset p,
    ``bound_i ~ TN+(mu_alpha_p, std_alpha_p)``, ``ext_i ~ N(bound_i,
    sigma1_p)``, ``(rt, choice)_i ~ DDM(drift_p, bound_i, beta_p, ter_p,
    dc_p)``. The per-trial latent boundaries are sampled jointly with the
    globals in QUANTILE space: latent ``u_i`` has a uniform prior and
    ``bound_i`` is the TN+ inverse-CDF of ``u_i`` given the globals. This
    fully non-centers the hierarchy (no funnel) and makes every coordinate
    O(1), so unit mass + dual-averaged step size mix well.

    ``parameterization``:

      * ``"natural"`` — per-parameter sigmoid transforms.
      * ``"ridge"`` — the flagship analog of the dcDDM ridge coordinates:
        the Wiener density is invariant under joint rescaling of
        (drift, bound_i, dc), and since the TN+ quantile transform gives
        ``bound_i = dc * (mu~ + std~ * ndtri(q))`` with the quantile
        depending only on mu/std, the likelihood-invariant scale ridge is
        the exact coordinate axis ``c = log dc`` under
        (drift/dc, log(mu_alpha/dc), log(std_alpha/dc), log dc).
        ``c`` is then informed only by the ext channel and the priors —
        a smooth unimodal conditional — instead of dragging every chain
        along a curved 4-parameter valley. Priors for mu_alpha /
        std_alpha / dc use the smooth untruncated N(1, .5) pdf: exp
        coordinates keep them positive, so it differs from the TN pdf
        only by a constant (the unreachable upper truncations hold
        <= 3e-5 prior mass).

    Returns (logprob_fn, unflatten, dim); layout = 7 global blocks of
    ``nparts`` followed by the ``N`` latents.
    """
    from jax.scipy.special import ndtr, ndtri

    assert parameterization in ("natural", "ridge")
    ridge = parameterization == "ridge"
    P = data.nparts
    N = int(data.y.shape[0])
    dim = 7 * P + N
    idx = data.participant
    # Wiener-term inputs for masked trials must stay in the smooth region
    # (|y| > any reachable ter); the term itself is zeroed below.
    y_safe = jnp.where(data.valid, data.y, 2.0)

    def unflatten(z: Array):
        out = {name: z[i * P:(i + 1) * P]
               for i, name in enumerate(_FLAG_ORDER)}
        out["u"] = z[7 * P:]
        return out

    def logprob(z: Array) -> Array:
        raw = unflatten(z)
        th, lp = _flagship_globals_lp(raw, ridge)
        # latent boundaries via the TN+ quantile transform; uniform prior
        # on u contributes only the sigmoid Jacobian
        uz = raw["u"]
        s = jax.nn.sigmoid(uz)
        lp = lp + jnp.sum(jax.nn.log_sigmoid(uz) + jax.nn.log_sigmoid(-uz))
        mu = th["mu_alpha"][idx]
        sd = th["std_alpha"][idx]
        p_lo = ndtr(-mu / sd)
        pq = jnp.clip(p_lo + s * (1.0 - p_lo), 1e-7, 1.0 - 1e-7)
        bound = jnp.maximum(mu + sd * ndtri(pq), 1e-4)
        # covariate channel: ext_i ~ N(bound_i, sigma1)
        # (single_trial_alpha_not_scaled.py:134)
        s1 = th["sigma1"][idx]
        resid = (data.ext - bound) / s1
        lp = lp + jnp.sum(-0.5 * resid * resid - jnp.log(s1)
                          - 0.5 * math.log(2.0 * math.pi))
        # Wiener likelihood per trial with its own latent boundary
        ll = diffusion_logpdf(y_safe, bound, th["ter"][idx],
                              th["beta"][idx], th["drift"][idx],
                              th["dc"][idx])
        lp = lp + jnp.sum(jnp.where(data.valid, ll, 0.0))
        return lp

    return logprob, unflatten, dim


def make_logprob_flagship_marginal(data: FlagshipData,
                                   parameterization: str = "natural",
                                   n_quad: int = 24):
    """Exact flagship posterior with the per-trial latent boundary
    INTEGRATED OUT — dim drops from ``7 P + N_trials`` to ``7 P``.

    The trial-level boundary prior TN+(mu_a, std_a) and the Gaussian
    covariate channel ``ext_i ~ N(bound_i, sigma1)``
    (single_trial_alpha_not_scaled.py:107-142) combine ANALYTICALLY by
    precision-weighting into a new truncated normal:

        TN+(b; mu, sd) * N(ext; b, s1) = Z * TN+(b; m*, s*)

    with ``1/s*^2 = 1/sd^2 + 1/s1^2``, ``m* = s*^2 (mu/sd^2 + ext/s1^2)``
    and evidence ``Z = N(ext; mu, sqrt(sd^2+s1^2)) Phi(m*/s*) / Phi(mu/sd)``.
    The only non-analytic factor left per trial is the smooth 1-D integral
    ``E_{b ~ TN+(m*, s*)}[wfpt(y | b)]``, evaluated by ``n_quad``-node
    Gauss-Legendre quadrature on the TN+ quantile scale (nodes are exact
    quantiles of the conditional, so the integrand is the slowly-varying
    WFPT density alone — 24 nodes give ~1e-6 relative accuracy, tested
    against brute-force Monte Carlo in tests/test_mcmc.py).

    Against the latent-space posterior this is the classic Rao-Blackwell
    trade: NUTS runs over 7 P coordinates instead of 7 P + N, each leapfrog
    costs N * n_quad WFPT evaluations (perfectly vectorized on the TPU),
    and the dense-mass machinery becomes affordable at any dataset count.
    Capped/missing trials contribute their evidence term Z only, exactly as
    the latent version excludes their Wiener factor but keeps the covariate
    channel.

    Returns (logprob_fn, unflatten, dim) with the same global layout as
    ``make_logprob_flagship`` (7 blocks of ``nparts``), so
    ``flagship_samples_to_dict`` and ``flagship_initial_positions`` (with
    ``include_latents=False``) work unchanged.
    """
    assert parameterization in ("natural", "ridge")
    ridge = parameterization == "ridge"
    P = data.nparts
    dim = 7 * P
    y_safe = jnp.where(data.valid, data.y, 2.0)
    u_nodes, log_w = quadrature_rule(n_quad)

    def unflatten(z: Array):
        return {name: z[i * P:(i + 1) * P]
                for i, name in enumerate(_FLAG_ORDER)}

    def logprob(z: Array) -> Array:
        raw = unflatten(z)
        th, lp = _flagship_globals_lp(raw, ridge)
        return lp + flagship_marginal_loglik(th, data, u_nodes, log_w,
                                             y_safe=y_safe)

    return logprob, unflatten, dim


def make_logprob_flagship_marginal_batched(adata: Array, amask: Array,
                                           n_quad: int = 24):
    """Per-chain-context marginal targets (NATURAL coordinates) for a
    padded batch of single flagship datasets — the plain-coordinate twin
    of ``neutra.make_logprob_flagship_neutra_batched`` for
    ``nuts.run_chains_chunked(ctx=...)``.

    ``adata (D, N_pad, C)`` / ``amask (D, N_pad)`` in the amortizer's
    layout (channel 0 = signed choicert, 1 = covariate). Returns
    ``(logprob, push, ctx, dim=7)``: ``logprob(z, ctx_d)`` is dataset
    d's ``make_logprob_flagship_marginal`` (P=1, natural) up to the
    capped-trial convention — capped trials keep their evidence term Z,
    exactly as the marginal likelihood defines it; padding rows are
    excluded wholesale. ``push(z)`` maps natural z of any leading shape
    to constrained theta in spec order (data-free bounds transform).

    This is the refit tier for datasets whose SATURATED khat says the
    flow transport itself is broken (measured: NeuTra inherits the
    breakage there, ROUND3.md) — plain coordinates depend on nothing
    the flow got wrong."""
    y = adata[..., 0]
    valid = amask & (y != 0.0)
    ctx = {"y": jnp.where(valid, y, 2.0), "ext": adata[..., 1],
           "valid": valid, "pad": amask}
    u_nodes, log_w = quadrature_rule(n_quad)

    def push(z: Array) -> Array:
        cols = [z[..., 0]]
        for i, name in enumerate(_FLAG_ORDER[1:], start=1):
            lo, hi = _FLAG_BOUNDS[name]
            cols.append(lo + (hi - lo) * jax.nn.sigmoid(z[..., i]))
        return jnp.stack(cols, axis=-1)

    def logprob(z: Array, c) -> Array:
        raw = {name: z[i:i + 1] for i, name in enumerate(_FLAG_ORDER)}
        th, lp = _flagship_globals_lp(raw, False)
        ll = flagship_marginal_trial_ll(
            c["y"], c["ext"], c["valid"], th["mu_alpha"],
            th["std_alpha"], th["sigma1"], th["ter"], th["beta"],
            th["drift"], th["dc"], u_nodes, log_w)
        return lp + jnp.sum(jnp.where(c["pad"], ll, 0.0))

    return logprob, push, ctx, 7


_DCDDM_SPEC_TO_MCMC = ("delta", "alpha", "beta", "ndt", "varsigma")


def make_logprob_dcddm_plain_batched(adata: Array, amask: Array):
    """Per-chain-context plain (natural-coordinate) dcDDM targets for a
    padded batch of single datasets — the dcDDM twin of
    ``make_logprob_flagship_marginal_batched``. z follows SPEC order
    (drift, alpha, beta, ter, dc); priors and bounds are the shared
    ``basic_ddm_dc_pyjags.py:112-133`` semantics (`_PRIORS`/`_BOUNDS`).
    Capped/missing trials (choice 0) and padding rows are excluded from
    the WFPT sum, matching ``make_logprob`` per participant."""
    rt, choice = adata[..., 0], adata[..., 1]
    valid = amask & (choice != 0.0)
    ctx = {"y": jnp.where(valid, rt * choice, 2.0), "valid": valid}

    def push(z: Array) -> Array:
        cols = []
        for j, name in enumerate(_DCDDM_SPEC_TO_MCMC):
            if name == "delta":
                cols.append(z[..., j])
            else:
                lo, hi = _BOUNDS[name]
                cols.append(lo + (hi - lo) * jax.nn.sigmoid(z[..., j]))
        return jnp.stack(cols, axis=-1)

    def logprob(z: Array, c) -> Array:
        lp = 0.0
        th = []
        for j, name in enumerate(_DCDDM_SPEC_TO_MCMC):
            if name == "delta":
                x = z[j]
            else:
                lo, hi = _BOUNDS[name]
                x, jac = _sigmoid_transform(z[j], lo, hi)
                lp = lp + jac
            lp = lp + _PRIORS[name].log_prob(x)
            th.append(x)
        ll = diffusion_logpdf(c["y"], th[1], th[3], th[2], th[0], th[4])
        return lp + jnp.sum(jnp.where(c["valid"], ll, 0.0))

    return logprob, push, ctx, 5


# ---------------------------------------------------------------------------
# Spec-driven batched targets for the Gaussian-drift-marginal (eta) family
# ---------------------------------------------------------------------------


def _spec_push_prior(spec):
    """Generic unconstrained-coordinate machinery from a ModelSpec's own
    prior list: bounded supports get the sigmoid transform, unbounded ones
    the identity. Returns (push, prior_lp) with ``push(z[..., P]) ->
    theta`` in spec order and ``prior_lp(z[P]) -> scalar`` including the
    transform Jacobians. Requires independent marginal priors
    (``spec.prior_transform is None``)."""
    assert spec.prior_transform is None, spec.name
    bounds = [d.support for d in spec.prior]

    def push(z: Array) -> Array:
        cols = []
        for j, (lo, hi) in enumerate(bounds):
            if np.isfinite(lo) and np.isfinite(hi):
                cols.append(lo + (hi - lo) * jax.nn.sigmoid(z[..., j]))
            else:
                cols.append(z[..., j])
        return jnp.stack(cols, axis=-1)

    def prior_lp(z: Array):
        lp = 0.0
        th = []
        for j, ((lo, hi), d) in enumerate(zip(bounds, spec.prior)):
            if np.isfinite(lo) and np.isfinite(hi):
                x, jac = _sigmoid_transform(z[j], lo, hi)
                lp = lp + jac
            else:
                x = z[j]
            lp = lp + d.log_prob(x)
            th.append(x)
        return th, lp

    return push, prior_lp


def exact_loglik_ctx(name: str, adata: Array, amask: Array,
                     n_quad: int = 24):
    """Shared exact-likelihood registry over the amortizer data layout.

    ``adata (D, N_pad, C)`` / ``amask (D, N_pad)`` -> ``(ctx, ll_fn)``
    where ``ctx`` holds one dataset per leading row and
    ``ll_fn(theta_cols, ctx_d)`` returns dataset d's summed exact
    log-likelihood at ``theta_cols`` (a sequence of per-parameter values
    in SPEC order; each entry may carry leading batch dims that broadcast
    against the trial axis added here). Backs the plain batched targets,
    the generic NeuTra targets, and ``inference.amortized_logw`` for
    every model with a closed-form likelihood:

      * ``basic_ddm_dc`` — WFPT (channels rt, choice; capped excluded);
      * ``basic_ddm_eta_dc`` — Gaussian-drift-marginal WFPT
        (``wfpt.diffusion_eta_logpdf``; capped excluded);
      * ``single_trial_drift2`` — joint (choicert, drift covariate)
        Gaussian-drift marginal (``wfpt.diffusion_eta_cov_logpdf``;
        capped trials keep their covariate evidence term, the flagship-
        marginal convention);
      * ``single_trial_drift_dc_base`` — trial drifts integrated out in
        closed form AND trial dc ~ TN+(mu_dc, var_dc) integrated by
        ``n_quad``-node quantile-space Gauss-Legendre quadrature (the
        flagship-marginal technique applied to the dc latent;
        retired_models/single_trial_drift_dc_base.py never had ANY
        exact backend).
    """
    if name in ("basic_ddm_dc", "basic_ddm_eta_dc"):
        rt, choice = adata[..., 0], adata[..., 1]
        valid = amask & (choice != 0.0)
        ctx = {"y": jnp.where(valid, rt * choice, 2.0), "valid": valid}
        if name == "basic_ddm_dc":
            def ll_fn(th, c):
                drift, alpha, beta, ter, dc = th
                ll = diffusion_logpdf(c["y"], alpha, ter, beta, drift, dc)
                return jnp.sum(jnp.where(c["valid"], ll, 0.0), axis=-1)
        else:
            from .wfpt import diffusion_eta_logpdf

            def ll_fn(th, c):
                mu_drift, alpha, beta, ter, eta, dc = th
                ll = diffusion_eta_logpdf(c["y"], alpha, ter, beta,
                                          mu_drift, eta, dc)
                return jnp.sum(jnp.where(c["valid"], ll, 0.0), axis=-1)
        return ctx, ll_fn
    if name == "single_trial_drift2":
        from .wfpt import diffusion_eta_cov_logpdf
        y = adata[..., 0]
        observed = amask & (y != 0.0)
        ctx = {"y": jnp.where(observed, y, 2.0), "ext": adata[..., 1],
               "observed": observed, "pad": amask}

        def ll_fn(th, c):
            mu_drift, alpha, beta, ter, eta, dc, sigma1 = th
            ll = diffusion_eta_cov_logpdf(c["y"], c["ext"], alpha, ter,
                                          beta, mu_drift, eta, dc, sigma1,
                                          observed=c["observed"])
            return jnp.sum(jnp.where(c["pad"], ll, 0.0), axis=-1)
        return ctx, ll_fn
    if name == "single_trial_drift_dc_base":
        from jax.scipy.special import logsumexp, ndtr, ndtri

        from .wfpt import diffusion_eta_logpdf
        rt, choice = adata[..., 0], adata[..., 1]
        valid = amask & (choice != 0.0)
        ctx = {"y": jnp.where(valid, rt * choice, 2.0), "valid": valid}
        u_nodes, log_w = quadrature_rule(n_quad)

        def ll_fn(th, c):
            mu_drift, alpha, beta, ter, eta, mu_dc, var_dc = th
            # E_{dc ~ TN+(mu_dc, var_dc)}[wfpt_eta]: quantile-space
            # quadrature (var_dc is the SD, the reference's naming —
            # single_trial_drift_dc_base.py:86-89). The TN+ density
            # integrates to 1, so unlike the flagship there is no
            # covariate-evidence log Z term.
            sd = jnp.maximum(var_dc, 1e-4)
            p_lo = ndtr(-mu_dc / sd)
            pq = jnp.clip(p_lo[..., None] + u_nodes
                          * (1.0 - p_lo[..., None]), 1e-7, 1.0 - 1e-7)
            dck = jnp.maximum(
                mu_dc[..., None] + sd[..., None] * ndtri(pq), 1e-4)
            ll = diffusion_eta_logpdf(
                c["y"][..., None], alpha[..., None], ter[..., None],
                beta[..., None], mu_drift[..., None], eta[..., None],
                dck)                                        # (..., K)
            ll = logsumexp(ll + log_w, axis=-1)
            return jnp.sum(jnp.where(c["valid"], ll, 0.0), axis=-1)
        return ctx, ll_fn
    raise ValueError(f"no exact likelihood registered for {name!r}")


def make_logprob_spec_plain_batched(spec, adata: Array, amask: Array):
    """Per-chain-context plain (unconstrained-coordinate) exact targets
    for any model in the ``exact_loglik_ctx`` registry — the generic twin
    of ``make_logprob_dcddm_plain_batched`` / ``..._flagship_marginal_
    batched``, driven entirely by the ModelSpec's own priors. For the eta
    family this is the first exact-likelihood backend any eta model ever
    had (the reference's JAGS/Stan runs cover only the dcDDM;
    ``retired_models/basic_ddm_eta_dc.py`` was validated by simulation
    only) — the trial drifts are integrated out in closed form, so the
    target has spec.n_params coordinates and no latents at all.

    Returns ``(logprob, push, ctx, dim)`` for
    ``nuts.run_chains_chunked(ctx=...)``."""
    push, prior_lp = _spec_push_prior(spec)
    ctx, ll_fn = exact_loglik_ctx(spec.name, adata, amask)

    def logprob(z: Array, c) -> Array:
        th, lp = prior_lp(z)
        return lp + ll_fn(th, c)

    return logprob, push, ctx, spec.n_params


def quadrature_rule(n_quad: int):
    """Static Gauss-Legendre rule mapped to (0, 1): (nodes, log-weights)."""
    x_gl, w_gl = np.polynomial.legendre.leggauss(int(n_quad))
    return (jnp.asarray((x_gl + 1.0) / 2.0, jnp.float32),
            jnp.log(jnp.asarray(w_gl / 2.0, jnp.float32)))


def flagship_marginal_trial_ll(y_safe: Array, ext: Array, valid: Array,
                               mu: Array, sd: Array, s1: Array, ter: Array,
                               beta: Array, drift: Array, dc: Array,
                               u_nodes: Array, log_w: Array) -> Array:
    """Per-trial flagship log-likelihood with the latent boundary
    integrated out: ``log Z + 1{valid} log E_{b ~ TN+(m*, s*)}[wfpt]``
    (see ``make_logprob_flagship_marginal``). All parameter args are
    PER-TRIAL arrays of a common shape (...,); returns that shape. Shared
    by the marginal NUTS posterior and the PSIS importance path
    (mcmc/importance.py), which evaluates it at (draws, trials) grids."""
    from jax.scipy.special import log_ndtr, logsumexp, ndtr, ndtri

    # precision-weighted combine of the TN+ prior and the ext channel
    lam = 1.0 / (sd * sd) + 1.0 / (s1 * s1)
    s_star = 1.0 / jnp.sqrt(lam)
    m_star = (mu / (sd * sd) + ext / (s1 * s1)) / lam
    tot = jnp.sqrt(sd * sd + s1 * s1)
    log_z = (-0.5 * ((ext - mu) / tot) ** 2 - jnp.log(tot)
             - 0.5 * math.log(2.0 * math.pi)
             + log_ndtr(m_star / s_star) - log_ndtr(mu / sd))
    # E_{b ~ TN+(m*, s*)}[wfpt(y | b)]: quantile-space quadrature
    p_lo = ndtr(-m_star / s_star)
    pq = jnp.clip(p_lo[..., None] + u_nodes
                  * (1.0 - p_lo[..., None]), 1e-7, 1.0 - 1e-7)
    b = jnp.maximum(m_star[..., None] + s_star[..., None] * ndtri(pq),
                    1e-4)                                # (..., K)
    ll = diffusion_logpdf(
        y_safe[..., None], b, ter[..., None], beta[..., None],
        drift[..., None], dc[..., None])                 # (..., K)
    log_e = logsumexp(ll + log_w, axis=-1)
    return log_z + jnp.where(valid, log_e, 0.0)


def flagship_marginal_loglik(th: dict, data: FlagshipData, u_nodes: Array,
                             log_w: Array, y_safe: Optional[Array] = None
                             ) -> Array:
    """Total flagship log-likelihood with the per-trial boundary integrated
    out (see ``make_logprob_flagship_marginal``). ``th`` holds constrained
    per-dataset arrays of shape (P,)."""
    idx = data.participant
    if y_safe is None:
        y_safe = jnp.where(data.valid, data.y, 2.0)
    return jnp.sum(flagship_marginal_trial_ll(
        y_safe, data.ext, data.valid, th["mu_alpha"][idx],
        th["std_alpha"][idx], th["sigma1"][idx], th["ter"][idx],
        th["beta"][idx], th["drift"][idx], th["dc"][idx], u_nodes, log_w))


def flagship_initial_positions(key: Array, data: FlagshipData,
                               n_chains: int,
                               min_rt: Optional[Array] = None,
                               parameterization: str = "natural",
                               include_latents: bool = True) -> Array:
    """Overdispersed chain inits; latents start at their prior median.
    ``include_latents=False`` returns the 7P-dim global block only, for
    the marginalized posterior (``make_logprob_flagship_marginal``)."""
    P = data.nparts
    N = int(data.y.shape[0])

    def logit(x, lo, hi):
        p = jnp.clip((x - lo) / (hi - lo), 1e-4, 1 - 1e-4)
        return jnp.log(p) - jnp.log1p(-p)

    ks = jax.random.split(key, 8)
    drift = jax.random.uniform(ks[0], (n_chains, P), minval=-2.0, maxval=2.0)
    mu_a = jax.random.uniform(ks[1], (n_chains, P), minval=0.7, maxval=1.8)
    beta = jax.random.uniform(ks[2], (n_chains, P), minval=0.3, maxval=0.7)
    if min_rt is None:
        ter = jax.random.uniform(ks[3], (n_chains, P), minval=0.1,
                                 maxval=0.4)
    else:
        ter = jax.random.uniform(ks[3], (n_chains, P), minval=0.05,
                                 maxval=1.0) * (min_rt[None, :] / 2.0)
    std_a = jax.random.uniform(ks[4], (n_chains, P), minval=0.3, maxval=1.2)
    dc = jax.random.uniform(ks[5], (n_chains, P), minval=0.7, maxval=1.4)
    sigma1 = jax.random.uniform(ks[6], (n_chains, P), minval=0.5, maxval=2.0)
    if parameterization == "ridge":
        cols = [drift / dc, jnp.log(mu_a / dc),
                logit(beta, *_FLAG_BOUNDS["beta"]),
                logit(ter, *_FLAG_BOUNDS["ter"]),
                jnp.log(std_a / dc), jnp.log(dc),
                logit(sigma1, *_FLAG_BOUNDS["sigma1"])]
    else:
        cols = [drift, logit(mu_a, *_FLAG_BOUNDS["mu_alpha"]),
                logit(beta, *_FLAG_BOUNDS["beta"]),
                logit(ter, *_FLAG_BOUNDS["ter"]),
                logit(std_a, *_FLAG_BOUNDS["std_alpha"]),
                logit(dc, *_FLAG_BOUNDS["dc"]),
                logit(sigma1, *_FLAG_BOUNDS["sigma1"])]
    if include_latents:
        cols = cols + [0.1 * jax.random.normal(ks[7], (n_chains, N))]
    z = jnp.concatenate(cols, axis=1)
    return z


def flagship_samples_to_dict(samples: Array, data: FlagshipData,
                             parameterization: str = "natural") -> dict:
    """(chains, S, dim) unconstrained -> constrained global arrays in the
    reference layout (P, S, C); latents are omitted."""
    P = data.nparts
    blocks = {name: samples[..., i * P:(i + 1) * P]   # (C, S, P)
              for i, name in enumerate(_FLAG_ORDER)}

    def sig(name):
        lo, hi = _FLAG_BOUNDS[name]
        return lo + (hi - lo) * jax.nn.sigmoid(blocks[name])

    if parameterization == "ridge":
        dc = jnp.exp(blocks["dc"])
        constrained = {
            "drift": blocks["drift"] * dc,
            "mu_alpha": jnp.exp(blocks["mu_alpha"]) * dc,
            "std_alpha": jnp.exp(blocks["std_alpha"]) * dc,
            "dc": dc,
            "beta": sig("beta"), "ter": sig("ter"), "sigma1": sig("sigma1"),
        }
    else:
        constrained = {"drift": blocks["drift"],
                       **{n: sig(n) for n in _FLAG_ORDER[1:]}}
    return {name: jnp.asarray(jnp.moveaxis(constrained[name],
                                           (0, 1, 2), (2, 1, 0)))
            for name in _FLAG_ORDER}
