"""Flow-preconditioned (NeuTra-style) exact-likelihood NUTS.

The round-3 agreement studies measured the one weakness of the exact
backend: flagship datasets with large true trial-level boundary
variability produce long curved ridge posteriors that defeat NUTS in
natural coordinates, in ridge coordinates, AND under replica exchange at
reference budget (ROUND3.md; ``agreement_flagship_tempered35_r3.json``:
healthy 0.27-0.48 swap acceptance, neff still 10-36). On exactly those
datasets PSIS certifies the amortized flow (khat ~ 0): the flow already
knows the map that straightens the ridge.

This module runs NUTS in the flow's base coordinates (Hoffman et al.
2019, "NeuTra-lizing bad geometry"): with ``theta = T(eps)`` the
amortizer's exact sampling transform (``AmortizedPosterior.push_forward``
= coupling-flow inverse + logit coordinate map, both with exact
log-Jacobians), the target becomes

    log p~(eps) = log prior(T(eps)) + log L(data | T(eps))
                  + log|det dT/deps|,

whose pullback is N(0, I) precisely to the extent PSIS already certified
the flow. The likelihood is the same Rao-Blackwellized marginal the
plain exact fits use (``models.flagship_marginal_loglik``), and the prior
is evaluated in model space (``models._FLAG_PRIORS``) — the identical
posterior as ``make_logprob_flagship_marginal``, only reparameterized, so
agreement numbers remain comparable across formulations.

No reference counterpart: the reference's exact backends are JAGS/Stan on
the dcDDM only (``basic_ddm_dc_pyjags.py``), with no amortized-exact
coupling of any kind.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import models as M

Array = jax.Array


def make_logprob_flagship_neutra(data: M.FlagshipData, amortizer, params,
                                 adata: Array, amask: Array, alog_n: Array,
                                 n_quad: int = 24):
    """NeuTra target for ONE flagship dataset's marginal posterior.

    ``data``: the ``FlagshipData`` (``nparts == 1``) the exact fits use;
    ``adata (N_pad, C)``, ``amask (N_pad,)``, ``alog_n (1,)``: the SAME
    dataset as the amortizer sees it. Returns ``(logprob_fn, push_fn,
    dim)``: ``logprob_fn`` maps base-space ``eps (7,)`` to the exact
    unnormalized posterior log-density (NUTS-ready, per-chain);
    ``push_fn`` maps eps draws of any leading shape to model-space theta
    in spec order (= ``models._FLAG_ORDER``).
    """
    assert data.nparts == 1, "one dataset per NeuTra target (--per-dataset)"
    dim = len(M._FLAG_ORDER)
    cond, lo, hi = amortizer.apply(
        params, adata[None], amask[None], alog_n[None],
        method="coord_context")
    cond, lo, hi = cond[0], lo[0], hi[0]
    u_nodes, log_w = M.quadrature_rule(n_quad)
    y_safe = jnp.where(data.valid, data.y, 2.0)
    priors = [M._FLAG_PRIORS[name] for name in M._FLAG_ORDER]

    def push(eps: Array) -> Array:
        theta, _ = amortizer.apply(params, eps, cond, lo, hi,
                                   method="push_forward")
        return theta

    def logprob(eps: Array) -> Array:
        theta, ldj = amortizer.apply(params, eps, cond, lo, hi,
                                     method="push_forward")
        lp = ldj
        for j, dist in enumerate(priors):
            lp = lp + dist.log_prob(theta[..., j])
        th = {name: theta[..., j][..., None]
              for j, name in enumerate(M._FLAG_ORDER)}
        return lp + M.flagship_marginal_loglik(th, data, u_nodes, log_w,
                                               y_safe=y_safe)

    return logprob, push, dim


# spec order (drift, alpha, beta, ter, dc) -> mcmc prior names
_DCDDM_SPEC_TO_MCMC = ("delta", "alpha", "beta", "ndt", "varsigma")


def make_logprob_dcddm_neutra(y: Array, amortizer, params,
                              adata: Array, amask: Array, alog_n: Array):
    """NeuTra target for ONE dcDDM dataset's exact posterior.

    ``y (n,)``: signed choice-RT with capped/missing trials excluded —
    the same data ``models.make_logprob`` sees; ``adata``/``amask``/
    ``alog_n``: the dataset as the amortizer sees it. Same posterior as
    ``make_logprob`` restricted to one participant (identical priors,
    ``basic_ddm_dc_pyjags.py:112-133`` semantics), pulled back through
    the flow. The intended use is exact re-fits of the near-degenerate
    full-prior datasets whose posterior geometry freezes plain NUTS and
    whose PSIS certification correctly fails (khat up to 32,
    ``results/importance_dcddm_prior_r3.json``)."""
    dim = 5
    cond, lo, hi = amortizer.apply(
        params, adata[None], amask[None], alog_n[None],
        method="coord_context")
    cond, lo, hi = cond[0], lo[0], hi[0]
    priors = [M._PRIORS[name] for name in _DCDDM_SPEC_TO_MCMC]

    def push(eps: Array) -> Array:
        theta, _ = amortizer.apply(params, eps, cond, lo, hi,
                                   method="push_forward")
        return theta

    def logprob(eps: Array) -> Array:
        theta, ldj = amortizer.apply(params, eps, cond, lo, hi,
                                     method="push_forward")
        lp = ldj
        for j, dist in enumerate(priors):
            lp = lp + dist.log_prob(theta[..., j])
        ll = M.diffusion_logpdf(y, theta[..., 1], theta[..., 3],
                                theta[..., 2], theta[..., 0],
                                theta[..., 4])
        return lp + ll.sum()

    return logprob, push, dim


def make_logprob_flagship_neutra_batched(amortizer, params, adata: Array,
                                         amask: Array, alog_n: Array,
                                         n_quad: int = 24):
    """NeuTra targets for a BATCH of flagship datasets, as one program.

    ``adata (D, N_pad, C)``, ``amask (D, N_pad)``, ``alog_n (D, 1)``: the
    padded batch exactly as the amortizer sees it (channel 0 = signed
    choicert, channel 1 = covariate; padding rows have mask False).
    Returns ``(logprob, push, ctx, dim)`` where ``logprob(eps, ctx_d)``
    evaluates ONE dataset's exact posterior given its ctx slice and
    ``ctx`` is a pytree with leading axis D — the per-chain-target form
    ``nuts.run_chains_chunked(..., ctx=...)`` consumes after
    ``replicate_ctx``. The batching is what turns N per-dataset
    recompiles (5-15 min each on a tunneled TPU) into one.

    Capped trials (signed y == 0 under a True mask) keep their observed
    covariate channel: they contribute the analytic ext term (log Z) but
    no Wiener term — the same target ``inference.amortized_logw``
    certifies against. (The serial ``make_logprob_flagship_neutra``
    path is fed pre-filtered valid-only trials by its callers, which
    drops capped ext channels; datasets without capped trials — all real
    Stahl data — give identical posteriors either way.)
    """
    dim = len(M._FLAG_ORDER)
    cond, lo, hi = amortizer.apply(params, adata, amask, alog_n,
                                   method="coord_context")
    y = adata[..., 0]
    valid = amask & (y != 0.0)
    ctx = {"cond": cond, "lo": lo, "hi": hi,
           "y": jnp.where(valid, y, 2.0), "ext": adata[..., 1],
           "valid": valid, "pad": amask}
    u_nodes, log_w = M.quadrature_rule(n_quad)
    priors = [M._FLAG_PRIORS[name] for name in M._FLAG_ORDER]

    def push(eps: Array, c) -> Array:
        theta, _ = amortizer.apply(params, eps, c["cond"], c["lo"],
                                   c["hi"], method="push_forward")
        return theta

    def logprob(eps: Array, c) -> Array:
        theta, ldj = amortizer.apply(params, eps, c["cond"], c["lo"],
                                     c["hi"], method="push_forward")
        lp = ldj
        for j, dist in enumerate(priors):
            lp = lp + dist.log_prob(theta[..., j])
        ll = M.flagship_marginal_trial_ll(
            c["y"], c["ext"], c["valid"], theta[..., 1], theta[..., 4],
            theta[..., 6], theta[..., 3], theta[..., 2], theta[..., 0],
            theta[..., 5], u_nodes, log_w)              # (N_pad,)
        return lp + jnp.sum(jnp.where(c["pad"], ll, 0.0))

    return logprob, push, ctx, dim


def make_logprob_dcddm_neutra_batched(amortizer, params, adata: Array,
                                      amask: Array, alog_n: Array):
    """Batched NeuTra targets for dcDDM datasets (see the flagship
    variant above). dcDDM channels are (rt, choice); capped/missing
    trials (choice 0) and padding rows are excluded from the WFPT sum,
    matching ``make_logprob_dcddm_neutra`` per dataset."""
    dim = 5
    cond, lo, hi = amortizer.apply(params, adata, amask, alog_n,
                                   method="coord_context")
    rt, choice = adata[..., 0], adata[..., 1]
    valid = amask & (choice != 0.0)
    ctx = {"cond": cond, "lo": lo, "hi": hi,
           "y": jnp.where(valid, rt * choice, 2.0), "valid": valid}
    priors = [M._PRIORS[name] for name in _DCDDM_SPEC_TO_MCMC]

    def push(eps: Array, c) -> Array:
        theta, _ = amortizer.apply(params, eps, c["cond"], c["lo"],
                                   c["hi"], method="push_forward")
        return theta

    def logprob(eps: Array, c) -> Array:
        theta, ldj = amortizer.apply(params, eps, c["cond"], c["lo"],
                                     c["hi"], method="push_forward")
        lp = ldj
        for j, dist in enumerate(priors):
            lp = lp + dist.log_prob(theta[..., j])
        ll = M.diffusion_logpdf(c["y"], theta[..., 1], theta[..., 3],
                                theta[..., 2], theta[..., 0],
                                theta[..., 4])          # (N_pad,)
        return lp + jnp.sum(jnp.where(c["valid"], ll, 0.0))

    return logprob, push, ctx, dim


def make_logprob_spec_neutra_batched(spec, amortizer, params, adata: Array,
                                     amask: Array, alog_n: Array):
    """Generic batched NeuTra targets for any model in
    ``models.exact_loglik_ctx``'s registry (the eta family and beyond):
    the exact posterior pulled back through the amortizer flow's
    transport map, priors taken from the ModelSpec itself. Same contract
    as the flagship/dcDDM variants: ``(logprob, push, ctx, dim)`` for
    ``nuts.run_chains_chunked(ctx=...)``."""
    assert spec.prior_transform is None, spec.name
    dim = spec.n_params
    cond, lo, hi = amortizer.apply(params, adata, amask, alog_n,
                                   method="coord_context")
    ll_ctx, ll_fn = M.exact_loglik_ctx(spec.name, adata, amask)
    ctx = {"cond": cond, "lo": lo, "hi": hi, **ll_ctx}

    def push(eps: Array, c) -> Array:
        theta, _ = amortizer.apply(params, eps, c["cond"], c["lo"],
                                   c["hi"], method="push_forward")
        return theta

    def logprob(eps: Array, c) -> Array:
        theta, ldj = amortizer.apply(params, eps, c["cond"], c["lo"],
                                     c["hi"], method="push_forward")
        lp = ldj
        for j, dist in enumerate(spec.prior):
            lp = lp + dist.log_prob(theta[..., j])
        return lp + ll_fn([theta[..., j] for j in range(dim)], c)

    return logprob, push, ctx, dim


def replicate_ctx(ctx, n_chains: int):
    """(D, ...) ctx leaves -> (D * n_chains, ...): dataset d's target
    occupies chain rows [d*n_chains, (d+1)*n_chains) — the layout
    ``run_chains_chunked(ctx=...)`` pairs with ``q0s`` of shape
    (D * n_chains, dim)."""
    return jax.tree.map(lambda x: jnp.repeat(x, n_chains, axis=0), ctx)


def neutra_initial_positions(key: Array, n_chains: int, dim: int,
                             scale: float = 2.0) -> Array:
    """Overdispersed chain inits in the flow's base space: N(0, scale^2).
    If the flow were exact the target would be N(0, 1); starting wider
    keeps split-Rhat an honest convergence check rather than a tautology.
    """
    return scale * jax.random.normal(key, (n_chains, dim))


def neutra_samples_to_dict(samples, push, param_names) -> dict:
    """(chains, S, dim) base-space draws -> {name: (1, S, chains)} model-
    space arrays, the layout ``flagship_samples_to_dict`` produces for a
    single dataset (agreement.py's per-dataset path)."""
    theta = np.asarray(push(jnp.asarray(samples)))     # (C, S, P)
    return {name: np.transpose(theta[..., j])[None]
            for j, name in enumerate(param_names)}
