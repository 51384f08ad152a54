"""Certified amortized inference: one call from data to a posterior with
a per-dataset quality certificate and an exact-refit fallback.

Round 3 established the pipeline piecewise (apps/importance_check.py,
apps/fit_stahl.py --psis --refit-flagged, apps/agreement.py --neutra):

  1. amortized draws from the trained flow (microseconds per dataset),
  2. PSIS certification of each dataset's posterior against the EXACT
     likelihood (khat < 0.7 certifies; Vehtari et al. 2015/2021),
  3. debiased moments from the smoothed weights wherever certified,
  4. flow-preconditioned (NeuTra) exact NUTS re-fits for the flagged
     tail — the route validated end-to-end on simulated data
     (results/agreement_flagship_refit*_r3) and real data
     (results/stahl_certified_*_r3).

This module packages that pipeline as a single library entry point,
``certified_posterior``, for every model family with an exact
likelihood: the dcDDM (WFPT density, ``mcmc/wfpt.py``), the flagship
(Rao-Blackwellized marginal, ``mcmc/models.py``), and the eta family
— ``basic_ddm_eta_dc`` and ``single_trial_drift2`` — whose trial-level
drifts integrate out in closed form (``wfpt.diffusion_eta_logpdf`` /
``diffusion_eta_cov_logpdf``; round 4).
The reference framework has no counterpart at any layer: its amortized
backend (BayesFlow usage, ``basic_ddm_dc.py:163-207``) ships posteriors
with no per-dataset quality signal, and its exact backends (JAGS/Stan,
``basic_ddm_dc_pyjags.py``) never talk to the amortized one.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .mcmc import importance as I
from .mcmc import models as M
from .mcmc import neutra as NT
from .mcmc import nuts as N
from .mcmc.wfpt import diffusion_logpdf

FLAGSHIP = "single_trial_alpha_not_scaled"
DCDDM = "basic_ddm_dc"


_EXACT_LL_MODELS = (DCDDM, FLAGSHIP, "basic_ddm_eta_dc",
                    "single_trial_drift2", "single_trial_drift_dc_base")


def _logw_kind(spec_or_name, flagship=None):
    """Resolve the likelihood family from a spec/model name (or the
    legacy ``flagship`` bool)."""
    if flagship is not None:
        return FLAGSHIP if flagship else DCDDM
    name = getattr(spec_or_name, "name", spec_or_name)
    if name not in _EXACT_LL_MODELS:
        raise ValueError(f"no exact likelihood wired for model {name!r}; "
                         f"have {_EXACT_LL_MODELS}")
    return name


def amortized_logw(spec, trainer, state, draws, data, mask, log_n, *,
                   flagship: bool | None = None, kind: str | None = None,
                   n_quad: int = 24, draw_chunk: int = 64) -> np.ndarray:
    """Raw importance log-weights of amortized draws against the exact
    unnormalized posterior: ``log p(theta) + log L(data|theta) -
    log q(theta|data)``. (B, S) float64. Shared by importance_check,
    fit_stahl --psis, agreement --psis, and certified_posterior.

    ``kind`` selects the exact likelihood: the dcDDM WFPT density, the
    flagship Rao-Blackwellized marginal, or the closed-form Gaussian-
    drift marginals of the eta family (``basic_ddm_eta_dc``,
    ``single_trial_drift2``; ``wfpt.diffusion_eta_logpdf`` /
    ``diffusion_eta_cov_logpdf``). Defaults to ``spec.name``; the legacy
    ``flagship`` bool is still accepted."""
    kind = kind or _logw_kind(spec, flagship)
    signed_ch0 = kind in (FLAGSHIP, "single_trial_drift2")
    logq = jax.jit(jax.vmap(
        lambda th: trainer.amortizer.apply(state.params, th, data, mask,
                                           log_n, method="log_prob"),
        in_axes=1, out_axes=1))(draws)                 # (B, S)
    m_np = np.asarray(mask)
    if signed_ch0:
        # channel 0 is already the signed choicert (spec.py flagship obs)
        signed_y = np.asarray(data[..., 0])
        valid_np = m_np & (signed_y != 0)
    else:
        # dcDDM channels are (rt, choice); sign the RT by the choice and
        # exclude capped/missing trials (choice 0) — agreement.py:146-148
        rt, choice = np.asarray(data[..., 0]), np.asarray(data[..., 1])
        signed_y = rt * choice
        valid_np = m_np & (choice != 0)
    logp_prior = spec.prior_log_prob(draws)            # (B, S)
    y_safe = jnp.asarray(np.where(valid_np, signed_y, 2.0), jnp.float32)
    valid = jnp.asarray(valid_np)
    in_mask = jnp.asarray(m_np)
    if kind == FLAGSHIP:
        ext = data[..., 1]
        u_nodes, log_w = M.quadrature_rule(n_quad)

        @jax.jit
        def chunk_ll(th):                              # th: (B, c, 7)
            def per(name_i):
                return th[..., name_i][:, :, None]     # (B, c, 1)
            ll = M.flagship_marginal_trial_ll(
                y_safe[:, None, :], ext[:, None, :], valid[:, None, :],
                per(1), per(4), per(6), per(3), per(2), per(0), per(5),
                u_nodes, log_w)                        # (B, c, N)
            return jnp.sum(jnp.where(in_mask[:, None, :], ll, 0.0), -1)
    elif kind in ("basic_ddm_eta_dc", "single_trial_drift2",
                  "single_trial_drift_dc_base"):
        # the shared exact-likelihood registry handles the per-trial sum
        # (capped-trial conventions included); broadcast draws over trials
        ctx, ll_fn = M.exact_loglik_ctx(kind, jnp.asarray(data),
                                        jnp.asarray(mask), n_quad=n_quad)
        ctx_b = jax.tree.map(lambda x: x[:, None, :], ctx)
        P = draws.shape[-1]

        @jax.jit
        def chunk_ll(th):                              # th: (B, c, P)
            cols = [th[..., j][:, :, None] for j in range(P)]
            return ll_fn(cols, ctx_b)
    else:
        @jax.jit
        def chunk_ll(th):                              # th: (B, c, 5)
            ll = diffusion_logpdf(
                y_safe[:, None, :], th[..., 1][:, :, None],
                th[..., 3][:, :, None], th[..., 2][:, :, None],
                th[..., 0][:, :, None], th[..., 4][:, :, None])
            return jnp.sum(jnp.where(valid[:, None, :], ll, 0.0), -1)

    S = draws.shape[1]
    parts = []
    for s0 in range(0, S, draw_chunk):
        parts.append(np.asarray(chunk_ll(draws[:, s0:s0 + draw_chunk])))
    loglik = np.concatenate(parts, axis=1)             # (B, S)
    return (np.asarray(logp_prior, np.float64) + loglik
            - np.asarray(logq, np.float64))


@dataclass
class ExactRefit:
    """One flagged dataset's exact-NUTS posterior (model space)."""
    index: int
    samples: np.ndarray          # (S*C, P) flattened model-space draws
    mean: np.ndarray             # (P,)
    sd: np.ndarray               # (P,)
    rhat_max: float
    neff_min: float
    method: str = "neutra"       # "neutra" | "plain"
    escalated_from_rhat: Optional[float] = None  # failed NeuTra Rhat


@dataclass
class CertifiedPosterior:
    """Amortized draws + per-dataset PSIS certificate + routed estimate.

    ``source[i]`` records which estimator ``mean()[i]`` comes from:
    ``"refit"`` (exact NUTS, the flagged tail), ``"psis"`` (certified,
    debiased by the smoothed weights) or ``"amortized"`` (khat >= the
    threshold and no refit budget reached it — raw flow moments, which
    the routing study measured to be SAFER than reweighting there:
    results/agreement_flagship_refit_r3, |dz| <= 0.12 raw vs 4.1
    PSIS-reweighted on a khat=6 dataset)."""
    draws: np.ndarray            # (B, S, P) amortized draws
    khat: np.ndarray             # (B,)
    weight_ess: np.ndarray       # (B,)
    logw_smoothed: np.ndarray    # (B, S)
    n_degenerate: np.ndarray     # (B,) boundary-atom draws zero-weighted
    raw_mean: np.ndarray         # (B, P)
    raw_sd: np.ndarray
    debiased_mean: np.ndarray
    debiased_sd: np.ndarray
    khat_threshold: float
    refits: Dict[int, ExactRefit] = field(default_factory=dict)

    @property
    def certified(self) -> np.ndarray:
        return self.khat < self.khat_threshold

    @property
    def source(self) -> np.ndarray:
        out = np.where(self.certified, "psis", "amortized").astype(object)
        for i in self.refits:
            out[i] = "refit"
        return out

    def mean(self) -> np.ndarray:
        out = np.where(self.certified[:, None], self.debiased_mean,
                       self.raw_mean)
        for i, r in self.refits.items():
            out[i] = r.mean
        return out

    def sd(self) -> np.ndarray:
        out = np.where(self.certified[:, None], self.debiased_sd,
                       self.raw_sd)
        for i, r in self.refits.items():
            out[i] = r.sd
        return out


def split_refits_by_khat(khat, flagged, k: int, band: float,
                         n_degenerate=None):
    """Pick the ``k`` worst-khat flagged indices and split them into the
    refit tiers along the measured khat bands (ROUND3.md): khat below
    ``band`` -> NeuTra NUTS in the flow's coordinates (the flow
    preconditions its own moderate errors); at/above ``band``
    (saturated/extreme, including inf/NaN, which sort first) -> plain
    natural coordinates, because there the flow transport itself is
    broken and NeuTra inherits the breakage (measured Rhat 27-6.5e4).

    ``n_degenerate`` (per-dataset count of boundary-clamped draws,
    ``importance.sanitize_logw``) overrides the band where given: ANY
    clamped draw proves the transport map pushed mass out of the
    posterior's support for that dataset, so it routes plain no matter
    how tame its khat. This signal is sharper than khat magnitude — the
    khat-regularization fix moved the one clamp-affected Stahl
    participant from 6.0 to 0.94 while every other khat moved by ~0.003,
    yet NeuTra still fails there (measured Rhat 27) because the failure
    is the clamp, not the weight tail.

    Returns ``(sel, neutra_sel, plain_sel)`` with ``sel`` in worst-first
    order and the two tiers as plain ``int`` lists."""
    khat = np.asarray(khat)
    flagged = np.asarray(flagged)
    order = np.argsort(-np.nan_to_num(khat[flagged], nan=np.inf,
                                      posinf=np.inf))
    sel = flagged[order][:k]

    def _plain(i):
        if n_degenerate is not None and int(n_degenerate[i]) > 0:
            return True
        return not khat[i] < band
    neutra_sel = [int(i) for i in sel if not _plain(i)]
    plain_sel = [int(i) for i in sel if _plain(i)]
    return sel, neutra_sel, plain_sel


def _family(spec) -> str:
    """The model's exact-likelihood kind (one of ``_EXACT_LL_MODELS``);
    raises for models with no exact likelihood wired."""
    return _logw_kind(spec)


def refit_exact(spec, trainer, state, data_i, mask_i, log_n_i, key, *,
                n_quad: int = 24, warmup: int = 400, samples: int = 1000,
                chains: int = 8, max_depth: int = 8, chunk: int = 50,
                checkpoint_path: Optional[str] = None,
                progress: bool = False):
    """Exact NeuTra-NUTS posterior of ONE dataset, in model space.

    NUTS runs in the amortizer flow's base coordinates with identity
    mass (mcmc/neutra.py) — the measured fix for the ridge posteriors
    that defeat natural/ridge/tempered NUTS (ROUND3.md). Returns
    ``(samples_dict, diagnostics)`` in the layouts ``neutra_samples_to_
    dict`` / ``diagnostics.convergence.diagnostic`` produce."""
    from .diagnostics.convergence import diagnostic
    kind = _family(spec)
    if kind not in (FLAGSHIP, DCDDM):
        raise ValueError("refit_exact handles the flagship/dcDDM only; "
                         "use refit_exact_batch for the eta family")
    flagship = kind == FLAGSHIP
    y_i = np.asarray(data_i[..., 0 if flagship else 1])
    m_i = np.asarray(mask_i)
    if flagship:
        v = m_i & (y_i != 0)
        fdata = M.FlagshipData(
            y=jnp.asarray(np.asarray(data_i[..., 0])[v]),
            ext=jnp.asarray(np.asarray(data_i[..., 1])[v]),
            participant=jnp.zeros(int(v.sum()), jnp.int32), nparts=1,
            valid=jnp.ones(int(v.sum()), bool))
        logprob, push, dim = NT.make_logprob_flagship_neutra(
            fdata, trainer.amortizer, state.params,
            jnp.asarray(data_i), jnp.asarray(mask_i), jnp.asarray(log_n_i),
            n_quad=n_quad)
    else:
        rt, choice = np.asarray(data_i[..., 0]), np.asarray(data_i[..., 1])
        v = m_i & (choice != 0)
        logprob, push, dim = NT.make_logprob_dcddm_neutra(
            jnp.asarray((rt * choice)[v]), trainer.amortizer, state.params,
            jnp.asarray(data_i), jnp.asarray(mask_i), jnp.asarray(log_n_i))
    q0 = NT.neutra_initial_positions(jax.random.fold_in(key, 0), chains,
                                     dim)
    res = N.run_chains_chunked(
        logprob, q0, jax.random.fold_in(key, 1), n_warmup=warmup,
        n_samples=samples, thin=1, max_depth=max_depth, chunk=chunk,
        progress=progress, dense_mass=False,
        init_inv_mass=jnp.ones(dim, jnp.float32),
        checkpoint_path=checkpoint_path)
    sdict = NT.neutra_samples_to_dict(np.asarray(res.samples), push,
                                      spec.param_names)
    return sdict, diagnostic(sdict)


def refit_exact_batch(spec, trainer, state, data, mask, log_n, indices,
                      key, *, n_quad: int = 24, warmup: int = 400,
                      samples: int = 1000, chains: int = 8,
                      max_depth: int = 8, chunk: int = 50,
                      checkpoint_path: Optional[str] = None,
                      progress: bool = False) -> Dict[int, ExactRefit]:
    """Exact NeuTra-NUTS re-fits of MANY datasets as ONE compiled program.

    The padded batch already gives every dataset the same static shape,
    so the per-dataset targets differ only by data — which enters the
    chunked NUTS driver as a traced per-chain context
    (``run_chains_chunked(ctx=...)``), not as a new closure. One compile
    + fused dispatches for the whole flagged set, instead of a
    multi-minute recompile per dataset; chain rows [d*chains,
    (d+1)*chains) sample dataset ``indices[d]``'s posterior with their
    own step size. TPU-first fan-out the serial ``refit_exact`` loop
    cannot match (measured: each per-dataset compile costs 5-15 min on
    a tunneled TPU; the batch pays it once).
    """
    from .diagnostics.convergence import diagnostic
    kind = _family(spec)
    indices = [int(i) for i in indices]
    adata = jnp.asarray(data)[jnp.asarray(indices)]
    amask = jnp.asarray(mask)[jnp.asarray(indices)]
    alog_n = jnp.asarray(log_n)[jnp.asarray(indices)]
    if kind == FLAGSHIP:
        logprob, push, ctx, dim = NT.make_logprob_flagship_neutra_batched(
            trainer.amortizer, state.params, adata, amask, alog_n,
            n_quad=n_quad)
    elif kind == DCDDM:
        logprob, push, ctx, dim = NT.make_logprob_dcddm_neutra_batched(
            trainer.amortizer, state.params, adata, amask, alog_n)
    else:
        logprob, push, ctx, dim = NT.make_logprob_spec_neutra_batched(
            spec, trainer.amortizer, state.params, adata, amask, alog_n)
    D = len(indices)
    q0 = NT.neutra_initial_positions(jax.random.fold_in(key, 0),
                                     D * chains, dim)
    res = N.run_chains_chunked(
        logprob, q0, jax.random.fold_in(key, 1), n_warmup=warmup,
        n_samples=samples, thin=1, max_depth=max_depth, chunk=chunk,
        progress=progress, dense_mass=False,
        init_inv_mass=jnp.ones(dim, jnp.float32),
        checkpoint_path=checkpoint_path,
        ctx=NT.replicate_ctx(ctx, chains))
    eps_all = np.asarray(res.samples).reshape(D, chains, samples, dim)
    theta_all = np.asarray(jax.vmap(push)(jnp.asarray(eps_all), ctx))
    out: Dict[int, ExactRefit] = {}
    for d, i in enumerate(indices):
        sdict = {name: np.transpose(theta_all[d][..., j], (1, 0))[None]
                 for j, name in enumerate(spec.param_names)}
        diags = diagnostic(sdict)
        flat = theta_all[d].reshape(-1, dim)
        out[i] = ExactRefit(
            index=i, samples=flat, mean=flat.mean(0), sd=flat.std(0),
            rhat_max=float(max(np.nanmax(diags[n]["rhat"])
                               for n in spec.param_names)),
            neff_min=float(min(np.nanmin(diags[n]["neff"])
                               for n in spec.param_names)))
    return out


def refit_plain_batch(spec, trainer, state, data, mask, log_n, indices,
                      key, *, n_quad: int = 24, warmup: int = 700,
                      samples: int = 1000, chains: int = 8,
                      max_depth: int = 8, chunk: int = 50,
                      checkpoint_path: Optional[str] = None,
                      amort_mean=None, amort_sd=None,
                      init_draws=None, dense_mass: bool = True,
                      progress: bool = False) -> Dict[int, ExactRefit]:
    """Plain-coordinate (natural) exact refits, batched as one program.

    The fallback tier for datasets whose SATURATED khat says the flow's
    transport map is itself broken — there NeuTra inherits the breakage
    (measured: Rhat 27-6.5e4 on exactly those datasets, ROUND3.md), and
    plain coordinates depend on nothing the flow got wrong. Both
    families ride the same batched ctx driver (flagship: natural-
    coordinate Rao-Blackwellized marginal; dcDDM: natural-coordinate
    WFPT).

    Preconditioning (the part that decides whether these fits move at
    all): the flagged tail contains NEEDLE posteriors — e.g. alpha -> 0
    pins rt ~ ter, giving |d2 log p / dz_ter^2| ~ 1e8 against O(10) in
    the other directions, a four-decade scale split the amortized SDs
    get wrong by ~1e3 (that wrongness is what khat flagged) and that
    freezes every chain under unit or amortized mass (measured,
    ROUND3.md). With ``init_draws`` (the amortized draws, model space),
    each dataset's chains start at its ``chains`` best draws by EXACT
    log-posterior and the mass is seeded from the Hessian diagonal at
    the best one (Laplace preconditioning) — the draws are in-support
    by construction, so no optimizer or barrier handling is needed.
    Without draws, falls back to amortized-moment mass and
    posterior-scale inits.
    """
    from .diagnostics.convergence import diagnostic
    kind = _family(spec)
    indices = [int(i) for i in indices]
    sel = jnp.asarray(indices)
    adata = jnp.asarray(data)[sel]
    amask = jnp.asarray(mask)[sel]
    if kind == FLAGSHIP:
        logprob, push, ctx, dim = M.make_logprob_flagship_marginal_batched(
            adata, amask, n_quad=n_quad)
        bounds = [None] + [M._FLAG_BOUNDS[n] for n in M._FLAG_ORDER[1:]]
    elif kind == DCDDM:
        logprob, push, ctx, dim = M.make_logprob_dcddm_plain_batched(
            adata, amask)
        bounds = [None] + [M._BOUNDS[n]
                           for n in M._DCDDM_SPEC_TO_MCMC[1:]]
    else:
        # generic spec-driven plain targets (the eta family): bounds come
        # from the spec's own prior supports
        logprob, push, ctx, dim = M.make_logprob_spec_plain_batched(
            spec, adata, amask)
        bounds = [(lo, hi) if np.isfinite(lo) and np.isfinite(hi) else None
                  for lo, hi in (d.support for d in spec.prior)]
    if kind in (FLAGSHIP, "single_trial_drift2"):
        # channel 0 is already the signed choicert
        y_np = np.asarray(adata[..., 0])
        v_np = np.asarray(amask) & (y_np != 0)
    else:
        rt = np.asarray(adata[..., 0])
        ch = np.asarray(adata[..., 1])
        y_np = rt * ch
        v_np = np.asarray(amask) & (ch != 0)
    D = len(indices)

    def _logit(x, lo, hi):
        p = np.clip((x - lo) / (hi - lo), 1e-4, 1 - 1e-4)
        return np.log(p) - np.log1p(-p)

    # Per-dataset natural-coordinate inits; ter starts strictly below
    # each dataset's min RT (the WFPT |y| < ter guard is a barrier).
    # When amortized moments are available, chains start overdispersed
    # at the POSTERIOR's own scale (mean ± 2 amortized SD): the flagged
    # tail contains needle posteriors (tiny dc/alpha concentrates every
    # RT within ~10 ms, |grad log p| ~ 1e6) where prior-range inits sit
    # ~1e6 nats out and freeze every chain — measured on the dcDDM
    # full-prior tail (ROUND3.md). The flow's mean is near the needle
    # even where its shape is wrong (that is what khat flags).
    def _theta_to_z(x):                                 # (..., dim)
        cols = []
        for j, b in enumerate(bounds):
            if b is None:
                cols.append(x[..., j])
            else:
                cols.append(_logit(x[..., j], *b))
        return np.stack(cols, axis=-1)

    rng = np.random.default_rng(int(jax.random.randint(
        jax.random.fold_in(key, 0), (), 0, 2 ** 31 - 1)))
    q0s, masses = [], []
    ter_j = list(spec.param_names).index("ter")
    if kind == FLAGSHIP:
        ranges = [(-2.0, 2.0), (0.7, 1.8), (0.3, 0.7), None, (0.3, 1.2),
                  (0.7, 1.4), (0.5, 2.0)]
    elif kind == DCDDM:
        ranges = [(-2.0, 2.0), (0.8, 1.6), (0.3, 0.7), None, (0.7, 1.4)]
    else:
        # moderate per-parameter init ranges from each prior's moments,
        # clipped to its support (the no-init fallback path only)
        ranges = []
        for j, d in enumerate(spec.prior):
            if j == ter_j:
                ranges.append(None)
                continue
            lo, hi = d.support
            ranges.append((max(lo + 1e-3, d.mean - d.std),
                           min(hi - 1e-3 if np.isfinite(hi) else np.inf,
                               d.mean + d.std)))
    if init_draws is not None:
        lp_many = jax.jit(jax.vmap(logprob, in_axes=(0, None)))
        grad_f = jax.grad(logprob)

        @jax.jit
        def _ascend(z0, c):
            # barrier-safe mode ascent: max-norm-normalized steps (the
            # needle's 1e6:1 gradient disparity makes raw gradient steps
            # useless), accept only finite improvements, adapt the step
            def step(carry, _):
                z, lr, best = carry
                g = grad_f(z, c)
                g = jnp.where(jnp.isfinite(g), g, 0.0)
                prop = z + lr * g / (jnp.abs(g).max() + 1e-12)
                lp_p = logprob(prop, c)
                ok = jnp.isfinite(lp_p) & (lp_p > best)
                return (jnp.where(ok, prop, z),
                        jnp.where(ok, lr * 1.1, lr * 0.5),
                        jnp.where(ok, lp_p, best)), None
            (z, _, best), _ = jax.lax.scan(
                step, (z0, jnp.float32(0.1), logprob(z0, c)), None,
                length=400)
            return z, best

        grad_jit = jax.jit(grad_f)

        def fd_hess_diag(zm, c_d):
            # central differences of the FIRST-order gradient: second-order
            # AD through the WFPT/logit guards returns NaN in every bounded
            # coordinate (measured — jax.hessian silently degraded the
            # Laplace mass to unit mass exactly where |grad| ~ 1e6), while
            # d/dz of grad is robust at any curvature scale
            zm = np.asarray(zm, np.float64)
            out = np.empty(dim)
            for j in range(dim):
                h = 1e-3 * max(1.0, abs(zm[j]))
                zp, zn = zm.copy(), zm.copy()
                zp[j] += h
                zn[j] -= h
                gp = np.asarray(grad_jit(jnp.asarray(zp, jnp.float32),
                                         c_d), np.float64)[j]
                gn = np.asarray(grad_jit(jnp.asarray(zn, jnp.float32),
                                         c_d), np.float64)[j]
                out[j] = (gp - gn) / (2.0 * h)
            return out
    for d in range(D):
        min_rt = float(np.abs(y_np[d][v_np[d]]).min()) \
            if v_np[d].any() else 1.0
        c_d = jax.tree.map(lambda x: x[d], ctx)
        if init_draws is not None:
            z_all = _theta_to_z(np.asarray(init_draws[indices[d]],
                                           np.float64))
            lps = np.asarray(lp_many(jnp.asarray(z_all, jnp.float32),
                                     c_d), np.float64)
            lps = np.where(np.isfinite(lps), lps, -np.inf)
            z0 = jnp.asarray(z_all[int(np.argmax(lps))], jnp.float32)
            z_mode, _ = _ascend(z0, c_d)
            hd = np.abs(fd_hess_diag(z_mode, c_d))
            # needle directions are REAL (|hess| ~ 1e8 -> var ~ 1e-8)
            # but flat directions are prior-bounded: in z space every
            # bounded parameter's prior curvature is O(1) (logit scale)
            # and drift's is 1/4 — an unclipped 1/|hess| there launched
            # chains to z ~ 1e8 along data-flat directions (measured)
            var_z = 1.0 / np.clip(np.where(np.isfinite(hd), hd, 1.0),
                                  0.1, 1e10)
            masses.append(var_z.astype(np.float32))
            # chains start at the mode, jittered at the Laplace scale;
            # any jitter that lands past the |y| < ter barrier (-inf)
            # falls back to the mode itself
            zm = np.asarray(z_mode, np.float64)
            q0_d = zm + 0.5 * np.sqrt(var_z) \
                * rng.standard_normal((chains, dim))
            lp0 = np.asarray(lp_many(jnp.asarray(q0_d, jnp.float32),
                                     c_d), np.float64)
            q0_d = np.where(np.isfinite(lp0)[:, None], q0_d, zm)
            q0s.append(q0_d.astype(np.float32))
            continue
        cols = []
        for j, r in enumerate(ranges):
            if amort_mean is not None:
                x = (amort_mean[indices[d], j]
                     + 2.0 * amort_sd[indices[d], j]
                     * rng.standard_normal(chains))
                if bounds[j] is not None:
                    lo, hi = bounds[j]
                    w = hi - lo
                    x = np.clip(x, lo + 1e-3 * w, hi - 1e-3 * w)
            elif j == ter_j:
                x = rng.uniform(0.05, 1.0, chains) * (min_rt / 2.0)
            else:
                x = rng.uniform(*r, chains)
            if j == ter_j:
                # just below the barrier, not far below it: the needle
                # posteriors (alpha -> 0 => rt ~ ter) concentrate ter
                # right against min_rt, and an init 5% under it faces
                # the full ~1e6 gradient wall
                x = np.minimum(x, (1.0 - 1e-3) * min_rt)
            cols.append(x if bounds[j] is None
                        else _logit(x, *bounds[j]))
        q0s.append(np.stack(cols, axis=-1).astype(np.float32))
        if amort_mean is not None:
            var_z = np.ones(dim, np.float32)
            for b in range(dim):
                mean_x = amort_mean[indices[d], b]
                sd_x = amort_sd[indices[d], b]
                if bounds[b] is None:
                    var_z[b] = sd_x ** 2
                else:
                    lo, hi = bounds[b]
                    s = np.clip((mean_x - lo) / (hi - lo), 1e-3, 1 - 1e-3)
                    var_z[b] = (sd_x / ((hi - lo) * s * (1.0 - s))) ** 2
            masses.append(np.clip(var_z, 1e-6, 1e2))
        else:
            masses.append(np.ones(dim, np.float32))
    q0 = jnp.asarray(np.concatenate(q0s, axis=0))      # (D*C, dim)
    iv = jnp.asarray(np.repeat(np.stack(masses), chains, axis=0),
                     jnp.float32)                      # (D*C, dim)
    res = N.run_chains_chunked(
        logprob, q0, jax.random.fold_in(key, 1), n_warmup=warmup,
        n_samples=samples, thin=1, max_depth=max_depth, chunk=chunk,
        progress=progress, dense_mass=dense_mass, init_inv_mass=iv,
        checkpoint_path=checkpoint_path,
        ctx=NT.replicate_ctx(ctx, chains))
    z_all = np.asarray(res.samples).reshape(D, chains, samples, dim)
    theta_all = np.asarray(push(jnp.asarray(z_all)))
    out: Dict[int, ExactRefit] = {}
    for d, i in enumerate(indices):
        sdict = {name: np.transpose(theta_all[d][..., j], (1, 0))[None]
                 for j, name in enumerate(spec.param_names)}
        diags = diagnostic(sdict)
        flat = theta_all[d].reshape(-1, dim)
        out[i] = ExactRefit(
            index=i, samples=flat, mean=flat.mean(0), sd=flat.std(0),
            rhat_max=float(max(np.nanmax(diags[n]["rhat"])
                               for n in spec.param_names)),
            neff_min=float(min(np.nanmin(diags[n]["neff"])
                               for n in spec.param_names)),
            method="plain")
    return out


def certified_posterior(spec, trainer, state, data, mask, log_n, key, *,
                        draws: int = 2000, n_quad: int = 24,
                        draw_chunk: int = 64, khat_threshold: float = 0.7,
                        refit_flagged: int = 0, refit_opts: dict = None,
                        khat_neutra_max: float = 3.0,
                        rhat_escalate: float = 1.1,
                        nuts_checkpoint: Optional[str] = None,
                        progress: bool = False) -> CertifiedPosterior:
    """Fit every dataset amortized, certify each fit with PSIS, debias
    where certified, and exactly re-fit the ``refit_flagged`` worst-khat
    failures. ``data (B, N, C)``, ``mask (B, N)``, ``log_n (B, 1)`` in
    the amortizer's layout.

    Refit routing follows the measured khat bands (ROUND3.md): flagged
    datasets with khat < ``khat_neutra_max`` re-fit with NeuTra NUTS
    (the flow preconditions its own moderate errors — Rhat <= 1.004 at
    budgets where plain NUTS hits 5.6); datasets at saturated/extreme
    khat re-fit in PLAIN natural coordinates (there the flow transport
    itself is broken and NeuTra inherits the breakage — measured Rhat
    27-6.5e4). Each tier is one batched compiled program."""
    kind = _family(spec)
    data, mask = jnp.asarray(data), jnp.asarray(mask)
    log_n = jnp.asarray(log_n)
    post = trainer.sample(state, jax.random.fold_in(key, 0), data, mask,
                          log_n, draws)                # (B, S, P)
    logw = amortized_logw(spec, trainer, state, post, data, mask, log_n,
                          kind=kind, n_quad=n_quad,
                          draw_chunk=draw_chunk)
    logw, n_degen = I.sanitize_logw(logw)
    smoothed, khat = I.psis_smooth(logw)
    post_np = np.asarray(post, np.float64)
    deb_mean, deb_sd = I.weighted_moments(post_np, smoothed)
    cp = CertifiedPosterior(
        draws=np.asarray(post), khat=khat, weight_ess=I.weight_ess(smoothed),
        logw_smoothed=smoothed, n_degenerate=n_degen,
        raw_mean=post_np.mean(1), raw_sd=post_np.std(1),
        debiased_mean=deb_mean, debiased_sd=deb_sd,
        khat_threshold=khat_threshold)
    flagged = np.nonzero(~cp.certified)[0]
    if refit_flagged > 0 and flagged.size:
        _, neutra_sel, plain_sel = split_refits_by_khat(
            khat, flagged, refit_flagged, khat_neutra_max,
            n_degenerate=cp.n_degenerate)
        if neutra_sel:
            if progress:
                print(f"refitting datasets {neutra_sel} (khat "
                      f"{np.round(khat[neutra_sel], 2).tolist()}): "
                      f"batched NeuTra NUTS", flush=True)
            cp.refits.update(refit_exact_batch(
                spec, trainer, state, data, mask, log_n, neutra_sel,
                jax.random.fold_in(key, 1000), n_quad=n_quad,
                progress=progress,
                checkpoint_path=(f"{nuts_checkpoint}.neutra.npz"
                                 if nuts_checkpoint else None),
                **(refit_opts or {})))
        # NeuTra refits that failed to converge (a stuck chain is batch-
        # composition-dependent — measured on real data: the same
        # participant drew Rhat 1.001 in one 4-dataset batch and 134 in
        # another) escalate to the plain tier, where Laplace
        # preconditioning converged on every real-data refit tried
        escalate = [i for i, r in cp.refits.items()
                    if r.method == "neutra"
                    and r.rhat_max > rhat_escalate]
        esc_rhat = {i: cp.refits[i].rhat_max for i in escalate}
        if escalate and progress:
            print(f"escalating datasets {escalate} (NeuTra rhat "
                  f"{[round(esc_rhat[i], 2) for i in escalate]}"
                  f" > {rhat_escalate}) to plain coordinates", flush=True)
        plain_sel = plain_sel + escalate
        if plain_sel:
            if progress:
                print(f"refitting datasets {plain_sel} (khat "
                      f"{np.round(khat[plain_sel], 2).tolist()}): "
                      f"batched plain-coordinate NUTS "
                      f"(Laplace-preconditioned)", flush=True)
            cp.refits.update(refit_plain_batch(
                spec, trainer, state, data, mask, log_n, plain_sel,
                jax.random.fold_in(key, 2000), n_quad=n_quad,
                amort_mean=cp.raw_mean, amort_sd=cp.raw_sd,
                init_draws=cp.draws, progress=progress,
                checkpoint_path=(f"{nuts_checkpoint}.plain.npz"
                                 if nuts_checkpoint else None),
                **(refit_opts or {})))
            for i, r0 in esc_rhat.items():
                cp.refits[i].escalated_from_rhat = r0
    return cp
