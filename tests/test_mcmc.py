"""MCMC backend tests: WFPT density correctness, HMC on known targets, and
a small-scale hierarchical dcDDM recovery (the reference's cross-backend
agreement check, SURVEY.md §4 item 2)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesflow_nddms_tpu.mcmc import hmc as H
from bayesflow_nddms_tpu.mcmc import models as M
from bayesflow_nddms_tpu.mcmc.wfpt import diffusion_logpdf, wfpt_logpdf_lower
from bayesflow_nddms_tpu.ops.ddm_sim import first_passage


def _analytic_p_lower(v, a, w):
    """P(hit lower) for drift v, boundary a, start w*a, unit dc."""
    if v == 0:
        return 1 - w
    th = 2.0 * v
    return (math.exp(-th * a * w) - math.exp(-th * a)) / (1 - math.exp(-th * a))


@pytest.mark.parametrize("v,a,w", [
    (1.0, 1.5, 0.5), (0.0, 1.0, 0.3), (-1.5, 2.0, 0.6), (2.5, 0.8, 0.5),
])
def test_wfpt_integrates_to_choice_probability(v, a, w):
    ts = jnp.linspace(1e-4, 30.0, 60000)
    pdf = jnp.exp(wfpt_logpdf_lower(ts, v, a, w))
    mass = float(jnp.trapezoid(pdf, ts))
    assert abs(mass - _analytic_p_lower(v, a, w)) < 2e-3


def test_wfpt_log_space_matches_linear_form_in_normal_regime():
    """The grouped log-space evaluation is exact algebra: it must match
    the classic linear-space Navarro-Fuss form (reconstructed here from
    the series primitives) everywhere the latter is numerically sound."""
    from bayesflow_nddms_tpu.mcmc.wfpt import _fpt_large, _fpt_small
    rng = np.random.default_rng(7)
    n = 5000
    t = jnp.asarray(rng.uniform(0.05, 3.0, n), jnp.float32)
    v = jnp.asarray(rng.uniform(-4, 4, n), jnp.float32)
    a = jnp.asarray(rng.uniform(0.3, 3.0, n), jnp.float32)
    w = jnp.asarray(rng.uniform(0.05, 0.95, n), jnp.float32)
    tt = jnp.maximum(t / (a * a), 1e-9)
    f0 = jnp.where(tt < 0.35, _fpt_small(tt, w), _fpt_large(tt, w))
    old = np.asarray(jnp.log(jnp.maximum(f0, 1e-29)) - jnp.log(a * a)
                     - v * a * w - v * v * t / 2.0)
    new = np.asarray(wfpt_logpdf_lower(t, v, a, w))
    m = old > -60          # above the old form's log-eps floor
    assert m.sum() > 4000
    assert np.max(np.abs(new[m] - old[m])) < 1e-3


def test_wfpt_needle_regime_no_positive_garbage():
    """dc -> 0 regression: the expanded linear-space form cancels
    +-(delta*alpha/dc^2)-scale terms and emitted spurious per-trial
    log-densities of +1e6 in float32 (fake +1e30 posterior modes on
    near-deterministic datasets — ROUND3.md). The grouped log-space
    evaluation must stay physical: smooth and moderate where the data
    match the deterministic crossing, hugely NEGATIVE where they don't,
    never garbage-positive, with finite gradients."""
    rts = jnp.linspace(1.2048, 1.2591, 12)
    args = dict(boundary=jnp.float32(1.1097), ndt=jnp.float32(0.9472),
                beta=jnp.float32(0.4842), drift=jnp.float32(-1.897))
    lp = np.asarray(diffusion_logpdf(-rts, dc=jnp.float32(0.0343), **args))
    assert np.all(np.isfinite(lp))
    assert np.all(lp < 20.0)          # physically sensible density heights
    assert np.max(lp) > -10.0         # ... and the window is plausible
    # mismatched deterministic crossing: astronomically unlikely, not +garbage
    lp2 = np.asarray(diffusion_logpdf(-rts, dc=jnp.float32(1e-4), **args))
    assert np.all(np.isfinite(lp2)) and np.all(lp2 < -100.0)
    # gradients stay finite on both sides of the needle
    g = jax.grad(lambda d: jnp.sum(diffusion_logpdf(-rts, dc=d, **args)))
    assert np.isfinite(float(g(jnp.float32(0.0343))))
    assert np.isfinite(float(g(jnp.float32(1e-4))))


def test_wfpt_series_agree_around_switch():
    """Small- and large-time series must agree to ~1e-5 relative in a wide
    band around the tt=0.35 crossover, for several start points."""
    from bayesflow_nddms_tpu.mcmc.wfpt import _fpt_large, _fpt_small
    tts = jnp.linspace(0.15, 0.7, 23)
    for w in [0.2, 0.45, 0.5, 0.8]:
        fs = np.asarray(_fpt_small(tts, jnp.full_like(tts, w)))
        fl = np.asarray(_fpt_large(tts, jnp.full_like(tts, w)))
        rel = np.abs(fs - fl) / np.maximum(fs, 1e-8)
        assert np.max(rel) < 1e-5


@pytest.mark.slow
def test_diffusion_logpdf_matches_simulation_histogram():
    """Density vs fine-dt EM simulation for a dcDDM (dc != 1) — the latent
    consistency check the reference relies on (SURVEY.md §4 item 6)."""
    # dt small enough that the EM boundary-overshoot bias
    # (~0.58*dc*sqrt(dt) effective widening) is < 1% of the boundary
    drift, bound, beta, ndt, dc = 1.2, 1.4, 0.45, 0.3, 1.0
    n, dt = 300_000, 2e-4
    fp = first_passage(jax.random.PRNGKey(0), drift, bound, beta, dc,
                       shape=(1, n), dt=dt, max_steps=60_000, chunk=512)
    steps = np.asarray(fp.steps[0])
    choice = np.asarray(fp.choice[0]).astype(int)
    rt = steps * dt + ndt
    y = rt * choice
    # histogram of upper-boundary RTs
    upper = y[choice == 1]
    hist, edges = np.histogram(upper, bins=30, range=(ndt, ndt + 1.6),
                               density=False)
    centers = 0.5 * (edges[:-1] + edges[1:])
    emp_dens = hist / n / (edges[1] - edges[0])
    mod_dens = np.exp(np.asarray(diffusion_logpdf(
        jnp.asarray(centers, jnp.float32), bound, ndt, beta, drift, dc)))
    keep = emp_dens > 5e-3
    rel = np.abs(mod_dens[keep] - emp_dens[keep]) / emp_dens[keep]
    assert np.median(rel) < 0.08  # EM discretization + MC noise budget


def test_eta_marginal_matches_quadrature():
    """The closed-form Gaussian-drift marginal must equal brute-force
    numerical integration of wfpt(y|delta) * N(delta; m, eta) over a wide
    delta grid, on both boundaries and across eta scales."""
    from bayesflow_nddms_tpu.mcmc.wfpt import diffusion_eta_logpdf
    bound, ndt, beta, dc = 1.4, 0.3, 0.45, 1.3
    ys = jnp.asarray([0.55, 0.9, 1.8, -0.62, -1.1], jnp.float32)
    for m, eta in [(1.2, 0.5), (0.0, 1.0), (-0.8, 0.25), (2.0, 2.0)]:
        closed = np.asarray(diffusion_eta_logpdf(
            ys, bound, ndt, beta, m, eta, dc))
        deltas = np.linspace(m - 8 * eta, m + 8 * eta, 4001)
        dd = deltas[1] - deltas[0]
        lps = np.asarray(diffusion_logpdf(
            ys[:, None], bound, ndt, beta,
            jnp.asarray(deltas, jnp.float32)[None, :], dc))
        wts = (np.exp(-(deltas - m) ** 2 / (2 * eta ** 2))
               / np.sqrt(2 * np.pi * eta ** 2) * dd)
        brute = np.log(np.exp(lps) @ wts)
        np.testing.assert_allclose(closed, brute, rtol=0, atol=2e-3)


def test_eta_marginal_zero_eta_limit():
    """eta -> 0 must reduce exactly to the fixed-drift density."""
    from bayesflow_nddms_tpu.mcmc.wfpt import diffusion_eta_logpdf
    ys = jnp.asarray([0.5, 1.2, -0.7, -2.0], jnp.float32)
    fixed = np.asarray(diffusion_logpdf(ys, 1.2, 0.25, 0.4, 0.9, 1.1))
    marg = np.asarray(diffusion_eta_logpdf(ys, 1.2, 0.25, 0.4, 0.9,
                                           0.0, 1.1))
    np.testing.assert_allclose(marg, fixed, rtol=1e-5, atol=1e-5)


def test_eta_marginal_matches_exact_sampler():
    """Density vs the exact rejection sampler WITH drift variability
    (simulratcliff's Eta argument, pyhddmjagsutils.py:47-176) — the
    latent consistency check extended to the eta family."""
    from bayesflow_nddms_tpu.mcmc.wfpt import diffusion_eta_logpdf
    from bayesflow_nddms_tpu.ops.exact_sampler import simulate_exact
    m, eta, bound, ndt, beta, dc = 1.0, 0.8, 1.3, 0.3, 0.5, 1.2
    n = 300_000
    y = np.asarray(simulate_exact(jax.random.PRNGKey(3), n=n, alpha=bound,
                                  tau=ndt, nu=m, beta=beta, eta=eta,
                                  varsigma=dc))
    upper = y[y > 0]
    hist, edges = np.histogram(upper, bins=30, range=(ndt, ndt + 1.6))
    centers = 0.5 * (edges[:-1] + edges[1:])
    emp_dens = hist / n / (edges[1] - edges[0])
    mod_dens = np.exp(np.asarray(diffusion_eta_logpdf(
        jnp.asarray(centers, jnp.float32), bound, ndt, beta, m, eta, dc)))
    keep = emp_dens > 5e-3
    rel = np.abs(mod_dens[keep] - emp_dens[keep]) / emp_dens[keep]
    assert np.median(rel) < 0.08
    # choice probability must match too
    p_up_emp = float((y > 0).mean())
    ts = np.linspace(ndt + 1e-4, ndt + 30.0, 60_000)
    pdf = np.exp(np.asarray(diffusion_eta_logpdf(
        jnp.asarray(ts, jnp.float32), bound, ndt, beta, m, eta, dc)))
    p_up_mod = float(np.trapezoid(pdf, ts))
    assert abs(p_up_emp - p_up_mod) < 0.01


def test_eta_cov_joint_matches_quadrature():
    """Joint (choice-RT, covariate) marginal vs brute-force integration —
    the single_trial_drift2 observation model."""
    from bayesflow_nddms_tpu.mcmc.wfpt import diffusion_eta_cov_logpdf
    bound, ndt, beta, dc = 1.2, 0.28, 0.5, 1.0
    m, eta, s1 = 1.1, 0.6, 0.8
    ys = jnp.asarray([0.5, 1.1, -0.8], jnp.float32)
    es = jnp.asarray([1.4, 0.2, -0.5], jnp.float32)
    closed = np.asarray(diffusion_eta_cov_logpdf(
        ys, es, bound, ndt, beta, m, eta, dc, s1))
    deltas = np.linspace(m - 8 * eta, m + 8 * eta, 4001)
    dd = deltas[1] - deltas[0]
    lps = np.asarray(diffusion_logpdf(
        ys[:, None], bound, ndt, beta,
        jnp.asarray(deltas, jnp.float32)[None, :], dc))
    prior_w = (np.exp(-(deltas - m) ** 2 / (2 * eta ** 2))
               / np.sqrt(2 * np.pi * eta ** 2) * dd)
    like_e = (np.exp(-(np.asarray(es)[:, None] - deltas[None, :]) ** 2
                     / (2 * s1 ** 2)) / np.sqrt(2 * np.pi * s1 ** 2))
    brute = np.log(np.sum(np.exp(lps) * like_e * prior_w[None, :], axis=1))
    np.testing.assert_allclose(closed, brute, rtol=0, atol=2e-3)
    # capped trial: only the covariate evidence term survives
    capped = np.asarray(diffusion_eta_cov_logpdf(
        jnp.float32(0.0), jnp.float32(1.4), bound, ndt, beta, m, eta, dc,
        s1, observed=jnp.asarray(False)))
    ev = (-0.5 * np.log(2 * np.pi * (eta ** 2 + s1 ** 2))
          - (1.4 - m) ** 2 / (2 * (eta ** 2 + s1 ** 2)))
    np.testing.assert_allclose(capped, ev, rtol=1e-5, atol=1e-5)


def test_diffusion_logpdf_guard_small_rt():
    """|y| < ndt must hit the guard, not produce nan
    (basic_ddm_dc_pystan2.py:122-124)."""
    lp = diffusion_logpdf(jnp.float32(0.1), 1.0, 0.3, 0.5, 1.0, 1.0)
    assert np.isfinite(float(lp))


def test_diffusion_logpdf_guard_is_a_barrier():
    """The impossible region ndt > |y| must be steeply penalized — the
    bare t_dec = 1e-4 remap leaves a FINITE spurious mode there that
    long-warmup NUTS chains find (observed: flagship ter -> 1.5 with all
    RTs < 1.2). The penalty must be zero in the legitimate region and
    make any material violation catastrophically unlikely."""
    legit = float(diffusion_logpdf(jnp.float32(0.8), 1.0, 0.3, 0.5,
                                   1.0, 1.0))
    # the same observation with ndt pushed above |y|
    bad = float(diffusion_logpdf(jnp.float32(0.8), 1.0, 1.3, 0.5, 1.0, 1.0))
    assert np.isfinite(bad) and bad < legit - 1e3
    # the penalty is exactly zero whenever ndt < |y|: nudging ndt within
    # the legit region changes the density only through the WFPT term
    a = float(diffusion_logpdf(jnp.float32(0.8), 1.0, 0.30, 0.5, 1.0, 1.0))
    assert abs(a - legit) < 1e-6


def test_hmc_gaussian_target():
    """HMC must recover mean/var of a correlated Gaussian."""
    cov = jnp.array([[1.0, 0.6], [0.6, 2.0]])
    prec = jnp.linalg.inv(cov)
    mu = jnp.array([1.0, -2.0])

    def logp(q):
        d = q - mu
        return -0.5 * d @ prec @ d

    q0 = jnp.zeros((4, 2))
    res = H.run_chains(logp, q0, jax.random.PRNGKey(0), n_warmup=400,
                       n_samples=800, n_leapfrog=16)
    samp = np.asarray(res.samples).reshape(-1, 2)
    assert np.all(np.asarray(res.accept_rate) > 0.5)
    np.testing.assert_allclose(samp.mean(0), np.asarray(mu), atol=0.15)
    np.testing.assert_allclose(samp.var(0), np.diag(np.asarray(cov)),
                               rtol=0.25)


@pytest.mark.slow
def test_hierarchical_dcddm_small_recovery():
    """End-to-end exact-likelihood fit on simulated data: Rhat close to 1
    and per-participant alpha/delta correlate with the truth (the quality
    gates of basic_ddm_dc_pyjags.py:212 and its recovery plots)."""
    rng = np.random.default_rng(3)
    P, T = 6, 300
    alpha = rng.uniform(0.9, 1.4, P)
    ndt = rng.uniform(0.2, 0.45, P)
    beta = rng.uniform(0.4, 0.6, P)
    delta = rng.uniform(-3, 3, P)
    varsigma = rng.uniform(0.9, 1.4, P)

    fp = first_passage(
        jax.random.PRNGKey(1),
        jnp.asarray(delta)[:, None], jnp.asarray(alpha)[:, None],
        jnp.asarray(beta)[:, None], jnp.asarray(varsigma)[:, None],
        shape=(P, T), dt=0.001, max_steps=15_000)
    steps = np.asarray(fp.steps)
    choice = np.asarray(fp.choice).astype(int)
    rt = steps * 0.001 + ndt[:, None]
    y = (rt * choice).ravel()
    part = np.repeat(np.arange(P), T)
    keep = y != 0
    data = M.DcDDMData(y=jnp.asarray(y[keep], jnp.float32),
                       participant=jnp.asarray(part[keep], jnp.int32),
                       nparts=P)
    logprob, _, dim = M.make_logprob(data)
    min_rt = np.array([np.abs(y[part == p][y[part == p] != 0]).min()
                       for p in range(P)])
    q0 = M.initial_positions(jax.random.PRNGKey(2), data, 2,
                             jnp.asarray(min_rt, jnp.float32))
    from bayesflow_nddms_tpu.mcmc import nuts as N
    res = N.run_chains(logprob, q0, jax.random.PRNGKey(3), n_warmup=400,
                       n_samples=400, max_depth=6)
    sdict = M.samples_to_dict(np.asarray(res.samples), data)
    from bayesflow_nddms_tpu.diagnostics.convergence import diagnostic
    diags = diagnostic({k: np.asarray(v) for k, v in sdict.items()},
                       verbose=False)
    # ndt/beta are sharply identified and must converge; delta/alpha/
    # varsigma sit on the alpha/varsigma scale ridge (the subject of the
    # paper) where 2x400 samples can't pin absolute scale — assert their
    # RELATIVE recovery via pooled-mean correlations instead of Rhat.
    assert np.nanmax(diags["ndt"]["rhat"]) < 1.2
    assert np.nanmax(diags["beta"]["rhat"]) < 1.3
    post_alpha = np.asarray(sdict["alpha"]).mean(axis=(1, 2))
    post_vs = np.asarray(sdict["varsigma"]).mean(axis=(1, 2))
    post_delta = np.asarray(sdict["delta"]).mean(axis=(1, 2))
    assert np.corrcoef(post_delta, delta)[0, 1] > 0.9
    # along the scale ridge the sharply identified quantity is alpha /
    # varsigma (the rescaled boundary the likelihood actually sees)
    assert np.corrcoef(post_alpha / post_vs, alpha / varsigma)[0, 1] > 0.8


def test_nuts_gaussian_target():
    """NUTS must recover mean/cov of a correlated Gaussian with healthy
    acceptance and adaptive depth."""
    from bayesflow_nddms_tpu.mcmc import nuts as N
    cov = jnp.array([[1.0, 0.6], [0.6, 2.0]])
    prec = jnp.linalg.inv(cov)
    mu = jnp.array([1.0, -2.0])

    def logp(q):
        d = q - mu
        return -0.5 * d @ prec @ d

    q0 = jnp.zeros((4, 2))
    res = N.run_chains(logp, q0, jax.random.PRNGKey(0), n_warmup=300,
                       n_samples=600, max_depth=6)
    samp = np.asarray(res.samples).reshape(-1, 2)
    assert np.all(np.asarray(res.accept_prob) > 0.6)
    assert float(np.asarray(res.mean_depth).mean()) >= 1.0
    np.testing.assert_allclose(samp.mean(0), np.asarray(mu), atol=0.15)
    np.testing.assert_allclose(samp.var(0), np.diag(np.asarray(cov)),
                               rtol=0.25)
    # chains must mix: split-Rhat close to 1
    from bayesflow_nddms_tpu.diagnostics.convergence import split_rhat
    # (chains, samples, dim) -> (dim, samples, chains)
    r = split_rhat(np.transpose(np.asarray(res.samples), (2, 1, 0)))
    assert np.all(r < 1.05)


def test_nuts_dense_mass_tames_ridge():
    """On a rho=.99 correlated Gaussian (the shape of the dcDDM
    alpha/varsigma ridge), full-covariance mass adaptation must find a
    much larger step size than diagonal mass at comparable accuracy, and
    mesh-sharded chains must reproduce unsharded chains exactly."""
    from bayesflow_nddms_tpu.mcmc import nuts as N
    from bayesflow_nddms_tpu.parallel.mesh import make_mesh
    rho = 0.99
    cov = jnp.array([[1.0, rho], [rho, 1.0]])
    prec = jnp.linalg.inv(cov)

    def logp(q):
        return -0.5 * q @ prec @ q

    q0 = jnp.zeros((8, 2)) + jnp.array([1.0, -1.0])
    key = jax.random.PRNGKey(0)
    dense = N.run_chains_chunked(logp, q0, key, n_warmup=400, n_samples=300,
                                 chunk=400, dense_mass=True)
    diag = N.run_chains_chunked(logp, q0, key, n_warmup=400, n_samples=300,
                                chunk=400, dense_mass=False)
    eps_dense = float(np.asarray(dense.step_size).mean())
    eps_diag = float(np.asarray(diag.step_size).mean())
    assert eps_dense > 2.5 * eps_diag, (eps_dense, eps_diag)
    s = np.asarray(dense.samples).reshape(-1, 2)
    np.testing.assert_allclose(s.mean(0), 0.0, atol=0.1)
    np.testing.assert_allclose(np.cov(s.T), np.asarray(cov), atol=0.15)
    # sharded chains: identical streams => identical samples
    sharded = N.run_chains_chunked(logp, q0, key, n_warmup=100,
                                   n_samples=100, chunk=100,
                                   dense_mass=True, mesh=make_mesh(8))
    unsharded = N.run_chains_chunked(logp, q0, key, n_warmup=100,
                                     n_samples=100, chunk=100,
                                     dense_mass=True)
    np.testing.assert_allclose(np.asarray(sharded.samples),
                               np.asarray(unsharded.samples),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_nuts_matches_hmc_on_dcddm_subset():
    """NUTS and HMC posteriors must agree on a small dcDDM fit (cross-
    sampler agreement, the reference's JAGS-vs-Stan check)."""
    from bayesflow_nddms_tpu.mcmc import nuts as N
    rng = np.random.default_rng(9)
    P, T = 3, 200
    alpha = rng.uniform(1.0, 1.3, P)
    ndt = rng.uniform(0.25, 0.4, P)
    beta = np.full(P, 0.5)
    delta = rng.uniform(-2, 2, P)
    varsigma = rng.uniform(0.9, 1.2, P)
    fp = first_passage(
        jax.random.PRNGKey(1),
        jnp.asarray(delta)[:, None], jnp.asarray(alpha)[:, None],
        jnp.asarray(beta)[:, None], jnp.asarray(varsigma)[:, None],
        shape=(P, T), dt=0.001, max_steps=15_000)
    rt = np.asarray(fp.steps) * 0.001 + ndt[:, None]
    y = (rt * np.asarray(fp.choice).astype(int)).ravel()
    part = np.repeat(np.arange(P), T)
    keep = y != 0
    data = M.DcDDMData(y=jnp.asarray(y[keep], jnp.float32),
                       participant=jnp.asarray(part[keep], jnp.int32),
                       nparts=P)
    logprob, _, dim = M.make_logprob(data)
    q0 = M.initial_positions(jax.random.PRNGKey(2), data, 2)
    res_h = H.run_chains(logprob, q0, jax.random.PRNGKey(3), n_warmup=300,
                         n_samples=300, n_leapfrog=24)
    res_n = N.run_chains(logprob, q0, jax.random.PRNGKey(4), n_warmup=300,
                         n_samples=300, max_depth=7)
    d_h = M.samples_to_dict(np.asarray(res_h.samples), data)
    d_n = M.samples_to_dict(np.asarray(res_n.samples), data)
    # tolerance ~ a few MC standard errors of each posterior mean (600
    # correlated draws): delta posteriors are ~0.3-0.5 wide, ndt ~0.02
    for name, atol in [("delta", 0.25), ("ndt", 0.05)]:
        mh = np.asarray(d_h[name]).mean(axis=(1, 2))
        mn = np.asarray(d_n[name]).mean(axis=(1, 2))
        np.testing.assert_allclose(mh, mn, atol=atol)


@pytest.mark.slow
def test_nuts_chunked_matches_monolithic():
    """run_chains_chunked must sample the same distribution as run_chains."""
    from bayesflow_nddms_tpu.mcmc import nuts as N
    mu = jnp.array([0.5, -1.0, 2.0])

    def logp(q):
        return -0.5 * jnp.sum((q - mu) ** 2)

    q0 = jnp.zeros((3, 3))
    res_a = N.run_chains(logp, q0, jax.random.PRNGKey(0), n_warmup=200,
                         n_samples=400, max_depth=5)
    res_b = N.run_chains_chunked(logp, q0, jax.random.PRNGKey(1),
                                 n_warmup=200, n_samples=400, max_depth=5,
                                 chunk=64)
    sa = np.asarray(res_a.samples).reshape(-1, 3)
    sb = np.asarray(res_b.samples).reshape(-1, 3)
    assert sb.shape == sa.shape
    np.testing.assert_allclose(sa.mean(0), sb.mean(0), atol=0.12)
    np.testing.assert_allclose(sa.var(0), sb.var(0), rtol=0.3)


def test_nuts_checkpoint_resume_bit_identical(tmp_path):
    """A run killed mid-warmup or mid-sampling and resumed from its chunk
    checkpoint must produce BIT-identical samples to an uninterrupted run
    (the state is carried exactly, not re-derived), and a checkpoint from
    a different configuration must be ignored."""
    from bayesflow_nddms_tpu.mcmc import nuts as N
    mu = jnp.array([0.5, -1.0])

    def logp(q):
        return -0.5 * jnp.sum((q - mu) ** 2)

    q0 = jnp.zeros((3, 2))
    key = jax.random.PRNGKey(5)
    kw = dict(n_warmup=40, n_samples=30, max_depth=5, chunk=10)
    ref = N.run_chains_chunked(logp, q0, key, **kw)

    class _Boom(RuntimeError):
        pass

    for kill_phase, kill_after in (("warmup", 2), ("sampling", 1)):
        ckpt = str(tmp_path / f"nuts_{kill_phase}.npz")
        calls = {"n": 0}
        orig = N._sample_chunk if kill_phase == "sampling" \
            else N._warmup_chunk

        def bomb(*a, **k):
            calls["n"] += 1
            if calls["n"] > kill_after:
                raise _Boom()
            return orig(*a, **k)

        name = ("_sample_chunk" if kill_phase == "sampling"
                else "_warmup_chunk")
        setattr(N, name, bomb)
        try:
            with pytest.raises(_Boom):
                N.run_chains_chunked(logp, q0, key, checkpoint_path=ckpt,
                                     **kw)
        finally:
            setattr(N, name, orig)
        res = N.run_chains_chunked(logp, q0, key, checkpoint_path=ckpt,
                                   **kw)
        np.testing.assert_array_equal(np.asarray(res.samples),
                                      np.asarray(ref.samples),
                                      err_msg=f"kill in {kill_phase}")

    # a checkpoint from different run settings is refused, not mixed in
    ckpt = str(tmp_path / "nuts_sampling.npz")
    with pytest.warns(UserWarning, match="different run configuration"):
        res = N.run_chains_chunked(logp, q0, key, n_warmup=40, n_samples=20,
                                   max_depth=5, chunk=10,
                                   checkpoint_path=ckpt)
    assert np.asarray(res.samples).shape[1] == 20

    # ... and so is one from different INITIAL STATE of the same shape:
    # changed q0 or changed preconditioning must invalidate the checkpoint
    # (a same-shape resume once silently ignored an initialization fix —
    # the content digest in the fingerprint catches it)
    ckpt2 = str(tmp_path / "nuts_content.npz")
    N.run_chains_chunked(logp, q0, key, checkpoint_path=ckpt2, **kw)
    with pytest.warns(UserWarning, match="different run configuration"):
        N.run_chains_chunked(logp, q0 + 0.1, key, checkpoint_path=ckpt2,
                             **kw)
    N.run_chains_chunked(logp, q0, key, checkpoint_path=ckpt2, **kw)
    with pytest.warns(UserWarning, match="different run configuration"):
        N.run_chains_chunked(logp, q0, key, checkpoint_path=ckpt2,
                             init_inv_mass=jnp.full((2,), 0.5), **kw)


@pytest.mark.slow
def test_ridge_parameterization_same_posterior():
    """'ridge' coordinates (log(alpha/varsigma), delta/varsigma,
    log varsigma) sample the SAME posterior as the natural sigmoid
    coordinates — posterior means must agree within MC error — while
    mixing dramatically better on the alpha/varsigma scale ridge
    (measured round 2: Rhat 6 -> 1.006 at half the budget)."""
    import numpy as np
    from bayesflow_nddms_tpu.mcmc import models as M
    from bayesflow_nddms_tpu.mcmc import nuts as N
    from bayesflow_nddms_tpu.ops.exact_sampler import simulate_participants

    P, T = 4, 200
    rng = np.random.default_rng(3)
    alpha = rng.uniform(0.9, 1.3, P)
    ndt = rng.uniform(0.2, 0.5, P)
    beta = rng.uniform(0.4, 0.6, P)
    delta = rng.uniform(-2, 2, P)
    varsigma = rng.uniform(0.9, 1.3, P)
    y = np.asarray(simulate_participants(
        jax.random.PRNGKey(0), P, T,
        jnp.asarray(alpha, jnp.float32), jnp.asarray(ndt, jnp.float32),
        jnp.asarray(delta, jnp.float32), jnp.asarray(beta, jnp.float32),
        jnp.zeros(P, jnp.float32), jnp.asarray(varsigma, jnp.float32)))
    part = np.repeat(np.arange(P), T)
    data = M.DcDDMData(y=jnp.asarray(y.ravel(), jnp.float32),
                       participant=jnp.asarray(part, jnp.int32), nparts=P)
    min_rt = np.array([np.abs(y[i]).min() for i in range(P)])

    means = {}
    for param in ("natural", "ridge"):
        logprob, _, dim = M.make_logprob(data, parameterization=param)
        q0 = M.initial_positions(jax.random.PRNGKey(1), data, 4,
                                 jnp.asarray(min_rt, jnp.float32),
                                 parameterization=param)
        res = N.run_chains_chunked(logprob, q0, jax.random.PRNGKey(2),
                                   n_warmup=400, n_samples=400, chunk=400,
                                   max_depth=7)
        sdict = M.samples_to_dict(np.asarray(res.samples), data,
                                  parameterization=param)
        means[param] = {k: np.asarray(v).mean(axis=(1, 2))
                        for k, v in sdict.items()}
    # sharply identified quantities agree tightly
    np.testing.assert_allclose(means["ridge"]["ndt"],
                               means["natural"]["ndt"], atol=0.02)
    ratio_r = means["ridge"]["alpha"] / means["ridge"]["varsigma"]
    ratio_n = means["natural"]["alpha"] / means["natural"]["varsigma"]
    np.testing.assert_allclose(ratio_r, ratio_n, rtol=0.1)
    np.testing.assert_allclose(means["ridge"]["beta"],
                               means["natural"]["beta"], atol=0.06)


def test_flagship_logprob_matches_numpy():
    """make_logprob_flagship against an independent numpy restatement of
    the flagship joint density (priors + quantile-latent boundaries +
    covariate normal + per-trial Wiener term)."""
    from scipy import stats as ss
    from bayesflow_nddms_tpu.mcmc.wfpt import diffusion_logpdf

    rng = np.random.default_rng(5)
    P, T = 2, 10
    N_ = P * T
    y = (rng.uniform(0.5, 1.2, N_) * rng.choice([-1, 1], N_)).astype(
        np.float32)
    ext = rng.normal(1.4, 0.6, N_).astype(np.float32)
    part = np.repeat(np.arange(P, dtype=np.int32), T)
    valid = np.ones(N_, bool)
    valid[3] = False
    data = M.FlagshipData(y=jnp.asarray(y), ext=jnp.asarray(ext),
                          participant=jnp.asarray(part), nparts=P,
                          valid=jnp.asarray(valid))
    logprob, unflatten, dim = M.make_logprob_flagship(data)
    z = rng.normal(0, 0.8, dim).astype(np.float32)

    # --- numpy restatement ---
    def sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    names = M._FLAG_ORDER
    raw = {nm: z[i * P:(i + 1) * P] for i, nm in enumerate(names)}
    uz = z[7 * P:]
    th = {"drift": raw["drift"]}
    lp = ss.norm(0, 2).logpdf(th["drift"]).sum()
    for nm in names[1:]:
        lo, hi = M._FLAG_BOUNDS[nm]
        s = sigmoid(raw[nm])
        x = lo + (hi - lo) * s
        th[nm] = x
        lp += (np.log(hi - lo) + np.log(s) + np.log(1 - s)).sum()
        if nm == "mu_alpha":
            d_ = ss.truncnorm(-2.0, 18.0, 1.0, 0.5)
        elif nm == "beta":
            d_ = ss.beta(2, 2)
        elif nm == "ter":
            d_ = ss.truncnorm(-2.0, 4.0, 0.5, 0.25)
        elif nm == "std_alpha":
            d_ = ss.truncnorm(-2.0, 4.0, 1.0, 0.5)
        elif nm == "dc":
            d_ = ss.truncnorm(-2.0, 18.0, 1.0, 0.5)
        else:  # sigma1 ~ U(0, 5)
            d_ = ss.uniform(0, 5)
        lp += d_.logpdf(x).sum()
    s = sigmoid(uz)
    lp += (np.log(s) + np.log(1 - s)).sum()
    mu, sd = th["mu_alpha"][part], th["std_alpha"][part]
    p_lo = ss.norm.cdf(-mu / sd)
    pq = np.clip(p_lo + s * (1 - p_lo), 1e-7, 1 - 1e-7)
    bound = np.maximum(mu + sd * ss.norm.ppf(pq), 1e-4)
    s1 = th["sigma1"][part]
    lp += ss.norm(bound, s1).logpdf(ext).sum()
    y_safe = np.where(valid, y, 2.0)
    ll = np.asarray(diffusion_logpdf(
        jnp.asarray(y_safe), jnp.asarray(bound, jnp.float32),
        jnp.asarray(th["ter"][part], jnp.float32),
        jnp.asarray(th["beta"][part], jnp.float32),
        jnp.asarray(th["drift"][part], jnp.float32),
        jnp.asarray(th["dc"][part], jnp.float32)))
    lp += np.where(valid, ll, 0.0).sum()

    got = float(logprob(jnp.asarray(z)))
    np.testing.assert_allclose(got, lp, rtol=2e-4)


@pytest.mark.slow
def test_flagship_exact_small_recovery():
    """NUTS on the exact flagship posterior (globals + per-trial latent
    boundaries) recovers the generating globals on simulated data — the
    trial-level-variability check the reference's JAGS/Stan backends never
    had (they only ever fit the dcDDM, basic_ddm_dc_pyjags.py)."""
    from bayesflow_nddms_tpu.mcmc import nuts as N
    from bayesflow_nddms_tpu.models import zoo
    from bayesflow_nddms_tpu.models.spec import trial_mask

    spec = zoo.get_model("single_trial_alpha_not_scaled")
    rng = np.random.default_rng(7)
    P = 2
    theta = np.stack([
        rng.uniform(1.0, 2.5, P),      # drift
        rng.uniform(1.0, 1.5, P),      # mu_alpha
        rng.uniform(0.45, 0.55, P),    # beta
        rng.uniform(0.2, 0.4, P),      # ter
        rng.uniform(0.4, 0.8, P),      # std_alpha
        rng.uniform(0.9, 1.2, P),      # dc
        rng.uniform(0.6, 1.2, P),      # sigma1
    ], axis=-1).astype(np.float32)
    n = np.array([260, 300])
    mask = trial_mask(jnp.asarray(n), 300)
    data = np.asarray(spec.simulate(jax.random.PRNGKey(3),
                                    jnp.asarray(theta), 300, active=mask))
    m = np.asarray(mask)
    yy, ext = data[..., 0], data[..., 1]
    ds, tr = np.nonzero(m & (yy != 0))
    mdata = M.FlagshipData(
        y=jnp.asarray(yy[ds, tr]), ext=jnp.asarray(ext[ds, tr]),
        participant=jnp.asarray(ds, jnp.int32), nparts=P,
        valid=jnp.ones(len(ds), bool))
    logprob, _, dim = M.make_logprob_flagship(mdata)
    min_rt = np.array([np.abs(yy[p][m[p] & (yy[p] != 0)]).min()
                       for p in range(P)])
    q0 = M.flagship_initial_positions(jax.random.PRNGKey(4), mdata, 2,
                                      jnp.asarray(min_rt, jnp.float32))
    res = N.run_chains_chunked(logprob, q0, jax.random.PRNGKey(5),
                               n_warmup=300, n_samples=300, max_depth=7,
                               chunk=100)
    sdict = M.flagship_samples_to_dict(np.asarray(res.samples), mdata)
    post = {k: np.asarray(v).mean(axis=(1, 2)) for k, v in sdict.items()}
    # sharply identified globals must land near the truth
    for i, nm in enumerate(M._FLAG_ORDER):
        if nm in ("drift", "mu_alpha", "ter"):
            sd = np.asarray(sdict[nm]).std(axis=(1, 2))
            err = np.abs(post[nm] - theta[:, i])
            assert np.all(err < np.maximum(4.5 * sd, 0.15)), (
                nm, post[nm], theta[:, i], sd)


def test_flagship_ridge_logprob_finite_and_roundtrip():
    """Ridge coordinates: logprob and its gradient are finite at
    overdispersed inits, and samples_to_dict inverts the coordinate map
    (mu_alpha = exp(slot) * dc etc.)."""
    rng = np.random.default_rng(9)
    P, T = 2, 12
    N_ = P * T
    y = (rng.uniform(0.5, 1.2, N_) * rng.choice([-1, 1], N_)).astype(
        np.float32)
    ext = rng.normal(1.4, 0.6, N_).astype(np.float32)
    part = np.repeat(np.arange(P, dtype=np.int32), T)
    data = M.FlagshipData(y=jnp.asarray(y), ext=jnp.asarray(ext),
                          participant=jnp.asarray(part), nparts=P,
                          valid=jnp.ones(N_, bool))
    logprob, _, dim = M.make_logprob_flagship(data, parameterization="ridge")
    q0 = M.flagship_initial_positions(jax.random.PRNGKey(0), data, 4,
                                      jnp.asarray([0.5, 0.5], jnp.float32),
                                      parameterization="ridge")
    for c in range(4):
        lp = float(logprob(q0[c]))
        g = np.asarray(jax.grad(logprob)(q0[c]))
        assert np.isfinite(lp) and np.all(np.isfinite(g))
    sdict = M.flagship_samples_to_dict(
        np.asarray(q0)[:, None, :], data, parameterization="ridge")
    z = np.asarray(q0)
    dc = np.exp(z[:, 5 * P:6 * P])
    np.testing.assert_allclose(np.asarray(sdict["dc"])[:, 0, :].T, dc,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sdict["mu_alpha"])[:, 0, :].T,
                               np.exp(z[:, P:2 * P]) * dc, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sdict["drift"])[:, 0, :].T,
                               z[:, :P] * dc, rtol=1e-5)


def test_flagship_ridge_same_density():
    """The ridge coordinates define the SAME posterior density as the
    natural coordinates: for any theta, lp_ridge(z_r(theta)) minus
    lp_natural(z_n(theta)), after removing each side's NUMERICALLY
    computed log|det dtheta/dz| (jax.jacfwd — independent of the
    implementation's analytic Jacobians), must be a theta-independent
    constant (the TN -> untruncated-normal prior-normalizer offset,
    3 params x P datasets x log Phi(2)).

    A deterministic, pointwise-exact replacement for an MCMC
    natural-vs-ridge comparison, which the natural coordinates' slow
    ridge mixing makes hopelessly noisy at test budgets."""
    rng = np.random.default_rng(3)
    P, T = 2, 8
    N_ = P * T
    y = (rng.uniform(0.5, 1.2, N_) * rng.choice([-1, 1], N_)).astype(
        np.float32)
    ext = rng.normal(1.4, 0.6, N_).astype(np.float32)
    part = np.repeat(np.arange(P, dtype=np.int32), T)
    data = M.FlagshipData(y=jnp.asarray(y), ext=jnp.asarray(ext),
                          participant=jnp.asarray(part), nparts=P,
                          valid=jnp.ones(N_, bool))
    lp_n, _, dim = M.make_logprob_flagship(data, "natural")
    lp_r, _, _ = M.make_logprob_flagship(data, "ridge")
    B = M._FLAG_BOUNDS

    def logit(x, lo, hi):
        p = (x - lo) / (hi - lo)
        return np.log(p) - np.log1p(-p)

    def z_nat(th, u):
        return np.concatenate([
            th["drift"], logit(th["mu_alpha"], *B["mu_alpha"]),
            logit(th["beta"], *B["beta"]), logit(th["ter"], *B["ter"]),
            logit(th["std_alpha"], *B["std_alpha"]),
            logit(th["dc"], *B["dc"]),
            logit(th["sigma1"], *B["sigma1"]), u]).astype(np.float32)

    def z_rid(th, u):
        dc = th["dc"]
        return np.concatenate([
            th["drift"] / dc, np.log(th["mu_alpha"] / dc),
            logit(th["beta"], *B["beta"]), logit(th["ter"], *B["ter"]),
            np.log(th["std_alpha"] / dc), np.log(dc),
            logit(th["sigma1"], *B["sigma1"]), u]).astype(np.float32)

    def glob_from_z_nat(zg):
        out = [zg[0:P]]
        for i, nm in enumerate(("mu_alpha", "beta", "ter", "std_alpha",
                                "dc", "sigma1")):
            lo, hi = B[nm]
            out.append(lo + (hi - lo)
                       * jax.nn.sigmoid(zg[(i + 1) * P:(i + 2) * P]))
        return jnp.concatenate(out)

    def glob_from_z_rid(zg):
        dc = jnp.exp(zg[5 * P:6 * P])
        out = [zg[0:P] * dc, jnp.exp(zg[P:2 * P]) * dc]
        for i, nm in zip((2, 3), ("beta", "ter")):
            lo, hi = B[nm]
            out.append(lo + (hi - lo)
                       * jax.nn.sigmoid(zg[i * P:(i + 1) * P]))
        out.append(jnp.exp(zg[4 * P:5 * P]) * dc)
        out.append(dc)
        lo, hi = B["sigma1"]
        out.append(lo + (hi - lo) * jax.nn.sigmoid(zg[6 * P:7 * P]))
        return jnp.concatenate(out)

    resids = []
    for _ in range(4):
        th = {"drift": rng.uniform(-2, 2, P),
              "mu_alpha": rng.uniform(0.8, 1.6, P),
              "beta": rng.uniform(0.35, 0.65, P),
              "ter": rng.uniform(0.2, 0.45, P),
              "std_alpha": rng.uniform(0.4, 1.0, P),
              "dc": rng.uniform(0.7, 1.4, P),
              "sigma1": rng.uniform(0.6, 1.5, P)}
        u = rng.normal(0, 0.5, N_)
        zn, zr = z_nat(th, u), z_rid(th, u)
        Jn = np.linalg.slogdet(np.asarray(
            jax.jacfwd(glob_from_z_nat)(jnp.asarray(zn[:7 * P]))))[1]
        Jr = np.linalg.slogdet(np.asarray(
            jax.jacfwd(glob_from_z_rid)(jnp.asarray(zr[:7 * P]))))[1]
        resids.append((float(lp_r(jnp.asarray(zr))) - Jr)
                      - (float(lp_n(jnp.asarray(zn))) - Jn))
    resids = np.asarray(resids)
    expected = 6.0 * np.log(0.9772499)  # 3 params x P=2 x log Phi(2)
    assert np.max(resids) - np.min(resids) < 5e-3, resids
    np.testing.assert_allclose(resids.mean(), expected, atol=5e-3)


def test_flagship_marginal_matches_mc():
    """make_logprob_flagship_marginal (analytic TN+ combine + quantile
    quadrature) against brute-force Monte-Carlo integration of the latent
    boundary, per trial. Also checks the gradient stays finite."""
    from jax.scipy.special import ndtr, ndtri

    rng = np.random.default_rng(11)
    P = 2
    th = {"drift": np.array([1.2, -0.8]), "mu_alpha": np.array([1.0, 1.3]),
          "beta": np.array([0.45, 0.6]), "ter": np.array([0.3, 0.25]),
          "std_alpha": np.array([0.5, 0.8]), "dc": np.array([1.0, 1.2]),
          "sigma1": np.array([0.7, 1.5])}
    part = np.array([0, 0, 0, 1, 1, 1], np.int32)
    y = np.array([0.8, -0.6, 1.1, 0.5, -0.9, 0.7], np.float32)
    ext = np.array([1.1, 0.6, 1.5, 1.2, 0.9, 2.0], np.float32)
    valid = np.array([True] * 5 + [False])
    data = M.FlagshipData(y=jnp.asarray(y), ext=jnp.asarray(ext),
                          participant=jnp.asarray(part), nparts=P,
                          valid=jnp.asarray(valid))
    logprob, unflatten, dim = M.make_logprob_flagship_marginal(
        data, n_quad=24)
    assert dim == 7 * P

    def logit(x, lo, hi):
        p = np.clip((x - lo) / (hi - lo), 1e-9, 1 - 1e-9)
        return np.log(p) - np.log1p(-p)

    z = jnp.asarray(np.concatenate([
        th["drift"], logit(th["mu_alpha"], 0, 10), logit(th["beta"], 0, 1),
        logit(th["ter"], 0, 1.5), logit(th["std_alpha"], 0, 3),
        logit(th["dc"], 0, 10), logit(th["sigma1"], 0, 5)]), jnp.float32)
    lp_marg = float(logprob(z))
    assert bool(jnp.isfinite(jax.grad(logprob)(z)).all())

    # subtract the globals' prior+Jacobian so only the likelihood remains
    th_c, lp_prior = M._flagship_globals_lp(unflatten(z), False)
    lik_marg = lp_marg - float(lp_prior)

    n_mc = 400_000
    lik_mc = 0.0
    for i in range(len(y)):
        p_ = part[i]
        mu, sd = th["mu_alpha"][p_], th["std_alpha"][p_]
        s1 = th["sigma1"][p_]
        u = rng.uniform(size=n_mc)
        p_lo = float(ndtr(jnp.asarray(-mu / sd, jnp.float32)))
        b = mu + sd * np.asarray(ndtri(jnp.asarray(
            np.clip(p_lo + u * (1 - p_lo), 1e-12, 1 - 1e-12))))
        b = np.maximum(b, 1e-4)
        log_f = (-0.5 * ((ext[i] - b) / s1) ** 2 - np.log(s1)
                 - 0.5 * math.log(2 * math.pi))
        if valid[i]:
            log_f = log_f + np.asarray(diffusion_logpdf(
                jnp.float32(y[i]), jnp.asarray(b, jnp.float32),
                jnp.float32(th["ter"][p_]), jnp.float32(th["beta"][p_]),
                jnp.float32(th["drift"][p_]), jnp.float32(th["dc"][p_])))
        m_ = log_f.max()
        lik_mc += np.log(np.exp(log_f - m_).mean()) + m_
    np.testing.assert_allclose(lik_marg, lik_mc, atol=8e-3)


@pytest.mark.slow
def test_flagship_marginal_posterior_matches_latent():
    """The Rao-Blackwellized (marginal) posterior and the latent-boundary
    posterior are the SAME distribution over the 7 globals; NUTS on both
    must agree on posterior means within joint MC error."""
    from bayesflow_nddms_tpu.mcmc import nuts as N_
    from bayesflow_nddms_tpu.models import zoo
    from bayesflow_nddms_tpu.models.spec import (sample_n_trials,
                                                 trial_mask)

    spec = zoo.get_model("single_trial_alpha_not_scaled")
    key = jax.random.PRNGKey(7)
    theta = jnp.asarray([[1.0, 1.2, 0.5, 0.3, 0.6, 1.0, 1.0]], jnp.float32)
    n = jnp.asarray([50])
    mask = trial_mask(n, spec.n_max)
    d = np.asarray(spec.simulate(jax.random.fold_in(key, 1), theta,
                                 spec.n_max, active=mask))
    m = np.asarray(mask)
    signed_y, ext_all = d[..., 0], d[..., 1]
    valid = m & (signed_y != 0)
    ds_idx, tr_idx = np.nonzero(valid)
    y = signed_y[ds_idx, tr_idx].astype(np.float32)
    ext = ext_all[ds_idx, tr_idx].astype(np.float32)
    data = M.FlagshipData(y=jnp.asarray(y), ext=jnp.asarray(ext),
                          participant=jnp.asarray(ds_idx, jnp.int32),
                          nparts=1, valid=jnp.ones(len(y), bool))
    min_rt = jnp.asarray([np.abs(y).min()], jnp.float32)

    from bayesflow_nddms_tpu.diagnostics.convergence import ess

    means, sds, esss = {}, {}, {}
    for marginal in (True, False):
        if marginal:
            logprob, _, dim = M.make_logprob_flagship_marginal(
                data, n_quad=16)
        else:
            logprob, _, dim = M.make_logprob_flagship(data)
        q0 = M.flagship_initial_positions(
            jax.random.fold_in(key, 3), data, 4, min_rt,
            include_latents=not marginal)
        res = N_.run_chains_chunked(
            logprob, q0, jax.random.fold_in(key, 4), n_warmup=400,
            n_samples=600, max_depth=7, chunk=200,
            dense_mass=marginal)
        sd_ = M.flagship_samples_to_dict(np.asarray(res.samples), data)
        means[marginal] = {k: float(np.mean(v)) for k, v in sd_.items()}
        sds[marginal] = {k: float(np.std(v)) for k, v in sd_.items()}
        esss[marginal] = {k: float(max(np.nansum(ess(np.asarray(v))), 8.0))
                          for k, v in sd_.items()}
    for k in means[True]:
        # tolerance scaled to both runs' measured MC error (the scale
        # ridge mixes slowly at this budget in either formulation), plus
        # a small quadrature/adaptation margin
        sd_ref = max(sds[False][k], 1e-6)
        mc = np.sqrt(1.0 / esss[True][k] + 1.0 / esss[False][k])
        tol = 4.0 * mc + 0.25
        dz = abs(means[True][k] - means[False][k]) / sd_ref
        assert dz < tol, (k, means[True][k], means[False][k], dz, tol,
                          esss[True][k], esss[False][k])


def test_tempered_nuts_crosses_modes_plain_cannot():
    """Replica exchange: on a well-separated symmetric Gaussian mixture,
    single-temperature NUTS started in one mode never sees the other;
    run_chains_tempered's cold chain visits both with healthy swap
    acceptance."""
    from bayesflow_nddms_tpu.mcmc import nuts as N

    mu = 5.0

    def logp(q):
        return jnp.logaddexp(-0.5 * jnp.sum((q - mu) ** 2),
                             -0.5 * jnp.sum((q + mu) ** 2))

    q0 = jnp.full((4, 2), mu)          # all chains start in the + mode
    key = jax.random.PRNGKey(3)
    plain = N.run_chains_chunked(logp, q0, key, n_warmup=200,
                                 n_samples=400, max_depth=6, chunk=100)
    frac_neg_plain = float((np.asarray(plain.samples)[..., 0] < 0).mean())
    assert frac_neg_plain < 0.01, frac_neg_plain

    temp = N.run_chains_tempered(logp, q0, key, n_temps=5, beta_min=0.04,
                                 n_warmup=200, n_samples=400, max_depth=6,
                                 chunk=25)
    s = np.asarray(temp.samples)
    assert s.shape == (4, 400, 2)
    # long-run frac is 0.5 by symmetry, but with ~16 swap rounds mode
    # residence is sticky; 0.05 still separates cleanly from plain's <0.01
    frac_neg = float((s[..., 0] < 0).mean())
    assert 0.05 < frac_neg < 0.95, frac_neg
    # swaps actually flow through the ladder
    assert np.all(np.asarray(temp.swap_accept) > 0.05), temp.swap_accept
    # the cold chain still targets pi exactly: mode centers at +-mu
    pos = s[s[..., 0] > 0]
    neg = s[s[..., 0] < 0]
    assert abs(pos[..., 0].mean() - mu) < 0.5
    assert abs(neg[..., 0].mean() + mu) < 0.5


def test_tempered_nuts_checkpoint_resume_bit_identical(tmp_path):
    """run_chains_tempered killed mid-warmup or mid-sampling and resumed
    from its chunk checkpoint reproduces the uninterrupted run bitwise
    (swap uniforms are keyed by round index, not host RNG state)."""
    from bayesflow_nddms_tpu.mcmc import nuts as N
    mu = jnp.array([0.5, -1.0])

    def logp(q):
        return -0.5 * jnp.sum((q - mu) ** 2)

    q0 = jnp.zeros((2, 2))
    key = jax.random.PRNGKey(7)
    kw = dict(n_temps=3, beta_min=0.3, n_warmup=30, n_samples=30,
              max_depth=5, chunk=10)
    ref = N.run_chains_tempered(logp, q0, key, **kw)
    assert np.asarray(ref.samples).shape == (2, 30, 2)

    class _Boom(RuntimeError):
        pass

    for kill_phase, kill_after in (("warmup", 1), ("sampling", 1)):
        ckpt = str(tmp_path / f"temper_{kill_phase}.npz")
        calls = {"n": 0}
        name = ("_sample_chunk_beta" if kill_phase == "sampling"
                else "_warmup_chunk_beta")
        orig = getattr(N, name)

        def bomb(*a, **k):
            calls["n"] += 1
            # the chunk fns are vmapped: one python call per chunk
            if calls["n"] > kill_after:
                raise _Boom()
            return orig(*a, **k)

        setattr(N, name, bomb)
        try:
            with pytest.raises(_Boom):
                N.run_chains_tempered(logp, q0, key, checkpoint_path=ckpt,
                                      **kw)
        finally:
            setattr(N, name, orig)
        res = N.run_chains_tempered(logp, q0, key, checkpoint_path=ckpt,
                                    **kw)
        np.testing.assert_array_equal(np.asarray(res.samples),
                                      np.asarray(ref.samples),
                                      err_msg=f"kill in {kill_phase}")
        np.testing.assert_allclose(np.asarray(res.swap_accept),
                                   np.asarray(ref.swap_accept))


def test_nuts_ctx_per_chain_targets():
    """run_chains_chunked(ctx=...) samples a DIFFERENT posterior per
    chain from ONE compiled program: chain i's Gaussian mean comes from
    its ctx slice, and the ctx path with a constant ctx is bit-identical
    to the closure path (same body, same keys)."""
    from bayesflow_nddms_tpu.mcmc import nuts as N
    mus = jnp.array([[3.0, -1.0], [-2.0, 4.0], [0.0, 0.0], [5.0, 5.0]])

    def logp_ctx(q, c):
        d = q - c["mu"]
        return -0.5 * d @ d

    # two chains per target: (D * C, dim) with ctx replicated per chain
    C = 2
    ctx = {"mu": jnp.repeat(mus, C, axis=0)}
    q0 = jnp.zeros((mus.shape[0] * C, 2))
    res = N.run_chains_chunked(logp_ctx, q0, jax.random.PRNGKey(0),
                               n_warmup=150, n_samples=300, max_depth=6,
                               chunk=50, ctx=ctx)
    samp = np.asarray(res.samples).reshape(mus.shape[0], C, 300, 2)
    per_target_mean = samp.mean(axis=(1, 2))
    np.testing.assert_allclose(per_target_mean, np.asarray(mus), atol=0.2)

    # constant-ctx path == closure path, bit for bit
    mu0 = jnp.array([1.0, -2.0])
    q1 = jnp.zeros((3, 2))
    a = N.run_chains_chunked(lambda q: -0.5 * (q - mu0) @ (q - mu0), q1,
                             jax.random.PRNGKey(1), n_warmup=60,
                             n_samples=40, max_depth=5, chunk=20)
    b = N.run_chains_chunked(logp_ctx, q1, jax.random.PRNGKey(1),
                             n_warmup=60, n_samples=40, max_depth=5,
                             chunk=20,
                             ctx={"mu": jnp.broadcast_to(mu0, (3, 2))})
    np.testing.assert_array_equal(a.samples, b.samples)
    np.testing.assert_array_equal(np.asarray(a.step_size),
                                  np.asarray(b.step_size))


def test_plain_batched_targets_match_serial():
    """The plain-coordinate batched targets (ctx form) evaluate the same
    posterior log-density as the serial natural-coordinate builders."""
    from bayesflow_nddms_tpu.mcmc import models as M
    from bayesflow_nddms_tpu.models import zoo

    # flagship: batched z layout (spec order) == marginal natural layout
    # at P=1, so the densities must agree pointwise
    spec = zoo.get_model("single_trial_alpha_not_scaled")
    theta = jnp.asarray([[1.2, 1.1, 0.5, 0.3, 0.4, 1.0, 1.0]], jnp.float32)
    n = 48
    mask = jnp.ones((1, n), bool)
    data = spec.simulate(jax.random.PRNGKey(3), theta, n, active=mask)
    lp_b, push_b, ctx, dim = M.make_logprob_flagship_marginal_batched(
        data, mask, n_quad=8)
    assert dim == 7
    y = np.asarray(data[0, :, 0])
    valid = y != 0.0
    if valid.all():      # capped trials change the serial data layout
        fdata = M.FlagshipData(
            y=jnp.asarray(y), ext=jnp.asarray(data[0, :, 1]),
            participant=jnp.zeros(n, jnp.int32), nparts=1,
            valid=jnp.ones(n, bool))
        lp_s, _, _ = M.make_logprob_flagship_marginal(
            fdata, parameterization="natural", n_quad=8)
        c = jax.tree.map(lambda x: x[0], ctx)
        for s in range(3):
            z = 0.7 * jax.random.normal(jax.random.PRNGKey(s), (7,))
            np.testing.assert_allclose(float(lp_b(z, c)), float(lp_s(z)),
                                       rtol=2e-6, atol=2e-4)
            th = np.asarray(push_b(z))
            assert th.shape == (7,) and np.isfinite(th).all()

    # the generic spec-driven builder must agree EXACTLY with the
    # hand-written dcDDM batched target (identical priors, bounds,
    # transforms — M._BOUNDS/_PRIORS mirror the spec's own dists)
    spec_g = zoo.get_model("basic_ddm_dc")
    mask_g = jnp.ones((2, n), bool)
    theta_g = spec_g.sample_prior(jax.random.PRNGKey(21), 2)
    data_g = spec_g.simulate(jax.random.PRNGKey(22), theta_g, n,
                             active=mask_g)
    lp_g, push_g, ctx_g, dim_g = M.make_logprob_spec_plain_batched(
        spec_g, data_g, mask_g)
    lp_h, push_h, ctx_h, dim_h = M.make_logprob_dcddm_plain_batched(
        data_g, mask_g)
    assert dim_g == dim_h == 5
    for s in range(3):
        z = 0.7 * jax.random.normal(jax.random.PRNGKey(30 + s), (5,))
        for d_ in range(2):
            cg = jax.tree.map(lambda x: x[d_], ctx_g)
            ch_ = jax.tree.map(lambda x: x[d_], ctx_h)
            np.testing.assert_allclose(float(lp_g(z, cg)),
                                       float(lp_h(z, ch_)),
                                       rtol=1e-6, atol=1e-4)
        np.testing.assert_allclose(np.asarray(push_g(z)),
                                   np.asarray(push_h(z)), rtol=1e-6)


def test_drift_dc_base_marginal_matches_grid():
    """The drift_dc_base exact likelihood (closed-form drift marginal +
    TN+ quadrature over trial dc) must equal brute-force grid integration
    of wfpt_eta(y|dc) * TN+(dc; mu_dc, var_dc) over a fine dc grid, and
    converge in the number of quadrature nodes."""
    from scipy.stats import truncnorm as tn

    from bayesflow_nddms_tpu.mcmc import models as M
    from bayesflow_nddms_tpu.mcmc.wfpt import diffusion_eta_logpdf
    mu_drift, alpha, beta, ter = 1.0, 1.4, 0.45, 0.3
    ys = np.asarray([0.55, 0.9, 1.8, -0.62, -1.1], np.float32)
    adata = np.zeros((1, len(ys), 2), np.float32)
    adata[0, :, 0] = np.abs(ys)
    adata[0, :, 1] = np.sign(ys)
    amask = np.ones((1, len(ys)), bool)
    for eta, mu_dc, var_dc in [(0.6, 1.1, 0.5), (1.0, 0.8, 1.2),
                               (0.3, 1.5, 0.2)]:
        # brute force: fine grid over the TN+(mu_dc, var_dc) support
        dgrid = np.linspace(1e-4, mu_dc + 8 * var_dc, 4001)
        dd = dgrid[1] - dgrid[0]
        w = tn.pdf(dgrid, -mu_dc / var_dc, np.inf, loc=mu_dc,
                   scale=var_dc) * dd
        lps = np.asarray(diffusion_eta_logpdf(
            jnp.asarray(ys)[:, None], alpha, ter, beta, mu_drift, eta,
            jnp.asarray(dgrid, jnp.float32)[None, :]))
        brute = np.log(np.exp(lps) @ w)

        def quad_ll(K):
            ctx, ll_fn = M.exact_loglik_ctx(
                "single_trial_drift_dc_base", jnp.asarray(adata),
                jnp.asarray(amask), n_quad=K)
            c = jax.tree.map(lambda x: x[0], ctx)
            th = [jnp.float32(v) for v in
                  (mu_drift, alpha, beta, ter, eta, mu_dc, var_dc)]
            # per-trial values: ll_fn sums over trials, so evaluate one
            # trial at a time to compare pointwise
            out = []
            for i in range(len(ys)):
                ci = jax.tree.map(lambda x: x[i:i + 1], c)
                out.append(float(ll_fn(th, ci)))
            return np.asarray(out)

        q24 = quad_ll(24)
        q64 = quad_ll(64)
        np.testing.assert_allclose(q64, brute, rtol=0, atol=5e-3)
        # convergence: the K=24 default within ~1e-2 of K=64 even on
        # tail RTs (worst case measured 0.014 at K=16 on y=1.8)
        np.testing.assert_allclose(q24, q64, rtol=0, atol=1e-2)


def test_eta_batched_target_finite_and_informative():
    """The eta-family batched targets: finite logprob and gradient at
    prior-typical z, and the data moves the posterior (truth beats a
    far-off point)."""
    from bayesflow_nddms_tpu.mcmc import models as M
    from bayesflow_nddms_tpu.models import zoo
    for name in ("basic_ddm_eta_dc", "single_trial_drift2",
                 "single_trial_drift_dc_base"):
        spec = zoo.get_model(name)
        theta = jnp.asarray(
            [[1.0, 1.2, 0.5, 0.3, 0.6, 1.0, 0.8][:spec.n_params]],
            jnp.float32)
        n = 160
        mask = jnp.ones((1, n), bool)
        data = spec.simulate(jax.random.PRNGKey(7), theta, n, active=mask)
        lp, push, ctx, dim = M.make_logprob_spec_plain_batched(
            spec, data, mask)
        assert dim == spec.n_params
        c = jax.tree.map(lambda x: x[0], ctx)

        def z_of(th):
            cols = []
            for j, d_ in enumerate(spec.prior):
                lo, hi = d_.support
                if np.isfinite(lo) and np.isfinite(hi):
                    s = np.clip((th[j] - lo) / (hi - lo), 1e-4, 1 - 1e-4)
                    cols.append(np.log(s) - np.log1p(-s))
                else:
                    cols.append(th[j])
            return jnp.asarray(cols, jnp.float32)

        z_true = z_of(np.asarray(theta)[0])
        lp_true = float(lp(z_true, c))
        g = np.asarray(jax.grad(lp)(z_true, c))
        assert np.isfinite(lp_true) and np.all(np.isfinite(g)), name
        wrong = np.asarray(theta)[0].copy()
        wrong[0] = -wrong[0] - 2.0         # flip + shift the drift mean
        assert lp_true > float(lp(z_of(wrong), c)) + 10, name
        th_rt = np.asarray(push(z_true))
        np.testing.assert_allclose(th_rt, np.asarray(theta)[0], rtol=1e-4,
                                   atol=1e-4)


def test_plain_batched_targets_match_serial_dcddm():
    # dcDDM: batched spec-order z vs make_logprob's mcmc-name-order z
    from bayesflow_nddms_tpu.mcmc import models as M
    from bayesflow_nddms_tpu.models import zoo
    n = 48
    spec2 = zoo.get_model("basic_ddm_dc")
    theta2 = jnp.asarray([[1.0, 1.1, 0.5, 0.3, 1.0]], jnp.float32)
    mask2 = jnp.ones((1, n), bool)
    data2 = spec2.simulate(jax.random.PRNGKey(5), theta2, n, active=mask2)
    lp2_b, push2_b, ctx2, dim2 = M.make_logprob_dcddm_plain_batched(
        data2, mask2)
    assert dim2 == 5
    rt, choice = np.asarray(data2[0, :, 0]), np.asarray(data2[0, :, 1])
    valid2 = choice != 0
    mdata = M.DcDDMData(
        y=jnp.asarray((rt * choice)[valid2], jnp.float32),
        participant=jnp.zeros(int(valid2.sum()), jnp.int32), nparts=1)
    lp2_s, _, _ = M.make_logprob(mdata)
    c2 = jax.tree.map(lambda x: x[0], ctx2)
    # spec order (drift, alpha, beta, ter, dc) -> mcmc layout
    # (alpha, ndt, beta, delta, varsigma)
    perm = [1, 3, 2, 0, 4]
    for s in range(3):
        z = 0.7 * jax.random.normal(jax.random.PRNGKey(10 + s), (5,))
        z_mcmc = z[jnp.asarray(perm)]
        np.testing.assert_allclose(float(lp2_b(z, c2)),
                                   float(lp2_s(z_mcmc)), rtol=2e-6,
                                   atol=2e-4)
        th = np.asarray(push2_b(z))
        assert th.shape == (5,) and np.isfinite(th).all()
