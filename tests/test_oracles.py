"""Oracle tests: exact inverse-CDF sampler vs closed forms and vs the EM
kernel (SURVEY.md §4 item 6), EZ-diffusion estimator + the dc
identifiability demonstration (simulations/Basic_DDM_simulations.py:
163-209)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from bayesflow_nddms_tpu.ops.ddm_sim import first_passage
from bayesflow_nddms_tpu.ops.exact_sampler import simulate_exact
from bayesflow_nddms_tpu.ops.ez_diffusion import ez_diffusion


def _p_up(v, a, w):
    if v == 0:
        return w
    th = 2.0 * v
    return (1 - math.exp(-th * a * w)) / (1 - math.exp(-th * a))


def test_exact_sampler_choice_probability_and_mean():
    n = 60_000
    alpha, tau, nu, beta = 1.4, 0.35, 1.1, 0.45
    y = np.asarray(simulate_exact(jax.random.PRNGKey(0), n=n, alpha=alpha,
                                  tau=tau, nu=nu, beta=beta, eta=0.0,
                                  varsigma=1.0))
    p_up = (y > 0).mean()
    assert abs(p_up - _p_up(nu, alpha, beta)) < 0.01
    mean_t = (np.abs(y) - tau).mean()
    t_ref = (alpha * _p_up(nu, alpha, beta) - beta * alpha) / nu
    assert abs(mean_t - t_ref) < 0.03 * t_ref + 0.01


def test_exact_sampler_dc_rescaling_invariance():
    """(nu, alpha, dc) and (k*nu, k*alpha, k*dc) must give identical
    choice-RT distributions — THE identifiability fact of the paper
    (Basic_DDM_simulations.py:163-209)."""
    kws = dict(n=40_000, tau=0.3, beta=0.5, eta=0.0)
    y1 = np.asarray(simulate_exact(jax.random.PRNGKey(1), alpha=1.2,
                                   nu=1.5, varsigma=1.0, **kws))
    y2 = np.asarray(simulate_exact(jax.random.PRNGKey(2), alpha=2.4,
                                   nu=3.0, varsigma=2.0, **kws))
    assert abs((y1 > 0).mean() - (y2 > 0).mean()) < 0.01
    q1 = np.quantile(np.abs(y1), [0.25, 0.5, 0.75])
    q2 = np.quantile(np.abs(y2), [0.25, 0.5, 0.75])
    np.testing.assert_allclose(q1, q2, rtol=0.03)


def test_exact_sampler_vs_bridge_kernel_at_production_dt():
    """Inverse-CDF oracle vs the bridge kernel AT THE PRODUCTION GRID
    (dt=.01): with exact transitions + bridge crossing tests + GIG
    crossing times the kernel is an exact sampler at any dt, so the two
    must agree to MC noise — where the round-2 plain-EM version needed
    dt=2e-4 and 5% tolerances to pass (the latent cross-check between the
    reference's two simulators, tightened per VERDICT r2 Next #1)."""
    alpha, nu, beta, dc = 1.2, 0.8, 0.55, 1.3
    n = 100_000
    y = np.asarray(simulate_exact(jax.random.PRNGKey(3), n=n,
                                  alpha=alpha, tau=0.0, nu=nu, beta=beta,
                                  eta=0.0, varsigma=dc))
    fp = first_passage(jax.random.PRNGKey(4), nu, alpha, beta, dc,
                       shape=(1, n), dt=0.01, max_steps=1600)
    t = np.asarray(fp.decision_time(0.01)[0])
    ch = np.asarray(fp.choice[0]).astype(int)
    em_t = t[ch != 0]
    # p_up MC sd ~ 0.0015 per sampler
    assert abs((y > 0).mean() - (ch == 1).mean()) < 0.006
    assert abs(np.abs(y).mean() - em_t.mean()) < 0.006
    qs = [0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95]
    np.testing.assert_allclose(np.quantile(np.abs(y), qs),
                               np.quantile(em_t, qs), rtol=0.02, atol=0.004)


def test_exact_sampler_eta_accuracy_matches_theory():
    """Drift variability: accuracy must equal E_v[P_up(v)] with
    v ~ N(nu, eta) — 0.657 for (nu=1, eta=2, a=1.2, w=.5), well below the
    eta=0 value 0.769."""
    base = np.asarray(simulate_exact(jax.random.PRNGKey(5), n=30_000,
                                     alpha=1.2, tau=0.3, nu=1.0, beta=0.5,
                                     eta=0.0, varsigma=1.0))
    wide = np.asarray(simulate_exact(jax.random.PRNGKey(6), n=30_000,
                                     alpha=1.2, tau=0.3, nu=1.0, beta=0.5,
                                     eta=2.0, varsigma=1.0))
    assert abs((base > 0).mean() - _p_up(1.0, 1.2, 0.5)) < 0.01
    # MC integral of E_v[P_up(v)], v ~ N(1, 2): 0.657 +- 0.002
    assert abs((wide > 0).mean() - 0.657) < 0.012
    # mean |v| grows with eta, so decisions get FASTER on average
    assert np.abs(wide).mean() < np.abs(base).mean()


def test_ez_diffusion_recovers_generating_parameters():
    v_true, a_true, ter_true = 1.0, 1.4, 0.35
    y = np.asarray(simulate_exact(jax.random.PRNGKey(7), n=50_000,
                                  alpha=a_true, tau=ter_true, nu=v_true,
                                  beta=0.5, eta=0.0, varsigma=1.0))
    est = ez_diffusion(np.abs(y), (y > 0).astype(float))
    assert abs(float(est.drift) - v_true) < 0.08
    assert abs(float(est.boundary) - a_true) < 0.1
    assert abs(float(est.ndt) - ter_true) < 0.05


def test_ez_diffusion_guards():
    """Degenerate inputs raise instead of silently returning inf/NaN
    (reference asserts, Basic_DDM_simulations.py:133-146)."""
    import pytest
    rt = np.array([0.4, 0.5, 0.6, 0.7])
    with pytest.raises(ValueError):          # empty
        ez_diffusion(np.array([]), np.array([]))
    with pytest.raises(ValueError):          # shape mismatch
        ez_diffusion(rt, np.array([1.0, 0.0]))
    with pytest.raises(ValueError):          # accuracy outside [0, 1]
        ez_diffusion(rt, np.array([1.0, 2.0, 0.0, 1.0]))
    with pytest.raises(ValueError):          # no correct responses
        ez_diffusion(rt, np.zeros(4))
    with pytest.raises(ValueError):          # zero correct-RT variance
        ez_diffusion(np.full(4, 0.5), np.array([1.0, 1.0, 0.0, 0.0]))


def test_ez_diffusion_blind_to_dc():
    """EZ (s=1 assumption) must return the SAME estimates for scalar-
    multiplied (v, a, dc) — the motivation for the entire dcDDM program."""
    ests = []
    for k, seed in [(1.0, 8), (2.0, 8)]:
        y = np.asarray(simulate_exact(jax.random.PRNGKey(seed), n=50_000,
                                      alpha=1.2 * k, tau=0.3, nu=1.5 * k,
                                      beta=0.5, eta=0.0, varsigma=k))
        ests.append(ez_diffusion(np.abs(y), (y > 0).astype(float)))
    assert abs(float(ests[0].drift) - float(ests[1].drift)) < 1e-9
    assert abs(float(ests[0].boundary) - float(ests[1].boundary)) < 1e-9
