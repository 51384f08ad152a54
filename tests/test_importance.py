"""PSIS importance reweighting (mcmc/importance.py).

Known-answer checks: a Gaussian proposal against (a) a wider Gaussian
target — khat moderate, reweighted moments recover the target; (b) a
heavy-tailed Student-t target — khat flags the failure; (c) the identity
target — weights constant, khat tiny, moments unchanged.
"""

import numpy as np

from bayesflow_nddms_tpu.mcmc import importance as I


def _gauss_logpdf(x, mu, sd):
    return -0.5 * ((x - mu) / sd) ** 2 - np.log(sd) \
        - 0.5 * np.log(2 * np.pi)


def test_identity_weights_are_flat():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 4000))
    logw = np.zeros_like(x)
    sm, khat = I.psis_smooth(logw + 7.0)     # additive constants drop out
    ess = I.weight_ess(sm)
    np.testing.assert_allclose(ess, 4000, rtol=1e-6)
    mean, sd = I.weighted_moments(x[..., None], sm)
    np.testing.assert_allclose(mean[:, 0], x.mean(axis=1), atol=1e-9)


def test_reweighting_recovers_wider_gaussian():
    """q = N(0,1) draws reweighted to p = N(0.3, 1.25): weighted moments
    must match the target far better than the raw draws do."""
    rng = np.random.default_rng(1)
    B, S = 8, 20000
    x = rng.normal(size=(B, S))
    logw = _gauss_logpdf(x, 0.3, 1.25) - _gauss_logpdf(x, 0.0, 1.0)
    sm, khat = I.psis_smooth(logw)
    assert np.all(khat < 0.7), khat
    mean, sd = I.weighted_moments(x[..., None], sm)
    np.testing.assert_allclose(mean[:, 0], 0.3, atol=0.05)
    np.testing.assert_allclose(sd[:, 0], 1.25, atol=0.08)
    # resampling agrees with the weighted moments
    res = I.importance_resample(2, x[..., None], sm, 4000)
    np.testing.assert_allclose(res.mean(axis=(1, 2)), 0.3, atol=0.08)


def test_khat_flags_heavy_tailed_target():
    """p = Student-t(nu=2) against q = N(0, 1): infinite-variance weights;
    khat must exceed the 0.7 usability threshold."""
    rng = np.random.default_rng(2)
    B, S = 4, 20000
    x = rng.normal(size=(B, S))
    nu = 2.0
    logp = -0.5 * (nu + 1) * np.log1p(x * x / nu)   # t up to a constant
    logw = logp - _gauss_logpdf(x, 0.0, 1.0)
    _, khat = I.psis_smooth(logw)
    assert np.all(khat > 0.7), khat


def test_smoothing_reduces_weight_variance():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 8000))
    logw = _gauss_logpdf(x, 0.5, 1.4) - _gauss_logpdf(x, 0.0, 1.0)
    sm, _ = I.psis_smooth(logw)
    # smoothing tames the extreme weights; ESS stays in the same ballpark
    # (the GPD order stats may slightly raise some tail weights)
    assert np.all(I.weight_ess(sm) >= I.weight_ess(logw) * 0.95)
    # smoothing must not change the bulk: only the top-20% tail moves
    order = np.argsort(logw, axis=1)
    keep = order[:, : int(0.8 * logw.shape[1]) - 1]
    rows = np.arange(2)[:, None]
    np.testing.assert_allclose(
        (sm - (logw - logw.max(axis=1, keepdims=True)))[rows, keep], 0.0,
        atol=1e-12)


def test_tiny_sample_returns_inf_khat():
    _, khat = I.psis_smooth(np.zeros((2, 10)))
    assert np.all(np.isinf(khat))


def test_sanitize_logw_zero_weights_degenerate_draws():
    """NaN (0/0 Wiener density at a clamped boundary draw) and +inf
    (vanishing flow density) entries become -inf = weight exactly 0;
    finite entries — including legitimately huge ones PSIS must still
    see — pass through untouched."""
    rng = np.random.default_rng(1)
    logw = rng.normal(size=(2, 64))
    logw[0, 3] = np.nan
    logw[0, 10] = np.inf
    logw[1, 5] = 5e11          # finite: a real (terrible) weight, kept
    clean, n_bad = I.sanitize_logw(logw)
    assert n_bad.tolist() == [2, 0]
    assert np.isneginf(clean[0, 3]) and np.isneginf(clean[0, 10])
    assert clean[1, 5] == 5e11
    # downstream stays finite where it should: khat/ess computable
    sm, khat = I.psis_smooth(clean)
    ess = I.weight_ess(sm)
    assert np.isfinite(ess).all()
    assert not np.isnan(khat).any()
    # row 1's single dominating weight must be flagged, not averaged away
    assert ess[1] < 2.0
