"""Distribution primitives vs scipy ground truth."""

import numpy as np
import pytest
from scipy import stats

import jax
import jax.numpy as jnp

from bayesflow_nddms_tpu.utils import dists


@pytest.mark.parametrize("mu,sd,lo,hi", [
    (1.0, 0.5, 0.0, 10.0),   # boundary prior (basic_ddm_dc.py:68)
    (0.5, 0.25, 0.0, 1.5),   # ndt prior (:74)
    (1.0, 0.5, 0.0, 3.0),    # trial-sd prior
])
def test_truncnorm_matches_scipy(mu, sd, lo, hi):
    d = dists.truncnorm(mu, sd, lo, hi)
    ref = stats.truncnorm((lo - mu) / sd, (hi - mu) / sd, loc=mu, scale=sd)
    # moments
    assert abs(d.mean - ref.mean()) < 1e-6
    assert abs(d.std - ref.std()) < 1e-6
    # log-density on a grid
    xs = np.linspace(lo + 1e-3, min(hi, mu + 4 * sd), 50)
    lp = np.asarray(d.log_prob(jnp.asarray(xs, jnp.float32)))
    np.testing.assert_allclose(lp, ref.logpdf(xs), atol=1e-4)
    # samples
    s = np.asarray(d.sample(jax.random.PRNGKey(0), (200_000,)))
    assert s.min() >= lo and s.max() <= hi
    assert abs(s.mean() - ref.mean()) < 0.01
    assert abs(s.std() - ref.std()) < 0.01


def test_beta_matches_scipy():
    d = dists.beta(2.0, 2.0)
    xs = np.linspace(0.01, 0.99, 50)
    np.testing.assert_allclose(
        np.asarray(d.log_prob(jnp.asarray(xs, jnp.float32))),
        stats.beta(2, 2).logpdf(xs), atol=1e-5)
    s = np.asarray(d.sample(jax.random.PRNGKey(1), (100_000,)))
    assert abs(s.mean() - 0.5) < 0.005
    assert abs(s.std() - stats.beta(2, 2).std()) < 0.005


def test_normal_and_uniform():
    n = dists.normal(0.0, 2.0)
    np.testing.assert_allclose(float(n.log_prob(jnp.float32(1.0))),
                               stats.norm(0, 2).logpdf(1.0), atol=1e-6)
    u = dists.uniform(0.0, 5.0)
    assert float(u.log_prob(jnp.float32(2.0))) == pytest.approx(
        np.log(1 / 5), abs=1e-6)
    assert float(u.log_prob(jnp.float32(6.0))) == -np.inf


def test_trunc_normal_positive_matches_rejection_law():
    """Vectorized >0 truncation must match the reference's rejection
    semantics (single_trial_alpha_not_scaled.py:113-116)."""
    mu, sd = jnp.float32(0.5), jnp.float32(1.0)
    s = np.asarray(dists.trunc_normal_positive(
        jax.random.PRNGKey(2), mu, sd, (200_000,)))
    ref = stats.truncnorm(-0.5, np.inf, loc=0.5, scale=1.0)
    assert s.min() > 0
    assert abs(s.mean() - ref.mean()) < 0.01
    assert abs(s.std() - ref.std()) < 0.01
