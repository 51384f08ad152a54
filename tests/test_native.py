"""Native C++ runtime tests: the series-method exact sampler against
analytic moments and the JAX inverse-CDF sampler; the native CSV reader
against a synthetic fixture."""

import math
import os

import numpy as np
import pytest

from bayesflow_nddms_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def _p_up(v, a, w):
    th = 2.0 * v
    return (1 - math.exp(-th * a * w)) / (1 - math.exp(-th * a))


def test_cpp_exact_sampler_moments():
    alpha, tau, nu, beta = 1.4, 0.35, 1.1, 0.45
    y = native.exact_sampler(n=40_000, alpha=alpha, tau=tau, nu=nu,
                             beta=beta, eta=0.0, varsigma=1.0, seed=11)
    p = (y > 0).mean()
    assert abs(p - _p_up(nu, alpha, beta)) < 0.012
    t_ref = (alpha * _p_up(nu, alpha, beta) - beta * alpha) / nu
    assert abs((np.abs(y) - tau).mean() - t_ref) < 0.05 * t_ref + 0.01


def test_cpp_matches_jax_exact_sampler():
    import jax
    from bayesflow_nddms_tpu.ops.exact_sampler import simulate_exact
    kw = dict(alpha=1.2, tau=0.3, nu=-0.8, beta=0.55, eta=0.0, varsigma=1.5)
    y_cpp = native.exact_sampler(n=40_000, seed=5, **kw)
    y_jax = np.asarray(simulate_exact(jax.random.PRNGKey(5), n=40_000, **kw))
    assert abs((y_cpp > 0).mean() - (y_jax > 0).mean()) < 0.012
    np.testing.assert_allclose(
        np.quantile(np.abs(y_cpp), [0.25, 0.5, 0.75]),
        np.quantile(np.abs(y_jax), [0.25, 0.5, 0.75]), rtol=0.04)


def test_cpp_exact_sampler_dc_invariance():
    y1 = native.exact_sampler(n=40_000, alpha=1.2, tau=0.3, nu=1.5,
                              beta=0.5, eta=0.0, varsigma=1.0, seed=7)
    y2 = native.exact_sampler(n=40_000, alpha=2.4, tau=0.3, nu=3.0,
                              beta=0.5, eta=0.0, varsigma=2.0, seed=8)
    assert abs((y1 > 0).mean() - (y2 > 0).mean()) < 0.012
    np.testing.assert_allclose(np.quantile(np.abs(y1), [0.25, 0.5, 0.75]),
                               np.quantile(np.abs(y2), [0.25, 0.5, 0.75]),
                               rtol=0.04)


def test_native_csv_reader(tmp_path):
    path = tmp_path / "fixture.csv"
    rng = np.random.default_rng(0)
    n = 500
    subj = rng.integers(1, 6, n)
    rt = rng.uniform(0.2, 1.5, n)
    resp = rng.integers(0, 2, n)
    ne = rng.normal(size=n)
    pe = rng.normal(size=n)
    with open(path, "w") as f:
        f.write("subj_idx,rt,response,type,pre_Ne,pre_Pe\n")
        for i in range(n):
            f.write(f"{subj[i]},{rt[i]:.6f},{resp[i]},go,{ne[i]:.6f},"
                    f"{pe[i]:.6f}\n")
    cols = native.parse_stahl_csv(str(path))
    assert cols is not None and len(cols["rt"]) == n
    np.testing.assert_array_equal(cols["subj_idx"], subj)
    np.testing.assert_allclose(cols["rt"], rt, atol=1e-6)
    np.testing.assert_allclose(cols["pre_Pe"], pe, atol=1e-6)
