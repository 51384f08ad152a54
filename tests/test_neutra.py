"""Flow-preconditioned (NeuTra) NUTS: exactness of the transport map and
end-to-end posterior equality with the plain marginal formulation.

The transport map is the amortizer's own sampling path, so the logdet
tests pin the exact-Jacobian claim mcmc/neutra.py rests on; the slow test
checks the reparameterized NUTS samples the SAME posterior as
make_logprob_flagship_marginal on a dataset where both mix well.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesflow_nddms_tpu.mcmc import models as M
from bayesflow_nddms_tpu.mcmc import neutra as NT
from bayesflow_nddms_tpu.mcmc import nuts as N
from bayesflow_nddms_tpu.models import zoo
from bayesflow_nddms_tpu.nets.amortizer import build_amortizer


def _tiny_amortizer(n_trials=48, batch=2, seed=0):
    spec = zoo.get_model("single_trial_alpha_not_scaled")
    am = build_amortizer(spec)
    rng = np.random.default_rng(seed)
    rt = rng.uniform(0.35, 2.0, (batch, n_trials)).astype(np.float32)
    sign = rng.choice([-1.0, 1.0], (batch, n_trials)).astype(np.float32)
    ext = rng.normal(1.0, 0.5, (batch, n_trials)).astype(np.float32)
    data = jnp.stack([rt * sign, ext], axis=-1)
    mask = jnp.ones((batch, n_trials), bool)
    log_n = jnp.full((batch, 1), np.log(n_trials), jnp.float32)
    theta = jnp.asarray(rng.uniform(0.3, 0.9, (batch, spec.n_params)),
                        jnp.float32)
    params = am.init(jax.random.PRNGKey(7), theta, data, mask, log_n)
    return spec, am, params, data, mask, log_n


def test_push_forward_logdet_matches_numerical_jacobian():
    _, am, params, data, mask, log_n = _tiny_amortizer()
    cond, lo, hi = am.apply(params, data, mask, log_n,
                            method="coord_context")
    cond, lo, hi = cond[0], lo[0], hi[0]

    def push(eps):
        th, _ = am.apply(params, eps, cond, lo, hi, method="push_forward")
        return th

    for s in range(3):
        eps = jax.random.normal(jax.random.PRNGKey(s), (7,))
        _, ldj = am.apply(params, eps, cond, lo, hi, method="push_forward")
        jac = jax.jacfwd(push)(eps)
        _, num = np.linalg.slogdet(np.asarray(jac, np.float64))
        np.testing.assert_allclose(float(ldj), num, atol=5e-3, rtol=1e-4)


def test_push_forward_consistent_with_flow_log_prob():
    """log q(theta | data) == log N(eps) - log|det dT/deps| at theta=T(eps):
    the sampling transform and the density the PSIS certificates use are
    the same map."""
    _, am, params, data, mask, log_n = _tiny_amortizer()
    cond, lo, hi = am.apply(params, data, mask, log_n,
                            method="coord_context")
    S = 10
    eps = jax.random.normal(jax.random.PRNGKey(3), (S, 7))
    # push all draws through dataset 0's map
    theta, ldj = am.apply(params, eps, cond[0], lo[:1], hi[:1],
                          method="push_forward")
    logq = am.apply(params, theta, jnp.repeat(data[:1], S, 0),
                    jnp.repeat(mask[:1], S, 0),
                    jnp.repeat(log_n[:1], S, 0), method="log_prob")
    log_base = -0.5 * (eps**2 + np.log(2 * np.pi)).sum(-1)
    np.testing.assert_allclose(np.asarray(logq),
                               np.asarray(log_base - ldj),
                               atol=2e-2, rtol=1e-4)


def _one_flagship_dataset(n_trials=64, seed=11):
    rng = np.random.default_rng(seed)
    spec = zoo.get_model("single_trial_alpha_not_scaled")
    theta = jnp.asarray([[1.2, 1.1, 0.5, 0.3, 0.4, 1.0, 1.0]], jnp.float32)
    mask = jnp.ones((1, n_trials), bool)
    data = spec.simulate(jax.random.PRNGKey(seed), theta, n_trials,
                         active=mask)
    log_n = jnp.full((1, 1), np.log(n_trials), jnp.float32)
    return spec, theta, data, mask, log_n


def test_neutra_logprob_finite_with_gradient():
    spec, theta, data, mask, log_n = _one_flagship_dataset()
    am = build_amortizer(spec)
    params = am.init(jax.random.PRNGKey(7), theta, data, mask, log_n)
    y = np.asarray(data[0, :, 0])
    valid = y != 0.0
    fdata = M.FlagshipData(
        y=jnp.asarray(y[valid]), ext=jnp.asarray(data[0, :, 1])[valid],
        participant=jnp.zeros(int(valid.sum()), jnp.int32), nparts=1,
        valid=jnp.ones(int(valid.sum()), bool))
    logprob, push, dim = NT.make_logprob_flagship_neutra(
        fdata, am, params, data[0], mask[0], log_n[0], n_quad=8)
    assert dim == 7
    eps = 0.5 * jax.random.normal(jax.random.PRNGKey(0), (7,))
    lp, g = jax.value_and_grad(logprob)(eps)
    assert np.isfinite(float(lp))
    assert np.all(np.isfinite(np.asarray(g)))
    th = push(eps)
    assert th.shape == (7,)
    # pushed draws respect every prior bound by construction
    lo = np.array([-np.inf, 0, 0, 0, 0, 0, 0])
    hi = np.array([np.inf, 10, 1, 1.5, 3, 10, 5])
    assert np.all(np.asarray(th) > lo) and np.all(np.asarray(th) < hi)


def test_neutra_density_identity_vs_natural():
    """The NeuTra target and the natural-coordinate marginal target are the
    SAME theta-space posterior: after removing each parameterization's own
    Jacobian (via jacfwd slogdet, independent of the implementation's
    logdets), the log-densities agree pointwise to float32 roundoff."""
    spec, theta, data, mask, log_n = _one_flagship_dataset()
    am = build_amortizer(spec)
    params = am.init(jax.random.PRNGKey(7), theta, data, mask, log_n)
    y = np.asarray(data[0, :, 0])
    valid = y != 0.0
    fdata = M.FlagshipData(
        y=jnp.asarray(y[valid]), ext=jnp.asarray(data[0, :, 1])[valid],
        participant=jnp.zeros(int(valid.sum()), jnp.int32), nparts=1,
        valid=jnp.ones(int(valid.sum()), bool))
    logprob_n, push, _ = NT.make_logprob_flagship_neutra(
        fdata, am, params, data[0], mask[0], log_n[0], n_quad=8)
    logprob_m, _, _ = M.make_logprob_flagship_marginal(
        fdata, parameterization="natural", n_quad=8)

    def from_nat(z):
        cols = [z[0]]
        for j, name in enumerate(M._FLAG_ORDER[1:], start=1):
            lo, hi = M._FLAG_BOUNDS[name]
            cols.append(lo + (hi - lo) * jax.nn.sigmoid(z[j]))
        return jnp.stack(cols)

    def to_nat(th):
        cols = [th[0]]
        for j, name in enumerate(M._FLAG_ORDER[1:], start=1):
            lo, hi = M._FLAG_BOUNDS[name]
            p = (th[j] - lo) / (hi - lo)
            cols.append(jnp.log(p) - jnp.log1p(-p))
        return jnp.stack(cols)

    diffs = []
    min_rt = float(np.abs(y[valid]).min())
    for s in range(200):
        if len(diffs) == 3:
            break
        eps = 0.6 * jax.random.normal(jax.random.PRNGKey(100 + s), (7,))
        th = push(eps)
        # Skip ill-conditioned points: with ter within ~50 ms of the
        # fastest trial, |d loglik / d ter| reaches ~1e5 (the decision
        # time -> 0 wall), so the two paths' float32 rounding of theta
        # alone produces O(1e-2) log-density gaps that say nothing about
        # the identity under test.
        if min_rt - float(th[3]) < 0.05:
            continue
        a = (logprob_n(eps)
             - jnp.linalg.slogdet(jax.jacfwd(push)(eps))[1])
        z = to_nat(th)
        b = (logprob_m(z)
             - jnp.linalg.slogdet(jax.jacfwd(from_nat)(z))[1])
        diffs.append(float(a - b))
    assert len(diffs) == 3, "could not find 3 well-conditioned points"
    np.testing.assert_allclose(diffs, 0.0, atol=5e-3)


def test_dcddm_neutra_density_identity_vs_natural():
    """Same check for the dcDDM target: the NeuTra pullback and the
    natural-coordinate make_logprob (restricted to one participant) are
    the same theta-space posterior."""
    spec = zoo.get_model("basic_ddm_dc")
    rng = np.random.default_rng(5)
    theta0 = jnp.asarray([[1.0, 1.1, 0.5, 0.3, 1.0]], jnp.float32)
    n_trials = 48
    mask = jnp.ones((1, n_trials), bool)
    data = spec.simulate(jax.random.PRNGKey(5), theta0, n_trials,
                         active=mask)
    log_n = jnp.full((1, 1), np.log(n_trials), jnp.float32)
    am = build_amortizer(spec)
    params = am.init(jax.random.PRNGKey(7), theta0, data, mask, log_n)
    rt, choice = np.asarray(data[0, :, 0]), np.asarray(data[0, :, 1])
    valid = choice != 0
    y = jnp.asarray((rt * choice)[valid], jnp.float32)

    logprob_n, push, dim = NT.make_logprob_dcddm_neutra(
        y, am, params, data[0], mask[0], log_n[0])
    assert dim == 5
    mdata = M.DcDDMData(y=y, participant=jnp.zeros(len(y), jnp.int32),
                        nparts=1)
    logprob_m, _, _ = M.make_logprob(mdata)

    # spec order (drift, alpha, beta, ter, dc) -> natural z layout
    # (alpha, ndt, beta, delta, varsigma)
    def from_nat(z):
        names = ("alpha", "ndt", "beta", "delta", "varsigma")
        out = []
        for j, name in enumerate(names):
            if name == "delta":
                out.append(z[j])
            else:
                lo, hi = M._BOUNDS[name]
                out.append(lo + (hi - lo) * jax.nn.sigmoid(z[j]))
        return jnp.stack(out)

    def to_nat(th):
        drift, alpha, beta, ter, dc = th
        def logit(x, name):
            lo, hi = M._BOUNDS[name]
            p = (x - lo) / (hi - lo)
            return jnp.log(p) - jnp.log1p(-p)
        return jnp.stack([logit(alpha, "alpha"), logit(ter, "ndt"),
                          logit(beta, "beta"), drift,
                          logit(dc, "varsigma")])

    diffs = []
    min_rt = float(np.abs(np.asarray(y)).min())
    for s in range(200):
        if len(diffs) == 3:
            break
        eps = 0.6 * jax.random.normal(jax.random.PRNGKey(200 + s), (5,))
        th = push(eps)
        # Skip ill-conditioned points near the ter -> min rt wall (see
        # the flagship identity test): |d loglik / d ter| ~ 1e5 there,
        # so float32 theta rounding alone breaks the comparison.
        if min_rt - float(th[3]) < 0.05:
            continue
        a = (logprob_n(eps)
             - jnp.linalg.slogdet(jax.jacfwd(push)(eps))[1])
        z = to_nat(th)
        b = (logprob_m(z)
             - jnp.linalg.slogdet(jax.jacfwd(from_nat)(z))[1])
        diffs.append(float(a - b))
        g = jax.grad(logprob_n)(eps)
        assert np.all(np.isfinite(np.asarray(g)))
    assert len(diffs) == 3, "could not find 3 well-conditioned points"
    np.testing.assert_allclose(diffs, 0.0, atol=5e-3)


@pytest.mark.slow
def test_neutra_matches_plain_marginal_nuts():
    """On an easy dataset both formulations must agree: same posterior,
    different coordinates. (The NeuTra map here is a random-init flow —
    near the identity in logit coordinates — so this checks correctness
    of the pullback, independent of flow quality.)"""
    spec, theta, data, mask, log_n = _one_flagship_dataset()
    am = build_amortizer(spec)
    params = am.init(jax.random.PRNGKey(7), theta, data, mask, log_n)
    y = np.asarray(data[0, :, 0])
    valid = y != 0.0
    fdata = M.FlagshipData(
        y=jnp.asarray(y[valid]), ext=jnp.asarray(data[0, :, 1])[valid],
        participant=jnp.zeros(int(valid.sum()), jnp.int32), nparts=1,
        valid=jnp.ones(int(valid.sum()), bool))
    n_quad = 12
    kw = dict(n_warmup=300, n_samples=400, max_depth=6, chunk=200)

    logprob_n, push, _ = NT.make_logprob_flagship_neutra(
        fdata, am, params, data[0], mask[0], log_n[0], n_quad=n_quad)
    q0n = NT.neutra_initial_positions(jax.random.PRNGKey(1), 4, 7)
    res_n = N.run_chains_chunked(logprob_n, q0n, jax.random.PRNGKey(2),
                                 **kw)
    th_nc = np.asarray(push(res_n.samples))           # (C, S, P)
    th_n = th_nc.reshape(-1, 7)

    logprob_m, _, dim = M.make_logprob_flagship_marginal(
        fdata, parameterization="natural", n_quad=n_quad)
    min_rt = jnp.asarray([np.abs(y[valid]).min()], jnp.float32)
    q0m = M.flagship_initial_positions(jax.random.PRNGKey(3), fdata, 4,
                                       min_rt, include_latents=False)
    res_m = N.run_chains_chunked(logprob_m, q0m, jax.random.PRNGKey(4),
                                 **kw)
    sd_m = M.flagship_samples_to_dict(np.asarray(res_m.samples), fdata)

    # MCSE-aware comparison: the pointwise density identity is exact
    # (tested in /tmp-free form via the logdet tests + the agreement
    # artifacts); what sampling can verify is equality within each run's
    # own Monte-Carlo error, estimated from FFT-ESS per parameter.
    from bayesflow_nddms_tpu.diagnostics.convergence import diagnostic
    dn = {name: np.transpose(th_nc[..., j])[None]
          for j, name in enumerate(M._FLAG_ORDER)}
    diag_n, diag_m = diagnostic(dn), diagnostic(
        {k: np.asarray(v) for k, v in sd_m.items()})
    for j, name in enumerate(M._FLAG_ORDER):
        a = th_n[:, j]
        b = np.asarray(sd_m[name]).ravel()
        ne_a = float(np.asarray(diag_n[name]["neff"]).min())
        ne_b = float(np.asarray(diag_m[name]["neff"]).min())
        se = np.sqrt(a.var() / max(ne_a, 2.0) + b.var() / max(ne_b, 2.0))
        pooled = np.sqrt(0.5 * (a.var() + b.var()))
        assert abs(a.mean() - b.mean()) < 4.0 * se + 0.1 * pooled, (
            name, a.mean(), b.mean(), se, ne_a, ne_b)


def test_batched_neutra_targets_match_serial():
    """The batched per-chain-context targets evaluate the SAME posterior
    log-density as the serial single-dataset builders, for both families
    (on fully-valid datasets, where the capped-ext semantics coincide)."""
    # flagship: build a 2-dataset batch by stacking the fixture twice
    # with different seeds
    spec, theta, d1, m1, l1 = _one_flagship_dataset(seed=11)
    _, _, d2, m2, l2 = _one_flagship_dataset(seed=12)
    data = jnp.concatenate([d1, d2]); mask = jnp.concatenate([m1, m2])
    log_n = jnp.concatenate([l1, l2])
    am = build_amortizer(spec)
    params = am.init(jax.random.PRNGKey(7), theta, d1, m1, l1)
    lp_b, push_b, ctx, dim = NT.make_logprob_flagship_neutra_batched(
        am, params, data, mask, log_n, n_quad=8)
    assert dim == 7
    for d in range(2):
        y = np.asarray(data[d, :, 0])
        valid = y != 0.0
        if not valid.all():      # capped trials: semantics differ; skip
            continue
        fdata = M.FlagshipData(
            y=jnp.asarray(y[valid]),
            ext=jnp.asarray(data[d, :, 1])[valid],
            participant=jnp.zeros(int(valid.sum()), jnp.int32), nparts=1,
            valid=jnp.ones(int(valid.sum()), bool))
        lp_s, push_s, _ = NT.make_logprob_flagship_neutra(
            fdata, am, params, data[d], mask[d], log_n[d], n_quad=8)
        c = jax.tree.map(lambda x: x[d], ctx)
        for s in range(3):
            eps = 0.5 * jax.random.normal(jax.random.PRNGKey(s), (7,))
            np.testing.assert_allclose(float(lp_b(eps, c)),
                                       float(lp_s(eps)), rtol=2e-6,
                                       atol=2e-4)
            np.testing.assert_allclose(np.asarray(push_b(eps, c)),
                                       np.asarray(push_s(eps)), rtol=1e-6)

    # dcDDM
    spec2 = zoo.get_model("basic_ddm_dc")
    theta2 = jnp.asarray([[1.0, 1.1, 0.5, 0.3, 1.0],
                          [-0.5, 1.3, 0.45, 0.25, 0.9]], jnp.float32)
    n_trials = 48
    mask2 = jnp.ones((2, n_trials), bool)
    data2 = spec2.simulate(jax.random.PRNGKey(5), theta2, n_trials,
                           active=mask2)
    log_n2 = jnp.full((2, 1), np.log(n_trials), jnp.float32)
    am2 = build_amortizer(spec2)
    params2 = am2.init(jax.random.PRNGKey(7), theta2, data2, mask2,
                       log_n2)
    lp2_b, push2_b, ctx2, dim2 = NT.make_logprob_dcddm_neutra_batched(
        am2, params2, data2, mask2, log_n2)
    assert dim2 == 5
    for d in range(2):
        rt, choice = np.asarray(data2[d, :, 0]), np.asarray(data2[d, :, 1])
        valid = choice != 0
        y = jnp.asarray((rt * choice)[valid], jnp.float32)
        lp2_s, _, _ = NT.make_logprob_dcddm_neutra(
            y, am2, params2, data2[d], mask2[d], log_n2[d])
        c = jax.tree.map(lambda x: x[d], ctx2)
        for s in range(3):
            eps = 0.5 * jax.random.normal(jax.random.PRNGKey(10 + s), (5,))
            np.testing.assert_allclose(float(lp2_b(eps, c)),
                                       float(lp2_s(eps)), rtol=2e-6,
                                       atol=2e-4)


def test_spec_neutra_density_identity():
    """The generic spec-driven NeuTra target (eta family) must equal
    prior(theta) + exact loglik(theta) + logdet at theta = push(eps),
    with the likelihood evaluated by the shared registry directly."""
    spec = zoo.get_model("basic_ddm_eta_dc")
    theta = jnp.asarray([[1.0, 1.2, 0.5, 0.3, 0.6, 1.0],
                         [-0.8, 1.0, 0.45, 0.25, 0.4, 1.2]], jnp.float32)
    n = 48
    mask = jnp.ones((2, n), bool)
    data = spec.simulate(jax.random.PRNGKey(9), theta, n, active=mask)
    log_n = jnp.full((2, 1), np.log(n), jnp.float32)
    am = build_amortizer(spec)
    params = am.init(jax.random.PRNGKey(7), theta, data, mask, log_n)
    lp, push, ctx, dim = NT.make_logprob_spec_neutra_batched(
        spec, am, params, data, mask, log_n)
    assert dim == 6
    cond, lo, hi = am.apply(params, data, mask, log_n,
                            method="coord_context")
    ll_ctx, ll_fn = M.exact_loglik_ctx(spec.name, data, mask)
    for d in range(2):
        c = jax.tree.map(lambda x: x[d], ctx)
        cl = jax.tree.map(lambda x: x[d], ll_ctx)
        for s in range(3):
            eps = 0.5 * jax.random.normal(jax.random.PRNGKey(s), (6,))
            th, ldj = am.apply(params, eps, cond[d], lo[d], hi[d],
                               method="push_forward")
            expect = float(ldj) + sum(
                float(dist.log_prob(th[j]))
                for j, dist in enumerate(spec.prior))
            expect += float(ll_fn([th[j] for j in range(6)], cl))
            np.testing.assert_allclose(float(lp(eps, c)), expect,
                                       rtol=2e-6, atol=2e-3)
            np.testing.assert_allclose(np.asarray(push(eps, c)),
                                       np.asarray(th), rtol=1e-6)


def test_replicate_ctx_layout():
    ctx = {"a": jnp.arange(3.0)[:, None]}
    r = NT.replicate_ctx(ctx, 2)
    np.testing.assert_array_equal(np.asarray(r["a"][:, 0]),
                                  [0, 0, 1, 1, 2, 2])
