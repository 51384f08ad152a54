"""Network unit tests: invariance, masking, invertibility, conditioning."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesflow_nddms_tpu.models import zoo
from bayesflow_nddms_tpu.nets.amortizer import build_amortizer
from bayesflow_nddms_tpu.nets.coupling import ConditionalFlow
from bayesflow_nddms_tpu.nets.deepset import DeepSet


def _init_deepset():
    net = DeepSet(summary_dim=8, width=16, n_equivariant=2,
                  head_widths=(32,))
    x = jnp.ones((2, 10, 2))
    mask = jnp.ones((2, 10), bool)
    params = net.init(jax.random.PRNGKey(0), x, mask)
    return net, params


def test_deepset_permutation_invariance():
    net, params = _init_deepset()
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (3, 20, 2))
    mask = jnp.ones((3, 20), bool)
    perm = jax.random.permutation(key, 20)
    out1 = net.apply(params, x, mask)
    out2 = net.apply(params, x[:, perm], mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-4, atol=1e-5)


def test_deepset_mask_ignores_padding():
    net, params = _init_deepset()
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (2, 30, 2))
    mask = jnp.arange(30)[None, :] < jnp.array([[17], [30]])
    # poison the padded region: output must not change
    x_poison = jnp.where(mask[..., None], x, 1e6)
    out1 = net.apply(params, x, mask)
    out2 = net.apply(params, x_poison, mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-4, atol=1e-5)


def test_flow_invertibility_and_logdet():
    flow = ConditionalFlow(dim=5, n_blocks=4, widths=(32, 32))
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (7, 5))
    cond = jax.random.normal(jax.random.PRNGKey(4), (7, 9))
    params = flow.init(key, x, cond)
    # perturb params away from zero-init so the test is non-trivial
    params = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(key, p.shape), params)
    z, ldj = flow.apply(params, x, cond, method="forward")
    x_rec = flow.apply(params, z, cond, method="inverse")
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x),
                               rtol=1e-4, atol=1e-5)
    # log-det vs autodiff jacobian on a single row
    jac = jax.jacobian(
        lambda xx: flow.apply(params, xx[None], cond[:1],
                              method="forward")[0][0])(x[0])
    sign, logdet = np.linalg.slogdet(np.asarray(jac))
    np.testing.assert_allclose(float(ldj[0]), logdet, rtol=1e-4, atol=1e-4)


def test_amortizer_end_to_end_shapes():
    spec = zoo.get_model("basic_ddm_dc")
    amort = build_amortizer(spec)
    B, N = 4, 64
    key = jax.random.PRNGKey(0)
    theta = spec.sample_prior(key, B)
    data = spec.simulate(key, theta, N)
    mask = jnp.ones((B, N), bool)
    log_n = jnp.full((B, 1), jnp.log(float(N)))
    params = amort.init(key, theta, data, mask, log_n)
    loss = amort.apply(params, theta, data, mask, log_n)
    assert np.isfinite(float(loss))
    samples = amort.apply(params, key, data, mask, log_n, 50,
                          method="sample")
    assert samples.shape == (B, 50, spec.n_params)
    assert np.all(np.isfinite(np.asarray(samples)))
    # at zero-init the flow is identity: the unbounded coordinate (drift)
    # samples its standardized prior N(0, 2); bounded coordinates sample
    # the logit-normal surrogate of theirs (in-support by construction)
    m, s = spec.prior_moments()
    drift = np.asarray(samples)[..., 0]
    assert abs(drift.mean()) < 4 * float(s[0]) / np.sqrt(200)


def test_amortizer_dependent_prior_specs_raw_coordinates():
    """Specs with prior_transform (alpha_mean, not_scaled3) are amortized
    in RAW prior coordinates: the logit machinery (incl. the ter bound)
    applies because every raw marginal has a known support, training
    targets come back raw from generate_training_batch, and model-space
    values are recovered through spec.to_model_coords (round 4: modelling
    the transformed gamma = u/std_alpha directly reproduced the round-2
    raw-coordinate ter SBC failure)."""
    from bayesflow_nddms_tpu.models.spec import generate_training_batch
    for name in ("single_trial_alpha_mean", "single_trial_alpha_not_scaled3"):
        spec = zoo.get_model(name)
        amort = build_amortizer(spec)
        assert amort.theta_low is not None, name
        assert amort.ndt_index == spec.param_names.index("ter"), name
        B, N = 4, 48
        key = jax.random.PRNGKey(1)
        theta_raw, data, mask, log_n = generate_training_batch(
            spec, key, B, N)
        # raw gamma slot is the U(0,1) draw, NOT u/std_alpha
        g = np.asarray(theta_raw)[:, 6]
        assert np.all((g >= 0.0) & (g <= 1.0)), name
        tm = np.asarray(spec.to_model_coords(theta_raw))
        np.testing.assert_allclose(tm[:, 6],
                                   g / np.asarray(theta_raw)[:, 4],
                                   rtol=1e-6)
        params = amort.init(key, theta_raw, data, mask, log_n)
        loss = amort.apply(params, theta_raw, data, mask, log_n)
        assert np.isfinite(float(loss)), name
        samples = amort.apply(params, key, data, mask, log_n, 20,
                              method="sample")
        assert samples.shape == (B, 20, spec.n_params), name
        s = np.asarray(samples)
        assert np.all(np.isfinite(s)), name
        # raw draws respect the raw supports by construction
        assert np.all((s[..., 6] >= 0.0) & (s[..., 6] <= 1.0)), name
        lp = amort.apply(params, theta_raw, data, mask, log_n,
                         method="log_prob")
        assert np.all(np.isfinite(np.asarray(lp))), name


def test_ndt_index_covers_tau_specs():
    """Every zoo spec with a non-decision time gets the per-dataset
    min-rt bounded coordinate, whatever the parameter is named ('ter'
    everywhere, 'tau' in the single_trial_drift family — missing it left
    single_trial_drift_dc's tau SBC at p = 0.0)."""
    for name in zoo.list_models():
        spec = zoo.get_model(name)
        ndt = [p for p in ("ter", "tau") if p in spec.param_names]
        am = build_amortizer(spec)
        if ndt:
            assert am.ndt_index == spec.param_names.index(ndt[0]), name
        else:
            assert am.ndt_index is None, name


def test_sample_in_support_and_below_min_rt():
    """Bounded parameters are sampled in logit coordinates, so every draw
    lies inside the prior support BY CONSTRUCTION (no clamp involved), and
    ter additionally respects its per-dataset bound ter < min rt — the
    data-conditioned coordinate that fixes the flagship ter SBC
    (nets/amortizer.py docstring)."""
    from bayesflow_nddms_tpu.models.spec import generate_training_batch
    spec = zoo.get_model("basic_ddm_dc")
    amort = build_amortizer(spec)
    key = jax.random.PRNGKey(0)
    theta, data, mask, log_n = generate_training_batch(spec, key, 4, 64)
    params = amort.init(key, theta, data, mask, log_n)
    samp, rate = amort.apply(params, key, data, mask, log_n, 4000,
                             method="sample_with_clamp_rate")
    samp = np.asarray(samp)
    assert np.all(np.asarray(rate) == 0.0)  # clamp is a dead backstop
    for i, d in enumerate(spec.prior):
        lo, hi = d.support
        assert samp[..., i].min() >= lo - 1e-6, spec.param_names[i]
        assert samp[..., i].max() <= hi + 1e-6, spec.param_names[i]
    # the unbounded-support parameter (drift ~ N(0,2)) must NOT be clamped
    # to a narrow range: untrained draws are ~N(0, 2), so |drift| > 4
    # appears with probability ~4.5% per draw
    assert np.abs(samp[..., 0]).max() > 4.0
    # ter < per-dataset min rt on every draw
    d_ = np.asarray(data)
    m_ = np.asarray(mask)
    rt = np.abs(d_[..., 0])
    rt[~(m_ & (rt > 0))] = np.inf
    minrt = np.minimum(rt.min(axis=1), 1.5)
    i_ter = spec.param_names.index("ter")
    # bound includes the 0.1 ms float32-safety slack (amortizer._NDT_SLACK)
    assert np.all(samp[..., i_ter] <= minrt[:, None] + 1.1e-4)


def test_logprob_integrates_transform_jacobians():
    """log_prob must be a proper density in theta space: MC-integrating
    exp(log_prob) over prior draws of a coarse importance proposal should
    be ~1 for a fresh (identity-flow) net, where the density is available
    in closed form per coordinate. Cheaper equivalent: compare log_prob
    against the analytic zero-init density (standardized logit-normal /
    normal product)."""
    from bayesflow_nddms_tpu.models.spec import generate_training_batch
    import scipy.stats as ss

    spec = zoo.get_model("basic_ddm_dc")
    amort = build_amortizer(spec)
    key = jax.random.PRNGKey(1)
    theta, data, mask, log_n = generate_training_batch(spec, key, 3, 64)
    params = amort.init(key, theta, data, mask, log_n)
    lp = np.asarray(amort.apply(params, theta, data, mask, log_n,
                                method="log_prob"))
    # analytic zero-init density: per coordinate, u ~ N(u_mu, u_sd) in
    # logit (bounded) or raw (unbounded) space, times |du/dtheta|
    th = np.asarray(theta)
    d_ = np.asarray(data)
    m_ = np.asarray(mask)
    rt = np.abs(d_[..., 0])
    rt[~(m_ & (rt > 0))] = np.inf
    minrt = np.minimum(rt.min(axis=1) + 1e-4, 1.5)
    expect = np.zeros(3)
    for i, dist in enumerate(spec.prior):
        lo, hi = dist.support
        if not (np.isfinite(lo) and np.isfinite(hi)):
            expect += ss.norm(amort.theta_mean[i],
                              amort.theta_std[i]).logpdf(th[:, i])
            continue
        hi_i = np.where(np.asarray(amort.ndt_index) == i, minrt,
                        hi) if i == amort.ndt_index else np.full(3, hi)
        p = np.clip((th[:, i] - lo) / (hi_i - lo), 1e-6, 1 - 1e-6)
        u = np.log(p) - np.log1p(-p)
        expect += ss.norm(amort.u_mean[i], amort.u_std[i]).logpdf(u)
        expect += -np.log(hi_i - lo) - np.log(p) - np.log1p(-p)
    np.testing.assert_allclose(lp, expect, rtol=1e-4, atol=1e-3)
