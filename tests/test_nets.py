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
    # at zero-init the flow is identity: samples ~ prior moments
    m, s = spec.prior_moments()
    err = np.abs(np.asarray(samples).mean((0, 1)) - np.asarray(m))
    assert np.all(err < 4 * np.asarray(s) / np.sqrt(200))


def test_sample_clamped_to_prior_support():
    """Posterior draws must lie inside the prior's support: an untrained
    amortizer (identity flow = standardized-prior sampler, i.e. unbounded
    normals) would otherwise emit e.g. negative boundaries. Clamping
    bounds the damage of off-manifold conditioning (nets/amortizer.py)."""
    from bayesflow_nddms_tpu.models.spec import generate_training_batch
    spec = zoo.get_model("basic_ddm_dc")
    amort = build_amortizer(spec)
    key = jax.random.PRNGKey(0)
    theta, data, mask, log_n = generate_training_batch(spec, key, 4, 64)
    params = amort.init(key, theta, data, mask, log_n)
    samp = np.asarray(amort.apply(params, key, data, mask, log_n, 4000,
                                  method="sample"))
    for i, d in enumerate(spec.prior):
        lo, hi = d.support
        assert samp[..., i].min() >= lo - 1e-6, spec.param_names[i]
        assert samp[..., i].max() <= hi + 1e-6, spec.param_names[i]
    # the unbounded-support parameter (drift ~ N(0,2)) must NOT be clamped
    # to a narrow range: untrained draws are ~N(0, 2), so |drift| > 4
    # appears with probability ~4.5% per draw
    assert np.abs(samp[..., 0]).max() > 4.0
