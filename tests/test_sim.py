"""Simulator correctness: closed-form first-passage oracles + zoo contracts.

The reference validates its simulator only by eye ("should look like a
shifted Wald", single_trial_alpha_not_scaled.py:232-237). Here we test the
EM kernel against exact Wiener-process results: for drift mu, diffusion
coefficient sigma, boundaries [0, a], start z = beta*a,

    P(upper) = (1 - exp(-2 mu z / sigma^2)) / (1 - exp(-2 mu a / sigma^2))
    E[T]     = (a * P(upper) - z) / mu          (mu != 0)
    E[T]     = z (a - z) / sigma^2              (mu == 0)

Plain EM with step dt has a known O(sqrt(dt)) boundary-overshoot bias; the
kernels' Brownian-bridge crossing correction (ops/ddm_sim.py docstring)
removes it, so the default path is tested at the production dt = 0.01
against the analytic values at near-MC-noise tolerances, and the
``bridge=False`` ablation is tested to show exactly the bias the
correction removes.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesflow_nddms_tpu.models import zoo
from bayesflow_nddms_tpu.models.spec import generate_training_batch
from bayesflow_nddms_tpu.ops.ddm_sim import first_passage


def analytic_p_upper(mu, a, z, sigma=1.0):
    if mu == 0:
        return z / a
    th = 2.0 * mu / sigma**2
    return (1 - math.exp(-th * z)) / (1 - math.exp(-th * a))


def analytic_mean_t(mu, a, z, sigma=1.0):
    if mu == 0:
        return z * (a - z) / sigma**2
    return (a * analytic_p_upper(mu, a, z, sigma) - z) / mu


@pytest.mark.parametrize("mu,a,beta,dc", [
    (1.0, 1.5, 0.5, 1.0),
    (0.0, 1.2, 0.5, 1.0),
    (-2.0, 1.0, 0.3, 1.0),
    (1.0, 1.5, 0.5, 2.0),   # free diffusion coefficient (the dcDDM twist)
])
def test_first_passage_matches_analytic(mu, a, beta, dc):
    """Bridge-corrected kernel at the PRODUCTION grid (dt=.01) must hit the
    continuum values at near-MC-noise tolerance (n=200k: sd(p) ~ 1e-3)."""
    n = 200_000
    dt = 0.01
    key = jax.random.PRNGKey(42)
    fp = first_passage(key, mu, a, beta, dc, shape=(1, n), dt=dt,
                       max_steps=1600)
    t = np.asarray(fp.decision_time(dt)[0])
    choice = np.asarray(fp.choice[0]).astype(int)
    assert (choice == 0).mean() < 1e-3  # essentially no missing responses
    hit = choice != 0
    p_up = (choice[hit] == 1).mean()
    mean_t = t[hit].mean()

    z = beta * a
    p_ref = analytic_p_upper(mu, a, z, dc)
    t_ref = analytic_mean_t(mu, a, z, dc)
    assert abs(p_up - p_ref) < 0.005
    assert abs(mean_t - t_ref) < 0.004 + 0.01 * t_ref


def test_bridge_removes_em_bias():
    """The bridge=False ablation must show the classic boundary-overshoot
    bias (effective boundary inflated by ~0.5826*dc*sqrt(dt)) that the
    default path removes; bridge at dt=.01 must beat even plain EM at
    dt=.001 (the reference's fine-grained workaround,
    single_trial_alpha_not_scaled.py:1702-1765)."""
    mu, a, beta = 1.0, 1.5, 0.5
    t_ref = analytic_mean_t(mu, a, beta * a)
    errs = {}
    for label, (dt, ms, bridge) in {
        "plain_01": (0.01, 800, False),
        "plain_001": (0.001, 8000, False),
        "bridge_01": (0.01, 800, True),
    }.items():
        fp = first_passage(jax.random.PRNGKey(0), mu, a, beta, 1.0,
                           shape=(1, 100_000), dt=dt, max_steps=ms,
                           bridge=bridge)
        hit = np.asarray(fp.choice[0]) != 0
        t = np.asarray(fp.decision_time(dt)[0])
        errs[label] = abs(t[hit].mean() - t_ref)
    assert errs["plain_001"] < errs["plain_01"]
    assert errs["bridge_01"] < errs["plain_001"]
    # plain EM at dt=.01 carries the overshoot bias; bridge kills it
    overshoot_dt = 0.5826 * math.sqrt(0.01) * a  # rough E[T] scale of bias
    assert errs["plain_01"] > 0.3 * overshoot_dt
    assert errs["bridge_01"] < 0.1 * overshoot_dt


def test_decision_times_leave_the_grid():
    """RTs must be continuous, not multiples of dt: the sub-step crossing
    fraction has to spread decision times inside each dt bin (this is what
    fixes the reference-scale ter SBC failure, VERDICT r2 Weak #1)."""
    dt = 0.01
    fp = first_passage(jax.random.PRNGKey(5), 1.0, 1.5, 0.5, 1.0,
                       shape=(1, 50_000), dt=dt, max_steps=800)
    hit = np.asarray(fp.choice[0]) != 0
    t = np.asarray(fp.decision_time(dt)[0])[hit]
    fracpart = t / dt - np.floor(t / dt)
    # near-uniform coverage of the intra-bin fraction
    assert fracpart.std() > 0.2
    hist, _ = np.histogram(fracpart, bins=10, range=(0, 1))
    assert hist.min() > 0.5 * hist.mean()


def _reference_bridge_loop(ev0, xi, u, drift_dt, sqrt_dt_dc, boundary,
                           inv2, max_steps):
    """Independent plain-Python re-statement of the exact-transition +
    bridge-test step rule, fed pre-drawn noise — the reviewer's
    pre-drawn-noise stress test (Basic_DDM_simulations.py:75-125) adapted
    to the bridge kernel. Every op mirrors ops/ddm_sim._bridge_step but is
    written against numpy-style jnp calls in a Python for-loop, not
    lax.scan. Returns the loop state needed for the post-loop crossing-time
    draw."""
    ev = ev0
    steps = jnp.zeros_like(ev0, dtype=jnp.int32)
    evb = ev0
    dh = jnp.full_like(ev0, -1.0)
    choice = jnp.zeros_like(ev0, dtype=jnp.int8)
    done = (ev0 >= boundary) | (ev0 <= 0.0)
    for t in range(xi.shape[0]):
        act = (~done) & (steps < max_steps)
        ev_new = ev + jnp.where(act, drift_dt + sqrt_dt_dc * xi[t], 0.0)
        inside = (ev_new > 0.0) & (ev_new < boundary)
        detected = act & ~inside
        take_up = (ev + ev_new) > boundary
        d0 = jnp.where(take_up, boundary - ev, ev)
        d1 = jnp.where(take_up, boundary - ev_new, ev_new)
        p = jnp.exp(-d0 * d1 * inv2)
        hidden = act & inside & (u[t] < p)
        crossed = detected | hidden
        evb = jnp.where(crossed, ev, evb)
        dh = jnp.where(hidden, d1, dh)
        up = (detected & (ev_new >= boundary)) | (hidden & take_up)
        lo = crossed & ~up
        ev_new = jnp.where(hidden & take_up, boundary,
                           jnp.where(hidden & ~take_up, 0.0, ev_new))
        choice = choice + up.astype(jnp.int8) - lo.astype(jnp.int8)
        steps = steps + act.astype(jnp.int32)
        done = done | crossed
        ev = ev_new
    return ev, steps, evb, dh, choice


def test_predrawn_noise_equivalence():
    """Feed the exact noise stream the scan kernel consumes through an
    independent step-loop: trajectories must agree bitwise (steps/choice
    exactly, crossing-state floats to float32 round-off)."""
    from bayesflow_nddms_tpu.ops.ddm_sim import _finalize_frac

    key = jax.random.PRNGKey(9)
    shape = (1, 2048)
    mu, a, beta, dc = 0.8, 1.4, 0.45, 1.2
    dt, max_steps = 0.01, 120
    fp = first_passage(key, mu, a, beta, dc, shape=shape, dt=dt,
                       max_steps=max_steps, chunk=30, unroll=2)
    # reproduce the kernel's per-step noise derivation (ddm_sim.py step())
    xi = jnp.stack([
        jax.random.normal(
            jax.random.fold_in(jax.random.fold_in(key, t), 0), shape)
        for t in range(max_steps)])
    u = jnp.stack([
        jax.random.uniform(
            jax.random.fold_in(jax.random.fold_in(key, t), 1), shape,
            minval=1e-6, maxval=1.0)
        for t in range(max_steps)])
    f32 = jnp.float32
    sqrt_dt_dc = jnp.sqrt(jnp.asarray(dt, f32)) * jnp.asarray(dc, f32)
    inv2 = 2.0 / (sqrt_dt_dc * sqrt_dt_dc)
    bnd = jnp.broadcast_to(jnp.asarray(a, f32), shape)
    ev, steps, evb, dh, choice = _reference_bridge_loop(
        jnp.full(shape, a * beta, f32), xi, u,
        jnp.asarray(mu * dt, f32), sqrt_dt_dc, bnd, inv2, max_steps)
    np.testing.assert_array_equal(np.asarray(fp.steps), np.asarray(steps))
    np.testing.assert_array_equal(np.asarray(fp.choice), np.asarray(choice))
    frac = _finalize_frac(
        jax.random.fold_in(key, 0x7A11A5), ev, evb, dh,
        jnp.where(steps > 0, choice, 0), bnd,
        jnp.broadcast_to(inv2, shape))
    frac = jnp.where(steps > 0, frac, 1.0)
    # XLA may lower divides as reciprocal-multiplies (2e-5 of a 10 ms step
    # = 0.2 us of RT), and the crossing-time sampler's accept test can
    # flip on 1-ulp input differences — allow a handful of those flips.
    f_a, f_b = np.asarray(fp.frac), np.asarray(frac)
    close = np.isclose(f_a, f_b, atol=2e-5, rtol=1e-4)
    assert close.mean() > 0.99, f"{(~close).sum()} / {close.size} differ"


def test_missing_responses_at_cap():
    """Zero drift + huge boundary + small cap -> all walks time out with
    choice 0 (the reference's missing-response code, basic_ddm_dc.py:111)."""
    fp = first_passage(jax.random.PRNGKey(1), 0.0, 50.0, 0.5, 1.0,
                       shape=(4, 64), dt=0.01, max_steps=100)
    assert np.all(np.asarray(fp.choice) == 0)
    assert np.all(np.asarray(fp.steps) == 100)


def test_zero_dc_stays_finite():
    """dc == 0 (prior lower edge / trunc-normal rounding) must not NaN the
    bridge machinery: the walk degenerates to the deterministic drift line
    and the crossing fraction to linear interpolation. Regression for the
    dc5 training NaN (trial-level dc ~ trunc normal could yield exactly 0,
    then q = d0*dend/(sigma^2 dt) = inf and x = inf - inf = NaN)."""
    dc = jnp.array([[0.0], [1e-8], [1e-3], [1.0]])
    fp = first_passage(jax.random.PRNGKey(11), -1.5, 1.2, 0.4, dc,
                       shape=(4, 64), dt=0.01, max_steps=300)
    steps = np.asarray(fp.steps)
    frac = np.asarray(fp.frac)
    choice = np.asarray(fp.choice)
    assert np.all(np.isfinite(frac))
    rt = (steps - 1 + frac) * 0.01
    assert np.all(np.isfinite(rt))
    # sigma -> 0: deterministic drift -1.5 from 0.48 hits 0 at t = 0.32
    det = rt[:2][choice[:2] != 0]
    assert det.size and np.allclose(det, 0.32, atol=0.02)
    assert np.all(choice[0] == -1)


def test_trunc_normal_positive_never_zero():
    """Inverse-CDF truncation can round to the bound; the floor must keep
    every draw strictly positive (it feeds diffusion coefficients)."""
    from bayesflow_nddms_tpu.utils.dists import trunc_normal_positive
    # mu << 0 concentrates z within ~1/|a| of the truncation point, making
    # exact-0 rounding likely without the floor
    x = trunc_normal_positive(jax.random.PRNGKey(0), -10.0, 1.0, (1_000_000,))
    assert float(jnp.min(x)) > 0.0


def test_active_mask_zeroes_padding():
    spec = zoo.get_model("single_trial_alpha_not_scaled")
    key = jax.random.PRNGKey(3)
    theta, data, mask, log_n = generate_training_batch(spec, key, 16, 128)
    data = np.asarray(data)
    mask = np.asarray(mask)
    assert data.shape == (16, 128, 2)
    assert np.all(data[~mask] == 0.0)
    # active trials: choicert magnitude >= ndt for non-missing
    ndt = np.asarray(theta)[:, 3]
    c0 = data[..., 0]
    nonmissing = mask & (c0 != 0)
    ndt_full = np.broadcast_to(ndt[:, None], c0.shape)
    assert np.all(np.abs(c0[nonmissing]) >= ndt_full[nonmissing] - 1e-5)


def test_evidence_active_mask_equivalence():
    """The evidence family's custom_simulate must honor `active`: padded
    lanes are born-done (zero observation) and do not perturb the noise or
    outcomes of real lanes, and the chunked early-exit tail returns results
    identical to a mask-free run on the real lanes (VERDICT r3 weak #4)."""
    spec = zoo.get_model("basic_ddm_dc_evidence")
    key = jax.random.PRNGKey(9)
    theta = spec.sample_prior(jax.random.PRNGKey(1), 4)
    n_pad = 48
    active = jnp.arange(n_pad)[None, :] < jnp.array([12, 48, 30, 5])[:, None]
    with_mask = np.asarray(spec.simulate(key, theta, n_pad, active=active))
    no_mask = np.asarray(spec.simulate(key, theta, n_pad))
    act = np.asarray(active)
    # padded lanes are exactly zeroed
    assert np.all(with_mask[~act] == 0.0)
    # real lanes: rt and choice channels identical to the unmasked run
    # (same noise stream, padded lanes consume no extra randomness)
    np.testing.assert_array_equal(with_mask[..., 0][act],
                                  no_mask[..., 0][act])
    np.testing.assert_array_equal(with_mask[..., 1][act],
                                  no_mask[..., 1][act])
    # path channels differ only through the per-trial standardization of
    # the (identical) raw paths -> allclose, not bitwise
    np.testing.assert_allclose(with_mask[..., 2:][act],
                               no_mask[..., 2:][act], rtol=1e-5, atol=1e-5)


def test_determinism():
    spec = zoo.get_model("basic_ddm_dc")
    key = jax.random.PRNGKey(7)
    a = generate_training_batch(spec, key, 4, 64)
    b = generate_training_batch(spec, key, 4, 64)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_flagship_covariate_moments():
    """extdata1 ~ N(bound_trial, sigma1) with bound_trial ~ TN+(mu, std):
    its mean must track mu_alpha when truncation is mild
    (single_trial_alpha_not_scaled.py:113-134)."""
    spec = zoo.get_model("single_trial_alpha_not_scaled")
    theta = jnp.array([[1.0, 2.0, 0.5, 0.4, 0.2, 1.0, 0.3]], jnp.float32)
    data = spec.simulate(jax.random.PRNGKey(5), theta, 50_000)
    ext = np.asarray(data[0, :, 1])
    # truncation at 0 is ~10 sigma away -> mean ~= mu_alpha = 2.0
    assert abs(ext.mean() - 2.0) < 0.02
    assert abs(ext.std() - math.sqrt(0.2**2 + 0.3**2)) < 0.01


def test_all_zoo_models_simulate():
    # 34 fresh simulate programs on top of a full-suite session's compile
    # state reproducibly segfaults the XLA CPU compiler (observed twice
    # under -m '' at jax/_src/compiler.py:362, never in isolation);
    # dropping the accumulated executables first avoids the crash.
    jax.clear_caches()
    key = jax.random.PRNGKey(0)
    for name in zoo.list_models():
        spec = zoo.get_model(name)
        n = 32 if name == "basic_ddm_dc_evidence" else 64
        theta, data, mask, log_n = generate_training_batch(spec, key, 2, n)
        assert data.shape == (2, n, spec.n_channels), name
        assert np.all(np.isfinite(np.asarray(data))), name
        assert theta.shape == (2, spec.n_params), name


def test_registry_covers_every_reference_model():
    """Every amortized model the reference defines (3 main scripts + 31
    retired_models scripts, imputation pipelines excluded) must be
    registered under its reference name — the round-4 VERDICT found
    single_trial_drift_dc_base silently absent; this pins the inventory."""
    reference_models = {
        # main scripts (basic_ddm_dc.py, single_trial_alpha_not_scaled.py)
        "basic_ddm_dc", "single_trial_alpha_not_scaled",
        # retired_models/*.py
        "basic_ddm", "basic_ddm_eta_dc",
        "basic_ddm_dc_evidence", "basic_ddm_dc_evidence2",
        "basic_ddm_dc_evidence_no_noise", "basic_ddm_dc_evidence_no_noise2",
        "basic_ddm_dc_evidence_trainlow",
        "single_trial_alpha", "single_trial_alpha_dc",
        "single_trial_alpha_dc2", "single_trial_alpha_dc_not_scaled",
        "single_trial_alpha_fixed", "single_trial_alpha_mean",
        "single_trial_alpha_not_scaled2", "single_trial_alpha_not_scaled3",
        "single_trial_alpha_scaled", "single_trial_alpha_sepvar",
        "single_trial_alpha_standard", "single_trial_alpha_standnorm",
        "single_trial_drift", "single_trial_drift2",
        "single_trial_drift_alpha", "single_trial_drift_alpha2",
        "single_trial_drift_alpha_base",
        "single_trial_drift_dc", "single_trial_drift_dc2",
        "single_trial_drift_dc3", "single_trial_drift_dc4",
        "single_trial_drift_dc5", "single_trial_drift_dc6",
        "single_trial_drift_dc_base",
    }
    registered = set(zoo.list_models())
    missing = reference_models - registered
    assert not missing, f"reference models absent from the zoo: {missing}"


def test_prior_moments_match_samples():
    spec = zoo.get_model("basic_ddm_dc")
    theta = np.asarray(spec.sample_prior(jax.random.PRNGKey(11), 100_000))
    m, s = spec.prior_moments()
    np.testing.assert_allclose(theta.mean(0), np.asarray(m), atol=0.02)
    np.testing.assert_allclose(theta.std(0), np.asarray(s), rtol=0.03)


def test_drift_dc5_standardized_channels():
    """dc5/dc6 observe analytically standardized EEG: over prior draws the
    channels must be near-N(0,1). The reference's standardization ignores
    the dc>0 truncation (single_trial_drift_dc5.py:120-131), which leaves
    a small positive mean bias on the fixed-loading channel — we assert
    the same behavior, not a 'fixed' one."""
    spec = zoo.get_model("single_trial_drift_dc5")
    theta, data, mask, _ = generate_training_batch(
        spec, jax.random.PRNGKey(3), 192, 128)
    d, m = np.asarray(data), np.asarray(mask)
    for c in (1, 2):
        vals = d[..., c][m]
        assert abs(vals.mean()) < 0.35, (c, vals.mean())
        assert 0.8 < vals.std() < 1.15, (c, vals.std())


def test_drift_alpha_base_channels():
    """Covariate-free drift+alpha base model: channels are (rt, choice)
    with rt = decision + ndt > ndt and choice in {-1, 0, 1}
    (retired_models/single_trial_drift_alpha_base.py:98-107)."""
    spec = zoo.get_model("single_trial_drift_alpha_base")
    theta, data, mask, _ = generate_training_batch(
        spec, jax.random.PRNGKey(4), 64, 96)
    d, m = np.asarray(data), np.asarray(mask)
    th = np.asarray(theta)
    rt, choice = d[..., 0], d[..., 1]
    assert set(np.unique(choice[m])).issubset({-1.0, 0.0, 1.0})
    hit = m & (choice != 0)
    ndt = th[:, 3][:, None] * np.ones_like(rt)
    assert np.all(rt[hit] > ndt[hit] - 1e-5)


def test_stratified_n_buckets_cover_range_uniformly():
    """generate_training_batch draws N stratified over static dataset
    groups (spec.py _n_buckets): the N marginal must still cover the full
    {n_min..n_max} range near-uniformly and match mask/log_n exactly."""
    from bayesflow_nddms_tpu.models.spec import _n_buckets

    spec = zoo.get_model("basic_ddm_dc")
    groups = _n_buckets(spec, 256, spec.n_max)
    assert len(groups) == 4
    assert sum(g[1] for g in groups) == 256
    assert groups[0][2] == spec.n_min and groups[-1][3] == spec.n_max
    ns = []
    for i in range(12):
        _, data, mask, log_n = generate_training_batch(
            spec, jax.random.PRNGKey(100 + i), 256, spec.n_max)
        n = np.asarray(mask).sum(1)
        np.testing.assert_allclose(np.exp(np.asarray(log_n)[:, 0]), n,
                                   rtol=1e-5)
        ns.append(n)
    ns = np.concatenate(ns)
    assert ns.min() <= spec.n_min + 2 and ns.max() >= spec.n_max - 2
    assert abs(ns.mean() - (spec.n_min + spec.n_max) / 2) < 4
    hist, _ = np.histogram(ns, bins=8, range=(spec.n_min, spec.n_max + 1))
    assert hist.min() > 0.8 * hist.mean()
