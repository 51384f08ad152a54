"""Diagnostics tests: Rhat/ESS behavior on known chains, recovery metrics,
SBC calibration of an untrained (identity) flow, plot smoke tests."""

import numpy as np

from bayesflow_nddms_tpu.diagnostics import convergence as cv
from bayesflow_nddms_tpu.diagnostics import recovery as rec


def test_rhat_converged_chains_near_one():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 2000, 4))  # iid -> Rhat ~ 1
    r = cv.split_rhat(x)
    assert r.shape == (3,)
    assert np.all(np.abs(r - 1.0) < 0.02)


def test_rhat_detects_nonconvergence():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2000, 4))
    x[:, 0] += 5.0  # one shifted chain
    r = cv.split_rhat(x)
    assert r > 1.5


def test_ess_iid_close_to_total():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2000, 4))
    ne = cv.ess(x)
    assert 0.5 * 8000 < ne < 1.5 * 8000


def test_ess_autocorrelated_much_smaller():
    rng = np.random.default_rng(3)
    n, m, rho = 4000, 4, 0.95
    x = np.zeros((n, m))
    eps = rng.normal(size=(n, m))
    for t in range(1, n):
        x[t] = rho * x[t - 1] + eps[t] * np.sqrt(1 - rho**2)
    ne = cv.ess(x)
    expect = n * m * (1 - rho) / (1 + rho)  # AR(1) theory
    assert 0.4 * expect < ne < 2.5 * expect


def test_diagnostic_and_summary_dict_interface(capsys):
    rng = np.random.default_rng(4)
    samples = {"alpha": rng.normal(1.0, 0.1, size=(5, 500, 4)),
               "_ignored": rng.normal(size=(500, 4))}
    d = cv.diagnostic(samples)
    assert "_ignored" not in d and "alpha" in d
    assert "Maximum Rhat" in capsys.readouterr().out
    s = cv.summary(samples)
    assert abs(s["alpha"]["mean"].mean() - 1.0) < 0.01
    assert s["alpha"]["95lower"].shape == (5,)
    assert np.all(s["alpha"]["95lower"] < s["alpha"]["95upper"])


def test_flipstanout_axis_convention():
    x = np.zeros((100, 6, 3))  # (iters, chains, dim)
    out = cv.flipstanout({"v": x})
    assert out["v"].shape == (3, 100, 6)


def test_streaming_study_sharded_mesh(tmp_path):
    """The streaming recovery study shard_maps each chunk's dataset axis
    over the mesh (VERDICT r3 #7). Mechanics on the fake 8-device mesh:
    shapes, finiteness, chunk-resume equality with the sharded fingerprint.
    """
    import jax
    from bayesflow_nddms_tpu.models import zoo
    from bayesflow_nddms_tpu.nets.amortizer import build_amortizer
    from bayesflow_nddms_tpu.parallel.mesh import make_mesh
    spec = zoo.get_model("basic_ddm_dc")
    am = build_amortizer(spec)
    key = jax.random.PRNGKey(0)
    theta = spec.sample_prior(key, 2)
    import jax.numpy as jnp
    mask = jnp.ones((2, 64), bool)
    data = spec.simulate(key, theta, 64, active=mask)
    log_n = jnp.full((2, 1), np.log(64.0), jnp.float32)
    params = am.init(key, theta, data, mask, log_n)
    mesh = make_mesh()          # 8 fake devices under the test conftest
    assert mesh.devices.size == 8
    wd = str(tmp_path / "study")
    study = rec.run_recovery_study_streaming(
        spec, am, params, key, num_test=16, n_draws=32, batch=16,
        n_pad=64, workdir=wd, log_every=0, mesh=mesh)
    assert study.true_params.shape == (16, 5)
    assert study.ranks.shape == (16, 5)
    assert np.all((study.ranks >= 0) & (study.ranks <= 32))
    assert np.isfinite(study.post_mean).all()
    # resume from the stored chunk reproduces the identical reduction
    study2 = rec.run_recovery_study_streaming(
        spec, am, params, key, num_test=16, n_draws=32, batch=16,
        n_pad=64, workdir=wd, log_every=0, mesh=mesh)
    np.testing.assert_array_equal(study.ranks, study2.ranks)
    np.testing.assert_array_equal(study.post_mean, study2.post_mean)


def test_recovery_metrics_perfect_and_noise():
    rng = np.random.default_rng(5)
    truth = rng.normal(size=(200, 2))
    perfect = truth[:, None, :] + rng.normal(0, 1e-3, (200, 50, 2))
    m = rec.recovery_metrics(truth, perfect, ["a", "b"])
    assert m["a"]["r2"] > 0.99 and m["b"]["rho"] > 0.99
    garbage = rng.normal(size=(200, 50, 2))
    m2 = rec.recovery_metrics(truth, garbage, ["a", "b"])
    assert abs(m2["a"]["rho"]) < 0.2


def test_sbc_uniform_for_calibrated_sampler():
    """If posterior draws come from the same distribution as the truth,
    SBC ranks are uniform."""
    rng = np.random.default_rng(6)
    T, L, P = 400, 99, 3
    truth = rng.normal(size=(T, P))
    draws = rng.normal(size=(T, L, P))
    ranks = rec.sbc_ranks(truth, draws)
    p = rec.sbc_uniformity_pvalue(ranks, L)
    assert np.all(p > 0.01)
    # a biased sampler must fail
    ranks_bad = rec.sbc_ranks(truth + 1.0, draws)
    p_bad = rec.sbc_uniformity_pvalue(ranks_bad, L)
    assert np.all(p_bad < 1e-6)


def test_benjamini_hochberg_adjustment():
    # textbook example: BH q-values are monotone step-up adjusted p's
    p = np.array([0.01, 0.04, 0.03, 0.005, 0.5])
    q = rec.benjamini_hochberg(p)
    # q_(i) = min_{j>=i} p_(j) * m / j on sorted p's
    expected_sorted = [0.025, 0.025, 0.05, 0.05, 0.5]
    assert np.allclose(np.sort(q), expected_sorted)
    # shape-preserving, order-consistent, capped at 1
    assert q.shape == p.shape
    assert np.argmin(q) == np.argmin(p) or q[np.argmin(p)] == q.min()
    assert np.all(rec.benjamini_hochberg(np.ones((4, 3))) <= 1.0)
    # uniform nulls: with m tests the min q concentrates well above alpha
    rng = np.random.default_rng(7)
    qs = rec.benjamini_hochberg(rng.uniform(size=200))
    assert qs.min() > 0.05


def test_contraction_identity_conjugate_gaussian():
    """Exact conjugate check of the calibrated-rho identity
    rho = sqrt(1 - E[post var]/prior var), plus the estimator-bound
    counterexample: independent noise on the posterior means drops
    measured rho below the bound while the bound itself is unchanged."""
    rng = np.random.default_rng(7)
    T, n = 6000, 5
    tau, sigma = 1.3, 2.0                    # prior sd, obs noise sd
    theta = rng.normal(0, tau, T)
    y = theta[:, None] + rng.normal(0, sigma, (T, n))
    post_var = 1.0 / (1.0 / tau**2 + n / sigma**2)
    post_mean = post_var * y.sum(1) / sigma**2
    out = rec.contraction_identity(
        theta[:, None], post_mean[:, None],
        np.full((T, 1), np.sqrt(post_var)), ["th"])["th"]
    # analytic bound sqrt(1 - post_var/tau^2); exact posterior attains it
    want = np.sqrt(1 - post_var / tau**2)
    assert abs(out["rho_bound"] - want) < 0.02
    assert abs(out["efficiency"] - 1.0) < 0.03
    # estimator-bound: posterior means corrupted by independent noise
    noisy = post_mean + rng.normal(0, 2 * np.sqrt(post_var), T)
    out2 = rec.contraction_identity(
        theta[:, None], noisy[:, None],
        np.full((T, 1), np.sqrt(post_var)), ["th"])["th"]
    assert out2["efficiency"] < 0.8
    assert abs(out2["rho_bound"] - out["rho_bound"]) < 1e-12


def test_sbc_interval_coverage():
    """Calibrated ranks give nominal central-interval coverage; an
    overconfident sampler (draws too narrow) undercovers."""
    rng = np.random.default_rng(11)
    T, L, P = 4000, 199, 2
    truth = rng.normal(size=(T, P))
    draws = rng.normal(size=(T, L, P))
    cov = rec.sbc_interval_coverage(rec.sbc_ranks(truth, draws), L)
    assert cov.shape == (3, P)
    for j, q in enumerate((0.5, 0.9, 0.95)):
        assert np.all(np.abs(cov[j] - q) < 0.03)
    narrow = draws * 0.3
    cov_n = rec.sbc_interval_coverage(rec.sbc_ranks(truth, narrow), L)
    assert np.all(cov_n[1] < 0.6)  # nominal 90% badly undercovered


def test_plots_smoke(tmp_path):
    from bayesflow_nddms_tpu.diagnostics import plots
    rng = np.random.default_rng(7)
    samps = rng.normal(size=(4, 200, 2))
    fig = plots.jellyfish(samps.reshape(4, 200, 2)[..., 0, None, :])
    fig.savefig(tmp_path / "jf.png")
    fig = plots.recovery(rng.normal(size=(50, 100, 1)),
                         rng.normal(size=(50,)))
    fig.savefig(tmp_path / "rec.png")
    fig = plots.recovery_scatter(rng.normal(size=(50, 3)),
                                 rng.normal(size=(50, 3)),
                                 ["a", "b", "c"], figsize=(9, 3))
    fig.savefig(tmp_path / "rs.png")
    fig = plots.plot_posterior2d(rng.normal(size=(6, 100)),
                                 rng.normal(size=(6, 100)), ["x", "y"],
                                 true_params=rng.normal(size=(6, 2)),
                                 highlight=2)
    fig.savefig(tmp_path / "p2d.png")
    fig = plots.plot_posterior3d(rng.normal(size=(200, 3)), ["x", "y", "z"])
    fig.savefig(tmp_path / "p3d.png")
    fig = plots.plot_losses(np.linspace(3, -2, 100),
                            np.linspace(3, -1.5, 10))
    fig.savefig(tmp_path / "loss.png")
    fig = plots.plot_recovery(samps, rng.normal(size=(4, 2)), ["a", "b"])
    fig.savefig(tmp_path / "bfrec.png")
    import matplotlib.pyplot as plt
    plt.close("all")


def test_stuck_chains_flags_stranded_basin():
    """A chain parked in a far low-probability region is flagged; chains
    exploring the same basin (or two modes of comparable log-probability)
    are not."""
    import jax.numpy as jnp

    def logp(q):
        return -0.5 * jnp.sum(q * q)

    rng = np.random.default_rng(0)
    good = rng.normal(size=(3, 50, 2))            # near the mode
    stuck = rng.normal(size=(1, 50, 2)) + 12.0    # ~72 nats below
    samples = np.concatenate([good, stuck], axis=0)
    mask, lp = cv.stuck_chains(logp, samples)
    assert mask.tolist() == [False, False, False, True]
    assert lp[3] < lp[:3].min() - 20
    # symmetric modes of equal mass: nobody is "stuck"
    def bimodal(q):
        return jnp.logaddexp(-0.5 * jnp.sum((q - 10.0) ** 2),
                             -0.5 * jnp.sum((q + 10.0) ** 2))
    m1 = rng.normal(size=(2, 50, 2)) + 10.0
    m2 = rng.normal(size=(2, 50, 2)) - 10.0
    mask2, _ = cv.stuck_chains(bimodal, np.concatenate([m1, m2]))
    assert not mask2.any()
