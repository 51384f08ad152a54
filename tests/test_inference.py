"""Unified certified-inference API (bayesflow_nddms_tpu/inference.py):
amortized fit -> PSIS certificate -> debiasing -> exact-refit routing,
as one library call. Mechanics-level tests (tiny budgets, untrained
flow); the quality-level validation lives in the round-3 artifacts
(results/agreement_flagship_refit*_r3, stahl_certified_*_r3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesflow_nddms_tpu import inference as CI
from bayesflow_nddms_tpu.models import zoo
from bayesflow_nddms_tpu.models.spec import (generate_training_batch,
                                             sample_n_trials, trial_mask)
from bayesflow_nddms_tpu.train.trainer import TrainConfig, Trainer


def _tiny_setup(model="basic_ddm_dc", batch=3, n_pad=48, seed=0):
    spec = zoo.get_model(model)
    cfg = TrainConfig(batch_size=8, steps=1, n_pad=n_pad,
                      ckpt_dir="/nonexistent-ckpt")
    trainer = Trainer(spec, cfg)
    state = trainer.init()                      # untrained flow
    key = jax.random.PRNGKey(seed)
    rng = np.random.default_rng(seed)
    theta = jnp.asarray(np.stack(
        [rng.uniform(lo, hi, batch) for lo, hi in
         [(-2, 2), (0.9, 1.3), (0.4, 0.6), (0.2, 0.4), (0.9, 1.3)]],
        axis=-1), jnp.float32)
    n = jnp.full((batch,), n_pad, jnp.int32)
    mask = trial_mask(n, n_pad)
    data = spec.simulate(jax.random.fold_in(key, 1), theta, n_pad,
                         active=mask)
    log_n = jnp.log(n.astype(jnp.float32))[:, None]
    return spec, trainer, state, data, mask, log_n


def test_certified_posterior_fields_and_routing():
    spec, trainer, state, data, mask, log_n = _tiny_setup()
    cp = CI.certified_posterior(spec, trainer, state, data, mask, log_n,
                                jax.random.PRNGKey(2), draws=32,
                                draw_chunk=16)
    B, P = 3, 5
    assert cp.draws.shape == (B, 32, P)
    assert cp.khat.shape == (B,) and not np.isnan(cp.khat).any()
    assert cp.logw_smoothed.shape == (B, 32)
    assert cp.raw_mean.shape == (B, P) and cp.debiased_mean.shape == (B, P)
    assert np.all(cp.weight_ess >= 1) and np.all(cp.weight_ess <= 32)
    # routing: certified datasets report the debiased moments, flagged
    # ones the raw flow moments (measured-safer: ROUND3.md PSIS-routing)
    m = cp.mean()
    ok = cp.certified
    np.testing.assert_allclose(m[ok], cp.debiased_mean[ok])
    np.testing.assert_allclose(m[~ok], cp.raw_mean[~ok])
    src = cp.source
    assert set(src) <= {"psis", "amortized"}
    assert ((src == "psis") == ok).all()


def test_family_requires_exact_likelihood():
    spec = zoo.get_model("basic_ddm")      # no dc: not an exact family
    with pytest.raises(ValueError, match="exact likelihood"):
        CI._family(spec)


@pytest.mark.slow
def test_certified_posterior_refit_flagged_dcddm():
    """Flagged dataset routes to an exact NeuTra-NUTS refit; the routed
    mean/sd/source switch to it. Slow: the NUTS program is a
    multi-minute XLA CPU compile."""
    spec, trainer, state, data, mask, log_n = _tiny_setup(batch=2,
                                                          n_pad=24)
    cp = CI.certified_posterior(
        spec, trainer, state, data, mask, log_n, jax.random.PRNGKey(3),
        draws=16, draw_chunk=16, refit_flagged=1,
        # the deliberately tiny NUTS budget cannot converge, so disable
        # rhat-based escalation to the plain tier (tested on real data;
        # here the point is the NeuTra routing itself)
        rhat_escalate=float("inf"),
        refit_opts=dict(warmup=10, samples=6, chains=2, max_depth=3,
                        chunk=8))
    # untrained flow at 16 draws: at least one dataset must be flagged
    assert (~cp.certified).any()
    assert len(cp.refits) == 1
    (i, r), = cp.refits.items()
    assert r.samples.shape == (6 * 2, 5)
    assert np.isfinite(r.mean).all() and np.isfinite(r.sd).all()
    assert cp.source[i] == "refit"
    np.testing.assert_allclose(cp.mean()[i], r.mean)
    np.testing.assert_allclose(cp.sd()[i], r.sd)


@pytest.mark.slow
def test_certified_posterior_eta_model_plain_refit():
    """The eta family rides the full certified pipeline: PSIS against the
    closed-form Gaussian-drift marginal, and the generic spec-driven
    PLAIN refit tier (khat_neutra_max=0 forces it) — mechanics only."""
    spec = zoo.get_model("basic_ddm_eta_dc")
    cfg = TrainConfig(batch_size=8, steps=1, n_pad=32,
                      ckpt_dir="/nonexistent-ckpt")
    trainer = Trainer(spec, cfg)
    state = trainer.init()
    key = jax.random.PRNGKey(5)
    theta = jnp.asarray([[1.0, 1.2, 0.5, 0.3, 0.5, 1.0],
                         [-0.5, 1.0, 0.5, 0.25, 0.4, 1.1]], jnp.float32)
    mask = trial_mask(jnp.full((2,), 32, jnp.int32), 32)
    data = spec.simulate(jax.random.fold_in(key, 1), theta, 32,
                         active=mask)
    log_n = jnp.log(jnp.full((2, 1), 32.0))
    cp = CI.certified_posterior(
        spec, trainer, state, data, mask, log_n, key, draws=16,
        draw_chunk=16, refit_flagged=1, khat_neutra_max=0.0,
        rhat_escalate=float("inf"),
        refit_opts=dict(warmup=10, samples=6, chains=2, max_depth=3,
                        chunk=8))
    assert cp.khat.shape == (2,) and not np.isnan(cp.khat).any()
    assert (~cp.certified).any()           # untrained flow at 16 draws
    assert len(cp.refits) == 1
    (i, r), = cp.refits.items()
    assert r.method == "plain"
    assert r.samples.shape == (6 * 2, spec.n_params)
    assert np.isfinite(r.mean).all() and np.isfinite(r.sd).all()
    # refit samples live in the model's support
    for j, d_ in enumerate(spec.prior):
        lo, hi = d_.support
        if np.isfinite(lo):
            assert r.samples[:, j].min() >= lo - 1e-5
        if np.isfinite(hi):
            assert r.samples[:, j].max() <= hi + 1e-5


def test_split_refits_by_khat_bands():
    """Routing follows the measured khat bands: worst-first selection,
    khat < band -> NeuTra tier, saturated/inf/NaN -> plain tier."""
    khat = np.array([0.2, 1.5, 6.0, np.inf, 0.9, np.nan, 2.9])
    flagged = np.array([1, 2, 3, 4, 5, 6])       # index 0 is certified
    sel, neutra, plain = CI.split_refits_by_khat(khat, flagged, 4, 3.0)
    # worst-first: inf and NaN (both "flow transport broken") lead
    assert set(sel[:2].tolist()) == {3, 5}
    assert set(sel.tolist()) == {3, 5, 2, 6}
    assert neutra == [6]                          # 2.9 < 3.0
    assert sorted(plain) == [2, 3, 5]             # 6.0, inf, NaN
    # k larger than the flagged set: everything routed, no error
    sel2, neutra2, plain2 = CI.split_refits_by_khat(khat, flagged, 99, 3.0)
    assert len(sel2) == 6 and len(neutra2) + len(plain2) == 6
    assert sorted(neutra2) == [1, 4, 6]


def test_split_refits_degenerate_draws_force_plain():
    """Boundary-clamped (degenerate) draws prove the transport map is
    broken for that dataset, so it routes plain even at tame khat."""
    khat = np.array([0.2, 0.94, 1.5])
    flagged = np.array([1, 2])
    ndeg = np.array([0, 8, 0])
    sel, neutra, plain = CI.split_refits_by_khat(
        khat, flagged, 2, 3.0, n_degenerate=ndeg)
    assert neutra == [2] and plain == [1]
    # without the signal, both land in the NeuTra band
    _, neutra2, plain2 = CI.split_refits_by_khat(khat, flagged, 2, 3.0)
    assert sorted(neutra2) == [1, 2] and plain2 == []
