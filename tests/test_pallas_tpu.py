"""Pallas-kernel tests, skipped off-TPU (the CPU suite exercises the XLA
path; the driver's bench exercises this one on hardware)."""

import numpy as np
import pytest

import jax


def _on_tpu():
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _on_tpu(), reason="requires TPU")


def test_pallas_matches_xla_statistics():
    """HW-PRNG Box-Muller Pallas vs threefry XLA: same first-passage law.

    n = 1.23M walks across two seeds puts the MC sd of p_up at ~4.4e-4 and
    of mean RT at ~3e-4 s; tolerances are ~4 sd — tight enough to catch
    any systematic bridge-rule divergence between the two backends
    (VERDICT r2 Next #7)."""
    import jax.numpy as jnp
    from bayesflow_nddms_tpu.ops.ddm_pallas import first_passage_pallas
    from bayesflow_nddms_tpu.ops.ddm_sim import first_passage
    shape = (2048, 300)
    dt = 0.01
    p_p = p_x = t_p = t_x = f_p = f_x = 0.0
    for seed in (3, 11):
        fp_p = first_passage_pallas(jnp.int32(seed), 1.0, 1.5, 0.5, 1.0,
                                    shape=shape, dt=dt, max_steps=400)
        fp_x = first_passage(jax.random.PRNGKey(seed), 1.0, 1.5, 0.5, 1.0,
                             shape=shape, dt=dt, max_steps=400)
        for fp in (fp_p, fp_x):
            assert np.asarray(fp.steps).shape == shape
        p_p += (np.asarray(fp_p.choice) == 1).mean() / 2
        p_x += (np.asarray(fp_x.choice) == 1).mean() / 2
        t_p += np.asarray(fp_p.decision_time(dt)).mean() / 2
        t_x += np.asarray(fp_x.decision_time(dt)).mean() / 2
        f_p += np.asarray(fp_p.frac).mean() / 2
        f_x += np.asarray(fp_x.frac).mean() / 2
    assert abs(p_p - p_x) < 0.002
    assert abs(t_p - t_x) < 0.0015
    # sub-step crossing fractions must agree in level too
    assert abs(f_p - f_x) < 0.003


def test_pallas_active_mask():
    import jax.numpy as jnp
    from bayesflow_nddms_tpu.ops.ddm_pallas import first_passage_pallas
    shape = (64, 128)
    active = jnp.arange(128)[None, :] < 70
    active = jnp.broadcast_to(active, shape)
    fp = first_passage_pallas(jnp.int32(0), 1.0, 1.2, 0.5, 1.0,
                              shape=shape, dt=0.01, max_steps=400,
                              active=active)
    ch = np.asarray(fp.choice)
    assert np.all(ch[:, 70:] == 0)
    assert (ch[:, :70] != 0).mean() > 0.95
