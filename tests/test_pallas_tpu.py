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
    import jax.numpy as jnp
    from bayesflow_nddms_tpu.ops.ddm_pallas import first_passage_pallas
    from bayesflow_nddms_tpu.ops.ddm_sim import first_passage
    shape = (512, 300)
    fp_p = first_passage_pallas(jnp.int32(3), 1.0, 1.5, 0.5, 1.0,
                                shape=shape, dt=0.01, max_steps=400)
    fp_x = first_passage(jax.random.PRNGKey(3), 1.0, 1.5, 0.5, 1.0,
                         shape=shape, dt=0.01, max_steps=400)
    for fp in (fp_p, fp_x):
        assert np.asarray(fp.steps).shape == shape
    p_p = (np.asarray(fp_p.choice) == 1).mean()
    p_x = (np.asarray(fp_x.choice) == 1).mean()
    assert abs(p_p - p_x) < 0.01
    t_p = np.asarray(fp_p.steps).mean()
    t_x = np.asarray(fp_x.steps).mean()
    assert abs(t_p - t_x) / t_x < 0.03


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
