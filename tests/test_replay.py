"""Experience-replay ring buffer tests (train_experience_replay parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesflow_nddms_tpu.models import zoo
from bayesflow_nddms_tpu.models.spec import generate_training_batch
from bayesflow_nddms_tpu.train import replay


def _batch(seed, B=4, N=32):
    spec = zoo.get_model("basic_ddm_dc")
    return generate_training_batch(spec, jax.random.PRNGKey(seed), B, N)


def test_ring_overwrite_and_read():
    b0 = _batch(0)
    buf = replay.init_buffer(3, b0)
    assert buf.slots == 3
    batches = [_batch(i) for i in range(1, 6)]
    for b in batches:
        buf = replay.write(buf, b)
    assert int(buf.count) == 5
    # write i lands in slot i % 3: after 5 writes the ring holds
    # slot0 = 4th write, slot1 = 5th write, slot2 = 3rd write
    np.testing.assert_array_equal(np.asarray(buf.theta[0]),
                                  np.asarray(batches[3][0]))
    np.testing.assert_array_equal(np.asarray(buf.theta[1]),
                                  np.asarray(batches[4][0]))
    np.testing.assert_array_equal(np.asarray(buf.theta[2]),
                                  np.asarray(batches[2][0]))
    # read returns one of the stored batches
    theta, data, mask, log_n = replay.read(buf, jax.random.PRNGKey(7))
    stored = [np.asarray(b[0]) for b in batches[1:]]
    assert any(np.array_equal(np.asarray(theta), s) for s in stored)


def test_replay_is_jittable():
    b0 = _batch(0)
    buf = replay.init_buffer(2, b0)

    @jax.jit
    def step(buf, key):
        b = _unstack(buf)
        buf = replay.write(buf, b)
        return replay.read(buf, key)[0]

    def _unstack(buf):
        return (buf.theta[0], buf.data[0], buf.mask[0], buf.log_n[0])

    out = step(buf, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()
