"""On-device experience-replay ring buffer.

Capability parity with ``trainer.train_experience_replay``
(``basic_ddm_dc.py:199-202``; BayesFlow stores past simulations and trains
on buffer re-draws, persisting the buffer in ``memory.pkl``,
``basic_ddm_dc.py:18-20``). On TPU the simulator is fused into the train
step and is nearly free, so ONLINE training (fresh simulations every step)
is the default and usually strictly better (SURVEY.md §7 hard part g).
This buffer exists for (a) semantic parity, (b) models whose simulator is
genuinely expensive (evidence-path family, fine-dt checks).

The buffer is a pytree of device arrays with a leading slot axis; writes
and reads are ``dynamic_update_slice``/gather under jit, so replay training
stays a single fused program.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class ReplayBuffer(NamedTuple):
    theta: Array    # (slots, B, P)
    data: Array     # (slots, B, N, C)
    mask: Array     # (slots, B, N)
    log_n: Array    # (slots, B, 1)
    count: Array    # () int32, total writes so far

    @property
    def slots(self) -> int:
        return self.theta.shape[0]


def init_buffer(slots: int, batch: Tuple[Array, Array, Array, Array]
                ) -> ReplayBuffer:
    """Allocate a buffer shaped after one training batch, pre-filled with
    copies of it (so reads before the buffer wraps are valid samples)."""
    theta, data, mask, log_n = batch
    tile = lambda x: jnp.broadcast_to(x[None], (slots,) + x.shape).copy()
    return ReplayBuffer(tile(theta), tile(data), tile(mask), tile(log_n),
                        jnp.zeros((), jnp.int32))


def write(buf: ReplayBuffer, batch) -> ReplayBuffer:
    """Insert a fresh batch at the ring position."""
    theta, data, mask, log_n = batch
    slot = buf.count % buf.slots
    upd = lambda store, x: jax.lax.dynamic_update_index_in_dim(
        store, x, slot, axis=0)
    return ReplayBuffer(
        upd(buf.theta, theta), upd(buf.data, data), upd(buf.mask, mask),
        upd(buf.log_n, log_n), buf.count + 1)


def read(buf: ReplayBuffer, key: Array):
    """Draw a uniformly random stored batch (experience replay re-draw)."""
    high = jnp.minimum(jnp.maximum(buf.count, 1), buf.slots)
    slot = jax.random.randint(key, (), 0, high)
    pick = lambda store: jax.lax.dynamic_index_in_dim(
        store, slot, axis=0, keepdims=False)
    return pick(buf.theta), pick(buf.data), pick(buf.mask), pick(buf.log_n)
