"""Permutation-invariant summary network (DeepSet) with masked pooling.

TPU-native replacement for BayesFlow's ``InvariantNetwork``
(``basic_ddm_dc.py:163``): equivariant dense stack over the trial axis,
invariant mean+max pooling, dense head. Two departures, both deliberate:

  * masked pooling supports per-dataset trial counts inside one padded
    (B, N, C) buffer — the reference instead shares one N per batch
    (``basic_ddm_dc.py:131``), which forces retracing on TPU;
  * widths are MXU-friendly (multiples of 8/128 where it matters) and the
    whole stack is bfloat16-safe.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class EquivariantBlock(nn.Module):
    """Dense block mixing each trial embedding with the set mean."""

    width: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask: Array) -> Array:
        # x: (B, N, D); mask: (B, N)
        m = mask[..., None].astype(x.dtype)
        denom = jnp.maximum(m.sum(axis=1), 1.0)
        set_mean = (x * m).sum(axis=1, keepdims=True) / denom[:, None]
        h = jnp.concatenate(
            [x, jnp.broadcast_to(set_mean, x.shape)], axis=-1)
        h = nn.gelu(nn.Dense(self.width, dtype=self.dtype)(h))
        h = nn.Dense(self.width, dtype=self.dtype)(h)
        if x.shape[-1] == self.width:
            h = h + x  # residual keeps deep stacks trainable
        return nn.gelu(h)


class DeepSet(nn.Module):
    """Equivariant stack -> masked (mean, max) pooling -> dense head."""

    summary_dim: int = 32
    width: int = 64
    n_equivariant: int = 2
    head_widths: Sequence[int] = (128, 128)
    # bf16 compute on the per-trial stack (the FLOP-heavy part: every dense
    # runs over B*N rows); params and the pooled head stay f32. Pooling in
    # f32 keeps the set statistics exact.
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask: Array) -> Array:
        # x: (B, N, C) observations, mask: (B, N) bool
        h = nn.Dense(self.width, dtype=self.dtype)(x)
        for _ in range(self.n_equivariant):
            h = EquivariantBlock(self.width, dtype=self.dtype)(h, mask)
        h = h.astype(jnp.float32)

        m = mask[..., None].astype(h.dtype)
        denom = jnp.maximum(m.sum(axis=1), 1.0)
        pooled_mean = (h * m).sum(axis=1) / denom
        neg_inf = jnp.asarray(-1e9, h.dtype)
        pooled_max = jnp.where(m > 0, h, neg_inf).max(axis=1)
        pooled = jnp.concatenate([pooled_mean, pooled_max], axis=-1)

        for w in self.head_widths:
            pooled = nn.gelu(nn.Dense(w)(pooled))
        return nn.Dense(self.summary_dim)(pooled)
