"""Conditional affine coupling flow (the invertible posterior network).

TPU-native replacement for BayesFlow's ``InvertibleNetwork``
(``basic_ddm_dc.py:164``): a stack of affine coupling blocks with fixed
(shuffled) permutations, each conditioned on ``[summary, log N]``. Scales
are soft-clamped (s_max * tanh(raw / s_max)) for numerical stability, the
same trick BayesFlow uses. ``forward`` maps parameters -> base normal with
exact log|det J| for the NLL loss; ``inverse`` draws posterior samples.

Odd parameter counts split ceil/floor, so 5- and 7-parameter models work
unchanged.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class CouplingMLP(nn.Module):
    out_dim: int
    widths: Sequence[int] = (128, 128)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for w in self.widths:
            x = nn.gelu(nn.Dense(w)(x))
        # zero-init final layer: the flow starts at the identity map
        return nn.Dense(self.out_dim,
                        kernel_init=nn.initializers.zeros)(x)


class AffineCoupling(nn.Module):
    dim: int
    widths: Sequence[int] = (128, 128)
    s_clamp: float = 1.9  # BayesFlow's soft-clamp constant

    def setup(self):
        self.d1 = (self.dim + 1) // 2
        self.d2 = self.dim - self.d1
        self.net1 = CouplingMLP(2 * self.d2, self.widths)
        self.net2 = CouplingMLP(2 * self.d1, self.widths)

    def _affine(self, net, part, cond):
        raw = net(jnp.concatenate([part, cond], axis=-1))
        s_raw, t = jnp.split(raw, 2, axis=-1)
        s = self.s_clamp * jnp.tanh(s_raw / self.s_clamp)
        return s, t

    def forward(self, x: Array, cond: Array) -> Tuple[Array, Array]:
        x1, x2 = x[..., :self.d1], x[..., self.d1:]
        s, t = self._affine(self.net1, x1, cond)
        y2 = x2 * jnp.exp(s) + t
        ldj = s.sum(-1)
        s2, t2 = self._affine(self.net2, y2, cond)
        y1 = x1 * jnp.exp(s2) + t2
        ldj = ldj + s2.sum(-1)
        return jnp.concatenate([y1, y2], axis=-1), ldj

    def inverse(self, y: Array, cond: Array) -> Array:
        x, _ = self.inverse_with_ldj(y, cond)
        return x

    def inverse_with_ldj(self, y: Array, cond: Array) -> Tuple[Array, Array]:
        """Inverse map with log|det d(inverse)/dy| = -(sum of scales)."""
        y1, y2 = y[..., :self.d1], y[..., self.d1:]
        s2, t2 = self._affine(self.net2, y2, cond)
        x1 = (y1 - t2) * jnp.exp(-s2)
        s, t = self._affine(self.net1, x1, cond)
        x2 = (y2 - t) * jnp.exp(-s)
        return (jnp.concatenate([x1, x2], axis=-1),
                -(s2.sum(-1) + s.sum(-1)))


class ConditionalFlow(nn.Module):
    """Stack of couplings with fixed permutations; base N(0, I)."""

    dim: int
    n_blocks: int = 6
    widths: Sequence[int] = (128, 128)

    def setup(self):
        rng = np.random.default_rng(1234)  # fixed, part of the architecture
        perms = []
        for _ in range(self.n_blocks):
            perms.append(rng.permutation(self.dim))
        self._perms = [jnp.asarray(p) for p in perms]
        self._inv_perms = [jnp.asarray(np.argsort(p)) for p in perms]
        self.blocks = [AffineCoupling(self.dim, self.widths)
                       for _ in range(self.n_blocks)]

    def forward(self, x: Array, cond: Array) -> Tuple[Array, Array]:
        """theta -> z, with total log|det J|. Shapes (..., dim), (..., c)."""
        ldj = jnp.zeros(x.shape[:-1], x.dtype)
        for perm, block in zip(self._perms, self.blocks):
            x = x[..., perm]
            x, d = block.forward(x, cond)
            ldj = ldj + d
        return x, ldj

    def inverse(self, z: Array, cond: Array) -> Array:
        x, _ = self.inverse_with_ldj(z, cond)
        return x

    def inverse_with_ldj(self, z: Array, cond: Array) -> Tuple[Array, Array]:
        """base z -> data x, with log|det dx/dz| (permutations are
        volume-preserving). This is the sampling-direction transport map
        with its exact Jacobian — what flow-preconditioned (NeuTra) MCMC
        needs (mcmc/neutra.py)."""
        ldj = jnp.zeros(z.shape[:-1], z.dtype)
        for perm, block in zip(reversed(self._inv_perms),
                               reversed(self.blocks)):
            z, d = block.inverse_with_ldj(z, cond)
            ldj = ldj + d
            z = z[..., perm]
        return z, ldj

    def log_prob(self, x: Array, cond: Array) -> Array:
        z, ldj = self.forward(x, cond)
        base = -0.5 * (z**2 + jnp.log(2.0 * jnp.pi)).sum(-1)
        return base + ldj

    def __call__(self, x: Array, cond: Array) -> Array:
        # default call used for init
        return self.log_prob(x, cond)
