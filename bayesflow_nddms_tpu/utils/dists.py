"""Marginal distribution primitives for prior specification.

TPU-native replacements for the reference's numpy/scipy prior draws
(e.g. ``truncnorm_better`` in ``basic_ddm_dc.py:55-57`` and ``draw_prior``
``basic_ddm_dc.py:62-80``): every distribution is a pure-JAX sampler with an
exact log-density, so priors can be vmapped/sharded and reused by the MCMC
backend. Truncated normals use inverse-CDF sampling
(``jax.random.truncated_normal``), which matches the reference's
rejection-sampling semantics exactly (same law, no dynamic control flow).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.scipy import stats as jstats
from jax.scipy.special import betaln, ndtr


Array = jax.Array

_SQRT_2PI = math.sqrt(2.0 * math.pi)


@dataclasses.dataclass(frozen=True)
class Dist:
    """A univariate distribution: sampler + log-density + first two moments."""

    name: str
    sample: Callable[[Array, Tuple[int, ...]], Array]
    log_prob: Callable[[Array], Array]
    mean: float
    std: float
    support: Tuple[float, float]

    def __repr__(self) -> str:  # keep dataclass hashable/printable for specs
        return f"Dist({self.name})"


def normal(mu: float, sd: float) -> Dist:
    def sample(key, shape=()):
        return mu + sd * jax.random.normal(key, shape)

    def log_prob(x):
        return jstats.norm.logpdf(x, loc=mu, scale=sd)

    return Dist(f"normal({mu},{sd})", sample, log_prob, mu, sd,
                (-jnp.inf, jnp.inf))


def _truncnorm_moments(mu, sd, low, high):
    a = (low - mu) / sd
    b = (high - mu) / sd
    phi = lambda z: math.exp(-0.5 * z * z) / _SQRT_2PI
    Phi = lambda z: 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))
    za = 0.0 if math.isinf(a) else phi(a)
    zb = 0.0 if math.isinf(b) else phi(b)
    Z = Phi(b) - Phi(a)
    m = mu + sd * (za - zb) / Z
    term_a = 0.0 if math.isinf(a) else a * za
    term_b = 0.0 if math.isinf(b) else b * zb
    var = sd * sd * (1.0 + (term_a - term_b) / Z - ((za - zb) / Z) ** 2)
    return m, math.sqrt(max(var, 1e-12))


def truncnorm(mu: float, sd: float, low: float, high: float) -> Dist:
    """Truncated normal on [low, high].

    Same distribution the reference draws by rejection
    (``scipy.stats.truncnorm`` in ``basic_ddm_dc.py:55-57`` and the
    ``while True`` loop in ``single_trial_alpha_not_scaled.py:113-116``),
    sampled here by inverse CDF so shapes stay static under jit.
    """
    a = (low - mu) / sd
    b = (high - mu) / sd
    log_z = math.log(
        (0.5 * (1.0 + math.erf(b / math.sqrt(2.0))) if not math.isinf(b) else 1.0)
        - (0.5 * (1.0 + math.erf(a / math.sqrt(2.0))) if not math.isinf(a) else 0.0)
    )

    def sample(key, shape=()):
        z = jax.random.truncated_normal(key, a, b, shape)
        return mu + sd * z

    def log_prob(x):
        z = (x - mu) / sd
        lp = -0.5 * z * z - math.log(sd * _SQRT_2PI) - log_z
        inside = (x >= low) & (x <= high)
        return jnp.where(inside, lp, -jnp.inf)

    m, s = _truncnorm_moments(mu, sd, low, high)
    return Dist(f"truncnorm({mu},{sd},[{low},{high}])", sample, log_prob,
                m, s, (low, high))


def beta(a: float, b: float) -> Dist:
    lnB = betaln(a, b)

    def sample(key, shape=()):
        return jax.random.beta(key, a, b, shape)

    def log_prob(x):
        lp = (a - 1.0) * jnp.log(x) + (b - 1.0) * jnp.log1p(-x) - lnB
        inside = (x > 0.0) & (x < 1.0)
        return jnp.where(inside, lp, -jnp.inf)

    m = a / (a + b)
    var = a * b / ((a + b) ** 2 * (a + b + 1.0))
    return Dist(f"beta({a},{b})", sample, log_prob, m, math.sqrt(var),
                (0.0, 1.0))


def uniform(low: float, high: float) -> Dist:
    width = high - low

    def sample(key, shape=()):
        return jax.random.uniform(key, shape, minval=low, maxval=high)

    def log_prob(x):
        inside = (x >= low) & (x <= high)
        return jnp.where(inside, -math.log(width), -jnp.inf)

    m = 0.5 * (low + high)
    s = width / math.sqrt(12.0)
    return Dist(f"uniform({low},{high})", sample, log_prob, m, s, (low, high))


def trunc_normal_positive(key: Array, mu: Array, sd: Array,
                          shape: Tuple[int, ...]) -> Array:
    """Vectorized draw from N(mu, sd) truncated to (0, inf) with array params.

    TPU-native equivalent of the per-trial rejection loop that draws the
    trial-level boundary in ``single_trial_alpha_not_scaled.py:113-116``:
    inverse-CDF truncation gives the identical law with static shapes.
    """
    a = (0.0 - mu) / sd
    z = jax.random.truncated_normal(key, a, jnp.inf, shape)
    # truncated_normal can return exactly ``a`` (inverse-CDF rounding), so
    # mu + sd*z can be exactly 0 — which, used as a diffusion coefficient,
    # divides the simulators' bridge machinery by zero. Floor at a value
    # far below any physical dc/boundary scale (measure-zero change).
    return jnp.maximum(mu + sd * z, 1e-6)


def halfnorm_lccdf_correction(mu: Array, sd: Array) -> Array:
    """log P(X > 0) for X ~ N(mu, sd): normalizer of the >0 truncation."""
    return jnp.log(ndtr(mu / sd))
