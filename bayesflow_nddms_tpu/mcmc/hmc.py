"""Hamiltonian Monte Carlo with dual-averaging step size and diagonal mass
adaptation, fully jitted, chains vectorized with vmap.

TPU-native replacement for the samplers behind the reference's MCMC
backends — JAGS's Gibbs/slice sampler driven with 6 CPU threads
(``basic_ddm_dc_pyjags.py:199-204``) and Stan's NUTS
(``basic_ddm_dc_pystan2.py:244-246``). Chain parallelism here is a vmap
axis compiled onto one chip (and shardable across a mesh), replacing
``threads=6`` / ``n_jobs=6``.

Everything runs in unconstrained space; callers supply a log-density that
already includes any transform Jacobians (see ``mcmc/models.py``).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


class HMCResult(NamedTuple):
    samples: Array        # (n_samples, dim) per chain
    accept_rate: Array    # ()
    step_size: Array      # () final adapted step size
    inv_mass: Array       # (dim,)


def _leapfrog(logp_grad, q, p, eps, inv_mass, n_steps):
    def body(carry, _):
        q, p = carry
        g = logp_grad(q)
        p = p + 0.5 * eps * g
        q = q + eps * inv_mass * p
        g = logp_grad(q)
        p = p + 0.5 * eps * g
        return (q, p), None
    (q, p), _ = lax.scan(body, (q, p), None, length=n_steps)
    return q, p


@functools.partial(jax.jit, static_argnames=(
    "logprob_fn", "n_warmup", "n_samples", "n_leapfrog", "thin"))
def hmc(logprob_fn: Callable[[Array], Array], q0: Array, key: Array,
        n_warmup: int = 500, n_samples: int = 1000, n_leapfrog: int = 24,
        target_accept: float = 0.8, thin: int = 1,
        init_step_size: float = 0.05) -> HMCResult:
    """Single-chain HMC; vmap over (q0, key) for multiple chains."""
    dim = q0.shape[-1]
    grad_fn = jax.grad(logprob_fn)

    def transition(q, key, eps, inv_mass):
        k_mom, k_acc, k_jit = jax.random.split(key, 3)
        p = jax.random.normal(k_mom, (dim,)) / jnp.sqrt(inv_mass)
        # jitter trajectory length +-50% to decorrelate (no NUTS tree yet)
        steps = n_leapfrog
        eps_j = eps * (0.8 + 0.4 * jax.random.uniform(k_jit))
        q_new, p_new = _leapfrog(grad_fn, q, p, eps_j, inv_mass, steps)
        h0 = -logprob_fn(q) + 0.5 * jnp.sum(inv_mass * p * p)
        h1 = -logprob_fn(q_new) + 0.5 * jnp.sum(inv_mass * p_new * p_new)
        log_accept = jnp.minimum(0.0, h0 - h1)
        log_accept = jnp.where(jnp.isfinite(log_accept), log_accept, -jnp.inf)
        accept = jnp.log(jax.random.uniform(k_acc)) < log_accept
        q = jnp.where(accept, q_new, q)
        return q, jnp.exp(log_accept), accept

    # ---- warmup: dual averaging (Hoffman & Gelman 2014) + Welford mass ----
    mu = jnp.log(10.0 * init_step_size)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def warmup_body(carry, i):
        (q, key, log_eps, log_eps_bar, h_bar, mean, m2, inv_mass) = carry
        key, k = jax.random.split(key)
        q, a_prob, _ = transition(q, k, jnp.exp(log_eps), inv_mass)
        # dual averaging
        t = i + 1.0
        h_bar = (1 - 1 / (t + t0)) * h_bar + \
            (target_accept - a_prob) / (t + t0)
        log_eps = mu - jnp.sqrt(t) / gamma * h_bar
        w = t ** (-kappa)
        log_eps_bar = w * log_eps + (1 - w) * log_eps_bar
        # Welford running variance -> diagonal mass
        delta = q - mean
        mean = mean + delta / t
        m2 = m2 + delta * (q - mean)
        # freeze mass updates into inv_mass midway through warmup
        var = m2 / jnp.maximum(t - 1.0, 1.0)
        inv_mass = jnp.where(i == (n_warmup * 3) // 4,
                             jnp.maximum(var, 1e-4), inv_mass)
        return (q, key, log_eps, log_eps_bar, h_bar, mean, m2, inv_mass), None

    init = (q0, key, jnp.log(init_step_size), jnp.log(init_step_size),
            0.0, jnp.zeros(dim), jnp.zeros(dim), jnp.ones(dim))
    (q, key, _, log_eps_bar, _, _, _, inv_mass), _ = lax.scan(
        warmup_body, init, jnp.arange(n_warmup, dtype=jnp.float32))
    eps = jnp.exp(log_eps_bar)

    # ---- sampling ----
    def sample_body(carry, _):
        q, key, n_acc = carry
        key, k = jax.random.split(key)
        def inner(c, _):
            q, k2, n_acc = c
            k2, kk = jax.random.split(k2)
            q, _, accept = transition(q, kk, eps, inv_mass)
            return (q, k2, n_acc + accept), None
        (q, key, n_acc), _ = lax.scan(inner, (q, key, n_acc), None,
                                      length=thin)
        return (q, key, n_acc), q

    (q, key, n_acc), samples = lax.scan(
        sample_body, (q, key, jnp.zeros((), jnp.float32)), None,
        length=n_samples)
    return HMCResult(samples=samples,
                     accept_rate=n_acc / (n_samples * thin),
                     step_size=eps, inv_mass=inv_mass)


def run_chains(logprob_fn, q0s: Array, key: Array, **kw) -> HMCResult:
    """vmap over chains; q0s (chains, dim). Returns stacked HMCResult with
    samples (chains, n_samples, dim)."""
    keys = jax.random.split(key, q0s.shape[0])
    return jax.vmap(lambda q, k: hmc(logprob_fn, q, k, **kw))(q0s, keys)


def to_reference_layout(samples: Array) -> Array:
    """(chains, n_samples, dim) -> (dim, n_samples, chains), the JAGS-style
    layout the diagnostics expect (pyhddmjagsutils.py convention)."""
    return jnp.moveaxis(samples, (0, 1, 2), (2, 1, 0))
