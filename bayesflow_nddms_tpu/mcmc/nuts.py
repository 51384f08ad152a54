"""No-U-Turn Sampler (NUTS), iterative fixed-shape formulation.

Full parity with the reference's Stan backend
(``basic_ddm_dc_pystan2.py:244-246`` runs NUTS) on TPU: multinomial
trajectory sampling over doubling trajectories with rigorous sub-tree
U-turn checks, implemented iteratively with a checkpoint stack so every
shape is static under jit (Hoffman & Gelman 2014; iterative scheme after
Phan et al. 2019).

Key structure: a trajectory doubles up to ``max_depth`` times. Each
doubling runs ``2^d`` leapfrog leaves in one direction. Within a subtree,
leaf ``n`` (1-based):

  * odd  n  -> store (q, p) at checkpoint slot popcount(n-1); it is the
    start of every power-of-two-aligned subtree beginning at n;
  * even n  -> for each s in {2, 4, ..., 2^ctz(n)} the aligned subtree
    [n-s+1, n] completes; U-turn-check the stored start state (slot
    popcount(n-s)) against the current leaf.

Proposals are multinomial within subtrees and biased-progressive across
doublings. Warmup shares the dual-averaging + diagonal-mass machinery
with ``mcmc/hmc.py``.

NOTE on max_depth: the doublings are unrolled, so the compiled program
grows linearly in ``max_depth``; on remote-compile TPU backends depths
above ~8 have been observed to exhaust the worker (keep max_depth <= 8
there; the default 8 matches typical Stan usage for these posteriors).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Array = jax.Array


class NUTSResult(NamedTuple):
    samples: Array        # (n_samples, dim)
    accept_prob: Array    # () mean acceptance statistic
    step_size: Array
    inv_mass: Array
    mean_depth: Array     # () average terminal doubling depth
    # replica-exchange only: per-adjacent-temperature-pair swap acceptance
    swap_accept: Array | None = None


def _popcount(n: Array) -> Array:
    n = n.astype(jnp.uint32)
    n = n - ((n >> 1) & 0x55555555)
    n = (n & 0x33333333) + ((n >> 2) & 0x33333333)
    n = (n + (n >> 4)) & 0x0F0F0F0F
    return ((n * 0x01010101) >> 24).astype(jnp.int32)


def _mv(inv_mass: Array, p: Array) -> Array:
    """inv_mass @ p for diagonal (vector) or dense (matrix) inverse mass."""
    if inv_mass.ndim == 1:
        return inv_mass * p
    return inv_mass @ p


def _mom_sample(key: Array, inv_mass: Array, dim: int) -> Array:
    """Draw p ~ N(0, M) with M = inv_mass^{-1}. Dense case: with
    L = chol(inv_mass), p = L^{-T} z has covariance inv_mass^{-1}."""
    z = jax.random.normal(key, (dim,))
    if inv_mass.ndim == 1:
        return z / jnp.sqrt(inv_mass)
    L = jnp.linalg.cholesky(inv_mass)
    return jax.scipy.linalg.solve_triangular(L, z, lower=True, trans=1)


def _is_turning(q_minus, p_minus, q_plus, p_plus, inv_mass):
    dq = q_plus - q_minus
    return (jnp.dot(dq, _mv(inv_mass, p_minus)) < 0.0) | \
           (jnp.dot(dq, _mv(inv_mass, p_plus)) < 0.0)


def _nuts_transition(logprob_fn, grad_fn, q0, key, eps, inv_mass,
                     max_depth: int):
    """One NUTS transition. Returns (q_new, mean_accept_prob, depth)."""
    dim = q0.shape[-1]
    k_mom, k_leaf = jax.random.split(key)
    p0 = _mom_sample(k_mom, inv_mass, dim)
    h0 = -logprob_fn(q0) + 0.5 * jnp.dot(p0, _mv(inv_mass, p0))

    def leapfrog(q, p, direction):
        e = direction * eps
        p = p + 0.5 * e * grad_fn(q)
        q = q + e * _mv(inv_mass, p)
        p = p + 0.5 * e * grad_fn(q)
        return q, p

    # trajectory state
    class T(NamedTuple):
        q_left: Array
        p_left: Array
        q_right: Array
        p_right: Array
        q_prop: Array      # current multinomial proposal
        log_w: Array       # logsumexp of weights over whole trajectory
        sum_acc: Array     # sum of per-leaf accept probabilities
        n_leaves: Array
        turning: Array
        diverging: Array

    t0 = T(q0, p0, q0, p0, q0, jnp.zeros(()), jnp.zeros(()),
           jnp.zeros((), jnp.int32), jnp.array(False), jnp.array(False))

    def build_subtree(t: T, d: int, direction, key):
        """Add 2^d leaves in `direction`; returns updated T."""
        n_leaf = 2 ** d
        ckpt_q = jnp.zeros((max_depth + 1, dim))
        ckpt_p = jnp.zeros((max_depth + 1, dim))

        # subtree-local accumulators
        class S(NamedTuple):
            q: Array
            p: Array
            q_prop: Array
            log_w: Array       # logsumexp over subtree
            sum_acc: Array
            turning: Array
            diverging: Array
            ckpt_q: Array
            ckpt_p: Array

        q_edge = jnp.where(direction > 0, t.q_right, t.q_left)
        p_edge = jnp.where(direction > 0, t.p_right, t.p_left)
        s0 = S(q_edge, p_edge, q_edge, -jnp.inf, jnp.zeros(()),
               jnp.array(False), jnp.array(False), ckpt_q, ckpt_p)

        def leaf_body(i, s_key):
            s, key = s_key
            key, k_mn = jax.random.split(key)
            n = i + 1  # 1-based leaf index
            q, p = leapfrog(s.q, s.p, direction)
            h = -logprob_fn(q) + 0.5 * jnp.dot(p, _mv(inv_mass, p))
            w = h0 - h                         # log weight relative to h0
            diverging = s.diverging | (w < -1000.0) | ~jnp.isfinite(w)
            # NaN energies (leapfrog blow-up) must register as weight -inf /
            # acceptance 0, or they poison the dual-averaging statistic
            w = jnp.where(jnp.isfinite(w), w, -jnp.inf)
            acc = jnp.exp(jnp.minimum(w, 0.0))

            # multinomial proposal within the subtree
            log_w_new = jnp.logaddexp(s.log_w, w)
            take = jnp.log(jax.random.uniform(k_mn)) < (w - log_w_new)
            q_prop = jnp.where(take, q, s.q_prop)

            # checkpoint store (odd n)
            slot = _popcount(n - 1)
            is_odd = (n % 2) == 1
            ckpt_q = jnp.where(
                is_odd, s.ckpt_q.at[slot].set(q), s.ckpt_q)
            ckpt_p = jnp.where(
                is_odd, s.ckpt_p.at[slot].set(p), s.ckpt_p)

            # U-turn checks (even n): aligned subtrees ending at n
            def check_turn(carry, j):
                turning = carry
                # subtree size 2^(j+1); start leaf m = n - 2^(j+1) + 1
                size = 2 ** (j + 1)
                active = (n % size == 0) & (size <= n)
                m = n - size + 1
                cslot = _popcount(jnp.maximum(m - 1, 0))
                qs = ckpt_q[cslot]
                ps = ckpt_p[cslot]
                # orient: ckpt state is the earlier one along integration
                turn = jnp.where(
                    direction > 0,
                    _is_turning(qs, ps, q, p, inv_mass),
                    _is_turning(q, p, qs, ps, inv_mass))
                return turning | (active & turn), None
            turning, _ = lax.scan(check_turn, s.turning,
                                  jnp.arange(max_depth))

            new_s = S(q, p, q_prop, log_w_new, s.sum_acc + acc,
                      turning, diverging, ckpt_q, ckpt_p)
            # freeze once turning/diverging (subtree is invalid anyway)
            frozen = s.turning | s.diverging
            s = jax.tree.map(
                lambda a, b: jnp.where(frozen, a, b), s, new_s)
            return (s, key)

        s, _ = lax.fori_loop(0, n_leaf, leaf_body, (s0, key))
        return s

    def doubling(d, t, key):
        k_dir, k_bias, k_sub = jax.random.split(key, 3)
        direction = jnp.where(jax.random.bernoulli(k_dir), 1.0, -1.0)
        s = build_subtree(t, d, direction, k_sub)

        invalid = s.turning | s.diverging
        # biased progressive: accept new subtree's proposal with prob
        # min(1, W_new / W_old)
        take = (jnp.log(jax.random.uniform(k_bias)) <
                (s.log_w - t.log_w)) & ~invalid
        q_prop = jnp.where(take, s.q_prop, t.q_prop)
        log_w = jnp.logaddexp(t.log_w, jnp.where(invalid, -jnp.inf, s.log_w))

        q_left = jnp.where(direction > 0, t.q_left, s.q)
        p_left = jnp.where(direction > 0, t.p_left, s.p)
        q_right = jnp.where(direction > 0, s.q, t.q_right)
        p_right = jnp.where(direction > 0, s.p, t.p_right)
        full_turn = _is_turning(q_left, p_left, q_right, p_right, inv_mass)
        return T(q_left, p_left, q_right, p_right, q_prop, log_w,
                 t.sum_acc + s.sum_acc, t.n_leaves + 2 ** d,
                 t.turning | s.turning | full_turn, t.diverging | s.diverging)

    # unrolled doublings with freezing after termination
    t = t0
    key_loop = k_leaf
    depth_done = jnp.zeros((), jnp.int32)
    for d in range(max_depth):
        key_loop, k_d = jax.random.split(key_loop)
        t_new = doubling(d, t, k_d)
        stopped = t.turning | t.diverging
        depth_done = jnp.where(stopped, depth_done, d + 1)
        t = jax.tree.map(lambda a, b: jnp.where(stopped, a, b), t, t_new)

    mean_acc = t.sum_acc / jnp.maximum(t.n_leaves, 1)
    return t.q_prop, mean_acc, depth_done


def _cov_update(m2, delta, q, mean, dense: bool):
    """Welford second-moment accumulator step (vector or full matrix)."""
    if dense:
        return m2 + jnp.outer(delta, q - mean)
    return m2 + delta * (q - mean)


def _mass_from_m2(m2, count, dim, dense: bool):
    """Regularized inverse mass (= posterior covariance estimate) from a
    Welford window of ``count`` draws. Dense case uses Stan's shrinkage
    toward a small identity, keeping the estimate well-conditioned when
    the window is short relative to dim."""
    n = jnp.maximum(count - 1.0, 1.0)
    if dense:
        cov = m2 / n
        w = n / (n + 5.0)
        return w * cov + ((1.0 - w) * 1e-3 + 1e-6) * jnp.eye(dim)
    return jnp.maximum(m2 / n, 1e-4)


def _diag_mass_from_m2(m2, count, dim, dense: bool):
    """Diagonal (variance-only) estimate — the FIRST window's mass. Robust
    even when the window is short or badly mixed; in dense mode returned
    as a diagonal matrix so carry shapes stay fixed."""
    n = jnp.maximum(count - 1.0, 1.0)
    var = (jnp.diagonal(m2) if dense else m2) / n
    var = jnp.maximum(var, 1e-4)
    return jnp.diag(var) if dense else var


class _WarmupCarry(NamedTuple):
    q: Array
    key: Array
    log_eps: Array
    log_eps_bar: Array
    h_bar: Array
    mu: Array           # dual-averaging anchor, re-centered at each window
    mean: Array
    m2: Array
    count: Array        # draws in the CURRENT adaptation window
    inv_mass: Array


def _init_warmup_carry(q0, key, init_step_size, dim, dense: bool,
                       batch_shape=(), init_inv_mass=None):
    """Fresh warmup state; ``batch_shape`` prepends a chain axis.

    ``init_inv_mass``: optional (dim,) variance vector to precondition
    window 1 (e.g. amortized-posterior variances in unconstrained space).
    On stiff multiscale posteriors (per-dataset ndt SD ~1e-3 against O(1)
    directions) unit mass makes window 1 useless — step size adapts to
    ~1e-3 and trajectories U-turn at depth ~2, so the covariance windows
    never see mixed draws.
    """
    full = lambda v: jnp.full(batch_shape, v)
    m2 = jnp.zeros(batch_shape + ((dim, dim) if dense else (dim,)))
    if init_inv_mass is None:
        mass = (jnp.broadcast_to(jnp.eye(dim),
                                 batch_shape + (dim, dim)).copy()
                if dense else jnp.ones(batch_shape + (dim,)))
    else:
        v = jnp.asarray(init_inv_mass, jnp.float32)
        if dense:
            # (dim,) or per-chain (chains, dim) diagonal seeds a dense
            # mass: the windows estimate the full covariance from there
            diag = (jax.vmap(jnp.diag)(v) if v.ndim == 2
                    else jnp.diag(v))
            mass = jnp.broadcast_to(diag,
                                    batch_shape + (dim, dim)).copy()
        else:
            mass = jnp.broadcast_to(v, batch_shape + (dim,)).copy()
    return _WarmupCarry(
        q=q0, key=key,
        log_eps=full(jnp.log(init_step_size)),
        log_eps_bar=full(jnp.log(init_step_size)),
        h_bar=jnp.zeros(batch_shape),
        mu=full(jnp.log(10.0 * init_step_size)),
        mean=jnp.zeros(batch_shape + (dim,)),
        m2=m2, count=jnp.zeros(batch_shape),
        inv_mass=mass)


def _make_warmup_body(logprob_fn, grad_fn, n_warmup_total: int,
                      max_depth: int, target_accept: float,
                      dense_mass: bool, dim: int):
    """One windowed-adaptation warmup transition, parameterized by the
    GLOBAL step index g (0-based). Stan-style schedule:

      window 1: [0, n/2)    -> at g = n/2-1  set DIAGONAL mass estimate
      window 2: [n/2, 3n/4) -> at g = 3n/4-1 set the full estimate
                               (dense covariance when dense_mass, else a
                               refreshed diagonal)
      window 3: [3n/4, n)   -> step-size-only refinement

    Accumulators AND the dual-averaging state restart at each switch, so
    the dense covariance is estimated only from draws taken under the
    window-1 diagonal mass (well mixed), never from the cold start — a
    single late switch fed by cold-start draws made >100-dim chains
    diverge outright (measured on the 160-dim agreement posterior).
    """
    gamma, t0c, kappa = 0.05, 10.0, 0.75
    n2 = n_warmup_total // 2
    n3 = (n_warmup_total * 3) // 4

    def body(c: _WarmupCarry, g):
        key, k = jax.random.split(c.key)
        q, a_prob, _ = _nuts_transition(
            logprob_fn, grad_fn, c.q, k, jnp.exp(c.log_eps), c.inv_mass,
            max_depth)
        t = c.count + 1.0
        h_bar = (1 - 1 / (t + t0c)) * c.h_bar + \
            (target_accept - a_prob) / (t + t0c)
        log_eps = c.mu - jnp.sqrt(t) / gamma * h_bar
        w = t ** (-kappa)
        log_eps_bar = w * log_eps + (1 - w) * c.log_eps_bar
        delta = q - c.mean
        mean = c.mean + delta / t
        m2 = _cov_update(c.m2, delta, q, mean, dense_mass)

        switch1 = g == jnp.int32(n2 - 1)
        switch2 = g == jnp.int32(n3 - 1)
        any_switch = switch1 | switch2
        est1 = _diag_mass_from_m2(m2, t, dim, dense_mass)
        est2 = _mass_from_m2(m2, t, dim, dense_mass)
        inv_mass = jnp.where(switch1, est1,
                             jnp.where(switch2, est2, c.inv_mass))
        # window restart: accumulators + dual averaging re-anchored at the
        # current averaged step size (Stan's init_buffer behavior)
        mu = jnp.where(any_switch, jnp.log(10.0) + log_eps_bar, c.mu)
        log_eps = jnp.where(any_switch, log_eps_bar, log_eps)
        h_bar = jnp.where(any_switch, 0.0, h_bar)
        count = jnp.where(any_switch, 0.0, t)
        mean = jnp.where(any_switch, jnp.zeros_like(mean), mean)
        m2 = jnp.where(any_switch, jnp.zeros_like(m2), m2)
        return _WarmupCarry(q, key, log_eps, log_eps_bar, h_bar, mu,
                            mean, m2, count, inv_mass), None

    return body


@functools.partial(jax.jit, static_argnames=(
    "logprob_fn", "n_warmup", "n_samples", "max_depth", "thin",
    "dense_mass"))
def nuts(logprob_fn: Callable[[Array], Array], q0: Array, key: Array,
         n_warmup: int = 500, n_samples: int = 1000, max_depth: int = 8,
         target_accept: float = 0.8, thin: int = 1,
         init_step_size: float = 0.05, dense_mass: bool = False
         ) -> NUTSResult:
    """Single-chain NUTS; vmap over (q0, key) for chains.

    ``dense_mass=True`` adapts a FULL covariance inverse-mass matrix —
    required for strongly correlated posteriors like the dcDDM
    alpha/varsigma ridge (the likelihood only constrains alpha/varsigma,
    basic_ddm_dc_pyjags.py:133), which a diagonal mass cannot align with.
    """
    dim = q0.shape[-1]
    grad_fn = jax.grad(logprob_fn)

    def transition(q, key, eps, inv_mass):
        return _nuts_transition(logprob_fn, grad_fn, q, key, eps, inv_mass,
                                max_depth)

    body = _make_warmup_body(logprob_fn, grad_fn, n_warmup, max_depth,
                             target_accept, dense_mass, dim)
    init = _init_warmup_carry(q0, key, init_step_size, dim, dense_mass)
    carry, _ = lax.scan(body, init, jnp.arange(n_warmup, dtype=jnp.int32))
    q, key = carry.q, carry.key
    eps = jnp.exp(carry.log_eps_bar)
    inv_mass = carry.inv_mass

    def sample_body(carry, _):
        q, key, acc_sum, depth_sum = carry
        def inner(c, _):
            q, k2, acc_sum, depth_sum = c
            k2, kk = jax.random.split(k2)
            q, a, d = transition(q, kk, eps, inv_mass)
            return (q, k2, acc_sum + a, depth_sum + d), None
        (q, key, acc_sum, depth_sum), _ = lax.scan(
            inner, (q, key, acc_sum, depth_sum), None, length=thin)
        return (q, key, acc_sum, depth_sum), q

    (q, key, acc_sum, depth_sum), samples = lax.scan(
        sample_body,
        (q, key, jnp.zeros(()), jnp.zeros((), jnp.int32)), None,
        length=n_samples)
    n_trans = n_samples * thin
    return NUTSResult(samples=samples, accept_prob=acc_sum / n_trans,
                      step_size=eps, inv_mass=inv_mass,
                      mean_depth=depth_sum / n_trans)


def run_chains(logprob_fn, q0s: Array, key: Array, **kw) -> NUTSResult:
    """vmap over chains; q0s (chains, dim)."""
    keys = jax.random.split(key, q0s.shape[0])
    return jax.vmap(lambda q, k: nuts(logprob_fn, q, k, **kw))(q0s, keys)


# --------------------------------------------------------------------------
# Chunked driver: bounded-size dispatches for long runs.
#
# A full warmup+sampling run compiled into ONE XLA program can execute for
# many minutes; some TPU runtimes (remote/tunneled workers) kill such
# long-running executions. run_chains_chunked carries the adaptation and
# chain state across many short dispatches instead — functionally identical
# to run_chains, but each device program runs for seconds.

@functools.partial(jax.jit, static_argnames=(
    "logprob_fn", "n", "n_warmup_total", "max_depth", "dense_mass"))
def _warmup_chunk(logprob_fn, carry: _WarmupCarry, t0_idx: Array, n: int,
                  n_warmup_total: int, max_depth: int,
                  target_accept: float = 0.8,
                  init_step_size: float = 0.05,
                  dense_mass: bool = False) -> _WarmupCarry:
    """Advance windowed-adaptation warmup by n transitions (vmapped over
    chains by the caller). Shares `_make_warmup_body` with the monolithic
    ``nuts`` so the two paths stay transition-identical."""
    grad_fn = jax.grad(logprob_fn)
    dim = carry.q.shape[-1]
    body = _make_warmup_body(logprob_fn, grad_fn, n_warmup_total, max_depth,
                             target_accept, dense_mass, dim)
    carry, _ = lax.scan(body, carry,
                        t0_idx + jnp.arange(n, dtype=jnp.int32))
    return carry


@functools.partial(jax.jit, static_argnames=(
    "logprob_fn", "n", "max_depth", "thin"))
def _sample_chunk(logprob_fn, q: Array, key: Array, eps: Array,
                  inv_mass: Array, n: int, max_depth: int, thin: int):
    grad_fn = jax.grad(logprob_fn)

    def outer(carry, _):
        q, key, acc, dep = carry
        def inner(c, _):
            q, k, acc, dep = c
            k, kk = jax.random.split(k)
            q, a, d = _nuts_transition(logprob_fn, grad_fn, q, kk, eps,
                                       inv_mass, max_depth)
            return (q, k, acc + a, dep + d), None
        (q, key, acc, dep), _ = lax.scan(inner, (q, key, acc, dep), None,
                                         length=thin)
        return (q, key, acc, dep), q

    (q, key, acc, dep), samples = lax.scan(
        outer, (q, key, jnp.zeros(()), jnp.zeros((), jnp.int32)), None,
        length=n)
    return q, key, samples, acc, dep


@functools.partial(jax.jit, static_argnames=(
    "logprob_fn", "n", "n_warmup_total", "max_depth", "dense_mass"))
def _warmup_chunk_ctx(logprob_fn, ctx, carry: _WarmupCarry, t0_idx: Array,
                      n: int, n_warmup_total: int, max_depth: int,
                      target_accept: float = 0.8,
                      init_step_size: float = 0.05,
                      dense_mass: bool = False) -> _WarmupCarry:
    """`_warmup_chunk` for per-chain targets: ``logprob_fn(q, ctx)`` with
    ``ctx`` a TRACED pytree (one chain's slice; the caller vmaps over the
    chain axis of both carry and ctx). This is what lets a whole batch of
    per-dataset posteriors — e.g. NeuTra refits of every PSIS-flagged
    dataset — run as ONE compiled NUTS program instead of a recompile
    per dataset (ctx enters as data, not as a new closure)."""
    lp = lambda q: logprob_fn(q, ctx)
    grad_fn = jax.grad(lp)
    dim = carry.q.shape[-1]
    body = _make_warmup_body(lp, grad_fn, n_warmup_total, max_depth,
                             target_accept, dense_mass, dim)
    carry, _ = lax.scan(body, carry,
                        t0_idx + jnp.arange(n, dtype=jnp.int32))
    return carry


@functools.partial(jax.jit, static_argnames=(
    "logprob_fn", "n", "max_depth", "thin"))
def _sample_chunk_ctx(logprob_fn, ctx, q: Array, key: Array, eps: Array,
                      inv_mass: Array, n: int, max_depth: int, thin: int):
    lp = lambda q_: logprob_fn(q_, ctx)
    grad_fn = jax.grad(lp)

    def outer(carry, _):
        q, key, acc, dep = carry
        def inner(c, _):
            q, k, acc, dep = c
            k, kk = jax.random.split(k)
            q, a, d = _nuts_transition(lp, grad_fn, q, kk, eps,
                                       inv_mass, max_depth)
            return (q, k, acc + a, dep + d), None
        (q, key, acc, dep), _ = lax.scan(inner, (q, key, acc, dep), None,
                                         length=thin)
        return (q, key, acc, dep), q

    (q, key, acc, dep), samples = lax.scan(
        outer, (q, key, jnp.zeros(()), jnp.zeros((), jnp.int32)), None,
        length=n)
    return q, key, samples, acc, dep


def _ckpt_write(path: str, payload: dict) -> None:
    """Atomic chunk-state write (tmp + rename): a killed process can never
    leave a truncated checkpoint behind."""
    import os
    np.savez(path + ".tmp", **payload)
    os.replace(path + ".tmp.npz", path)


def _ckpt_digest(*arrays) -> int:
    """Order-sensitive content digest of initial-state arrays (q0, mass,
    ctx leaves) for the checkpoint fingerprint. Without it a resumed run
    silently ignores CHANGED inits/preconditioning/data of the same shape
    — measured failure: an initialization fix appeared to have no effect
    because every rerun resumed the stale chains (ROUND3.md)."""
    import zlib
    crc = 0
    for a in arrays:
        if a is None:
            crc = zlib.crc32(b"\x00none", crc)
            continue
        leaves = jax.tree.leaves(a)
        for leaf in leaves:
            buf = np.ascontiguousarray(np.asarray(leaf))
            crc = zlib.crc32(buf.tobytes(), crc)
    return int(np.int64(np.uint32(crc)))


def _ckpt_read(path, fingerprint: np.ndarray):
    """Load a chunk-state checkpoint if present and produced by an
    identical run configuration; a mismatch warns and starts fresh."""
    import os
    import warnings
    if path is None or not os.path.exists(path):
        return None
    ck = dict(np.load(path))
    if ck["fingerprint"].shape != fingerprint.shape or \
            not np.array_equal(ck["fingerprint"], fingerprint):
        warnings.warn(f"NUTS checkpoint at {path} was produced by a "
                      f"different run configuration; ignoring it",
                      stacklevel=3)
        return None
    return ck


def run_chains_chunked(logprob_fn, q0s: Array, key: Array,
                       n_warmup: int = 500, n_samples: int = 1000,
                       max_depth: int = 8, thin: int = 1,
                       chunk: int = 100, target_accept: float = 0.8,
                       init_step_size: float = 0.05,
                       progress: bool = False, dense_mass: bool = False,
                       mesh=None, init_inv_mass=None,
                       checkpoint_path: str | None = None,
                       ctx=None) -> NUTSResult:
    """Chunked multi-chain NUTS: identical semantics to run_chains but
    every device dispatch is bounded to ~chunk transitions.

    ``ctx``: optional pytree of PER-CHAIN target context, every leaf with
    leading axis n_chains; when given, the target is ``logprob_fn(q,
    ctx_slice)`` instead of ``logprob_fn(q)``. Chain i samples its own
    posterior — step size and mass still adapt per chain — so a batch of
    per-dataset targets (e.g. NeuTra refits of every PSIS-flagged
    dataset, padded to a common trial count) runs as ONE compiled
    program: one compile + fused dispatches for the whole batch, instead
    of a multi-minute recompile per dataset. The checkpoint fingerprint
    does NOT cover ctx (same caveat as the data closure above): use one
    checkpoint path per batch.

    ``dense_mass=True`` adapts a full covariance inverse mass per chain
    (needed for the dcDDM alpha/varsigma ridge). ``mesh`` (a 1-D
    ``jax.sharding.Mesh``) shards the chain axis over devices — the
    TPU-native replacement for pyjags ``threads=6`` /
    Stan ``n_jobs`` (basic_ddm_dc_pyjags.py:203) at multi-chip scale;
    n_chains must be divisible by the mesh size.

    ``checkpoint_path`` makes a long run restartable across process death
    (host OOM, watchdog kills, a dying TPU tunnel): after every chunk the
    full chain state — warmup adaptation carry or (positions, keys, eps,
    mass, samples so far) — is written atomically to this ``.npz`` path.
    Re-invoking with identical arguments resumes at the last completed
    chunk; the result is bit-identical to an uninterrupted run (state is
    carried exactly, not re-derived). The reference has no counterpart:
    a killed JAGS/Stan run loses everything
    (basic_ddm_dc_pyjags.py:199-209 re-runs from scratch).

    The fingerprint covers the run configuration (chains, dim, budget,
    depth, mass type) but NOT the target: ``logprob_fn`` is an opaque
    closure over the data, so pointing ``checkpoint_path`` at a
    checkpoint produced for a different posterior of the same shape
    silently resumes the wrong run. Use one path per (data, model) pair.
    """
    if 0 < n_warmup < 20:
        # The windowed schedule switches mass at n/2 and 3n/4; below ~20
        # steps those windows collapse and the mass matrix silently stays
        # at its initial value (ADVICE r2 #3).
        import warnings
        warnings.warn(
            f"n_warmup={n_warmup} < 20: adaptation windows collapse and "
            f"the (initial) mass matrix is never re-estimated",
            stacklevel=2)
    n_chains, dim = q0s.shape
    keys = jax.random.split(key, n_chains)
    carry = _init_warmup_carry(q0s, keys, init_step_size, dim, dense_mass,
                               batch_shape=(n_chains,),
                               init_inv_mass=init_inv_mass)

    if mesh is not None and n_chains % mesh.devices.size:
        raise ValueError(f"{n_chains} chains not divisible by "
                         f"{mesh.devices.size} devices")

    fingerprint = np.asarray([n_chains, dim, n_warmup, n_samples, thin,
                              max_depth, int(dense_mass),
                              _ckpt_digest(q0s, init_inv_mass, ctx)],
                             np.int64)
    ck = _ckpt_read(checkpoint_path, fingerprint)
    warmup_done = 0
    resumed_sampling = None
    if ck is not None:
        if int(ck["phase"]) == 0:
            carry = _WarmupCarry(**{f: jnp.asarray(ck[f"carry_{f}"])
                                    for f in _WarmupCarry._fields})
            warmup_done = int(ck["done"])
        else:
            resumed_sampling = ck
        if progress:
            phase = "warmup" if resumed_sampling is None else "sampling"
            print(f"  resumed from {checkpoint_path} at {phase} "
                  f"{int(ck['done'])}", flush=True)

    def save_warmup(done):
        if checkpoint_path is None:
            return
        payload = {f"carry_{f}": np.asarray(getattr(carry, f))
                   for f in _WarmupCarry._fields}
        payload.update(fingerprint=fingerprint, phase=np.int64(0),
                       done=np.int64(done))
        _ckpt_write(checkpoint_path, payload)

    def make_vw(step):
        if ctx is None:
            f = jax.vmap(
                lambda c, t0: _warmup_chunk(logprob_fn, c, t0, step,
                                            n_warmup, max_depth,
                                            target_accept, init_step_size,
                                            dense_mass),
                in_axes=(0, None))
            bind = lambda g: g
        else:
            f = jax.vmap(
                lambda c, x, t0: _warmup_chunk_ctx(
                    logprob_fn, x, c, t0, step, n_warmup, max_depth,
                    target_accept, init_step_size, dense_mass),
                in_axes=(0, 0, None))
            bind = lambda g: (lambda c, t0: g(c, ctx, t0))
        if mesh is None:
            return bind(f)
        from jax.sharding import PartitionSpec as P
        axis = mesh.axis_names[0]
        specs = ((P(axis), P()) if ctx is None
                 else (P(axis), P(axis), P()))
        return bind(jax.jit(jax.shard_map(
            f, mesh=mesh, in_specs=specs, out_specs=P(axis),
            check_vma=False)))

    vw = make_vw(min(chunk, n_warmup))
    done = warmup_done
    while done < n_warmup and resumed_sampling is None:
        step = min(chunk, n_warmup - done)
        if step != min(chunk, n_warmup):  # tail chunk recompiles once
            vw = make_vw(step)
        carry = vw(carry, jnp.int32(done))
        jax.block_until_ready(carry.q)
        done += step
        save_warmup(done)
        if progress:
            print(f"  warmup {done}/{n_warmup}", flush=True)

    eps = jnp.exp(carry.log_eps_bar)
    inv_mass = carry.inv_mass
    q, keys2 = carry.q, carry.key

    def make_vs(step):
        if ctx is None:
            f = jax.vmap(
                lambda q, k, e, m: _sample_chunk(logprob_fn, q, k, e, m,
                                                 step, max_depth, thin))
            bind = lambda g: g
        else:
            f = jax.vmap(
                lambda q, k, e, m, x: _sample_chunk_ctx(
                    logprob_fn, x, q, k, e, m, step, max_depth, thin))
            bind = lambda g: (lambda q, k, e, m: g(q, k, e, m, ctx))
        if mesh is None:
            return bind(f)
        from jax.sharding import PartitionSpec as P
        axis = mesh.axis_names[0]
        n_in = 4 if ctx is None else 5
        return bind(jax.jit(jax.shard_map(
            f, mesh=mesh, in_specs=(P(axis),) * n_in,
            out_specs=(P(axis),) * 5, check_vma=False)))

    vs = make_vs(min(chunk, n_samples))
    all_samples, acc_tot, dep_tot = [], 0.0, 0.0
    done = 0
    if resumed_sampling is not None:
        q = jnp.asarray(resumed_sampling["q"])
        keys2 = jnp.asarray(resumed_sampling["keys"])
        eps = jnp.asarray(resumed_sampling["eps"])
        inv_mass = jnp.asarray(resumed_sampling["inv_mass"])
        acc_tot = resumed_sampling["acc"]
        dep_tot = resumed_sampling["dep"]
        done = int(resumed_sampling["done"])
        if done > 0:
            all_samples.append(resumed_sampling["samples"])
    while done < n_samples:
        step = min(chunk, n_samples - done)
        if step != min(chunk, n_samples):
            vs = make_vs(step)
        q, keys2, samples, acc, dep = vs(q, keys2, eps, inv_mass)
        jax.block_until_ready(q)
        all_samples.append(np.asarray(samples))
        acc_tot = acc_tot + acc
        dep_tot = dep_tot + dep
        done += step
        if checkpoint_path is not None:
            _ckpt_write(checkpoint_path, dict(
                fingerprint=fingerprint, phase=np.int64(1),
                done=np.int64(done), q=np.asarray(q),
                keys=np.asarray(keys2), eps=np.asarray(eps),
                inv_mass=np.asarray(inv_mass),
                acc=np.asarray(acc_tot), dep=np.asarray(dep_tot),
                samples=np.concatenate(all_samples, axis=1)))
        if progress:
            print(f"  sampling {done}/{n_samples}", flush=True)

    samples = np.concatenate(all_samples, axis=1)  # (chains, n_samples, dim)
    n_trans = n_samples * thin
    return NUTSResult(samples=samples, accept_prob=acc_tot / n_trans,
                      step_size=eps, inv_mass=inv_mass,
                      mean_depth=dep_tot / n_trans)


# --------------------------------------------------------------------------
# Replica exchange (parallel tempering) over the chunked driver.
#
# The chunk boundary doubles as the swap boundary: within a chunk every
# temperature runs plain NUTS on pi^beta; between chunks adjacent
# temperatures propose state swaps (Metropolis, alternating parity). The
# cold chain (beta = 1) remains exactly pi-invariant, but hot chains ferry
# states across log-posterior barriers that defeat single-temperature
# NUTS — the measured failure mode of the flagship marginal posteriors
# with slow curved ridges (results/ROUND3.md). beta enters the kernels as
# a TRACED per-chain scalar, so all temperatures share one compiled
# program per chunk shape (a per-temperature closure would compile T
# times — minutes each on CPU).

@functools.partial(jax.jit, static_argnames=(
    "logprob_fn", "n", "n_warmup_total", "max_depth", "dense_mass"))
def _warmup_chunk_beta(logprob_fn, beta: Array, carry: _WarmupCarry,
                       t0_idx: Array, n: int, n_warmup_total: int,
                       max_depth: int, target_accept: float = 0.8,
                       dense_mass: bool = False) -> _WarmupCarry:
    lp = lambda q: beta * logprob_fn(q)
    grad_fn = jax.grad(lp)
    dim = carry.q.shape[-1]
    body = _make_warmup_body(lp, grad_fn, n_warmup_total, max_depth,
                             target_accept, dense_mass, dim)
    carry, _ = lax.scan(body, carry,
                        t0_idx + jnp.arange(n, dtype=jnp.int32))
    return carry


@functools.partial(jax.jit, static_argnames=(
    "logprob_fn", "n", "max_depth", "thin"))
def _sample_chunk_beta(logprob_fn, beta: Array, q: Array, key: Array,
                       eps: Array, inv_mass: Array, n: int, max_depth: int,
                       thin: int):
    lp = lambda qq: beta * logprob_fn(qq)
    grad_fn = jax.grad(lp)

    def outer(carry, _):
        q, key, acc, dep = carry

        def inner(c, _):
            q, k, acc, dep = c
            k, kk = jax.random.split(k)
            q, a, d = _nuts_transition(lp, grad_fn, q, kk, eps,
                                       inv_mass, max_depth)
            return (q, k, acc + a, dep + d), None

        (q, key, acc, dep), _ = lax.scan(inner, (q, key, acc, dep), None,
                                         length=thin)
        return (q, key, acc, dep), q

    (q, key, acc, dep), samples = lax.scan(
        outer, (q, key, jnp.zeros(()), jnp.zeros((), jnp.int32)), None,
        length=n)
    return q, key, samples, acc, dep


def run_chains_tempered(logprob_fn, q0s: Array, key: Array,
                        n_temps: int = 4, beta_min: float = 0.2,
                        n_warmup: int = 500, n_samples: int = 1000,
                        max_depth: int = 8, thin: int = 1,
                        chunk: int = 50, target_accept: float = 0.8,
                        init_step_size: float = 0.05,
                        progress: bool = False, dense_mass: bool = False,
                        init_inv_mass=None,
                        checkpoint_path: str | None = None) -> NUTSResult:
    """Replica-exchange NUTS: ``n_temps`` tempered copies of every chain
    (geometric ladder 1 -> ``beta_min``), Metropolis state swaps between
    adjacent temperatures after every ``chunk`` transitions, alternating
    pair parity. Each temperature adapts its own step size and mass
    during warmup. Returns cold-chain (beta = 1) samples in the
    ``run_chains_chunked`` layout, with per-pair swap acceptance in
    ``swap_accept`` (shape (n_temps - 1,)); healthy ladders sit around
    0.2-0.6 — near 0 means the ladder is too steep (raise ``beta_min``
    or ``n_temps``).

    ``checkpoint_path`` has ``run_chains_chunked`` semantics: full replica
    state written atomically after every chunk, bit-identical resume (swap
    uniforms are a pure function of (key, swap round), not host RNG
    state).

    The reference has nothing comparable (JAGS/Stan single-temperature
    only); motivation and the measured failure mode this addresses are in
    results/ROUND3.md (flagship posteriors whose curved ridges defeat
    single-temperature NUTS at realistic budgets).
    """
    n_chains, dim = q0s.shape
    T, C = int(n_temps), n_chains
    betas = jnp.asarray(np.geomspace(1.0, beta_min, T), jnp.float32)
    q0_full = jnp.tile(q0s, (T, 1))                        # (T*C, dim)
    beta_full = jnp.repeat(betas, C)                       # (T*C,)
    keys = jax.random.split(key, T * C)
    carry = _init_warmup_carry(q0_full, keys, init_step_size, dim,
                               dense_mass, batch_shape=(T * C,),
                               init_inv_mass=init_inv_mass)

    fingerprint = np.asarray([T, C, dim, n_warmup, n_samples, thin,
                              max_depth, int(dense_mass),
                              int(round(beta_min * 1e6)),
                              _ckpt_digest(q0_full, init_inv_mass)],
                             np.int64)
    ck = _ckpt_read(checkpoint_path, fingerprint)
    warmup_done = 0
    resumed_sampling = None
    if ck is not None:
        if int(ck["phase"]) == 0:
            carry = _WarmupCarry(**{f: jnp.asarray(ck[f"carry_{f}"])
                                    for f in _WarmupCarry._fields})
            warmup_done = int(ck["done"])
        else:
            resumed_sampling = ck
        if progress:
            phase = "warmup" if resumed_sampling is None else "sampling"
            print(f"  resumed from {checkpoint_path} at {phase} "
                  f"{int(ck['done'])}", flush=True)

    def save_warmup(done):
        if checkpoint_path is None:
            return
        payload = {f"carry_{f}": np.asarray(getattr(carry, f))
                   for f in _WarmupCarry._fields}
        payload.update(fingerprint=fingerprint, phase=np.int64(0),
                       done=np.int64(done))
        _ckpt_write(checkpoint_path, payload)

    vw_full = jax.vmap(
        lambda c, b, t0: _warmup_chunk_beta(
            logprob_fn, b, c, t0, min(chunk, n_warmup), n_warmup,
            max_depth, target_accept, dense_mass),
        in_axes=(0, 0, None))
    done = warmup_done
    while done < n_warmup and resumed_sampling is None:
        step = min(chunk, n_warmup - done)
        if step != min(chunk, n_warmup):
            vw_full = jax.vmap(
                lambda c, b, t0: _warmup_chunk_beta(
                    logprob_fn, b, c, t0, step, n_warmup, max_depth,
                    target_accept, dense_mass),
                in_axes=(0, 0, None))
        carry = vw_full(carry, beta_full, jnp.int32(done))
        jax.block_until_ready(carry.q)
        done += step
        save_warmup(done)
        if progress:
            print(f"  warmup {done}/{n_warmup}", flush=True)

    eps = jnp.exp(carry.log_eps_bar)
    inv_mass = carry.inv_mass
    q, keys2 = carry.q, carry.key
    lp_eval = jax.jit(jax.vmap(logprob_fn))

    def make_vs(step):
        return jax.vmap(
            lambda b, q, k, e, m: _sample_chunk_beta(
                logprob_fn, b, q, k, e, m, step, max_depth, thin),
            in_axes=(0, 0, 0, 0, 0))

    vs = make_vs(min(chunk, n_samples))
    cold_samples, acc_tot, dep_tot = [], 0.0, 0.0
    swap_acc = np.zeros(T - 1)
    swap_tries = np.zeros(T - 1)
    # swap decisions are a pure function of (key, round_i) so an
    # interrupted run resumes bit-identically
    swap_key = jax.random.fold_in(key, 0x5AFE)
    done = 0
    round_i = 0
    if resumed_sampling is not None:
        rs = resumed_sampling
        q = jnp.asarray(rs["q"])
        keys2 = jnp.asarray(rs["keys"])
        eps = jnp.asarray(rs["eps"])
        inv_mass = jnp.asarray(rs["inv_mass"])
        acc_tot, dep_tot = rs["acc"], rs["dep"]
        swap_acc, swap_tries = rs["swap_acc"], rs["swap_tries"]
        done, round_i = int(rs["done"]), int(rs["round_i"])
        if done > 0:
            cold_samples.append(rs["samples"])
    while done < n_samples:
        step = min(chunk, n_samples - done)
        if step != min(chunk, n_samples):
            vs = make_vs(step)
        q, keys2, samples, acc, dep = vs(beta_full, q, keys2, eps, inv_mass)
        jax.block_until_ready(q)
        cold_samples.append(np.asarray(samples[:C]))
        acc_tot = acc_tot + np.asarray(acc[:C])
        dep_tot = dep_tot + np.asarray(dep[:C])
        done += step
        if T > 1 and done < n_samples:
            # swap round at the chunk boundary (host side; states only —
            # eps/mass stay with their temperature)
            qh = np.array(q).reshape(T, C, dim)   # copy: jax buffers are read-only
            L = np.asarray(lp_eval(q), np.float64).reshape(T, C)
            b = np.asarray(betas, np.float64)
            u = np.asarray(jax.random.uniform(
                jax.random.fold_in(swap_key, round_i),
                (T - 1, C)), np.float64)
            for t in range(round_i % 2, T - 1, 2):
                dlog = (b[t] - b[t + 1]) * (L[t + 1] - L[t])
                accept = np.log(u[t]) < dlog
                if accept.any():
                    tmp = qh[t, accept].copy()
                    qh[t, accept] = qh[t + 1, accept]
                    qh[t + 1, accept] = tmp
                    Lt = L[t, accept].copy()
                    L[t, accept] = L[t + 1, accept]
                    L[t + 1, accept] = Lt
                swap_acc[t] += accept.mean()
                swap_tries[t] += 1.0
            q = jnp.asarray(qh.reshape(T * C, dim), q.dtype)
            round_i += 1
        if checkpoint_path is not None:
            _ckpt_write(checkpoint_path, dict(
                fingerprint=fingerprint, phase=np.int64(1),
                done=np.int64(done), round_i=np.int64(round_i),
                q=np.asarray(q), keys=np.asarray(keys2),
                eps=np.asarray(eps), inv_mass=np.asarray(inv_mass),
                acc=np.asarray(acc_tot), dep=np.asarray(dep_tot),
                swap_acc=swap_acc, swap_tries=swap_tries,
                samples=np.concatenate(cold_samples, axis=1)))
        if progress:
            print(f"  sampling {done}/{n_samples}", flush=True)

    samples = np.concatenate(cold_samples, axis=1)   # (C, n_samples, dim)
    n_trans = n_samples * thin
    return NUTSResult(samples=samples, accept_prob=acc_tot / n_trans,
                      step_size=eps[:C], inv_mass=inv_mass[:C],
                      mean_depth=dep_tot / n_trans,
                      swap_accept=np.divide(
                          swap_acc, np.maximum(swap_tries, 1.0)))
