"""Batched first-passage simulator for DDMs on TPU — exact by construction.

TPU-native rebuild of the reference's per-trial numba loop
(``diffusion_trial`` in ``/root/reference/basic_ddm_dc.py:85-112`` and
``single_trial_alpha_not_scaled.py:107-142``): instead of one Python while
loop per trial, all (datasets x trials) walks advance together on the VPU.
A ``lax.while_loop`` over fixed-size ``lax.scan`` chunks gives early exit
once every walk has crossed a boundary, without dynamic shapes.

Beyond the reference, the kernels are **exact samplers of the continuous
model** rather than Euler–Maruyama approximations (``bridge=True``, the
default). Three facts make this possible for the DDM:

  1. Within a trial the coefficients are constant, so the Gaussian EM
     transition ``ev + mu*dt + sigma*sqrt(dt)*xi`` is the *exact*
     transition law of the underlying arithmetic Brownian motion — there
     is no discretization error at the grid points, for any step size.
  2. Conditioned on a step's endpoints the in-between path is a Brownian
     bridge, so a crossing missed by endpoint tests ("hidden") occurred
     with probability ``exp(-2 d0 d1 / (sigma^2 dt))`` (``d0``/``d1`` the
     endpoint distances to the nearer boundary) — one extra uniform per
     step decides it exactly.
  3. Given a crossing (detected overshoot or hidden), the within-step
     crossing time has the Brownian-bridge first-passage law, which after
     the substitution ``tau = dt*d0/(d0 + d1*c)`` reduces to
     ``c ~ GIG(1/2, q, q)`` with ``q = d0*d1/(sigma^2 dt)`` — sampled
     exactly as the reciprocal of an InverseGaussian(1, q) draw
     (Michael–Schucany–Haas), once per walk after the integration loop.

This removes both classic EM artifacts the reference carries: the
O(sqrt(dt)) boundary-overshoot bias (the reference works around it with a
fine-grained dt=.001 re-check, single_trial_alpha_not_scaled.py:1702-1765)
and the quantization of RTs to the 10 ms grid (``ndt + steps*dt``,
basic_ddm_dc.py:108-110).

Base semantics otherwise match the reference exactly:
  * evidence starts at ``boundary * beta``;
  * the walk stops when evidence <= 0 (choice -1), >= boundary (choice +1),
    or after ``max_steps * dt`` seconds (missing response, choice 0 — the
    reference encodes this as ``choicert = 0``, ``basic_ddm_dc.py:111``);
  * decision time is ``(n_steps - 1 + frac) * dt`` (``n_steps * dt`` with
    ``bridge=False``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

_MIN_FRAC = 1e-6
_MIN_Q = 1e-6


class FirstPassage(NamedTuple):
    """Outcome of a batch of first-passage simulations."""

    steps: Array   # int32, number of EM steps taken (== max_steps if missing)
    choice: Array  # int8 in {-1, 0, +1}; 0 = no boundary hit (missing)
    # float32 in (0, 1]: sub-step crossing fraction at the crossing step.
    # 1.0 for missing responses and with bridge=False, so decision_time
    # degrades gracefully to the grid value steps*dt.
    frac: Optional[Array] = None

    def decision_time(self, dt: float) -> Array:
        t = self.steps.astype(jnp.float32) * dt
        if self.frac is not None:
            t = t - (1.0 - self.frac) * dt
        return jnp.maximum(t, 0.0)


def bridge_crossing_time(d0: Array, d1: Array, inv_var: Array,
                         nu: Array, u: Array) -> Array:
    """Exact within-step crossing-time fraction of a Brownian bridge.

    For a bridge over one step with variance ``1/inv_var``, starting
    ``d0 > 0`` away from the crossed boundary and ending ``d1 > 0`` away
    (on either side — overshoot and touch-and-return have the same
    conditional law), the first-passage time fraction is
    ``tau = d0 / (d0 + d1*c)`` with ``c ~ GIG(1/2, q, q)``,
    ``q = d0*d1*inv_var``. ``c`` is drawn as 1/InverseGaussian(1, q) from
    one standard normal ``nu`` and one uniform ``u``
    (Michael–Schucany–Haas).
    """
    # upper clip: q -> inf (sigma -> 0) must resolve to the deterministic
    # limit x -> 1, frac -> d0/(d0+d1), not inf - inf = NaN; 1e18 keeps
    # y*(4q + y) comfortably inside float32 range
    q = jnp.clip(d0 * d1 * inv_var, _MIN_Q, 1e18)
    y = nu * nu
    x = 1.0 + (y - jnp.sqrt(y * (4.0 * q + y))) / (2.0 * q)
    x = jnp.maximum(x, _MIN_Q)
    ig = jnp.where(u < 1.0 / (1.0 + x), x, 1.0 / x)
    # c = 1/ig, so d0/(d0 + d1*c) = d0*ig/(d0*ig + d1); the max() guards
    # d0 = d1 = 0 (start and end both exactly on the boundary)
    frac = d0 * ig / jnp.maximum(d0 * ig + d1, _MIN_Q)
    return jnp.clip(frac, _MIN_FRAC, 1.0)


def _bridge_step(ev, steps, evb, dh, choice, done, act, xi, u, *,
                 drift_dt, sqrt_dt_dc, boundary, inv2, bridge):
    """One shared exact-transition + bridge-test step on explicit state.

    Pure function of (state, noise) so the XLA scan and the test-suite's
    pre-drawn-noise reference loop run the identical rule. ``act`` is a
    bool mask of walks still integrating; ``inv2`` is ``2 / (dc^2 dt)``.
    ``evb`` records the pre-step evidence at the crossing step; ``dh``
    records the endpoint's boundary distance for hidden crossings
    (sentinel -1 for detected ones, whose endpoint stays in ``ev``).
    """
    ev_new = ev + jnp.where(act, drift_dt + sqrt_dt_dc * xi, 0.0)
    inside = (ev_new > 0.0) & (ev_new < boundary)
    detected = act & ~inside
    if bridge:
        take_up = (ev + ev_new) > boundary  # exactly argmin of d0*d1
        d0 = jnp.where(take_up, boundary - ev, ev)
        d1 = jnp.where(take_up, boundary - ev_new, ev_new)
        p = jnp.exp(-d0 * d1 * inv2)
        hidden = act & inside & (u < p)
        crossed = detected | hidden
        evb = jnp.where(crossed, ev, evb)
        dh = jnp.where(hidden, d1, dh)
        up = (detected & (ev_new >= boundary)) | (hidden & take_up)
        # freeze hidden crossings exactly onto the crossed boundary
        ev_new = jnp.where(hidden & take_up, boundary,
                           jnp.where(hidden & ~take_up, 0.0, ev_new))
    else:
        crossed = detected
        up = detected & (ev_new >= boundary)
    lo = crossed & ~up
    choice = choice + up.astype(jnp.int8) - lo.astype(jnp.int8)
    steps = steps + act.astype(jnp.int32)
    done = done | crossed
    return ev_new, steps, evb, dh, choice, done


def _finalize_frac(key, ev, evb, dh, choice, boundary, inv2):
    """Draw the exact crossing-time fraction for every crossed walk."""
    up = choice > 0
    crossed = choice != 0
    d0 = jnp.where(up, boundary - evb, evb)
    dend = jnp.where(dh >= 0.0, dh,
                     jnp.where(up, ev - boundary, -ev))
    d0 = jnp.maximum(d0, 0.0)
    dend = jnp.maximum(dend, 0.0)
    k_nu, k_u = jax.random.split(key)
    nu = jax.random.normal(k_nu, ev.shape, jnp.float32)
    u = jax.random.uniform(k_u, ev.shape, jnp.float32,
                           minval=_MIN_FRAC, maxval=1.0)
    f = bridge_crossing_time(d0, dend, 0.5 * inv2, nu, u)
    return jnp.where(crossed, f, 1.0)


@functools.partial(
    jax.jit,
    static_argnames=("shape", "dt", "max_steps", "chunk", "unroll", "bridge"))
def first_passage(
    key: Array,
    drift: Array,
    boundary: Array,
    beta: Array,
    dc: Array,
    *,
    shape: tuple[int, ...],
    dt: float = 0.01,
    max_steps: int = 400,
    chunk: int = 50,
    unroll: int = 5,
    active: Optional[Array] = None,
    bridge: bool = True,
) -> FirstPassage:
    """Simulate first passage for ``shape`` independent DDM walks.

    ``shape`` is the full walk-batch shape (typically ``(datasets, trials)``);
    parameter arrays broadcast against it, so dataset-level parameters can be
    passed as ``(B, 1)`` while every walk still gets independent noise.
    ``active`` masks out padded trials: inactive walks are born "done" so a
    fully padded tail costs no chunks. ``bridge=False`` recovers the
    reference's plain EM (grid RTs, overshoot bias) for ablation tests.
    """
    f32 = jnp.float32
    drift = jnp.broadcast_to(jnp.asarray(drift, f32), shape)
    boundary = jnp.broadcast_to(jnp.asarray(boundary, f32), shape)
    beta = jnp.broadcast_to(jnp.asarray(beta, f32), shape)
    dc = jnp.broadcast_to(jnp.asarray(dc, f32), shape)

    ev0 = boundary * beta
    up0 = ev0 >= boundary
    lo0 = ev0 <= 0.0
    choice0 = jnp.where(up0, 1, jnp.where(lo0, -1, 0)).astype(jnp.int8)
    done0 = up0 | lo0
    if active is not None:
        done0 = done0 | ~active
        choice0 = jnp.where(active, choice0, 0).astype(jnp.int8)
    steps0 = jnp.zeros(shape, jnp.int32)

    sqrt_dt_dc = jnp.sqrt(jnp.asarray(dt, f32)) * dc
    drift_dt = drift * dt
    # dc == 0 (legal at prior edges / floored trial-level draws) would make
    # this inf and poison the bridge quantities with 0*inf = NaN; the clamp
    # keeps the sigma -> 0 limit (deterministic walk, q -> huge -> linear
    # crossing fraction) finite instead.
    inv2 = 2.0 / jnp.maximum(sqrt_dt_dc * sqrt_dt_dc, 1e-20)
    n_chunks = -(-max_steps // chunk)

    def step(carry, t):
        ev, steps, evb, dh, choice, done = carry
        kt = jax.random.fold_in(key, t)
        xi = jax.random.normal(jax.random.fold_in(kt, 0), shape, f32)
        if bridge:
            u = jax.random.uniform(
                jax.random.fold_in(kt, 1), shape, f32,
                minval=_MIN_FRAC, maxval=1.0)
        else:
            u = evb  # unused
        act = (~done) & (steps < max_steps)
        carry = _bridge_step(
            ev, steps, evb, dh, choice, done, act, xi, u,
            drift_dt=drift_dt, sqrt_dt_dc=sqrt_dt_dc, boundary=boundary,
            inv2=inv2, bridge=bridge)
        return carry, None

    def chunk_body(state):
        ci, carry = state
        ts = ci * chunk + lax.iota(jnp.int32, chunk)
        carry, _ = lax.scan(step, carry, ts, unroll=unroll)
        return ci + 1, carry

    def chunk_cond(state):
        ci, (_, _, _, _, _, done) = state
        return (ci < n_chunks) & jnp.logical_not(jnp.all(done))

    carry0 = (ev0, steps0, ev0, jnp.full(shape, -1.0, f32), choice0, done0)
    _, (ev, steps, evb, dh, choice, _) = lax.while_loop(
        chunk_cond, chunk_body, (jnp.int32(0), carry0))
    if bridge:
        frac = _finalize_frac(jax.random.fold_in(key, 0x7A11A5), ev, evb, dh,
                              jnp.where(steps > 0, choice, 0), boundary, inv2)
        frac = jnp.where(steps > 0, frac, 1.0)
    else:
        frac = jnp.ones(shape, f32)
    return FirstPassage(steps=steps, choice=choice, frac=frac)


@functools.partial(
    jax.jit,
    static_argnames=("dt", "max_steps", "n_record", "record_dt_ratio",
                     "chunk"))
def first_passage_with_path(
    key: Array,
    drift: Array,
    boundary: Array,
    beta: Array,
    dc: Array,
    *,
    dt: float = 0.001,
    max_steps: int = 4000,
    n_record: int = 200,
    record_dt_ratio: int = 1,
    active: Optional[Array] = None,
    chunk: int = 200,
) -> tuple[FirstPassage, Array]:
    """First passage that also records the first ``n_record`` evidence values.

    Rebuilds the "evidence path" observation family
    (``retired_models/basic_ddm_dc_evidence.py:88-151``): the accumulation
    path over the first ``n_record`` recorded steps is returned alongside the
    choice/RT so the caller can add measurement noise and standardize it.
    The path holds its final value after absorption (the reference keeps
    appending the frozen evidence value once the walk has stopped).

    Runs at fine dt (default .001) where grid effects are below measurement
    noise; no bridge correction, so recorded paths stay the plain EM walks
    that the observation model (path + noise) assumes.

    ``active`` masks out padded trials exactly as in :func:`first_passage`:
    inactive walks are born "done" (choice 0, zero path), so after the
    mandatory ``n_record`` recording steps the chunked tail loop early-exits
    as soon as every *real* walk has been absorbed — padded lanes no longer
    drag every dataset through the full 4000-step dt=.001 walk.
    """
    shape = jnp.broadcast_shapes(
        jnp.shape(drift), jnp.shape(boundary), jnp.shape(beta), jnp.shape(dc))
    f32 = jnp.float32
    drift = jnp.broadcast_to(jnp.asarray(drift, f32), shape)
    boundary = jnp.broadcast_to(jnp.asarray(boundary, f32), shape)
    beta = jnp.broadcast_to(jnp.asarray(beta, f32), shape)
    dc = jnp.broadcast_to(jnp.asarray(dc, f32), shape)

    ev0 = boundary * beta
    done0 = (ev0 >= boundary) | (ev0 <= 0.0)
    choice0 = jnp.where(ev0 >= boundary, 1,
                        jnp.where(ev0 <= 0.0, -1, 0)).astype(jnp.int8)
    if active is not None:
        done0 = done0 | ~active
        choice0 = jnp.where(active, choice0, 0).astype(jnp.int8)
        ev0 = jnp.where(active, ev0, 0.0)

    sqrt_dt_dc = jnp.sqrt(jnp.asarray(dt, f32)) * dc
    drift_dt = drift * dt

    def step(carry, t):
        ev, steps, choice, done = carry
        xi = jax.random.normal(jax.random.fold_in(key, t), shape, f32)
        act = (~done) & (steps < max_steps)
        ev_new = ev + jnp.where(act, drift_dt + sqrt_dt_dc * xi, 0.0)
        up = act & (ev_new >= boundary)
        lo = act & (ev_new <= 0.0)
        choice = (choice + up.astype(jnp.int8) - lo.astype(jnp.int8))
        steps = steps + act.astype(jnp.int32)
        done = done | up | lo
        return (ev_new, steps, choice, done), ev_new

    carry0 = (ev0, jnp.zeros(shape, jnp.int32), choice0, done0)
    ts_rec = lax.iota(jnp.int32, n_record * record_dt_ratio)
    carry, path = lax.scan(step, carry0, ts_rec)
    if record_dt_ratio > 1:
        path = path[record_dt_ratio - 1::record_dt_ratio]

    rec_steps = n_record * record_dt_ratio
    remaining = max_steps - rec_steps
    if remaining > 0:
        # Chunked tail with all-done early exit (same structure as
        # first_passage): most prior draws absorb well before the 4 s cap,
        # and with `active` padded lanes born-done the exit actually fires.
        n_chunks = -(-remaining // chunk)

        def chunk_body(state):
            ci, carry = state
            ts = rec_steps + ci * chunk + lax.iota(jnp.int32, chunk)
            carry, _ = lax.scan(step, carry, ts)
            return ci + 1, carry

        def chunk_cond(state):
            ci, (_, _, _, done) = state
            return (ci < n_chunks) & jnp.logical_not(jnp.all(done))

        _, carry = lax.while_loop(chunk_cond, chunk_body,
                                  (jnp.int32(0), carry))
    _, steps, choice, _ = carry
    # path: (n_record, *shape) -> (*shape, n_record)
    path = jnp.moveaxis(path, 0, -1)
    return FirstPassage(steps=steps, choice=choice), path
