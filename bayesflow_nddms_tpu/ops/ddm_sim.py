"""Batched Euler–Maruyama first-passage simulator for DDMs on TPU.

TPU-native rebuild of the reference's per-trial numba loop
(``diffusion_trial`` in ``/root/reference/basic_ddm_dc.py:85-112`` and
``single_trial_alpha_not_scaled.py:107-142``): instead of one Python while
loop per trial, all (datasets x trials) walks advance together on the VPU.
A ``lax.while_loop`` over fixed-size ``lax.scan`` chunks gives early exit
once every walk has crossed a boundary, without dynamic shapes.

Semantics match the reference exactly:
  * evidence starts at ``boundary * beta``;
  * each step adds ``drift*dt + sqrt(dt)*dc*xi``, xi ~ N(0,1);
  * the walk stops when evidence <= 0 (choice -1), >= boundary (choice +1),
    or after ``max_steps`` steps (missing response, choice 0 — the reference
    encodes this as ``choicert = 0``, ``basic_ddm_dc.py:111``);
  * decision time is ``n_steps * dt``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


class FirstPassage(NamedTuple):
    """Outcome of a batch of first-passage simulations."""

    steps: Array   # int32, number of EM steps taken (== max_steps if missing)
    choice: Array  # int8 in {-1, 0, +1}; 0 = no boundary hit (missing)

    def decision_time(self, dt: float) -> Array:
        return self.steps.astype(jnp.float32) * dt


@functools.partial(
    jax.jit, static_argnames=("shape", "dt", "max_steps", "chunk", "unroll"))
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
) -> FirstPassage:
    """Simulate first passage for ``shape`` independent DDM walks.

    ``shape`` is the full walk-batch shape (typically ``(datasets, trials)``);
    parameter arrays broadcast against it, so dataset-level parameters can be
    passed as ``(B, 1)`` while every walk still gets independent noise.
    ``active`` masks out padded trials: inactive walks are born "done" so a
    fully padded tail costs no chunks.
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
    n_chunks = -(-max_steps // chunk)

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
        return (ev_new, steps, choice, done), None

    def chunk_body(state):
        ci, carry = state
        ts = ci * chunk + lax.iota(jnp.int32, chunk)
        carry, _ = lax.scan(step, carry, ts, unroll=unroll)
        return ci + 1, carry

    def chunk_cond(state):
        ci, (_, _, _, done) = state
        return (ci < n_chunks) & jnp.logical_not(jnp.all(done))

    _, (_, steps, choice, _) = lax.while_loop(
        chunk_cond, chunk_body, (jnp.int32(0), (ev0, steps0, choice0, done0)))
    return FirstPassage(steps=steps, choice=choice)


@functools.partial(
    jax.jit, static_argnames=("dt", "max_steps", "n_record", "record_dt_ratio"))
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
) -> tuple[FirstPassage, Array]:
    """First passage that also records the first ``n_record`` evidence values.

    Rebuilds the "evidence path" observation family
    (``retired_models/basic_ddm_dc_evidence.py:88-151``): the accumulation
    path over the first ``n_record`` recorded steps is returned alongside the
    choice/RT so the caller can add measurement noise and standardize it.
    The path holds its final value after absorption (the reference keeps
    appending the frozen evidence value once the walk has stopped).
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

    remaining = max_steps - n_record * record_dt_ratio
    if remaining > 0:
        ts_rest = (n_record * record_dt_ratio) + lax.iota(jnp.int32, remaining)
        carry, _ = lax.scan(step, carry, ts_rest)
    _, steps, choice, _ = carry
    # path: (n_record, *shape) -> (*shape, n_record)
    path = jnp.moveaxis(path, 0, -1)
    return FirstPassage(steps=steps, choice=choice), path
