"""Pallas TPU kernel for the batched EM first-passage simulator.

Same semantics as ``ops/ddm_sim.first_passage`` (which rebuilds the
reference's ``diffusion_trial`` loop, ``basic_ddm_dc.py:85-112``) but
engineered for the chip:

  * walk state (evidence, steps, choice, done) lives in VMEM for the whole
    integration — zero HBM traffic between steps;
  * normals come from the hardware PRNG (``pltpu.prng_random_bits``) via
    Box-Muller — two steps per loop iteration, no threefry in the hot loop
    (the XLA path spends most of its time in counter-based RNG);
  * early exit per grid block: a ``while_loop`` stops integrating as soon
    as every walk in the block has crossed, so fast-parameter blocks don't
    pay for slow ones (the XLA path can only exit globally).

Walks are flattened to (rows, 128) lanes; each grid step owns a
(BLOCK_ROWS, 128) tile.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ddm_sim import FirstPassage

Array = jax.Array

LANES = 128
BLOCK_ROWS = 128          # 128x128 walks per grid step — best early-exit
                          # granularity on v5e (measured sweep in round 1)
_TWO_PI = 2.0 * math.pi
_INV_2_24 = 1.0 / (1 << 24)


def _uniform01(bits: Array) -> Array:
    """uint32 bits -> float32 uniform in (0, 1), never exactly 0.

    Mosaic can't cast uint32->f32 directly; shifting to 24 bits first makes
    the int32 reinterpretation lossless, and int32->f32 is supported.
    """
    i24 = pltpu.bitcast(bits >> 8, jnp.int32)
    return i24.astype(jnp.float32) * _INV_2_24 + (0.5 * _INV_2_24)


def _fp_kernel(seed_ref, drift_ref, bound_ref, beta_ref, dc_ref, active_ref,
               steps_ref, choice_ref, *, dt: float, max_steps: int):
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    drift_dt = drift_ref[:] * dt
    sqrt_dt_dc = math.sqrt(dt) * dc_ref[:]
    boundary = bound_ref[:]
    ev0 = boundary * beta_ref[:]
    active0 = active_ref[:] > 0

    # Lean carry: only (evidence, steps). The walk freezes at the crossing
    # value (the update is gated by ``act``), so done/choice are pure
    # functions of the frozen evidence — no i1 vectors in the scf.while
    # carry (Mosaic can't lower those) and ~25% fewer VPU ops per step.
    # Padded lanes start at ev = -1 (born "crossed"); the caller masks them.
    ev0 = jnp.where(active0, ev0, -1.0)

    shape = ev0.shape
    n_iters = (max_steps + 1) // 2  # two EM steps per iteration

    def activity(ev, steps):
        inside = jnp.where((ev > 0.0) & (ev < boundary), 1.0, 0.0)
        return inside * jnp.where(steps < float(max_steps), 1.0, 0.0)

    def one_step(state, xi):
        ev, steps = state
        act = activity(ev, steps)
        ev = ev + act * (drift_dt + sqrt_dt_dc * xi)
        steps = steps + act
        return ev, steps

    def body(carry):
        it, state = carry
        bits1 = pltpu.prng_random_bits(shape)
        bits2 = pltpu.prng_random_bits(shape)
        u1 = _uniform01(pltpu.bitcast(bits1, jnp.uint32))
        u2 = _uniform01(pltpu.bitcast(bits2, jnp.uint32))
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        th = _TWO_PI * u2
        state = one_step(state, r * jnp.cos(th))
        state = one_step(state, r * jnp.sin(th))
        return it + 1, state

    def cond(carry):
        it, (ev, steps) = carry
        return (it < n_iters) & (jnp.max(activity(ev, steps)) > 0.5)

    state0 = (ev0, jnp.zeros(shape, jnp.float32))
    _, (ev, steps) = jax.lax.while_loop(cond, body, (0, state0))

    choice = jnp.where(ev >= boundary, 1.0, jnp.where(ev <= 0.0, -1.0, 0.0))
    choice = jnp.where(active0, choice, 0.0)
    steps_ref[:] = steps
    choice_ref[:] = choice


@functools.partial(
    jax.jit, static_argnames=("shape", "dt", "max_steps", "block_rows"))
def first_passage_pallas(
    seed: Array,
    drift: Array,
    boundary: Array,
    beta: Array,
    dc: Array,
    *,
    shape: tuple[int, ...],
    dt: float = 0.01,
    max_steps: int = 400,
    active: Array | None = None,
    block_rows: int = BLOCK_ROWS,
) -> FirstPassage:
    """Pallas first-passage simulator.

    ``seed``: int32 scalar (per-call stream; combined with the grid index
    per block). Parameters broadcast against ``shape`` exactly like
    ``first_passage``. Returns the same ``FirstPassage`` struct.
    """
    f32 = jnp.float32
    total = int(math.prod(shape))
    block = block_rows * LANES
    padded = -(-total // block) * block
    rows = padded // LANES

    def flat(x, fill=0.0):
        x = jnp.broadcast_to(jnp.asarray(x, f32), shape).reshape(-1)
        if padded != total:
            x = jnp.concatenate(
                [x, jnp.full((padded - total,), fill, f32)])
        return x.reshape(rows, LANES)

    if active is None:
        act = jnp.ones(shape, f32)
    else:
        act = active.astype(f32)

    grid = rows // block_rows
    bspec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((rows, LANES), f32)

    steps, choice = pl.pallas_call(
        functools.partial(_fp_kernel, dt=dt, max_steps=max_steps),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [bspec] * 5,
        out_specs=(bspec, bspec),
        out_shape=(out_shape, out_shape),
    )(jnp.asarray(seed, jnp.int32).reshape(1),
      flat(drift), flat(boundary, fill=1.0), flat(beta, fill=0.5),
      flat(dc, fill=1.0), flat(act, fill=0.0))

    steps = steps.reshape(-1)[:total].reshape(shape).astype(jnp.int32)
    choice = choice.reshape(-1)[:total].reshape(shape).astype(jnp.int8)
    return FirstPassage(steps=steps, choice=choice)
