"""Pallas TPU kernel for the batched exact first-passage simulator.

Same semantics as ``ops/ddm_sim.first_passage`` (which rebuilds the
reference's ``diffusion_trial`` loop, ``basic_ddm_dc.py:85-112``, made
exact via the Brownian-bridge machinery documented there) but engineered
for the chip:

  * walk state lives in VMEM for the whole integration — zero HBM traffic
    between steps;
  * normals come from the hardware PRNG (``pltpu.prng_random_bits``) via
    Box-Muller — two steps per loop iteration, no threefry in the hot loop
    (the XLA path spends most of its time in counter-based RNG); the
    bridge test consumes one extra 32-bit draw per iteration, split into
    two 16-bit uniforms (crossing probabilities below 2^-16 are dropped —
    orders of magnitude under the MC noise floor);
  * **adaptive step tiers**: exact Gaussian transitions are valid for any
    step size, and the bridge test stays exact per segment, so lanes
    farther than ``cfar`` bridge-sds from both boundaries take one
    ``kbig * dt`` step instead of ``kbig`` small ones. Only the within-step
    crossing-time draw depends on the step size, and crossings fire almost
    exclusively from near-boundary (small-step) lanes, so accuracy is
    unchanged while total work drops ~2-3x (measured on prior-drawn
    parameter batches);
  * crossing times are drawn ONCE per walk after the loop via the exact
    GIG(1/2) bridge first-passage sampler (``ddm_sim.bridge_crossing_time``
    docstring) — the hot loop only records the crossing step's endpoints;
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
KBIG = 3.0                # big-tier step multiple; see
                          # results/pallas_kbig_sweep_r4.json for the
                          # on-chip sweep this default comes from
CFAR = 2.5                # big-tier guard band, in big-step noise sds
_TWO_PI = 2.0 * math.pi
_INV_2_24 = 1.0 / (1 << 24)
_INV_2_16 = 1.0 / (1 << 16)
_MIN_Q = 1e-6
_MIN_FRAC = 1e-6


def _uniform01(bits: Array) -> Array:
    """uint32 bits -> float32 uniform in (0, 1), never exactly 0.

    Mosaic can't cast uint32->f32 directly; shifting to 24 bits first makes
    the int32 reinterpretation lossless, and int32->f32 is supported.
    """
    i24 = pltpu.bitcast(bits >> 8, jnp.int32)
    return i24.astype(jnp.float32) * _INV_2_24 + (0.5 * _INV_2_24)


def _uniform16(bits: Array) -> Array:
    """uint32 holding 16 random low bits -> float32 uniform in (0, 1)."""
    i16 = pltpu.bitcast(bits, jnp.int32)
    return i16.astype(jnp.float32) * _INV_2_16 + (0.5 * _INV_2_16)


def _fp_kernel(seed_ref, drift_ref, bound_ref, beta_ref, dc_ref, active_ref,
               steps_ref, choice_ref, frac_ref, *,
               dt: float, max_steps: int, bridge: bool,
               kbig: float, cfar: float):
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    drift = drift_ref[:]
    # dc == 0 (legal at prior edges) would blow up inv2 and the final
    # q = d0*dend/(sigma^2 dlt) to inf/NaN; the floor keeps the sigma -> 0
    # limit finite (deterministic walk, linear crossing fraction) while
    # being physically negligible against dc/boundary scales ~ 0.1-3.
    sigma = jnp.maximum(dc_ref[:], 1e-6)
    boundary = bound_ref[:]
    t_max = float(max_steps) * dt
    dt_b = kbig * dt
    mu_s = drift * dt
    sd_s = math.sqrt(dt) * sigma
    mu_b = drift * dt_b
    sd_b = math.sqrt(dt_b) * sigma
    inv2_s = 2.0 / (sd_s * sd_s)
    inv2_b = 2.0 / (sd_b * sd_b)
    far_thresh = cfar * sd_b
    ev0 = boundary * beta_ref[:]
    active0 = active_ref[:] > 0

    # Lean carry: (ev, t, evb, dh, dlt). The walk freezes at (or, for
    # bridge-hidden crossings, is clamped onto) the crossing value, so
    # done/choice are pure functions of the frozen evidence — no i1
    # vectors in the scf.while carry (Mosaic can't lower those).
    # evb: pre-step evidence at the crossing step; dh: endpoint boundary
    # distance for hidden crossings (sentinel -1 when detected); dlt: the
    # crossing step's size. Padded lanes start at ev = -1 (born "crossed").
    ev0 = jnp.where(active0, ev0, -1.0)

    shape = ev0.shape
    n_iters = (max_steps + 1) // 2  # two steps (small tier) per iteration

    # bridge=False counts unit steps (exact in f32) instead of seconds
    t_cap = t_max if bridge else float(max_steps)

    def activity(ev, t):
        inside = jnp.where((ev > 0.0) & (ev < boundary), 1.0, 0.0)
        return inside * jnp.where(t < t_cap, 1.0, 0.0)

    def one_step(state, xi, u):
        ev, t, evb, dh, dlt = state
        act = activity(ev, t)
        act_b = act > 0.5
        d_up0 = boundary - ev
        if bridge:
            far = jnp.minimum(d_up0, ev) > far_thresh
            step_mu = jnp.where(far, mu_b, mu_s)
            step_sd = jnp.where(far, sd_b, sd_s)
            delta = jnp.where(far, dt_b, dt)
            inv2 = jnp.where(far, inv2_b, inv2_s)
        else:
            step_mu, step_sd, delta = mu_s, sd_s, 1.0
        ev_new = ev + act * (step_mu + step_sd * xi)
        inside_new = (ev_new > 0.0) & (ev_new < boundary)
        detected = act_b & ~inside_new
        if bridge:
            take_up = (ev + ev_new) > boundary  # exactly argmin of d0*d1
            d0 = jnp.where(take_up, d_up0, ev)
            d1 = jnp.where(take_up, boundary - ev_new, ev_new)
            p = jnp.exp(-(d0 * d1 * inv2))
            hidden = act_b & inside_new & (u < p)
            crossed = detected | hidden
            evb = jnp.where(crossed, ev, evb)
            dh = jnp.where(hidden, d1, dh)
            dlt = jnp.where(crossed, delta, dlt)
            ev_new = jnp.where(hidden & take_up, boundary,
                               jnp.where(hidden & ~take_up, 0.0, ev_new))
        t = t + act * delta
        return ev_new, t, evb, dh, dlt

    def body(carry):
        it, state = carry
        bits1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        bits2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        u1 = _uniform01(bits1)
        u2 = _uniform01(bits2)
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        th = _TWO_PI * u2
        if bridge:
            bits3 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            ua = _uniform16(bits3 >> 16)
            ub = _uniform16(bits3 & 0xFFFF)
        else:
            ua = ub = u1
        state = one_step(state, r * jnp.cos(th), ua)
        state = one_step(state, r * jnp.sin(th), ub)
        return it + 1, state

    def cond(carry):
        it, (ev, t, _, _, _) = carry
        return (it < n_iters) & (jnp.max(activity(ev, t)) > 0.5)

    state0 = (ev0, jnp.zeros(shape, jnp.float32), ev0,
              jnp.full(shape, -1.0, jnp.float32),
              jnp.full(shape, dt, jnp.float32))
    _, (ev, t, evb, dh, dlt) = jax.lax.while_loop(cond, body, (0, state0))

    up = ev >= boundary
    lo = ev <= 0.0
    crossed = (up | lo) & active0 & (t > 0.0)
    if bridge:
        # exact within-step crossing time, once per walk (GIG(1/2) law;
        # see ddm_sim.bridge_crossing_time)
        bits1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        bits2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        bits3 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        nu = jnp.sqrt(-2.0 * jnp.log(_uniform01(bits1))) * \
            jnp.cos(_TWO_PI * _uniform01(bits2))
        uu = _uniform01(bits3)
        d0 = jnp.maximum(jnp.where(up, boundary - evb, evb), 0.0)
        dend = jnp.maximum(
            jnp.where(dh >= 0.0, dh, jnp.where(up, ev - boundary, -ev)), 0.0)
        q = jnp.maximum(d0 * dend / (sigma * sigma * dlt), _MIN_Q)
        y = nu * nu
        x = jnp.maximum(
            1.0 + (y - jnp.sqrt(y * (4.0 * q + y))) / (2.0 * q), _MIN_Q)
        ig = jnp.where(uu < 1.0 / (1.0 + x), x, 1.0 / x)
        f = jnp.clip(d0 * ig / jnp.maximum(d0 * ig + dend, _MIN_Q),
                     _MIN_FRAC, 1.0)
        rt = jnp.where(crossed, t - (1.0 - f) * dlt, t)
        rt = jnp.minimum(rt, t_max)
        # encode rt exactly as (steps, frac): rt = (steps - 1 + frac) * dt
        sgrid = jnp.minimum(jnp.ceil(rt / dt), float(max_steps))
        frac_out = jnp.clip(rt / dt - (sgrid - 1.0), 0.0, 1.0)
    else:
        sgrid = jnp.minimum(t, t_cap)
        frac_out = jnp.ones(shape, jnp.float32)

    choice = jnp.where(up, 1.0, jnp.where(lo, -1.0, 0.0))
    choice = jnp.where(active0, choice, 0.0)
    steps_ref[:] = sgrid
    choice_ref[:] = choice
    frac_ref[:] = frac_out


def _fp_path_kernel(seed_ref, drift_ref, bound_ref, beta_ref, dc_ref,
                    active_ref, steps_ref, choice_ref, path_ref, *,
                    dt: float, max_steps: int, n_record: int):
    """Path-recording EM walk (evidence family twin of
    ``ddm_sim.first_passage_with_path``): plain Euler–Maruyama at ``dt``
    (no bridge — the recorded path must BE the EM walk the observation
    model assumes), the first ``n_record`` evidence values stored to
    ``path_ref``, then a tail loop to absorption with per-block early
    exit. Distributionally identical to the XLA twin; only the RNG stream
    differs (hardware PRNG + Box-Muller vs threefry)."""
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    drift = drift_ref[:]
    boundary = bound_ref[:]
    sigma = dc_ref[:]
    mu_s = drift * dt
    sd_s = math.sqrt(dt) * sigma
    is_act = active_ref[:]                      # f32 0/1 padded-lane mask
    ev0 = boundary * beta_ref[:]
    # padded lanes are born "crossed" (ev outside the open interval) but
    # record 0.0 to the path like the XLA twin's zeroed lanes
    ev0 = jnp.where(is_act > 0, ev0, -1.0)
    shape = ev0.shape
    t_cap = float(max_steps)

    def activity(ev, t):
        inside = jnp.where((ev > 0.0) & (ev < boundary), 1.0, 0.0)
        return inside * jnp.where(t < t_cap, 1.0, 0.0)

    def one_step(state, xi):
        ev, t = state
        act = activity(ev, t)
        ev = ev + act * (mu_s + sd_s * xi)
        return ev, t + act

    def normals():
        bits1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        bits2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        r = jnp.sqrt(-2.0 * jnp.log(_uniform01(bits1)))
        th = _TWO_PI * _uniform01(bits2)
        return r * jnp.cos(th), r * jnp.sin(th)

    def rec_body(i, state):
        xa, xb = normals()
        state = one_step(state, xa)
        path_ref[pl.ds(2 * i, 1)] = (state[0] * is_act)[None]
        state = one_step(state, xb)
        path_ref[pl.ds(2 * i + 1, 1)] = (state[0] * is_act)[None]
        return state

    state = jax.lax.fori_loop(
        0, n_record // 2, rec_body,
        (ev0, jnp.zeros(shape, jnp.float32)))

    n_tail_iters = (max_steps - n_record + 1) // 2

    def tail_body(carry):
        it, state = carry
        xa, xb = normals()
        state = one_step(state, xa)
        state = one_step(state, xb)
        return it + 1, state

    def tail_cond(carry):
        it, (ev, t) = carry
        return (it < n_tail_iters) & (jnp.max(activity(ev, t)) > 0.5)

    _, (ev, t) = jax.lax.while_loop(tail_cond, tail_body, (0, state))

    up = ev >= boundary
    lo = ev <= 0.0
    choice = jnp.where(up, 1.0, jnp.where(lo, -1.0, 0.0)) * is_act
    steps_ref[:] = t
    choice_ref[:] = choice


@functools.partial(
    jax.jit,
    static_argnames=("shape", "dt", "max_steps", "n_record", "block_rows"))
def first_passage_with_path_pallas(
    seed: Array,
    drift: Array,
    boundary: Array,
    beta: Array,
    dc: Array,
    *,
    shape: tuple[int, ...],
    dt: float = 0.001,
    max_steps: int = 4000,
    n_record: int = 200,
    active: Array | None = None,
    block_rows: int | None = None,
) -> tuple[FirstPassage, Array]:
    """Pallas twin of ``ddm_sim.first_passage_with_path`` (ratio-1
    recording). Returns ``(FirstPassage(steps, choice), path)`` with
    ``path`` shaped ``(*shape, n_record)``. Block rows shrink with
    ``n_record`` so the in-VMEM path block stays ~6.5 MB."""
    assert n_record % 2 == 0 and (max_steps - n_record) % 2 == 0
    f32 = jnp.float32
    if block_rows is None:
        block_rows = 64 if n_record <= 256 else 32
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

    act = jnp.ones(shape, f32) if active is None else active.astype(f32)

    grid = rows // block_rows
    bspec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((n_record, block_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    out2d = jax.ShapeDtypeStruct((rows, LANES), f32)
    out3d = jax.ShapeDtypeStruct((n_record, rows, LANES), f32)

    steps, choice, path = pl.pallas_call(
        functools.partial(_fp_path_kernel, dt=dt, max_steps=max_steps,
                          n_record=n_record),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [bspec] * 5,
        out_specs=(bspec, bspec, pspec),
        out_shape=(out2d, out2d, out3d),
    )(jnp.asarray(seed, jnp.int32).reshape(1),
      flat(drift), flat(boundary, fill=1.0), flat(beta, fill=0.5),
      flat(dc, fill=1.0), flat(act, fill=0.0))

    steps = steps.reshape(-1)[:total].reshape(shape).astype(jnp.int32)
    choice = choice.reshape(-1)[:total].reshape(shape).astype(jnp.int8)
    # (n_record, rows, LANES) -> (*shape, n_record)
    path = jnp.moveaxis(path.reshape(n_record, -1)[:, :total], 0, -1)
    path = path.reshape(*shape, n_record)
    return FirstPassage(steps=steps, choice=choice), path


@functools.partial(
    jax.jit,
    static_argnames=("shape", "dt", "max_steps", "block_rows", "bridge",
                     "kbig", "cfar"))
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
    bridge: bool = True,
    kbig: float = KBIG,
    cfar: float = CFAR,
) -> FirstPassage:
    """Pallas first-passage simulator.

    ``seed``: int32 scalar (per-call stream; combined with the grid index
    per block). Parameters broadcast against ``shape`` exactly like
    ``first_passage``. Returns the same ``FirstPassage`` struct.

    ``kbig``/``cfar`` tune the adaptive step tiers (big-tier step multiple
    and its guard band in big-step sds); any ``kbig`` > 0 preserves the
    sampler's law up to the ``cfar`` far-boundary approximation described
    below (values <= 1 merely give no speedup), while ``cfar`` must stay
    large enough that a big step
    starting inside the guard band essentially never reaches the FAR
    boundary within one segment (the bridge test treats the nearest
    boundary only; cfar = 2.5 puts the nearest-boundary crossing
    probability at e^(-2*cfar^2) ~ 4e-6, and the opposite-boundary one
    far below that).
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

    steps, choice, frac = pl.pallas_call(
        functools.partial(_fp_kernel, dt=dt, max_steps=max_steps,
                          bridge=bridge, kbig=float(kbig), cfar=float(cfar)),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [bspec] * 5,
        out_specs=(bspec, bspec, bspec),
        out_shape=(out_shape, out_shape, out_shape),
    )(jnp.asarray(seed, jnp.int32).reshape(1),
      flat(drift), flat(boundary, fill=1.0), flat(beta, fill=0.5),
      flat(dc, fill=1.0), flat(act, fill=0.0))

    steps = steps.reshape(-1)[:total].reshape(shape).astype(jnp.int32)
    choice = choice.reshape(-1)[:total].reshape(shape).astype(jnp.int8)
    frac = frac.reshape(-1)[:total].reshape(shape)
    return FirstPassage(steps=steps, choice=choice, frac=frac)
