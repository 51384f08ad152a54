"""Declarative model specifications.

The reference repo defines each model as a standalone script repeating the
same prior/simulator/configurator skeleton (~40 scripts, see e.g.
``/root/reference/basic_ddm_dc.py:50-160``). Here a model is a single
``ModelSpec``: named priors + a trial-parameter map + an observation map,
all pure JAX and batch-aware, consumed by one shared simulator and one
shared amortizer.

Shapes convention: ``theta`` is a dict of ``(B,)`` parameter arrays; trial
maps return ``(B, 1)`` (shared across trials) or ``(B, N)`` (trial-level
variability) arrays that broadcast inside the simulator; observation maps
return ``(B, N, C)`` channel stacks. ``B`` = datasets, ``N`` = trials.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.ddm_sim import first_passage
from ..utils.dists import Dist

Array = jax.Array
Theta = Dict[str, Array]


class TrialParams(NamedTuple):
    """Per-trial core DDM parameters, each broadcastable to (B, N).

    ``extra`` carries model-specific latent state from the trial map to the
    observation map (e.g. the UNOBSERVED latent boundary in the sepvar
    model, retired_models/single_trial_alpha_sepvar.py:83-111).
    """

    drift: Array
    boundary: Array
    beta: Array
    ndt: Array
    dc: Array
    extra: Array | None = None


def _use_pallas() -> bool:
    """Use the Pallas kernel on real TPU backends (2.7x the XLA scan path);
    CPU meshes (tests, multi-chip dry runs) take the portable path."""
    import os
    if os.environ.get("NDDMS_DISABLE_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


TrialFn = Callable[[Array, Theta, int], TrialParams]
# obs_fn(key, theta, trial_params, t_dec(B,N), choice(B,N) int8) -> (B,N,C)
ObsFn = Callable[[Array, Theta, TrialParams, Array, Array], Array]


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """A generative model: priors + trial map + observation map."""

    name: str
    param_names: Tuple[str, ...]
    prior: Tuple[Dist, ...]
    trial_fn: TrialFn
    obs_fn: ObsFn
    n_channels: int = 2
    dt: float = 0.01
    max_steps: int = 400
    n_min: int = 60     # prior over number of trials (basic_ddm_dc.py:50-52)
    n_max: int = 300
    summary_dim: int = 64   # summary-net output dim (the reference's dc2
                            # variant raised it to 64 from BayesFlow's
                            # default, retired_models/single_trial_alpha_dc2
                            # .py:284; our capacity study confirmed 64 wins)
    doc: str = dataclasses.field(default="", compare=False)
    # Applied to the stacked independent draws — supports dependent priors
    # like gamma ~ U(0, 1/std_alpha) (retired_models/single_trial_alpha_mean
    # .py:76). When set, prior_log_prob refers to the *raw* (pre-transform)
    # space and must not be used for MCMC.
    prior_transform: Callable[[Array], Array] | None = None
    # Full replacement for the default EM first-passage observation pipeline
    # (used by the evidence-path family, which records the accumulation path).
    # Signature: (key, theta(B,P), n_trials, active(B,N)|None) -> (B,N,C).
    custom_simulate: Callable | None = None

    def __post_init__(self):
        assert len(self.param_names) == len(self.prior)

    @property
    def n_params(self) -> int:
        return len(self.param_names)

    # ---- priors -----------------------------------------------------------

    def sample_prior_raw(self, key: Array, batch: int) -> Array:
        """Draw (batch, n_params) from the independent marginal priors,
        WITHOUT applying ``prior_transform``. These raw coordinates are
        the amortizer's native space: every marginal has a known support,
        so the logit-coordinate machinery (incl. the per-dataset ter
        bound) applies to dependent-prior specs too (round 4 — modelling
        the transformed gamma = u/std_alpha directly reproduced the
        round-2 raw-coordinate ter SBC failure, p = 3e-4 at 2,000)."""
        keys = jax.random.split(key, self.n_params)
        cols = [d.sample(k, (batch,)) for d, k in zip(self.prior, keys)]
        return jnp.stack(cols, axis=-1)

    def sample_prior(self, key: Array, batch: int) -> Array:
        """Draw (batch, n_params) from the prior in MODEL coordinates
        (``prior_transform`` applied)."""
        theta = self.sample_prior_raw(key, batch)
        if self.prior_transform is not None:
            theta = self.prior_transform(theta)
        return theta

    def to_model_coords(self, theta_raw: Array) -> Array:
        """Raw prior coordinates -> model coordinates (identity for
        independent-prior specs)."""
        if self.prior_transform is None:
            return theta_raw
        return self.prior_transform(theta_raw)

    def prior_log_prob(self, theta: Array) -> Array:
        """Sum of marginal log-densities, theta (..., n_params) -> (...)."""
        lps = [d.log_prob(theta[..., i]) for i, d in enumerate(self.prior)]
        return sum(lps)

    def prior_moments(self) -> Tuple[Array, Array]:
        """Analytic (mean, std) per parameter — used to standardize the flow
        inputs (the reference leaves this as a TODO, basic_ddm_dc.py:15)."""
        m = jnp.array([d.mean for d in self.prior], jnp.float32)
        s = jnp.array([d.std for d in self.prior], jnp.float32)
        return m, s

    def theta_dict(self, theta: Array) -> Theta:
        return {n: theta[..., i] for i, n in enumerate(self.param_names)}

    # ---- simulation -------------------------------------------------------

    def simulate(self, key: Array, theta: Array, n_trials: int,
                 active: Array | None = None, chunk: int = 50) -> Array:
        """Simulate (B, n_trials, n_channels) observations for theta (B, P).

        ``active`` is an optional (B, n_trials) bool mask: padded trials are
        skipped by the simulator and must be masked downstream.
        """
        if self.custom_simulate is not None:
            data = self.custom_simulate(key, theta, n_trials, active)
            if active is not None:
                data = jnp.where(active[..., None], data, 0.0)
            return data
        k_trial, k_walk, k_obs = jax.random.split(key, 3)
        th = self.theta_dict(theta)
        trial = self.trial_fn(k_trial, th, n_trials)
        shape = (theta.shape[0], n_trials)
        if _use_pallas():
            from ..ops.ddm_pallas import first_passage_pallas
            seed = jax.random.bits(k_walk, dtype=jnp.uint32).astype(jnp.int32)
            # Sort datasets by expected decision time so slow-parameter
            # datasets share Pallas blocks: block-level early exit then
            # actually fires for the fast blocks (2-4x on prior-drawn
            # parameter batches where one slow dataset would otherwise
            # drag every block to the step cap).
            a0 = trial.boundary[:, :1]
            dc0 = trial.dc[:, :1]
            b0 = trial.beta[:, :1]
            proxy = (a0 * a0 * b0 * (1.0 - b0) / (dc0 * dc0))[:, 0]
            order = jnp.argsort(proxy)
            inv_order = jnp.argsort(order)
            gather = lambda x: x[order] if x.shape[0] == shape[0] else x
            fp = first_passage_pallas(
                seed, gather(trial.drift), gather(trial.boundary),
                gather(trial.beta), gather(trial.dc),
                shape=shape, dt=self.dt, max_steps=self.max_steps,
                active=gather(active) if active is not None else None)
            fp = type(fp)(steps=fp.steps[inv_order],
                          choice=fp.choice[inv_order],
                          frac=fp.frac[inv_order])
        else:
            fp = first_passage(
                k_walk, trial.drift, trial.boundary, trial.beta, trial.dc,
                shape=shape,
                dt=self.dt, max_steps=self.max_steps, chunk=chunk,
                active=active)
        t_dec = fp.decision_time(self.dt)
        data = self.obs_fn(k_obs, th, trial, t_dec, fp.choice)
        if active is not None:
            data = jnp.where(active[..., None], data, 0.0)
        return data


def sample_n_trials(key: Array, spec: ModelSpec, batch: int) -> Array:
    """Per-dataset random trial count N ~ U{n_min..n_max} (prior_N,
    basic_ddm_dc.py:50-52). Returned as (batch,) int32."""
    return jax.random.randint(key, (batch,), spec.n_min, spec.n_max + 1)


def trial_mask(n: Array, n_pad: int) -> Array:
    """(B,) trial counts -> (B, n_pad) bool activity mask."""
    idx = jnp.arange(n_pad, dtype=jnp.int32)[None, :]
    return idx < n[:, None]


def _n_buckets(spec: ModelSpec, batch: int, n_pad: int,
               n_buckets: int = 4) -> tuple[tuple[int, int, int, int], ...]:
    """Static (start, size, n_lo, n_hi) dataset groups for stratified-N
    simulation, or a single full-range group when bucketing won't pay.

    Simulating every dataset at n_pad = n_max wastes ~40% of kernel lanes
    on padding (E[N] = 180 vs 300 lanes for the reference's N ~ U{60..300},
    basic_ddm_dc.py:50-52). Packing active trials is 20x *slower* on TPU
    (per-element gathers, docs/DESIGN.md §9); instead the batch is split
    into fixed-size groups, each drawing N from one subrange of
    {n_min..n_max} and simulating at that subrange's max — static shapes,
    no gathers, ~86% active lanes. The marginal N distribution is the same
    near-uniform law for every dataset and identical between training and
    test batches, so amortized posteriors stay calibrated.
    """
    lo, hi = spec.n_min, min(spec.n_max, n_pad)
    if batch < 4 * n_buckets or hi - lo < 20 * n_buckets:
        return ((0, batch, lo, hi),)
    edges = [lo - 1 + round((hi - lo + 1) * (b + 1) / n_buckets)
             for b in range(n_buckets)]
    groups = []
    start = 0
    prev = lo - 1
    for b in range(n_buckets):
        size = (batch * (b + 1)) // n_buckets - (batch * b) // n_buckets
        groups.append((start, size, prev + 1, edges[b]))
        start += size
        prev = edges[b]
    return tuple(groups)


@functools.partial(jax.jit, static_argnames=("spec", "batch", "n_pad"))
def generate_training_batch(spec: ModelSpec, key: Array, batch: int,
                            n_pad: int | None = None):
    """One fused on-device draw of (theta, data, mask, log_n).

    Replaces the reference's CPU-side ``GenerativeModel`` + ``configurator``
    round trip (``basic_ddm_dc.py:130-160``): priors, trial counts, the EM
    walks, and the log-N conditioning vector are all produced inside one jit.
    Unlike the reference (one shared N per batch, recompile-hostile on TPU),
    every dataset gets its own N and padding is masked. Trial counts are
    drawn stratified over static dataset groups (see ``_n_buckets``) so
    each group simulates at its own smaller pad size.
    """
    if n_pad is None:
        n_pad = spec.n_max
    k_theta, k_n, k_sim = jax.random.split(key, 3)
    # theta is returned in RAW prior coordinates (the amortizer's native
    # space; identical to model coordinates unless the spec has a
    # prior_transform) — simulation uses the model coordinates.
    theta = spec.sample_prior_raw(k_theta, batch)
    theta_sim = spec.to_model_coords(theta)

    groups = _n_buckets(spec, batch, n_pad)
    ns, datas, masks = [], [], []
    for b, (start, size, n_lo, n_hi) in enumerate(groups):
        pad_b = min(n_hi, n_pad)
        n_b = jax.random.randint(jax.random.fold_in(k_n, b), (size,),
                                 n_lo, n_hi + 1)
        mask_b = trial_mask(n_b, pad_b)
        data_b = spec.simulate(jax.random.fold_in(k_sim, b),
                               theta_sim[start:start + size], pad_b,
                               active=mask_b)
        if pad_b < n_pad:
            grow = ((0, 0), (0, n_pad - pad_b))
            mask_b = jnp.pad(mask_b, grow)
            data_b = jnp.pad(data_b, grow + ((0, 0),))
        ns.append(n_b)
        masks.append(mask_b)
        datas.append(data_b)
    n = ns[0] if len(groups) == 1 else jnp.concatenate(ns)
    mask = masks[0] if len(groups) == 1 else jnp.concatenate(masks)
    data = datas[0] if len(groups) == 1 else jnp.concatenate(datas)
    log_n = jnp.log(n.astype(jnp.float32))[:, None]
    return theta, data, mask, log_n
