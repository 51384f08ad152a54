"""Fused on-device training loop for amortized posterior estimation.

TPU-native replacement for ``bf.trainers.Trainer`` +
``train_experience_replay`` (``basic_ddm_dc.py:172-202``). Key differences,
all deliberate (SURVEY.md §3.1):

  * the simulator runs INSIDE the jitted train step — no CPU(numba) -> GPU
    ping-pong per iteration;
  * data parallelism via ``shard_map`` over a 1-D chip mesh with a single
    ``pmean`` gradient sync on ICI (the reference is single-device);
  * many steps are fused into one dispatch with ``lax.scan`` so host
    latency never gates the chip;
  * optional on-device experience-replay ring buffer mirrors the
    reference's replay semantics (``train/replay.py``).

Checkpointing uses orbax (params, opt state, step, RNG key), replacing the
TF checkpoint + memory.pkl pair (``basic_ddm_dc.py:169-181``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
shard_map = jax.shard_map

from ..models.spec import ModelSpec, generate_training_batch
from ..nets.amortizer import AmortizedPosterior, build_amortizer
from ..parallel.mesh import DATA_AXIS, make_mesh

Array = jax.Array

# Coordinate-convention version stamped into checkpoint dirs.
#   1: raw model coordinates (rounds 1-2)
#   2: logit coordinates for bounded marginals + per-dataset min-rt ter
#      bound (round 3)
#   3: amortization in RAW prior coordinates for prior_transform specs +
#      the min-rt bound applied to any ndt name incl. 'tau' (round 4).
#      Identical to 2 for specs without prior_transform/tau, so round-3
#      checkpoints of such specs are stamped 3 retroactively.
CKPT_COORD_VERSION = 3


class CheckpointCompatibilityError(RuntimeError):
    """A checkpoint's coordinate convention does not match current code."""


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters.

    Reference budget: 500 epochs x 1000 iters x batch 32 ~ 1.6e7 datasets
    (``basic_ddm_dc.py:199-202``). On TPU we default to larger batches and
    a cosine schedule; ``steps * batch_size`` is the dataset budget.
    """

    batch_size: int = 256          # global (across the mesh)
    n_pad: int = 300               # padded trial buffer (n_max of the spec)
    steps: int = 30_000
    inner_steps: int = 100         # steps fused per dispatch
    lr: float = 5e-4
    warmup: int = 1_000
    val_size: int = 256
    seed: int = 0
    ckpt_dir: Optional[str] = None
    ckpt_every: int = 5_000
    # Experience replay (train_experience_replay parity,
    # basic_ddm_dc.py:199-202): 0 = pure online (fresh simulations every
    # step, the TPU-native default — simulation is fused and nearly free).
    # > 0 = per-device ring buffer of that many stored batches; each step
    # simulates one fresh batch, writes it, and trains on a uniformly
    # random stored batch (BayesFlow's replay semantics). The buffer is
    # NOT checkpointed (unlike the reference's memory.pkl): its contents
    # are synthetic draws from the same prior, so a restore simply
    # re-primes it with fresh simulations.
    replay_slots: int = 0


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class State:
    params: Any
    opt_state: Any
    step: Array

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


class Trainer:
    """Simulation-based trainer for one ModelSpec on a device mesh."""

    def __init__(self, spec: ModelSpec, config: TrainConfig = TrainConfig(),
                 mesh: Optional[Mesh] = None,
                 amortizer: Optional[AmortizedPosterior] = None):
        self.spec = spec
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_dev = self.mesh.devices.size
        if config.batch_size % self.n_dev:
            raise ValueError(
                f"batch_size {config.batch_size} not divisible by "
                f"{self.n_dev} devices")
        self.local_batch = config.batch_size // self.n_dev
        self.inner_steps = max(1, min(config.inner_steps, config.steps))
        self.amortizer = amortizer if amortizer is not None \
            else build_amortizer(spec)
        warmup = min(config.warmup, max(config.steps // 10, 1))
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, config.lr, warmup, max(config.steps, warmup + 1))
        self.tx = optax.chain(optax.clip_by_global_norm(5.0),
                              optax.adam(schedule))
        self.base_key = jax.random.PRNGKey(config.seed)
        self._build_steps()

    # ------------------------------------------------------------------ #

    def init(self) -> State:
        k = jax.random.fold_in(self.base_key, 0xFEED)
        theta, data, mask, log_n = generate_training_batch(
            self.spec, k, 2, self.config.n_pad)
        params = self.amortizer.init(k, theta, data, mask, log_n)
        opt_state = self.tx.init(params)
        state = State(params, opt_state, jnp.zeros((), jnp.int32))
        # replicate across the mesh
        rep = jax.sharding.NamedSharding(self.mesh, P())
        return jax.device_put(state, rep)

    def _loss_fn(self, params, key):
        theta, data, mask, log_n = generate_training_batch(
            self.spec, key, self.local_batch, self.config.n_pad)
        return self.amortizer.apply(params, theta, data, mask, log_n)

    def _batch_loss_fn(self, params, batch):
        theta, data, mask, log_n = batch
        return self.amortizer.apply(params, theta, data, mask, log_n)

    # ---- experience replay (config.replay_slots > 0) ------------------- #

    def init_replay(self):
        """Per-device ring buffers, leading mesh axis (n_dev, slots, ...)."""
        from . import replay
        k = jax.random.fold_in(self.base_key, 0xB0FF)
        batch = generate_training_batch(self.spec, k, self.local_batch,
                                        self.config.n_pad)
        buf = replay.init_buffer(self.config.replay_slots, batch)
        stacked = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (self.n_dev,) + x.shape),
            buf)
        shard = jax.sharding.NamedSharding(self.mesh, P(DATA_AXIS))
        return jax.device_put(stacked, shard)

    def _replay_specs(self):
        from .replay import ReplayBuffer
        sharded = ReplayBuffer(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                               P(DATA_AXIS), P(DATA_AXIS))
        return sharded

    def _build_steps(self):
        from . import replay
        spec_p, rep = P(), P()
        use_replay = self.config.replay_slots > 0

        def one_step(carry, _):
            state, buf = carry
            dev = lax.axis_index(DATA_AXIS)
            key = jax.random.fold_in(
                jax.random.fold_in(self.base_key, state.step), dev)
            if use_replay:
                # BayesFlow train_experience_replay semantics
                # (basic_ddm_dc.py:199-202): simulate fresh, store, train
                # on a random stored batch.
                k_sim, k_read = jax.random.split(key)
                fresh = generate_training_batch(
                    self.spec, k_sim, self.local_batch, self.config.n_pad)
                buf = replay.write(buf, fresh)
                batch = replay.read(buf, k_read)
            else:
                batch = generate_training_batch(
                    self.spec, key, self.local_batch, self.config.n_pad)
            loss, grads = jax.value_and_grad(self._batch_loss_fn)(
                state.params, batch)
            grads = lax.pmean(grads, DATA_AXIS)
            loss = lax.pmean(loss, DATA_AXIS)
            updates, opt_state = self.tx.update(grads, state.opt_state)
            params = optax.apply_updates(state.params, updates)
            return (State(params, opt_state, state.step + 1), buf), loss

        if use_replay:
            def chunk(state: State, buf):
                buf = jax.tree.map(lambda x: x[0], buf)  # drop device axis
                (state, buf), losses = lax.scan(
                    one_step, (state, buf), None, length=self.inner_steps)
                buf = jax.tree.map(lambda x: x[None], buf)
                return state, buf, losses

            bspec = self._replay_specs()
            self._chunk_replay = jax.jit(shard_map(
                chunk, mesh=self.mesh, in_specs=(spec_p, bspec),
                out_specs=(rep, bspec, rep), check_vma=False))
            self._chunk = None
        else:
            def chunk(state: State):
                (state, _), losses = lax.scan(
                    one_step, (state, None), None, length=self.inner_steps)
                return state, losses

            self._chunk = jax.jit(shard_map(
                chunk, mesh=self.mesh, in_specs=(spec_p,),
                out_specs=(rep, rep), check_vma=False))
            self._chunk_replay = None

        def val_loss(params, key):
            dev = lax.axis_index(DATA_AXIS)
            k = jax.random.fold_in(key, dev)
            n_local = max(self.config.val_size // self.n_dev, 1)
            theta, data, mask, log_n = generate_training_batch(
                self.spec, k, n_local, self.config.n_pad)
            return lax.pmean(
                self.amortizer.apply(params, theta, data, mask, log_n),
                DATA_AXIS)

        self._val = jax.jit(shard_map(
            val_loss, mesh=self.mesh, in_specs=(spec_p, spec_p),
            out_specs=rep, check_vma=False))

    # ------------------------------------------------------------------ #

    def train(self, state: Optional[State] = None,
              log_fn: Callable[[dict], None] = None) -> tuple[State, dict]:
        """Run the full budget; returns final state and a history dict."""
        cfg = self.config
        if state is None:
            state = self.init()
        if cfg.ckpt_dir is not None:
            state = self.maybe_restore(state)
        history = {"step": [], "loss": [], "val_loss": [], "sec": []}
        n_chunks = -(-cfg.steps // self.inner_steps)
        t_start = time.time()
        start_step = int(state.step)
        buf = self.init_replay() if cfg.replay_slots > 0 else None
        for c in range(start_step // self.inner_steps, n_chunks):
            if buf is not None:
                state, buf, losses = self._chunk_replay(state, buf)
            else:
                state, losses = self._chunk(state)
            step = int(state.step)
            vl = float(self._val(state.params,
                                 jax.random.fold_in(self.base_key,
                                                    step + 0x5A5A5A)))
            rec = {"step": step, "loss": float(losses[-1]),
                   "val_loss": vl, "sec": time.time() - t_start}
            for k, v in rec.items():
                history[k].append(v)
            if log_fn:
                log_fn(rec)
            if cfg.ckpt_dir is not None and (
                    step % cfg.ckpt_every == 0 or c == n_chunks - 1):
                self.save(state)
        return state, history

    # ------------------------------------------------------------------ #
    # checkpointing (orbax) — replaces TF ckpt + memory.pkl
    # (basic_ddm_dc.py:169-181, :18-20)

    def _ckptr(self):
        import orbax.checkpoint as ocp
        return ocp.PyTreeCheckpointer()

    def save(self, state: State):
        import json
        import os
        path = os.path.abspath(self.config.ckpt_dir)
        os.makedirs(path, exist_ok=True)
        self._ckptr().save(
            f"{path}/step_{int(state.step)}",
            jax.tree.map(np.asarray, state), force=True)
        with open(f"{path}/meta.json", "w") as f:
            json.dump({"coord_version": CKPT_COORD_VERSION,
                       "model": self.spec.name,
                       "param_names": list(self.spec.param_names)}, f)

    def maybe_restore(self, state: State) -> State:
        """Restore the newest checkpoint if one exists (the reference's
        'Networks loaded from checkpoint/ckpt-1000' behavior,
        basic_ddm_dc.py:169-181). Refuses checkpoints written under a
        different coordinate convention: restoring a raw-coordinate
        (pre-round-3) or pre-raw-prior-amortization (pre-round-4) net
        into current code silently produces garbage draws, so a missing
        or mismatched version stamp raises instead of guessing."""
        import json
        import os
        path = self.config.ckpt_dir
        if path is None or not os.path.isdir(path):
            return state
        steps = sorted(int(d.split("_")[1]) for d in os.listdir(path)
                       if d.startswith("step_"))
        if not steps:
            return state
        meta_path = os.path.join(path, "meta.json")
        if not os.path.isfile(meta_path):
            raise CheckpointCompatibilityError(
                f"{path} has checkpoints but no meta.json version stamp. "
                f"Checkpoints from before the coordinate-convention stamps "
                f"(round-1/round-2 raw coordinates, pre-round-4 "
                f"prior-transform or tau-ndt nets) are incompatible with "
                f"current code; stamp known-good dirs with "
                f"scripts/stamp_checkpoints_r5.py or retrain.")
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("coord_version") != CKPT_COORD_VERSION:
            raise CheckpointCompatibilityError(
                f"{path}: coord_version {meta.get('coord_version')} != "
                f"current {CKPT_COORD_VERSION}; retrain or quarantine.")
        if meta.get("model") not in (None, self.spec.name):
            raise CheckpointCompatibilityError(
                f"{path} was trained for model {meta.get('model')!r}, "
                f"not {self.spec.name!r}.")
        target = jax.tree.map(np.asarray, state)
        restored = self._ckptr().restore(
            os.path.abspath(f"{path}/step_{steps[-1]}"), item=target)
        rep = jax.sharding.NamedSharding(self.mesh, P())
        return jax.device_put(jax.tree.map(jnp.asarray, restored), rep)

    # ------------------------------------------------------------------ #

    def sample(self, state: State, key: Array, data: Array, mask: Array,
               log_n: Array, n_samples: int) -> Array:
        """Amortized posterior draws in MODEL coordinates (bf
        ``amortizer.sample`` parity; the amortizer itself works in raw
        prior coordinates, identical unless the spec has a
        ``prior_transform``)."""
        draws = self.amortizer.apply(state.params, key, data, mask, log_n,
                                     n_samples, method="sample")
        return self.spec.to_model_coords(draws)
