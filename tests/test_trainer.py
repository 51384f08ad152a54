"""Trainer tests on the virtual 8-device CPU mesh: sharded step, loss
decrease, checkpoint round-trip (SURVEY.md §4 items 3, 8; §5 checkpointing).
"""

import numpy as np
import pytest

from bayesflow_nddms_tpu.models import zoo
from bayesflow_nddms_tpu.parallel.mesh import make_mesh
from bayesflow_nddms_tpu.train.trainer import TrainConfig, Trainer


def _tiny_cfg(**kw):
    base = dict(batch_size=16, n_pad=64, steps=30, inner_steps=10,
                lr=1e-3, warmup=5, val_size=16, seed=1)
    base.update(kw)
    return TrainConfig(**base)


def test_sharded_training_decreases_loss():
    import jax
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    spec = zoo.get_model("basic_ddm_dc")
    trainer = Trainer(spec, _tiny_cfg(), mesh=make_mesh(8))
    state, hist = trainer.train()
    assert int(state.step) == 30
    assert hist["loss"][-1] < hist["loss"][0]
    assert np.isfinite(hist["val_loss"]).all()


def test_single_device_mesh_matches_interface():
    spec = zoo.get_model("basic_ddm_dc")
    trainer = Trainer(spec, _tiny_cfg(batch_size=8), mesh=make_mesh(1))
    state, hist = trainer.train()
    assert len(hist["loss"]) == 3


def test_checkpoint_roundtrip(tmp_path):
    import jax
    spec = zoo.get_model("basic_ddm_dc")
    cfg = _tiny_cfg(ckpt_dir=str(tmp_path / "ckpt"), ckpt_every=10)
    trainer = Trainer(spec, cfg, mesh=make_mesh(8))
    state, _ = trainer.train()
    # a fresh trainer must restore the saved step, not start from scratch
    trainer2 = Trainer(spec, cfg, mesh=make_mesh(8))
    restored = trainer2.maybe_restore(trainer2.init())
    assert int(restored.step) == 30
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1))
    # resuming a finished run performs no extra chunks
    state3, hist3 = trainer2.train()
    assert int(state3.step) == 30 and hist3["loss"] == []


def test_checkpoint_version_guard(tmp_path):
    """Stale checkpoints (no stamp / wrong version / wrong model) must
    fail loudly instead of silently producing garbage draws (VERDICT r4
    weak #4: round-1/2 raw-coordinate nets, pre-r4 prior-transform nets).
    """
    import json
    import os
    from bayesflow_nddms_tpu.train.trainer import (
        CheckpointCompatibilityError)
    spec = zoo.get_model("basic_ddm_dc")
    cfg = _tiny_cfg(ckpt_dir=str(tmp_path / "ckpt"), ckpt_every=10,
                    steps=10)
    trainer = Trainer(spec, cfg, mesh=make_mesh(8))
    trainer.train()
    meta_path = os.path.join(cfg.ckpt_dir, "meta.json")
    meta = json.load(open(meta_path))

    # unstamped dir (legacy checkpoint) refuses
    os.remove(meta_path)
    with pytest.raises(CheckpointCompatibilityError, match="meta.json"):
        trainer.maybe_restore(trainer.init())

    # wrong coordinate version refuses
    json.dump({**meta, "coord_version": 1}, open(meta_path, "w"))
    with pytest.raises(CheckpointCompatibilityError, match="coord_version"):
        trainer.maybe_restore(trainer.init())

    # wrong model refuses
    json.dump({**meta, "model": "basic_ddm"}, open(meta_path, "w"))
    with pytest.raises(CheckpointCompatibilityError, match="basic_ddm"):
        trainer.maybe_restore(trainer.init())

    # correct stamp restores
    json.dump(meta, open(meta_path, "w"))
    assert int(trainer.maybe_restore(trainer.init()).step) == 10


def test_replay_training_decreases_loss():
    """Experience-replay path (TrainConfig.replay_slots > 0): sharded ring
    buffers train end-to-end on the mesh (train_experience_replay parity,
    basic_ddm_dc.py:199-202)."""
    spec = zoo.get_model("basic_ddm_dc")
    trainer = Trainer(spec, _tiny_cfg(replay_slots=4), mesh=make_mesh(8))
    state, hist = trainer.train()
    assert int(state.step) == 30
    assert hist["loss"][-1] < hist["loss"][0]
    assert np.isfinite(hist["loss"]).all()


def test_batch_size_divisibility_guard():
    spec = zoo.get_model("basic_ddm_dc")
    with pytest.raises(ValueError):
        Trainer(spec, _tiny_cfg(batch_size=12), mesh=make_mesh(8))
