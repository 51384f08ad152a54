"""Driver-contract and config-system tests: entry() compiles single-chip,
dryrun_multichip exercises the sharded train step on the fake mesh, and
RunConfig round-trips JSON."""

import sys

import jax
import numpy as np


def test_graft_entry_single_chip():
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import entry
    fn, args = entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))


def test_graft_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)   # asserts internally


def test_runconfig_roundtrip(tmp_path):
    from bayesflow_nddms_tpu.train.trainer import TrainConfig
    from bayesflow_nddms_tpu.utils.config import RunConfig
    cfg = RunConfig(model="single_trial_alpha_not_scaled",
                    train=TrainConfig(steps=123, batch_size=64),
                    num_test=7)
    path = tmp_path / "run.json"
    cfg.save(str(path))
    back = RunConfig.load(str(path))
    assert back == cfg
    assert back.spec.name == "single_trial_alpha_not_scaled"
    assert back.default_ckpt_dir().endswith("single_trial_alpha_not_scaled")


def test_runconfig_rejects_unknown_model():
    import pytest
    from bayesflow_nddms_tpu.utils.config import RunConfig
    with pytest.raises(ValueError):
        RunConfig(model="not_a_model")
