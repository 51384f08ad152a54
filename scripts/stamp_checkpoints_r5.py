"""One-time checkpoint hygiene pass (VERDICT r4 item 5).

Stamps every known-good ``trained/`` dir with the coordinate-convention
``meta.json`` that ``Trainer.save`` now writes, and quarantines the
known-incompatible dirs into ``trained/_incompatible/`` so
``Trainer.maybe_restore`` can never silently load one:

  * round-1 plain dirs (``basic_ddm_dc``, ``single_trial_alpha_not_scaled``
    — 25k raw-coordinate nets),
  * superseded mid-round-3 iterations (``*_100k_r3``, ``*_100k_r3b`` —
    the good 100k checkpoints are the ``*_r3c`` dirs, CLAUDE.md).

Everything else on disk (``*_r3c``, the r3 zoo dirs revalidated by the
round-4 ``*_r4c`` re-emits, all ``*_r4``/``*_r5`` dirs) was trained under
coordinate convention 3 semantics (raw-prior == logit identity for specs
without prior_transform) and gets stamped version 3 with its model name.

Usage: PYTHONPATH=/root/repo python scripts/stamp_checkpoints_r5.py
"""
from __future__ import annotations

import json
import os
import re
import shutil

import jax

jax.config.update("jax_platforms", "cpu")

from bayesflow_nddms_tpu.models import zoo
from bayesflow_nddms_tpu.train.trainer import CKPT_COORD_VERSION

TRAINED = os.path.join(os.path.dirname(__file__), "..", "trained")

INCOMPATIBLE = {
    "basic_ddm_dc",                          # round-1 raw coords
    "single_trial_alpha_not_scaled",         # round-1 raw coords
    "basic_ddm_dc_100k_r3b",                 # superseded by _100k_r3c
    "single_trial_alpha_not_scaled_100k_r3", # superseded by _100k_r3c
}


def model_of(dirname: str) -> str | None:
    """Longest registered model name that prefixes the dir name."""
    best = None
    for m in zoo.list_models():
        if dirname == m or dirname.startswith(m + "_"):
            if best is None or len(m) > len(best):
                best = m
    return best


def main() -> None:
    qdir = os.path.join(TRAINED, "_incompatible")
    for d in sorted(os.listdir(TRAINED)):
        path = os.path.join(TRAINED, d)
        if not os.path.isdir(path) or d.startswith("_"):
            continue
        if d in INCOMPATIBLE:
            os.makedirs(qdir, exist_ok=True)
            shutil.move(path, os.path.join(qdir, d))
            print(f"quarantined  {d}")
            continue
        model = model_of(d)
        if model is None:
            print(f"SKIP (no registered model matches)  {d}")
            continue
        meta = {"coord_version": CKPT_COORD_VERSION, "model": model,
                "param_names": list(zoo.get_model(model).param_names),
                "stamped_retroactively": "scripts/stamp_checkpoints_r5.py"}
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
        print(f"stamped v{CKPT_COORD_VERSION}  {d}  ({model})")


if __name__ == "__main__":
    main()
