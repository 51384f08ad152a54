"""Device-mesh utilities: the TPU-native replacement for the reference's
single-GPU SLURM setup (``bayesflow_nddms.sh:2-6``) and pyjags chain threads
(``basic_ddm_dc_pyjags.py:203``).

The workload is data-parallel over simulated datasets (SURVEY.md §2.8):
a 1-D mesh over all chips, batch sharded on axis ``data``, parameters
replicated, gradients synced with one ``psum`` compiled onto ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (dataset) axis across the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
