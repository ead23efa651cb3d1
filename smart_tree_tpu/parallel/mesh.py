"""Device mesh helpers.

The reference has no distributed layer at all (SURVEY.md §2.3); on TPU the
parallelism story is: data-parallel training over an ICI 'dp' mesh axis
(per-device voxel buffers, psum'd grads and BN stats) and embarrassingly
block-parallel inference (blocks sharded across the same axis). Both paths
shard with shard_map over the mesh built here; XLA rides ICI for the
collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))
