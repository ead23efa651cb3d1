"""Multi-chip block-parallel inference.

The reference scales to large clouds by spatial block tiling with halos
(SingleTreeInference — SURVEY.md §5 'long-context analog'). Blocks are
embarrassingly parallel, so the multi-chip mapping is: stack per-device
block sub-batches on a leading mesh axis and shard_map the jitted
voxelize+plan+UNet forward — every chip runs its own blocks, no collectives
in the forward at all (ICI is only touched if the caller gathers outputs).
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.plan import build_plan
from ..core.sparse_tensor import SparseVoxelTensor


def make_sharded_forward(
    model,
    variables,
    spatial_shape: Tuple[int, int, int],
    device_batch: int,
    mesh: Mesh,
    axis: str = "dp",
    precision: str = "float32",
):
    """Returns fn(coords [D,cap,4], feats [D,cap,C], valid [D,cap]) ->
    (preds dict [D,cap,...], sorted_feats [D,cap,C], active [D,cap])."""
    levels = len(model.unet_planes)

    def per_shard(coords, feats, valid):
        coords, feats, valid = coords[0], feats[0], valid[0]
        with jax.default_matmul_precision(precision):
            x = SparseVoxelTensor.from_coords(
                coords, feats, spatial_shape, device_batch, valid=valid
            )
            plan = build_plan(x, levels)
            preds = model.apply(variables, plan, x.feats[:, :3], train=False)
        return (
            jax.tree.map(lambda a: a[None], preds),
            x.feats[None],
            x.active[None],
        )

    sharded = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    return jax.jit(sharded)


def stack_device_batches(batches, n_dev: int):
    """Group VoxelBatches into [n_dev, ...] stacks (pad by repeating the
    last batch; its outputs are discarded via the returned mask)."""
    groups = []
    for start in range(0, len(batches), n_dev):
        chunk = list(batches[start : start + n_dev])
        real = len(chunk)
        while len(chunk) < n_dev:
            chunk.append(chunk[-1])
        coords = np.stack([b.coords for b in chunk])
        feats = np.stack([b.feats for b in chunk])
        valid = np.stack([b.valid for b in chunk])
        mask = np.stack([b.mask for b in chunk])
        keep = np.arange(n_dev) < real
        groups.append((coords, feats, valid, mask, keep))
    return groups
