"""Multi-chip block-parallel inference.

The reference scales to large clouds by spatial block tiling with halos
(SingleTreeInference — SURVEY.md §5 'long-context analog'). Blocks are
embarrassingly parallel, so the multi-chip mapping is: stack per-device
block sub-batches on a leading mesh axis and shard_map the jitted
voxelize+plan+UNet forward — every chip runs its own blocks, no collectives
in the forward at all (ICI is only touched if the caller gathers outputs).

The per-shard body is the same transfer-minimal formulation as the
single-device path (infer/inference.py): upload coords + xyz only, return
the sort permutation (the host applies it to its own arrays) plus per-level
occupancy counts for overflow detection.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.coords import INVALID_KEY, pack_coords
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
    level_capacity_factor: float = 1.0,
    voxel_size: float = 0.01,
):
    """Returns fn(coords16 [D,cap,4] i16, res16 [D,cap,3] f16,
    valid [D,cap], origins [D,items,3] f32) ->
    (preds dict [D,cap,...], order [D,cap] int32, active [D,cap],
     counts [D,levels], caps [D,levels])."""
    levels = len(model.unet_planes)
    feature_mode = "local" if model.input_channels == 4 else "xyz"

    def per_shard(coords16, res16, valid, origins):
        coords16, res16 = coords16[0], res16[0]
        valid, origins = valid[0], origins[0]
        with jax.default_matmul_precision(precision):
            from .dp import make_features

            coords, fv = make_features(
                coords16, res16, origins, voxel_size, feature_mode
            )
            keys = pack_coords(coords, spatial_shape, device_batch, valid=valid)
            order = jnp.argsort(keys, stable=True)
            skeys = keys[order]
            active = skeys != INVALID_KEY
            feats = jnp.where(active[:, None], fv[order], 0)
            x = SparseVoxelTensor(
                keys=skeys, feats=feats, active=active,
                spatial_shape=spatial_shape, batch_size=device_batch,
            )
            plan = build_plan(x, levels, level_capacity_factor=level_capacity_factor)
            preds = model.apply(variables, plan, x.feats, train=False)
            counts = jnp.stack([lv.count for lv in plan.levels])
            caps = jnp.asarray([lv.keys.shape[0] for lv in plan.levels])
        from ..infer.inference import compress_preds

        return (
            jax.tree.map(lambda a: a[None], compress_preds(preds)),
            order[None].astype(jnp.int32),
            active[None],
            counts[None],
            caps[None],
        )

    sharded = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    return jax.jit(sharded)


def stack_device_batches(batches, n_dev: int):
    """Group VoxelBatches into [n_dev, ...] stacks (pad by repeating the
    last batch; padded rows are dropped via the returned keep mask).
    All batches in `batches` must share one (capacity, spatial, batch)."""
    groups = []
    for start in range(0, len(batches), n_dev):
        chunk = list(batches[start : start + n_dev])
        real = len(chunk)
        while len(chunk) < n_dev:
            chunk.append(chunk[-1])
        comp = [b.compressed_xyz_upload() for b in chunk]
        coords16 = np.stack([c[0] for c in comp])
        res16 = np.stack([c[1] for c in comp])
        origins = np.stack([c[2] for c in comp])
        valid = np.stack([b.valid for b in chunk])
        keep = np.arange(n_dev) < real
        groups.append((chunk, coords16, res16, valid, origins, keep))
    return groups
