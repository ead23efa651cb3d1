"""Point -> voxel quantization with static capacity.

TPU-native replacement for spconv's `PointToVoxel` (used at reference
smart_tree/dataset/dataset.py:106-120 and 199-211 with
max_num_points_per_voxel=1, i.e. pure dedup keeping one point per voxel) and
for `sparse_quantize` (smart_tree/model/sparse.py:79-103).

Everything is jit-friendly: fixed `capacity` output rows, masking instead of
boolean indexing. Which point survives per voxel matches the reference's
np.unique(return_index) semantics: the lowest original row index.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from .coords import INVALID_KEY, pack_coords, unique_keys


class VoxelizeResult(NamedTuple):
    coords: jax.Array     # [capacity, 4] int32 (b,x,y,z); padding rows = -1
    feats: jax.Array      # [capacity, C] features of the surviving point
    point_idx: jax.Array  # [capacity] int32 original point row (N at padding)
    valid: jax.Array      # [capacity] bool
    inverse: jax.Array    # [N] int32 voxel id per point (-1 where invalid)
    count: jax.Array      # scalar int32 number of occupied voxels


def voxelize(
    xyz: jax.Array,
    feats: jax.Array,
    voxel_size: float,
    origin: jax.Array,
    spatial_shape: Sequence[int],
    capacity: int,
    batch_idx: jax.Array | None = None,
    batch_size: int = 1,
    valid: jax.Array | None = None,
) -> VoxelizeResult:
    """Quantize points to voxels, keeping one point per voxel.

    xyz:    [N,3] float points
    feats:  [N,C] per-point features to carry through
    origin: [3] float grid origin (voxel (0,0,0) corner); typically min(xyz)
            per the reference's coors_range_xyz = [min, max].
    spatial_shape: static (X,Y,Z) voxel extent of the grid
    capacity: static number of output voxel rows
    batch_idx: optional [N] int32 batch id per point
    """
    n = xyz.shape[0]
    g = jnp.floor((xyz - origin[None, :]) / voxel_size).astype(jnp.int32)
    if batch_idx is None:
        b = jnp.zeros((n,), jnp.int32)
    else:
        b = batch_idx.astype(jnp.int32)
    coords = jnp.concatenate([b[:, None], g], axis=1)
    keys = pack_coords(coords, spatial_shape, batch_size, valid=valid)
    ukeys, first_idx, inverse, count = unique_keys(keys, capacity)

    vvalid = ukeys != INVALID_KEY
    safe_idx = jnp.clip(first_idx, 0, n - 1)
    out_feats = jnp.where(vvalid[:, None], feats[safe_idx], 0)
    from .coords import unpack_keys  # local import to avoid cycle at module load

    out_coords = jnp.where(
        vvalid[:, None], unpack_keys(ukeys, spatial_shape, batch_size), -1
    )
    return VoxelizeResult(
        coords=out_coords,
        feats=out_feats,
        point_idx=first_idx,
        valid=vvalid,
        inverse=inverse,
        count=count,
    )


def voxel_downsample_indices(
    xyz: jax.Array,
    voxel_size: float,
    capacity: int,
    valid: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Indices of one representative point per voxel (lowest original row).

    Mirrors reference util/misc.py:61-79 `voxel_downsample` semantics (floor
    division by voxel size, first point per occupied voxel).

    Returns (point_idx [capacity], valid [capacity], count, n_out_of_grid).

    The grid is statically 1024^3 (extent can't be derived at trace time);
    points beyond it are NOT silently merged — they are counted in
    `n_out_of_grid` so callers can detect and fail/re-tile (mirrors the
    inference overflow raise, infer/inference.py:205-210).
    """
    mn = jnp.min(jnp.where((valid[:, None] if valid is not None else True), xyz, jnp.inf), axis=0)
    g = jnp.floor((xyz - mn[None, :]) / voxel_size).astype(jnp.int32)
    vmask = valid if valid is not None else jnp.ones((xyz.shape[0],), bool)
    oob = jnp.sum((jnp.any(g > 1023, axis=1) | jnp.any(g < 0, axis=1)) & vmask)
    g = jnp.clip(g, 0, 1023)
    coords = jnp.concatenate([jnp.zeros((xyz.shape[0], 1), jnp.int32), g], axis=1)
    keys = pack_coords(coords, (1024, 1024, 1024), 1, valid=valid)
    # 1024^3 needs 30 bits: fits.
    ukeys, first_idx, _, count = unique_keys(keys, capacity)
    return first_idx, ukeys != INVALID_KEY, count, oob
