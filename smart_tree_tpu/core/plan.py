"""UNet sparse plan: all rulebooks for one input sparsity pattern.

spconv caches indice pairs per `indice_key` so Encode/Decode share pairings
(reference model_blocks.py:57-101). Here the analogous object is a
`UNetPlan` built once per batch from the input coordinates — every level's
subm rulebook, downsample table, strided rulebook, and inverse rulebook —
after which the network forward is pure gather+GEMM with zero coordinate
work. Plans are jit-friendly pytrees with static capacities.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .coords import INVALID_KEY
from .rulebook import (
    downsample_with_rulebook,
    inverse_from_strided,
    subm_rulebook,
    subm_rulebook9,
)
from .sparse_tensor import SparseVoxelTensor


@struct.dataclass
class LevelPlan:
    keys: jax.Array        # [N_l] sorted voxel keys of this level
    active: jax.Array      # [N_l] bool
    subm_rb: jax.Array     # SubmRB9 (default) or [N_l, 27] full rulebook
    down_rb: jax.Array | None   # [N_{l+1}, 27] strided conv gather (into next)
    up_rb: jax.Array | None     # [N_l, 27] inverse conv gather (from next)
    count: jax.Array       # scalar int32 active voxels (overflow check)
    spatial_shape: Tuple[int, int, int] = struct.field(pytree_node=False)


@struct.dataclass
class UNetPlan:
    levels: Tuple[LevelPlan, ...]
    batch_size: int = struct.field(pytree_node=False)


def build_plan(
    x: SparseVoxelTensor,
    num_levels: int,
    level_capacity_factor: float = 1.0,
    min_capacity: int = 256,
    subm_mode: str = "full",
    level_capacities: Tuple[int, ...] | None = None,
) -> UNetPlan:
    """Build rulebooks for `num_levels` UNet levels (len(unet_planes)).

    level_capacity_factor sizes each level's buffer relative to the previous
    one. IMPORTANT: a stride-2 sparse conv can have MORE output voxels than
    inputs (each input touches up to 8 coarse cells and sparse data may not
    dedup them — observed ~3x expansion on sparse scans), so no fixed factor
    is universally safe; every LevelPlan carries the TRUE dedup `count`
    (which exceeds the buffer size on overflow) so callers can detect it and
    rebuild with `level_capacities` — explicit per-level buffer sizes
    (levels 1..), taking precedence over the factor (the counts-driven retry
    in infer/inference.py).

    subm_mode: "full" (default — [N,27] lookup rulebook; its plain gather +
    one GEMM measured ~4x faster than the z9 window path on real v5e, where
    the z9 routing einsum lowers poorly — docs/PERF.md round 3) or "z9"
    (compact z-window rulebook, 8 searchsorteds + 9 wide gathers per
    level; numerically identical, kept for narrower-HBM configurations)."""
    levels: List[LevelPlan] = []
    keys = x.keys
    shape = x.spatial_shape
    batch = x.batch_size
    cap = x.capacity
    # True voxel count of the current level. For level 0 that is the number
    # of active input keys; deeper levels use downsample_coords' dedup count,
    # which (unlike sum(active) over the TRUNCATED key table) still exceeds
    # capacity when the buffer overflowed — sum(active) saturates at cap and
    # made overflow invisible to the counts>caps check (round-3 fix).
    true_count = None
    for lvl in range(num_levels):
        active = keys != INVALID_KEY
        count = (
            jnp.sum(active.astype(jnp.int32)) if true_count is None else true_count
        )
        if subm_mode == "z9":
            srb = subm_rulebook9(keys, shape, batch)
        else:
            srb = subm_rulebook(keys, shape, batch, 3)
        if lvl < num_levels - 1:
            if level_capacities is not None:
                next_cap = int(level_capacities[lvl + 1])
            else:
                next_cap = max(int(cap * level_capacity_factor), min_capacity)
            # one candidate sweep yields the coarse key table AND the
            # strided pairing; the inverse pairing is its transpose — no
            # sorted lookups at all for the level transition
            out_keys, out_shape, out_count, drb = downsample_with_rulebook(
                keys, shape, batch, next_cap
            )
            urb = inverse_from_strided(drb, keys.shape[0])
            levels.append(
                LevelPlan(
                    keys=keys,
                    active=active,
                    subm_rb=srb,
                    down_rb=drb,
                    up_rb=urb,
                    count=count,
                    spatial_shape=shape,
                )
            )
            keys, shape, cap = out_keys, out_shape, next_cap
            true_count = out_count
        else:
            levels.append(
                LevelPlan(
                    keys=keys,
                    active=active,
                    subm_rb=srb,
                    down_rb=None,
                    up_rb=None,
                    count=count,
                    spatial_shape=shape,
                )
            )
    return UNetPlan(levels=tuple(levels), batch_size=batch)
