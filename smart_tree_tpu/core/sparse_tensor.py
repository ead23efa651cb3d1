"""SparseVoxelTensor: the static-shape TPU analogue of spconv's
SparseConvTensor (reference: smart_tree/model/sparse.py:9-19).

Rows are padded to a static capacity. Instead of carrying raw [N,4] indices
we carry *sorted* packed uint32 keys plus features permuted into key order —
so every conv layer can do rulebook lookups with a single vectorized binary
search and no re-sorting. `active` marks live rows; padded rows hold
INVALID_KEY and zero features (so gathers of padding contribute zeros).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .coords import INVALID_KEY, pack_coords, sort_keys, unpack_keys


@struct.dataclass
class SparseVoxelTensor:
    """Sorted sparse voxel buffer.

    keys:    [N] uint32 packed (b,x,y,z), ascending, INVALID_KEY padding
    feats:   [N, C] float features (zero rows at padding)
    active:  [N] bool
    spatial_shape: static (X, Y, Z)
    batch_size:    static int
    """

    keys: jax.Array
    feats: jax.Array
    active: jax.Array
    spatial_shape: Tuple[int, int, int] = struct.field(pytree_node=False)
    batch_size: int = struct.field(pytree_node=False)

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    @property
    def num_features(self) -> int:
        return self.feats.shape[1]

    def coords(self) -> jax.Array:
        """int32 [N,4] (b,x,y,z); padding rows are garbage — mask by active."""
        return unpack_keys(self.keys, self.spatial_shape, self.batch_size)

    def n_active(self) -> jax.Array:
        return jnp.sum(self.active.astype(jnp.int32))

    def replace_feats(self, feats: jax.Array) -> "SparseVoxelTensor":
        return self.replace(feats=feats)

    @staticmethod
    def from_coords(
        coords: jax.Array,
        feats: jax.Array,
        spatial_shape: Sequence[int],
        batch_size: int,
        valid: jax.Array | None = None,
    ) -> "SparseVoxelTensor":
        """Build from unsorted int32 coords [N,4] + feats [N,C].

        Rows with out-of-range coords (or valid=False) become padding. Assumes
        coords are already unique per voxel (the voxelizer guarantees it).
        """
        keys = pack_coords(coords, spatial_shape, batch_size, valid=valid)
        skeys, order = sort_keys(keys)
        active = skeys != INVALID_KEY
        f = feats[order]
        f = jnp.where(active[:, None], f, 0)
        return SparseVoxelTensor(
            keys=skeys,
            feats=f,
            active=active,
            spatial_shape=tuple(int(s) for s in spatial_shape),
            batch_size=int(batch_size),
        )
