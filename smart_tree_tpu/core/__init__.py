from .coords import INVALID_KEY, lookup, pack_coords, sort_keys, unique_keys, unpack_keys
from .rulebook import (
    downsample_coords,
    inverse_rulebook,
    kernel_offsets,
    strided_rulebook,
    subm_rulebook,
)
from .sparse_ops import gather_conv, linear
from .sparse_tensor import SparseVoxelTensor
from .voxelize import voxelize, voxel_downsample_indices
