"""Coordinate keys for sparse voxel tensors.

TPU-first replacement for spconv's hash-table voxel indexing (reference:
smart_tree/model/sparse.py:64-103 `ravel_hash`/`sparse_quantize`). Instead of
a hash table we keep, per sparse tensor, a *sorted* array of packed uint32
coordinate keys. Neighbor lookups (the rulebook) are vectorized binary
searches (`jnp.searchsorted`) into that table — fully static shapes, no
data-dependent control flow, and the sort itself maps onto XLA's TPU sort.

Keys pack (batch, x, y, z) into 32 bits with static per-axis bit widths
derived from the (static) spatial shape. Padding/invalid slots use the
all-ones key `INVALID_KEY`, which sorts past every valid key.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

INVALID_KEY = np.uint32(0xFFFFFFFF)


def _bits_for(n: int) -> int:
    """Number of bits needed to represent values in [0, n)."""
    if n <= 1:
        return 1
    return int(n - 1).bit_length()


def key_bits(spatial_shape: Sequence[int], batch_size: int) -> Tuple[int, int, int, int]:
    """Static per-field bit widths (b, x, y, z) for packed keys.

    Raises if the grid does not fit in 32 bits (minus one reserved top code
    for INVALID). Callers always have a static spatial shape (bucketed
    padding), so this check happens at trace time.
    """
    bb = _bits_for(batch_size)
    bx, by, bz = (_bits_for(int(s)) for s in spatial_shape)
    total = bb + bx + by + bz
    if total > 32:
        raise ValueError(
            f"spatial shape {tuple(spatial_shape)} x batch {batch_size} needs "
            f"{total} key bits > 32; use smaller blocks or coarser voxels"
        )
    return bb, bx, by, bz


def pack_coords(
    coords: jax.Array,
    spatial_shape: Sequence[int],
    batch_size: int,
    valid: jax.Array | None = None,
) -> jax.Array:
    """Pack int32 coords [N,4] (b,x,y,z) into sortable uint32 keys [N].

    Out-of-range or invalid rows map to INVALID_KEY.
    """
    bb, bx, by, bz = key_bits(spatial_shape, batch_size)
    c = coords.astype(jnp.int32)
    in_range = (
        (c[:, 0] >= 0)
        & (c[:, 0] < batch_size)
        & (c[:, 1] >= 0)
        & (c[:, 1] < spatial_shape[0])
        & (c[:, 2] >= 0)
        & (c[:, 2] < spatial_shape[1])
        & (c[:, 3] >= 0)
        & (c[:, 3] < spatial_shape[2])
    )
    if valid is not None:
        in_range = in_range & valid
    cu = c.astype(jnp.uint32)
    key = cu[:, 0]
    key = (key << bx) | cu[:, 1]
    key = (key << by) | cu[:, 2]
    key = (key << bz) | cu[:, 3]
    return jnp.where(in_range, key, jnp.uint32(INVALID_KEY))


def unpack_keys(
    keys: jax.Array, spatial_shape: Sequence[int], batch_size: int
) -> jax.Array:
    """Inverse of pack_coords for valid keys -> int32 coords [N,4]."""
    bb, bx, by, bz = key_bits(spatial_shape, batch_size)
    z = keys & jnp.uint32((1 << bz) - 1)
    y = (keys >> bz) & jnp.uint32((1 << by) - 1)
    x = (keys >> (bz + by)) & jnp.uint32((1 << bx) - 1)
    b = keys >> (bz + by + bx)
    return jnp.stack([b, x, y, z], axis=1).astype(jnp.int32)


def sort_keys(keys: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Stable-sort keys ascending; returns (sorted_keys, order)."""
    order = jnp.argsort(keys, stable=True)
    return keys[order], order


def lookup(sorted_keys: jax.Array, queries: jax.Array) -> jax.Array:
    """Find row index of each query key in a sorted key table.

    Returns int32 [M] with -1 where the key is absent (including INVALID
    queries; INVALID never matches because table INVALID slots are compared
    unequal by masking).
    """
    # method="sort" (one sort of keys+queries) instead of the default
    # binary-search "scan": on TPU, gathers/scatters cost ~3-7 ns PER INDEX
    # and scan runs log2(N) sequential gather rounds over every query —
    # 27*N rulebook queries made lookups ~90% of the UNet forward. Measured
    # (real v5e, 131k voxels): ResBlock+rulebook 500 ms/iter with scan,
    # 87 ms with sort, identical outputs (docs/PERF.md round 3).
    pos = jnp.searchsorted(
        sorted_keys, queries, side="left", method="sort"
    ).astype(jnp.int32)
    pos_c = jnp.clip(pos, 0, sorted_keys.shape[0] - 1)
    hit = (sorted_keys[pos_c] == queries) & (queries != INVALID_KEY)
    return jnp.where(hit, pos_c, jnp.int32(-1))


def unique_keys(
    keys: jax.Array, capacity: int
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Deduplicate keys with a static output capacity.

    Matches np.unique(return_index=...) semantics of the reference
    `sparse_quantize` (smart_tree/model/sparse.py:79-103): unique keys come
    out ascending and `first_idx` points at the *lowest original row* holding
    each key (stable argsort guarantees it).

    Returns:
      ukeys:     [capacity] uint32 sorted unique keys, INVALID padded
      first_idx: [capacity] int32 index into the input for each unique key
                 (N where padded)
      inverse:   [N] int32 index into ukeys for every input row (-1 invalid)
      count:     scalar int32 number of unique valid keys (may exceed
                 capacity if overflowed; callers may assert via count)
    """
    n = keys.shape[0]
    skeys, order = sort_keys(keys)
    is_valid = skeys != INVALID_KEY
    newgrp = jnp.concatenate(
        [jnp.ones((1,), bool), skeys[1:] != skeys[:-1]]
    ) & is_valid
    count = jnp.sum(newgrp).astype(jnp.int32)
    # Positions of group leaders, compacted to static capacity.
    (lead_pos,) = jnp.nonzero(newgrp, size=capacity, fill_value=n)
    lead_pos_c = jnp.clip(lead_pos, 0, n - 1)
    pad = lead_pos >= n
    ukeys = jnp.where(pad, INVALID_KEY, skeys[lead_pos_c])
    # group id per sorted row -> inverse per original row
    gid_sorted = jnp.cumsum(newgrp.astype(jnp.int32)) - 1
    inverse = jnp.full((n,), -1, jnp.int32).at[order].set(
        jnp.where(is_valid, gid_sorted, -1)
    )
    # first (minimum) original index per group
    first_idx = jnp.full((capacity,), n, jnp.int32)
    gid_safe = jnp.where(
        is_valid & (gid_sorted < capacity), gid_sorted, capacity - 1
    )
    first_idx = first_idx.at[gid_safe].min(
        jnp.where(is_valid, order.astype(jnp.int32), n)
    )
    first_idx = jnp.where(pad, n, first_idx)
    return ukeys, first_idx, inverse, count


def pack_coords_np(
    coords: np.ndarray,
    spatial_shape: Sequence[int],
    batch_size: int,
    valid: np.ndarray | None = None,
) -> np.ndarray:
    """Host (numpy) twin of pack_coords — bit-identical keys.

    The compact-transfer inference path (infer/inference.py) recomputes the
    device's stable sort permutation on the host from these keys instead of
    downloading the [capacity]-sized order array: stable argsort of equal
    uint32 key arrays is a unique permutation, so host and device agree
    exactly (tested in tests/test_compact_transfers.py)."""
    bb, bx, by, bz = key_bits(spatial_shape, batch_size)
    c = np.asarray(coords, np.int64)
    in_range = (
        (c[:, 0] >= 0)
        & (c[:, 0] < batch_size)
        & (c[:, 1] >= 0)
        & (c[:, 1] < spatial_shape[0])
        & (c[:, 2] >= 0)
        & (c[:, 2] < spatial_shape[1])
        & (c[:, 3] >= 0)
        & (c[:, 3] < spatial_shape[2])
    )
    if valid is not None:
        in_range = in_range & np.asarray(valid, bool)
    key = (
        (c[:, 0] << (bx + by + bz))
        | (c[:, 1] << (by + bz))
        | (c[:, 2] << bz)
        | c[:, 3]
    ).astype(np.uint32)
    return np.where(in_range, key, INVALID_KEY)


def ravel_hash_np(x: np.ndarray) -> np.ndarray:
    """Host-side row-major hash with the same semantics as the reference
    ravel_hash (smart_tree/model/sparse.py:64-76); used only in tests/tools."""
    assert x.ndim == 2
    x = x - np.min(x, axis=0)
    x = x.astype(np.uint64, copy=False)
    xmax = np.max(x, axis=0).astype(np.uint64) + 1
    h = np.zeros(x.shape[0], dtype=np.uint64)
    for k in range(x.shape[1] - 1):
        h += x[:, k]
        h *= xmax[k + 1]
    h += x[:, -1]
    return h
