"""Rulebook (kernel-offset index map) construction for sparse 3D convolution.

This replaces spconv's CUDA hash-table indice-pair generation (backing the
reference's SubMConv3d / SparseConv3d / SparseInverseConv3d at
smart_tree/model/model_blocks.py:24,58,91). The TPU formulation: coordinates
live in a *sorted* packed-key table (core/coords.py), and a rulebook is just
an [N, K^3] int32 gather-index matrix computed by vectorized binary search —
idx[i, k] = row of the neighbor of voxel i at kernel offset k, or -1.

Convolutions then become gather -> one [N, K^3*Cin] x [K^3*Cin, Cout] GEMM
(see core/sparse_ops.py), which is exactly the shape the MXU wants.

Conventions (cross-correlation, torch/XLA-compatible):
  submanifold k, pad irrelevant:  in_coord = out_coord + (k_off - (K-1)//2)
  strided K=3,s=2,p=1 (Encode):   in_coord = 2*out_coord - 1 + k_off
  inverse of Encode (Decode):     out fine f reads coarse o where
                                  2*o - 1 + k_off = f  (same k indexing,
                                  pair replay a la spconv inverse conv)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .coords import INVALID_KEY, key_bits, lookup, pack_coords, unique_keys, unpack_keys


def kernel_offsets(kernel_size: int) -> np.ndarray:
    """[K^3, 3] int32 offsets in spconv/torch weight order (kx major)."""
    r = np.arange(kernel_size)
    kx, ky, kz = np.meshgrid(r, r, r, indexing="ij")
    return np.stack([kx, ky, kz], axis=-1).reshape(-1, 3).astype(np.int32)


def _query_keys(
    coords: jax.Array,
    offsets: np.ndarray,
    spatial_shape: Sequence[int],
    batch_size: int,
    active: jax.Array,
) -> jax.Array:
    """Packed keys of coords + each offset: [N, K3] uint32."""
    c = coords[:, None, :].astype(jnp.int32)  # [N,1,4]
    off = jnp.asarray(offsets, jnp.int32)  # [K3,3]
    q = jnp.concatenate(
        [
            jnp.broadcast_to(c[..., :1], (c.shape[0], off.shape[0], 1)),
            c[..., 1:] + off[None, :, :],
        ],
        axis=-1,
    )  # [N,K3,4]
    flat = q.reshape(-1, 4)
    keys = pack_coords(
        flat,
        spatial_shape,
        batch_size,
        valid=jnp.repeat(active, off.shape[0]),
    )
    return keys.reshape(coords.shape[0], off.shape[0])


def subm_rulebook(
    keys: jax.Array,
    spatial_shape: Sequence[int],
    batch_size: int,
    kernel_size: int = 3,
) -> jax.Array:
    """Submanifold rulebook: idx [N, K^3] into the same (sorted) tensor.

    Exploits offset symmetry: the kernel offsets of an odd K come in +-
    pairs (offs[k] == -offs[K^3-1-k]) and the neighbor relation within ONE
    table is symmetric — idx[i, k] = j  <=>  idx[j, K^3-1-k] = i. So only
    the first (K^3-1)/2 columns are resolved by search; the center column
    is the identity, and the mirror half is one vectorized scatter. On TPU
    the search is the expensive part (a sort over keys+queries,
    core/coords.py::lookup), so halving the query count nearly halves the
    rulebook build — the #1 plan-build cost at level 0 (docs/PERF.md
    round 3: sort-based rulebooks ~180 ms of a 471 ms forward @131k)."""
    n = keys.shape[0]
    if kernel_size == 1:
        rows = jnp.arange(n, dtype=jnp.int32)[:, None]
        return jnp.where((keys != INVALID_KEY)[:, None], rows, -1)
    coords = unpack_keys(keys, spatial_shape, batch_size)
    active = keys != INVALID_KEY
    half = (kernel_size - 1) // 2
    offs = kernel_offsets(kernel_size) - half
    if kernel_size % 2 == 0:
        # even kernels have no +- symmetry; full lookup
        q = _query_keys(coords, offs, spatial_shape, batch_size, active)
        return lookup(keys, q.reshape(-1)).reshape(q.shape)
    k3 = offs.shape[0]
    c = (k3 - 1) // 2  # center column (offset 0,0,0)
    rows = jnp.arange(n, dtype=jnp.int32)
    q = _query_keys(coords, offs[:c], spatial_shape, batch_size, active)
    idx_half = lookup(keys, q.reshape(-1)).reshape(n, c)
    rb = jnp.full((n, k3), -1, jnp.int32)
    rb = rb.at[:, :c].set(idx_half)
    rb = rb.at[:, c].set(jnp.where(active, rows, -1))
    # mirror: idx_half[i, k] = j  =>  rb[j, k3-1-k] = i. For fixed k the
    # map i -> j is injective (j = i + off) and each k writes a distinct
    # column, so the scatter indices are unique; missing neighbors route to
    # row n and are dropped.
    jrow = jnp.where(idx_half >= 0, idx_half, n)
    cols = jnp.broadcast_to(
        jnp.arange(k3 - 1, c, -1, dtype=jnp.int32)[None, :], (n, c)
    )
    rb = rb.at[jrow, cols].set(
        jnp.broadcast_to(rows[:, None], (n, c)),
        mode="drop",
        unique_indices=True,
    )
    return rb


def xy_offsets() -> np.ndarray:
    """[9, 3] int32 (dx, dy, 0) offsets, kx-major (matching the first two
    axes of kernel_offsets(3) order)."""
    r = np.arange(-1, 2)
    dx, dy = np.meshgrid(r, r, indexing="ij")
    return np.stack([dx, dy, np.zeros_like(dx)], axis=-1).reshape(-1, 3).astype(np.int32)


@struct.dataclass
class SubmRB9:
    """Compact subm rulebook: per voxel and per (dx,dy) offset, the sorted-
    table insertion position of the (dx,dy,0) query key. dz neighbors are
    recovered from the 3-row window around it (see subm_rulebook9)."""

    keys: jax.Array  # [N] the level's sorted voxel keys (shared reference)
    pos: jax.Array   # [N, 9] int32 insertion positions
    qkey: jax.Array  # [N, 9] uint32 query keys (INVALID_KEY where OOB)
    zbits: int = struct.field(pytree_node=False)
    zmax: int = struct.field(pytree_node=False)


def subm_rulebook9(
    keys: jax.Array,
    spatial_shape: Sequence[int],
    batch_size: int,
):
    """Compact submanifold rulebook exploiting z-contiguity of sorted keys.

    Packed keys order z fastest (core/coords.py), so for any query coord
    (x+dx, y+dy, z) with packed key q, the rows holding q-1, q and q+1 —
    i.e. ALL THREE dz in {-1,0,+1} neighbors — lie within [pos-1, pos+1]
    where pos = searchsorted(keys, q). One binary search and one 3-row
    window replace three of each; the (0,0) column needs no search at all
    (it is the identity). 8 searchsorteds + 9 windowed gathers instead of
    spconv's 27-way hash probing (reference model_blocks.py:24-35).

    Returns a SubmRB9 pytree consumed by sparse_ops.gather_conv.
    """
    coords = unpack_keys(keys, spatial_shape, batch_size)
    active = keys != INVALID_KEY
    n = keys.shape[0]
    offs = xy_offsets()
    q = _query_keys(coords, offs, spatial_shape, batch_size, active)  # [N,9]
    rows = jnp.arange(n, dtype=jnp.int32)
    pos_cols = []
    for k in range(9):
        if offs[k, 0] == 0 and offs[k, 1] == 0:
            pos_cols.append(rows)  # own row: keys are unique and sorted
        else:
            pos_cols.append(
                # method="sort": see core/coords.py::lookup — the default
                # binary-search lowering is per-index-latency-bound on TPU
                jnp.searchsorted(
                    keys, q[:, k], side="left", method="sort"
                ).astype(jnp.int32)
            )
    pos = jnp.stack(pos_cols, axis=1)  # [N, 9]
    _, _, _, bz = key_bits(spatial_shape, batch_size)
    return SubmRB9(
        keys=keys,
        pos=pos,
        qkey=q,
        zbits=int(bz),
        zmax=int(spatial_shape[2]),
    )


def downsample_coords(
    keys: jax.Array,
    spatial_shape: Sequence[int],
    batch_size: int,
    out_capacity: int,
) -> Tuple[jax.Array, Tuple[int, int, int], jax.Array]:
    """Output key table of a K=3,s=2,p=1 strided conv (spconv SparseConv3d,
    reference model_blocks.py:57-70).

    An output voxel o exists iff some input voxel c satisfies
    2*o - 1 + k = c for k in [0,3)^3, i.e. 2o-1 <= c <= 2o+1 per axis.
    Candidates per input voxel: o_axis in {(c-1)//2, (c+1)//2} verified by
    that inequality, then dedup across the batch with static capacity.

    Returns (sorted out_keys [out_capacity], out_spatial_shape, count).
    """
    out_shape = tuple((int(s) + 2 - 3) // 2 + 1 for s in spatial_shape)
    coords = unpack_keys(keys, spatial_shape, batch_size)
    active = keys != INVALID_KEY
    c = coords[:, 1:]  # [N,3]
    lo = (c - 1) // 2
    hi = (c + 1) // 2
    n = keys.shape[0]
    cand_list = []
    valid_list = []
    # 8 corner combinations of {lo,hi} per axis
    for mx in (0, 1):
        for my in (0, 1):
            for mz in (0, 1):
                o = jnp.stack(
                    [
                        (hi if mx else lo)[:, 0],
                        (hi if my else lo)[:, 1],
                        (hi if mz else lo)[:, 2],
                    ],
                    axis=1,
                )
                ok = jnp.all((2 * o - 1 <= c) & (c <= 2 * o + 1), axis=1) & active
                cand_list.append(jnp.concatenate([coords[:, :1], o], axis=1))
                valid_list.append(ok)
    cand = jnp.concatenate(cand_list, axis=0)  # [8N,4]
    cvalid = jnp.concatenate(valid_list, axis=0)
    ckeys = pack_coords(cand, out_shape, batch_size, valid=cvalid)
    out_keys, _, _, count = unique_keys(ckeys, out_capacity)
    return out_keys, out_shape, count


def downsample_with_rulebook(
    keys: jax.Array,
    spatial_shape: Sequence[int],
    batch_size: int,
    out_capacity: int,
) -> Tuple[jax.Array, Tuple[int, int, int], jax.Array, jax.Array]:
    """`downsample_coords` + the strided rulebook, with ZERO extra lookups.

    The candidate enumeration that discovers the output voxels already
    carries the full pairing: candidate (input i, corner m) targets output
    cell o at kernel offset k = c - (2*o - 1), and `unique_keys`' inverse
    map gives each candidate's row in the dedup'd output table. One scatter
    of the 8N candidates therefore builds the [out_capacity, 27] gather
    rulebook that `strided_rulebook` otherwise pays a 27*N_out-query sorted
    lookup for. (o, k) pairs are unique — k fixes the input coord given o —
    so the scatter is collision-free.

    Returns (sorted out_keys, out_spatial_shape, count, drb).
    """
    out_shape = tuple((int(s) + 2 - 3) // 2 + 1 for s in spatial_shape)
    coords = unpack_keys(keys, spatial_shape, batch_size)
    active = keys != INVALID_KEY
    c = coords[:, 1:]  # [N,3]
    lo = (c - 1) // 2
    hi = (c + 1) // 2
    n = keys.shape[0]
    cand_list = []
    valid_list = []
    koff_list = []
    for mx in (0, 1):
        for my in (0, 1):
            for mz in (0, 1):
                o = jnp.stack(
                    [
                        (hi if mx else lo)[:, 0],
                        (hi if my else lo)[:, 1],
                        (hi if mz else lo)[:, 2],
                    ],
                    axis=1,
                )
                ok = jnp.all((2 * o - 1 <= c) & (c <= 2 * o + 1), axis=1) & active
                koff = c - (2 * o - 1)  # [N,3] in [0,3) where ok
                cand_list.append(jnp.concatenate([coords[:, :1], o], axis=1))
                valid_list.append(ok)
                koff_list.append(koff[:, 0] * 9 + koff[:, 1] * 3 + koff[:, 2])
    cand = jnp.concatenate(cand_list, axis=0)  # [8N,4]
    cvalid = jnp.concatenate(valid_list, axis=0)
    kflat = jnp.concatenate(koff_list, axis=0)  # [8N] kernel-offset column
    ckeys = pack_coords(cand, out_shape, batch_size, valid=cvalid)
    out_keys, _, inverse, count = unique_keys(ckeys, out_capacity)
    # scatter the pairing: drb[out_row, k] = input row i (candidate i mod n)
    irows = jnp.tile(jnp.arange(n, dtype=jnp.int32), 8)
    orow = jnp.where(
        cvalid & (inverse >= 0) & (inverse < out_capacity), inverse, out_capacity
    )
    drb = jnp.full((out_capacity, 27), -1, jnp.int32)
    drb = drb.at[orow, jnp.clip(kflat, 0, 26)].set(
        irows, mode="drop", unique_indices=True
    )
    return out_keys, out_shape, count, drb


def inverse_from_strided(drb: jax.Array, fine_capacity: int) -> jax.Array:
    """Inverse-conv rulebook as the TRANSPOSE of the strided rulebook.

    The Decode pairing is exactly the Encode pairing read backwards at the
    same kernel offset: drb[o, k] = f  <=>  urb[f, k] = o (both encode
    2*o - 1 + off_k = f). One scatter of the [M, 27] strided entries
    replaces `inverse_rulebook`'s 27*N_fine-query sorted lookup — the
    single largest lookup in the plan build (fine N is the big one)."""
    m, k3 = drb.shape
    frow = jnp.where(drb >= 0, drb, fine_capacity)
    orows = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32)[:, None], (m, k3))
    cols = jnp.broadcast_to(jnp.arange(k3, dtype=jnp.int32)[None, :], (m, k3))
    urb = jnp.full((fine_capacity, k3), -1, jnp.int32)
    return urb.at[frow, cols].set(orows, mode="drop", unique_indices=True)


def strided_rulebook(
    in_keys: jax.Array,
    out_keys: jax.Array,
    in_spatial_shape: Sequence[int],
    out_spatial_shape: Sequence[int],
    batch_size: int,
) -> jax.Array:
    """Gather rulebook for the strided conv: for each OUTPUT voxel o and
    kernel offset k, the input row at coord 2*o_coord - 1 + k (or -1)."""
    out_coords = unpack_keys(out_keys, out_spatial_shape, batch_size)
    active = out_keys != INVALID_KEY
    offs = kernel_offsets(3)  # [27,3] in [0,3)
    base = out_coords.at[:, 1:].multiply(2)
    base = base.at[:, 1:].add(-1)
    q = _query_keys(base, offs, in_spatial_shape, batch_size, active)
    return lookup(in_keys, q.reshape(-1)).reshape(q.shape)


def inverse_rulebook(
    fine_keys: jax.Array,
    coarse_keys: jax.Array,
    fine_spatial_shape: Sequence[int],
    coarse_spatial_shape: Sequence[int],
    batch_size: int,
) -> jax.Array:
    """Gather rulebook for the inverse conv (spconv SparseInverseConv3d,
    reference model_blocks.py:90-101): for each FINE voxel f and offset k,
    the coarse row o with 2*o - 1 + k = f, i.e. o = (f + 1 - k)/2 where the
    division is exact; -1 otherwise. Replays the Encode pairing transposed,
    so Decode output sites are exactly the pre-Encode sites (indice_key
    semantics) without storing anything."""
    fine_coords = unpack_keys(fine_keys, fine_spatial_shape, batch_size)
    active = fine_keys != INVALID_KEY
    offs = kernel_offsets(3)
    f = fine_coords[:, None, 1:].astype(jnp.int32)  # [N,1,3]
    num = f + 1 - jnp.asarray(offs, jnp.int32)[None, :, :]  # [N,27,3]
    exact = jnp.all(num % 2 == 0, axis=-1)  # divisible
    o = num // 2
    q = jnp.concatenate(
        [
            jnp.broadcast_to(
                fine_coords[:, None, :1], (f.shape[0], offs.shape[0], 1)
            ),
            o,
        ],
        axis=-1,
    ).reshape(-1, 4)
    keys = pack_coords(
        q,
        coarse_spatial_shape,
        batch_size,
        valid=(exact & active[:, None]).reshape(-1),
    )
    return lookup(coarse_keys, keys).reshape(fine_keys.shape[0], offs.shape[0])
