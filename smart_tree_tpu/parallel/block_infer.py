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
    staged: Tuple[int, int] | None = None,
    res_int8: bool = False,
    medial_classes: Tuple[int, ...] | None = None,
):
    """Returns fn(coords16 [D,cap,4] i16, res16 [D,cap,3] f16,
    valid [D,cap], origins [D,items,3] f32) ->
    (preds dict [D,cap,...], order [D,cap] int32, active [D,cap],
     counts [D,levels], caps [D,levels]).

    staged=(stage, cap) switches to the COMPACT-transfer signature
    (infer/inference.py compact path, VERDICT r3 #4): inputs become
    valid-prefix stagings fn(c16 [D,stage,4], res [D,stage,3] (int8|f16),
    n [D] i32, origins), padding to `cap` happens ON device, outputs are
    prefix-sliced to [D,stage] and the order/active downloads are dropped —
    the host recomputes the stable sort order from bit-identical numpy key
    packing (core/coords.py::pack_coords_np). Returns
    (preds [D,stage,...], counts, caps). res_int8 marks voxel/254-quantized
    residuals (absolute-xyz feature models).

    medial_classes (staged mode only) applies the per-shard download CULL
    (infer/inference.py::_partition_fn semantics): each shard permutes
    radius/direction (interior & medial-class)-rows-first and class
    interior-rows-first, so the host downloads only the row counts it
    derives from its own mask + the (1 B/row) classes. Requires the packed
    interior bits [D, ceil(stage/8)] as a 5th input
    (stack_device_batches_compact's `bits`). The partition is fused into
    the sharded program here (unlike the single-device path, which keeps
    it a separate jit to stay under the remote compile helper's memory
    limit) — multi-chip runs compile per-shard programs of the same size
    as the plain staged forward plus two argsorts."""
    levels = len(model.unet_planes)
    feature_mode = "local" if model.input_channels == 4 else "xyz"
    # trace-time slab-threshold hint (see infer/inference.py body): per-shard
    # capacity bounds the Pallas instance count in the sharded program too
    from ..core.sparse_ops import set_slab_cap_hint

    set_slab_cap_hint(staged[1] if staged is not None else 0)

    def per_shard_staged(coords16, res16, n, origins, *bits):
        stage, cap = staged
        c16, res = coords16[0], res16[0]
        if res_int8:
            res = (res.astype(jnp.float32) * (voxel_size / 254.0)).astype(
                jnp.float16
            )
        coords_full = jnp.full((cap, 4), -1, jnp.int16).at[:stage].set(c16)
        res_full = jnp.zeros((cap, 3), jnp.float16).at[:stage].set(res)
        valid = jnp.arange(cap) < n[0]
        preds, order, active, counts, caps = body(
            coords_full, res_full, valid, origins[0]
        )
        if medial_classes:
            import functools as _ft

            # interior bits arrive in RAW upload-row order; move them into
            # the device's sorted-key space with the same `order` the
            # features went through (padding rows unpack to False)
            ib = jnp.unpackbits(bits[0][0], count=stage).astype(bool)
            interior = jnp.zeros((cap,), bool).at[:stage].set(ib)[order]
            keep_i = active & interior
            is_med = _ft.reduce(
                jnp.logical_or,
                [preds["class_l"] == jnp.int8(c) for c in medial_classes],
            )
            keep_m = keep_i & is_med
            perm_i = jnp.argsort((~keep_i).astype(jnp.uint8), stable=True)
            perm_m = jnp.argsort((~keep_m).astype(jnp.uint8), stable=True)
            preds = {
                "radius": preds["radius"][perm_m],
                "direction": preds["direction"][perm_m],
                "class_l": preds["class_l"][perm_i],
            }
            n_med = jnp.sum(keep_m, dtype=jnp.int32)
            preds = jax.tree.map(lambda a: a[:stage], preds)
            return (
                jax.tree.map(lambda a: a[None], preds),
                counts[None],
                caps[None],
                n_med[None],
            )
        preds = jax.tree.map(lambda a: a[:stage], preds)
        return (
            jax.tree.map(lambda a: a[None], preds),
            counts[None],
            caps[None],
        )

    def per_shard(coords16, res16, valid, origins):
        coords16, res16 = coords16[0], res16[0]
        valid, origins = valid[0], origins[0]
        preds, order, active, counts, caps = body(
            coords16, res16, valid, origins
        )
        return (
            jax.tree.map(lambda a: a[None], preds),
            order[None].astype(jnp.int32),
            active[None],
            counts[None],
            caps[None],
        )

    def body(coords16, res16, valid, origins):
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

        return compress_preds(preds), order, active, counts, caps

    if staged is not None:
        n_in = 5 if medial_classes else 4
        n_out = 4 if medial_classes else 3
        sharded = jax.shard_map(
            per_shard_staged,
            mesh=mesh,
            in_specs=tuple(P(axis) for _ in range(n_in)),
            out_specs=tuple(P(axis) for _ in range(n_out)),
            check_vma=False,
        )
    else:
        sharded = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
            check_vma=False,
        )
    return jax.jit(sharded)


def stack_device_batches_compact(batches, n_dev: int, granularity: int,
                                 res_dtype):
    """Compact-transfer twin of stack_device_batches: stage only each
    batch's valid-row prefix (VoxelBatch.compact_upload), re-padded to the
    GROUP's max stage so the [n_dev, stage, ...] stack is rectangular.
    Yields (chunk, c16, res, n, origins, keep, stage, bits) where `bits` is
    each batch's interior/loss mask over the staged rows, packed to
    [n_dev, ceil(stage/8)] uint8 (the download cull's 5th input — padding
    rows pack as 0 = exterior)."""
    groups = []
    for start in range(0, len(batches), n_dev):
        chunk = list(batches[start : start + n_dev])
        real = len(chunk)
        while len(chunk) < n_dev:
            chunk.append(chunk[-1])
        comp = [b.compact_upload(granularity, res_dtype) for b in chunk]
        stage = max(len(c[0]) for c in comp)

        def pad_to(a, rows):
            out = np.zeros((rows,) + a.shape[1:], a.dtype)
            out[: len(a)] = a
            return out

        c16 = np.stack([pad_to(c[0], stage) for c in comp])
        res = np.stack([pad_to(c[1], stage) for c in comp])
        origins = np.stack([c[2] for c in comp])
        n = np.asarray([c[3] for c in comp], np.int32)
        keep = np.arange(n_dev) < real
        bits = np.stack([
            np.packbits(pad_to(b.mask[: len(c[0])], stage))
            for b, c in zip(chunk, comp)
        ])
        groups.append((chunk, c16, res, n, origins, keep, stage, bits))
    return groups


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
