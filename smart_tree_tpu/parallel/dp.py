"""Data-parallel training step over a device mesh.

The model is ~150k params, so the faithful and sufficient TPU mapping
(SURVEY.md §2.3) is pure DP: each device owns a full replica plus its own
padded voxel sub-batch; shard_map runs the single-device forward/backward
per shard and psums gradients, losses, and batch-norm statistics over the
'dp' axis (the BN sync makes multi-chip training match large-batch
single-chip training — stronger than the reference's single-GPU BN).

Batches are shaped [n_dev, cap, ...] and sharded on axis 0; every device
sub-batch shares one static spatial shape.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..core.plan import build_plan
from ..core.sparse_tensor import SparseVoxelTensor
from ..train.losses import compute_loss


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def _decode_xyz(coords16, res16, origins, voxel_size: float):
    """Reconstruct fp32 xyz from the tunnel-friendly encoding (int16 coords
    + fp16 residual from the voxel centre + per-item fp32 grid origin) —
    see VoxelBatch.compressed_xyz_upload."""
    coords = coords16.astype(jnp.int32)
    bi = jnp.clip(coords[:, 0], 0, origins.shape[0] - 1)
    xyz = (
        origins[bi]
        + (coords[:, 1:].astype(jnp.float32) + 0.5) * voxel_size
        + res16.astype(jnp.float32)
    )
    return coords, xyz


def _decode_targets(radius16, dir_cls8):
    """[cap,5] f32 targets from fp16 radius + int8 (direction*127, class).
    1/127 direction quantization is ~0.45 deg — far below label noise."""
    radius = radius16.astype(jnp.float32)
    dc = dir_cls8.astype(jnp.float32)
    return jnp.concatenate([radius, dc[:, :3] / 127.0, dc[:, 3:4]], axis=1)


def make_features(coords16, res16, origins, voxel_size: float, mode: str):
    """Input features per mode.

    "xyz"   — absolute point coordinates (reference parity, 3 channels).
    "local" — [sub-voxel residual / voxel_size (3), absolute y (1)]:
              the rulebook slot already encodes each neighbor's integer
              offset, so the residual is the ONLY geometry the conv lacks;
              handing it over directly (instead of absolute xyz the net
              must difference internally) makes direction-to-axis a local
              function of the inputs. y keeps the global height prior the
              class head uses. 4 channels.
    """
    coords, xyz = _decode_xyz(coords16, res16, origins, voxel_size)
    if mode == "local":
        feats = jnp.concatenate(
            [res16.astype(jnp.float32) / voxel_size, xyz[:, 1:2]], axis=1
        )
    else:
        feats = xyz
    return coords, feats


def make_dp_train_step(
    model,
    optimizer: optax.GradientTransformation,
    spatial_shape: Tuple[int, int, int],
    device_batch: int,
    mesh: Mesh,
    axis: str = "dp",
    vector_class: int | None = 0,
    compute_dtype=jnp.float32,
    matmul_precision: str = "float32",
    voxel_size: float = 0.01,
    direction_loss: str = "cosine",
    feature_mode: str = "xyz",
    direction_weight: float = 1.0,
    direction_min_radius: float | None = None,
):
    """Build the jitted DP train step.

    Batch arrays (compressed for the host->device link): coords16
    [D, cap, 4] int16, res16 [D, cap, 3] fp16, radius16 [D, cap, 1] fp16,
    dir_cls8 [D, cap, 4] int8 (direction*127 + 0/1 class), valid [D, cap]
    bool (doubles as the all-ones reference loss mask), origins
    [D, items, 3] f32 — axis 0 sharded over the mesh.
    """
    levels = len(model.unet_planes)

    def per_shard(params, batch_stats, opt_state, coords16, res16, radius16,
                  dir_cls8, valid, origins):
        # shard_map gives each device its [1, cap, ...] slice; drop the axis
        coords, feats = make_features(coords16[0], res16[0], origins[0],
                                      voxel_size, feature_mode)
        targets = _decode_targets(radius16[0], dir_cls8[0])
        valid = valid[0]
        mask = valid

        def loss_fn(p):
          with jax.default_matmul_precision(matmul_precision):
            x = SparseVoxelTensor.from_coords(
                coords, feats.astype(compute_dtype), spatial_shape, device_batch,
                valid=valid,
            )
            plan = build_plan(x, levels)
            # targets/mask must ride the same sort as the features: pack them
            # as extra feature columns through from_coords
            xt = SparseVoxelTensor.from_coords(
                coords,
                jnp.concatenate(
                    [targets, mask[:, None].astype(jnp.float32)], axis=1
                ),
                spatial_shape,
                device_batch,
                valid=valid,
            )
            t_sorted = xt.feats[:, :-1]
            m_sorted = (xt.feats[:, -1] > 0.5) & xt.active
            preds, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                plan,
                x.feats,
                train=True,
                mutable=["batch_stats"],
            )
            losses = compute_loss(preds, t_sorted, m_sorted,
                                  vector_class=vector_class,
                                  direction_loss=direction_loss,
                                  direction_weight=direction_weight,
                                  direction_min_radius=direction_min_radius)
            total = sum(losses.values())
            return total, (losses, updates["batch_stats"])

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        grads = jax.lax.pmean(grads, axis)
        losses = jax.lax.pmean(losses, axis)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_stats, new_opt, losses

    sharded = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis)),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def train_step(state: TrainState, coords16, res16, radius16, dir_cls8,
                   valid, origins):
        params, stats, opt, losses = sharded(
            state.params, state.batch_stats, state.opt_state,
            coords16, res16, radius16, dir_cls8, valid, origins,
        )
        return TrainState(params, stats, opt, state.step + 1), losses

    return train_step


def make_dp_eval_step(
    model,
    spatial_shape: Tuple[int, int, int],
    device_batch: int,
    mesh: Mesh,
    axis: str = "dp",
    vector_class: int | None = 0,
    voxel_size: float = 0.01,
    direction_loss: str = "cosine",
    feature_mode: str = "xyz",
    direction_min_radius: float | None = None,
):
    levels = len(model.unet_planes)

    def per_shard(params, batch_stats, coords16, res16, radius16, dir_cls8,
                  valid, origins):
        coords, feats = make_features(coords16[0], res16[0], origins[0],
                                      voxel_size, feature_mode)
        targets = _decode_targets(radius16[0], dir_cls8[0])
        valid = valid[0]
        mask = valid
        x = SparseVoxelTensor.from_coords(
            coords, feats, spatial_shape, device_batch, valid=valid
        )
        plan = build_plan(x, levels)
        xt = SparseVoxelTensor.from_coords(
            coords,
            jnp.concatenate([targets, mask[:, None].astype(jnp.float32)], axis=1),
            spatial_shape,
            device_batch,
            valid=valid,
        )
        preds = model.apply(
            {"params": params, "batch_stats": batch_stats}, plan, x.feats, train=False
        )
        losses = compute_loss(
            preds,
            xt.feats[:, :-1],
            (xt.feats[:, -1] > 0.5) & xt.active,
            vector_class=vector_class,
            direction_loss=direction_loss,
            direction_min_radius=direction_min_radius,
        )
        return jax.lax.pmean(losses, axis)

    sharded = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis)),
        out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def eval_step(state: TrainState, coords16, res16, radius16, dir_cls8,
                  valid, origins):
        return sharded(
            state.params, state.batch_stats, coords16, res16, radius16,
            dir_cls8, valid, origins,
        )

    return eval_step
