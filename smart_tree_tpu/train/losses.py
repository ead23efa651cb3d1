"""Training losses — rebuild of reference smart_tree/model/loss.py.

Same algebra, mask-based instead of boolean indexing (TPU static shapes):
  radius:    L1 on log-radius, branch points only (vector_class mask)
  direction: mean(1 - cosine similarity), branch points only
  class:     focal loss (gamma=2) over all masked points
The dead nll_loss / unused dice_loss of the reference are not ported
(SURVEY.md §2.1 flags them as dead code).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def _masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    m = mask.astype(jnp.float32)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def l1_loss(pred: jax.Array, target: jax.Array, mask: jax.Array) -> jax.Array:
    return _masked_mean(jnp.abs(pred - target).reshape(-1), mask.reshape(-1))


def cosine_similarity_loss(
    pred: jax.Array, target: jax.Array, mask: jax.Array
) -> jax.Array:
    # torch CosineSimilarity default eps=1e-8 on the norm product. Masked
    # rows are substituted with a unit vector BEFORE any norm so zero rows
    # never produce NaN values or NaN gradients (0*NaN is still NaN).
    # mask may be bool or float per-point weights (see direction_min_radius).
    e1 = jnp.zeros_like(pred).at[:, 0].set(1.0)
    m = (mask > 0)[:, None]
    p = jnp.where(m, pred, e1)
    t = jnp.where(m, target, e1)
    num = jnp.sum(p * t, axis=1)
    pn = jnp.sqrt(jnp.sum(p * p, axis=1) + 1e-16)
    tn = jnp.sqrt(jnp.sum(t * t, axis=1) + 1e-16)
    den = jnp.maximum(pn * tn, 1e-8)
    return _masked_mean(1.0 - num / den, mask)


def focal_loss(
    logits: jax.Array, labels: jax.Array, mask: jax.Array, gamma: float = 2.0
) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=1)
    lab = labels.reshape(-1).astype(jnp.int32)
    logpt = jnp.take_along_axis(logp, lab[:, None], axis=1).reshape(-1)
    pt = jnp.exp(logpt)
    loss = -((1 - pt) ** gamma) * logpt
    return _masked_mean(loss, mask)


def l2_direction_loss(
    pred_raw: jax.Array, target: jax.Array, mask: jax.Array
) -> jax.Array:
    """Mean squared error between the RAW (pre-normalization) direction
    output and the unit target. Unlike the normalized-cosine loss, whose
    gradient is ~1/|v| and collapses the head to a constant under Adam at
    moderate learning rates (see tools/overfit_probe.py), this is bounded
    everywhere and has the same minimizer direction; inference still
    normalizes."""
    diff = (pred_raw - target) ** 2
    return _masked_mean(jnp.sum(diff, axis=1), mask)


def compute_loss(
    preds: Dict[str, jax.Array],
    targets: jax.Array,
    mask: jax.Array,
    vector_class: int | None = 0,
    target_radius_log: bool = True,
    direction_loss: str = "cosine",
    direction_weight: float = 1.0,
    direction_min_radius: float | None = None,
    direction_subvoxel_weight: float = 0.0,
) -> Dict[str, jax.Array]:
    """targets: [N, 5] = [radius, direction(3), class]; mask: [N] bool
    (loss mask AND active-voxel mask). Matches reference loss.py:7-50.

    direction_loss: "cosine" (reference semantics, on the normalized head
    output) or "l2raw" (bounded-gradient variant on the raw output —
    requires preds["direction_raw"]).

    direction_min_radius: when set, direction supervision on points whose
    ground-truth radius is below it is down-weighted to
    direction_subvoxel_weight (default: dropped). Sub-voxel twigs have a
    sign-ambiguous medial direction by construction (opposite surface points
    share one voxel after dedup — BASELINE.md round-4 bucketed table: cos
    0.21-0.53 below 1 voxel vs 0.88 on thick structure); this mirrors how
    the reference masks direction supervision by class (loss.py:30-42),
    extended to the radius axis. Radius/class losses are unaffected."""
    target_radius = targets[:, 0:1]
    target_direction = targets[:, 1:4]
    target_class = targets[:, 4]

    vmask = mask
    if vector_class is not None:
        vmask = mask & (target_class == vector_class)

    dmask = vmask
    if direction_min_radius is not None:
        # linear-radius threshold applied BEFORE the log transform; float
        # weights ride the same masked-mean machinery as the bool mask
        big = targets[:, 0] >= direction_min_radius
        dmask = vmask.astype(jnp.float32) * jnp.where(
            big, 1.0, direction_subvoxel_weight
        )

    if target_radius_log:
        target_radius = jnp.log(jnp.maximum(target_radius, 1e-12))

    if direction_loss == "l2raw":
        dloss = l2_direction_loss(preds["direction_raw"], target_direction, dmask)
    else:
        dloss = cosine_similarity_loss(
            preds["direction"], target_direction, dmask
        )

    return {
        "radius": l1_loss(preds["radius"], target_radius, vmask),
        "direction": direction_weight * dloss,
        "class_l": focal_loss(preds["class_l"], target_class, mask),
    }
