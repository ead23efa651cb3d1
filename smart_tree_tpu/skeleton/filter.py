"""Medial-point outlier removal (reference smart_tree/skeleton/filter.py:6-11):
keep a point iff all of its `nb_points` nearest neighbours (itself included)
lie within its predicted radius."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..neighbors import knn


def outlier_removal(
    points: jax.Array,
    radii: jax.Array,
    nb_points: int = 8,
    valid: jax.Array | None = None,
    min_radius: float | None = None,
) -> jax.Array:
    """min_radius (extension, default off = reference-faithful): clamp the
    acceptance radius like the reference clamps graph-connection radii
    (skeletonize.py:37 `radius.clamp(min=min_connection_length)`). Without
    it, branches thinner than ~2 voxels can NEVER survive this filter: after
    1-voxel dedup their medial points are spaced wider than their own radius,
    so all of them are "outliers" and whole twigs vanish before graphing
    (measured round 3: a 7 m tree loses ~60% of skeleton length at
    voxel=0.01 with ground-truth-perfect predictions)."""
    if min_radius is not None:
        radii = jnp.maximum(radii, min_radius)
    r_max = jnp.max(jnp.where(valid, radii, 0.0) if valid is not None else radii)
    dists, idxs = knn(points, points, nb_points, r_max, src_valid=valid, dst_valid=valid)
    keep = (dists < radii[:, None]) & (idxs != -1)
    mask = jnp.sum(keep, axis=1) == nb_points
    if valid is not None:
        mask = mask & valid
    return mask
