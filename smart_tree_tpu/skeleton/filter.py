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
) -> jax.Array:
    r_max = jnp.max(jnp.where(valid, radii, 0.0) if valid is not None else radii)
    dists, idxs = knn(points, points, nb_points, r_max, src_valid=valid, dst_valid=valid)
    keep = (dists < radii[:, None]) & (idxs != -1)
    mask = jnp.sum(keep, axis=1) == nb_points
    if valid is not None:
        mask = mask & valid
    return mask
