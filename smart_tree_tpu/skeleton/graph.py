"""Neighbourhood graph over medial points.

Rebuild of reference smart_tree/skeleton/graph.py:36-60 (`nn_graph` +
`make_edges`) on the TPU KNN. The radius-clamped adjacency: K nearest
neighbours, invalidated where the distance exceeds the *source* point's
predicted radius.

Note on parity: the reference's `make_edges` keeps edges with `idxs > 0`
(graph.py:59), silently dropping vertex 0 as a target — an off-by-one
(SURVEY.md §7 known quirks). We implement the correct `>= 0` but expose
`drop_vertex_zero=True` to replicate the reference bit-for-bit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..neighbors import knn


class EdgeList(NamedTuple):
    edges: jax.Array    # [N*K, 2] int32 (src, dst)
    weights: jax.Array  # [N*K] float32 distances
    valid: jax.Array    # [N*K] bool


_GRID_KNN_THRESHOLD = 400_000  # brute force is O(N^2); grid wins past this


def nn_graph(
    points: jax.Array,
    radii: jax.Array,
    k: int = 16,
    valid: jax.Array | None = None,
    drop_vertex_zero: bool = False,
) -> EdgeList:
    """points [N,3] medial points; radii [N] connection radii (already
    clamped by min_connection_length upstream, skeletonize.py:37-41)."""
    n = points.shape[0]
    r_max = jnp.max(jnp.where(valid, radii, 0.0) if valid is not None else radii)
    if n > _GRID_KNN_THRESHOLD:
        from ..neighbors.grid import grid_knn

        dists, idxs = grid_knn(
            points, points, k, float(r_max), src_valid=valid, dst_valid=valid,
        )
    else:
        dists, idxs = knn(points, points, k, r_max, src_valid=valid, dst_valid=valid)
    # per-source radius gate (reference graph.py:38)
    idxs = jnp.where(dists <= radii[:, None], idxs, -1)
    src = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, k))
    edges = jnp.stack([src.reshape(-1), idxs.reshape(-1)], axis=1)
    weights = dists.reshape(-1)
    if drop_vertex_zero:
        evalid = edges[:, 1] > 0
    else:
        evalid = edges[:, 1] >= 0
    if valid is not None:
        evalid = evalid & valid[edges[:, 0]]
    weights = jnp.where(evalid, weights, jnp.inf)
    return EdgeList(edges=edges, weights=weights, valid=evalid)
