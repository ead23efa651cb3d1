"""Greedy branch extraction (reference smart_tree/skeleton/path.py:9-140).

The reference's `sample_tree` is a Python loop with a per-hop GPU sync in
`trace_route` (`idx not in termination_pts`, O(N) per hop) and an FRNN query
per branch. Here:

  - trace_route is a device-side lax.while_loop over a static hop-capped
    buffer, with an O(1) allocated-mask lookup per hop (SURVEY.md §7 notes
    this is semantically identical and the right fix);
  - select_path_points is one masked K=1 KNN against the padded path buffer;
  - the outer loop stays on host (one small sync per branch — branches
    number in the hundreds), with all heavy state on device.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..data.branch import BranchSkeleton
from ..neighbors import knn


@partial(jax.jit, static_argnames=("hop_cap",))
def trace_route(preds, start, allocated, hop_cap: int):
    """Hop predecessors from `start` until reaching an allocated vertex or
    the root (-1 pred), collecting the path root-side-first.

    Returns (path [hop_cap] int32 — padded with -1, ordered from the
    termination side to the leaf like the reference's flip, path_len,
    termination_idx int32: the allocated vertex reached, or -1)."""
    buf0 = jnp.full((hop_cap,), -1, jnp.int32)

    def cond(state):
        i, idx, _ = state
        ok = (idx >= 0) & (i < hop_cap)
        return ok & ~jnp.where(idx >= 0, allocated[jnp.maximum(idx, 0)], True)

    def body(state):
        i, idx, buf = state
        buf = buf.at[i].set(idx)
        return i + 1, preds[idx], buf

    length, term, buf = jax.lax.while_loop(cond, body, (0, start, buf0))
    # flip to root-side-first order (reference path.py:16 .flip(0))
    j = jnp.arange(hop_cap)
    src = length - 1 - j
    path = jnp.where(src >= 0, buf[jnp.maximum(src, 0)], -1)
    return path, length, term


@jax.jit
def select_path_points(points, points_valid, path_pts, path_radii, path_valid):
    """Mask of points whose nearest path vertex is within that vertex's
    radius (reference path.py:19-46)."""
    r_max = jnp.max(jnp.where(path_valid, path_radii, 0.0))
    d, i = knn(
        points, path_pts, 1, r_max, src_valid=points_valid, dst_valid=path_valid
    )
    d, i = d[:, 0], i[:, 0]
    return (i >= 0) & (d < path_radii[jnp.maximum(i, 0)])


@partial(jax.jit, static_argnames=("hop_cap",))
def _branch_step(medial_pts, medial_radii, preds, distances, allocated, branch_ids,
                 hop_cap: int, branch_id):
    """One greedy iteration fused on device. Returns updated state plus the
    path and bookkeeping scalars the host needs."""
    farthest = jnp.argmax(distances).astype(jnp.int32)
    far_dist = distances[farthest]

    path, length, term = trace_route(preds, farthest, allocated, hop_cap)
    pvalid = path >= 0
    psafe = jnp.maximum(path, 0)
    path_pts = medial_pts[psafe]
    path_radii = jnp.where(pvalid, medial_radii[psafe], 0.0)

    on_path_pts = select_path_points(
        medial_pts, distances >= 0, path_pts, path_radii, pvalid
    )

    make_branch = length >= 2
    # mark allocated: nearby points + path vertices
    new_alloc = allocated | on_path_pts
    new_alloc = new_alloc.at[psafe].set(jnp.where(pvalid, True, new_alloc[psafe]))
    new_dist = jnp.where(on_path_pts, -1.0, distances)
    new_dist = new_dist.at[psafe].set(jnp.where(pvalid, -1.0, new_dist[psafe]))

    parent_id = jnp.where(term >= 0, branch_ids[jnp.maximum(term, 0)], -1)
    bid_write = jnp.where(make_branch, branch_id, -1)
    new_bids = jnp.where(make_branch & on_path_pts, bid_write, branch_ids)
    new_bids = new_bids.at[psafe].set(
        jnp.where(pvalid & make_branch, bid_write, new_bids[psafe])
    )
    return (
        new_dist, new_alloc, new_bids,
        path, length, term, parent_id, far_dist, make_branch,
    )


def sample_tree(
    medial_pts: np.ndarray | jax.Array,
    medial_radii: np.ndarray | jax.Array,
    preds: jax.Array,
    distances: jax.Array,
    component_mask: jax.Array,
    hop_cap: int = 4096,
    max_branches: int = 10000,
    start_branch_id: int = 0,
) -> Dict[int, BranchSkeleton]:
    """Greedy farthest-first branch allocation for one component.

    distances: root distances along the predecessor tree (tree_distances).
    Semantics of the reference (path.py:49-140) preserved: vertices with
    pred <= 0 are never selected as a farthest seed (`selection_mask =
    preds > 0`, including its vertex-0 quirk); paths shorter than 2
    vertices allocate points but emit no branch; parent_id is the branch
    owning the termination vertex (-1 for the first branch).
    """
    medial_pts = jnp.asarray(medial_pts)
    medial_radii = jnp.asarray(medial_radii).reshape(-1)
    n = medial_pts.shape[0]
    distances = jnp.where((preds > 0) & component_mask, distances, -1.0)
    distances = jnp.where(jnp.isfinite(distances), distances, -1.0)
    allocated = jnp.zeros((n,), bool)
    branch_ids = jnp.full((n,), -1, jnp.int32)

    branches: Dict[int, BranchSkeleton] = {}
    branch_id = start_branch_id
    host_medial = np.asarray(medial_pts)
    host_radii = np.asarray(medial_radii)

    for _ in range(max_branches):
        (distances, allocated, branch_ids, path, length, term, parent_id,
         far_dist, make_branch) = _branch_step(
            medial_pts, medial_radii, preds, distances, allocated, branch_ids,
            hop_cap, jnp.int32(branch_id),
        )
        if float(far_dist) <= 0:
            break
        if bool(make_branch):
            plen = int(length)
            pidx = np.asarray(path[:plen])
            branches[branch_id] = BranchSkeleton(
                branch_id,
                int(parent_id),
                host_medial[pidx],
                host_radii[pidx].reshape(-1, 1),
            )
            branch_id += 1
    return branches
