"""Greedy branch extraction (reference smart_tree/skeleton/path.py:9-140).

The reference's `sample_tree` is a Python loop with a per-hop GPU sync in
`trace_route` (`idx not in termination_pts` is O(N) per hop) plus an FRNN
query per branch. Here the ENTIRE greedy loop runs on device as one jitted
`lax.while_loop` — trace, point selection, and state updates included — and
the host pulls the packed result once:

  - each vertex belongs to at most one branch *path*, so paths are encoded
    in-place as (path_branch[v], path_pos[v]) instead of a [branches, cap]
    buffer — total memory O(N);
  - select_path_points is a masked K=1 KNN against the hop-capped path
    buffer (MXU distance tiles);
  - zero host<->device round trips per branch, which is what makes
    skeletonization latency-bound designs fall over on real interconnects.

Reference semantics preserved (path.py:49-140): vertices with pred <= 0 are
never seeds (`selection_mask = preds > 0`, vertex-0 quirk included); paths
shorter than 2 vertices allocate points but emit no branch; parent_id is
the branch owning the termination vertex (-1 for the first branch).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

import logging

from ..data.branch import BranchSkeleton
from ..neighbors import knn
from ..neighbors.knn import _knn_impl

log = logging.getLogger(__name__)


class SampleTreeResult(NamedTuple):
    path_branch: jax.Array    # [N] int32 branch id whose path contains v (-1)
    path_pos: jax.Array       # [N] int32 position of v along its path
    branch_ids: jax.Array     # [N] int32 owning branch per allocated vertex
    branch_parents: jax.Array  # [maxB] int32 parent branch id
    branch_count: jax.Array   # scalar int32
    hop_cap_hits: jax.Array   # scalar int32: traces truncated at hop_cap
    branch_cap_hit: jax.Array  # scalar bool: loop stopped with work left


@partial(jax.jit, static_argnames=("hop_cap",))
def trace_route(preds, start, allocated, hop_cap: int):
    """Hop predecessors from `start` until reaching an allocated vertex or
    the root (-1 pred). Returns (path [hop_cap] int32, root-side first,
    -1 padded; length; termination vertex or -1).

    Sequential reference formulation (one gather per hop) — kept as the
    oracle for trace_route_jump, which computes the identical result in
    log2(hop_cap) parallel steps and is what sample_tree uses."""
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
    j = jnp.arange(hop_cap)
    src = length - 1 - j
    path = jnp.where(src >= 0, buf[jnp.maximum(src, 0)], -1)
    return path, length, term


@partial(jax.jit, static_argnames=("hop_cap",))
def build_jump_tables(preds, hop_cap: int):
    """Pointer-doubling ancestor tables: jumps[k][v] = 2^k-th predecessor
    of v, over an extended index space where row n is an absorbing
    sentinel (roots' pred -1 maps to it). [L, N+1] with
    L = hop_cap.bit_length(), so any ancestor up to pred^hop_cap is a
    bit-decomposed composition of table rows. Built once per predecessor
    forest; function powers commute, so composition order is free."""
    n = preds.shape[0]
    L = max(1, int(hop_cap).bit_length())
    base = jnp.concatenate(
        [jnp.where(preds >= 0, preds, n).astype(jnp.int32),
         jnp.asarray([n], jnp.int32)]
    )
    tables = [base]
    for _ in range(L - 1):
        t = tables[-1]
        tables.append(t[t])
    return jnp.stack(tables)


@partial(jax.jit, static_argnames=("hop_cap",))
def trace_route_jump(jumps, start, allocated, hop_cap: int):
    """trace_route, but log-step: materialize the whole ancestor chain
    v[j] = pred^j(start) for j in [0, hop_cap) with bit-decomposed jumps
    (L parallel hop_cap-wide gathers instead of hop_cap SEQUENTIAL
    ones — the tracer's per-branch latency floor on TPU), then find the
    first terminator (allocated vertex or past-root sentinel) in one
    parallel scan. Bit-identical to trace_route."""
    n = allocated.shape[0]
    j = jnp.arange(hop_cap, dtype=jnp.int32)
    v = jnp.full((hop_cap,), start, jnp.int32)
    vh = start.astype(jnp.int32) if hasattr(start, "astype") else jnp.int32(start)
    for k in range(jumps.shape[0]):
        v = jnp.where((j >> k) & 1 == 1, jumps[k][v], v)
        # pred^hop_cap(start): the sequential trace's `term` when hop-capped
        if (hop_cap >> k) & 1:
            vh = jumps[k][vh]
    valid = v < n
    stop = (~valid) | (valid & allocated[jnp.minimum(v, n - 1)])
    has_stop = jnp.any(stop)
    first_stop = jnp.argmax(stop).astype(jnp.int32)
    length = jnp.where(has_stop, first_stop, hop_cap)
    v_stop = v[jnp.minimum(first_stop, hop_cap - 1)]
    stopped_alloc = has_stop & (v_stop < n) & allocated[jnp.minimum(v_stop, n - 1)]
    term = jnp.where(
        has_stop,
        jnp.where(stopped_alloc, v_stop, -1),
        jnp.where(vh < n, vh, -1),
    )
    src = length - 1 - j
    path = jnp.where(src >= 0, v[jnp.maximum(src, 0)], -1)
    return path, length, term


@jax.jit
def select_path_points(points, points_valid, path_pts, path_radii, path_valid):
    """Mask of points whose nearest path vertex is within that vertex's
    radius (reference path.py:19-46)."""
    r_max = jnp.max(jnp.where(path_valid, path_radii, 0.0))
    d, i = _knn_impl(points, path_pts, points_valid, path_valid, r_max**2, 1)
    d, i = d[:, 0], i[:, 0]
    return (i >= 0) & (d < path_radii[jnp.maximum(i, 0)])


_SEL_CHUNK = 128


def _select_path_points_chunked(points, points_valid, medial_pts, radii,
                                path, length, hop_cap: int):
    """select_path_points paying only for the TRUE path length: the
    [hop_cap]-padded path is swept in _SEL_CHUNK-vertex windows inside a
    while_loop that stops at `length` (mean real path length is a few
    vertices, hop_cap is 2048+ — the full-width KNN made each branch cost
    a points x hop_cap distance tile, ~400x waste on the bench forest;
    probe: sample_forest was 8.5 s of the 14.5 s round-5 forward).

    Exact nearest-path-vertex semantics: a running (best_d2, best_r) pair
    carries the nearest vertex's radius across windows, so the final
    predicate is identical to the one-shot form (nearest path vertex
    within ITS OWN radius), not an any-vertex-covers OR."""
    n = points.shape[0]
    pathp = jnp.concatenate(
        [path, jnp.full((_SEL_CHUNK,), -1, jnp.int32)]
    )  # window slides past length by < one chunk

    def cond(c):
        i, _, _ = c
        return i * _SEL_CHUNK < length

    def body(c):
        i, best_d2, best_r = c
        seg = jax.lax.dynamic_slice(pathp, (i * _SEL_CHUNK,), (_SEL_CHUNK,))
        svalid = seg >= 0
        ssafe = jnp.maximum(seg, 0)
        seg_pts = medial_pts[ssafe]
        seg_r = jnp.where(svalid, radii[ssafe], 0.0)
        r_max = jnp.max(seg_r)
        d, j = _knn_impl(points, seg_pts, points_valid, svalid, r_max**2, 1)
        d, j = d[:, 0], j[:, 0]
        d2 = jnp.where(j >= 0, d * d, jnp.inf)
        closer = d2 < best_d2
        best_r = jnp.where(closer, seg_r[jnp.maximum(j, 0)], best_r)
        return i + 1, jnp.minimum(best_d2, d2), best_r

    _, best_d2, best_r = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.full((n,), jnp.inf), jnp.zeros((n,))),
    )
    return jnp.isfinite(best_d2) & (jnp.sqrt(best_d2) < best_r)


class _S(NamedTuple):
    dist: jax.Array
    allocated: jax.Array
    branch_ids: jax.Array
    path_branch: jax.Array
    path_pos: jax.Array
    parents: jax.Array
    count: jax.Array
    hop_hits: jax.Array


@partial(jax.jit, static_argnames=("max_branches",))
def _sample_init(preds, distances, component_mask, max_branches: int) -> _S:
    n = preds.shape[0]
    dist0 = jnp.where((preds > 0) & component_mask, distances, -1.0)
    dist0 = jnp.where(jnp.isfinite(dist0), dist0, -1.0)
    return _S(
        dist=dist0,
        allocated=jnp.zeros((n,), bool),
        branch_ids=jnp.full((n,), -1, jnp.int32),
        path_branch=jnp.full((n,), -1, jnp.int32),
        path_pos=jnp.full((n,), -1, jnp.int32),
        parents=jnp.full((max_branches,), -1, jnp.int32),
        count=jnp.zeros((), jnp.int32),
        hop_hits=jnp.zeros((), jnp.int32),
    )


@partial(
    jax.jit,
    static_argnames=("hop_cap", "max_branches", "max_iters"),
    donate_argnums=(3,),
)
def _sample_chunk(
    medial_pts: jax.Array,
    medial_radii: jax.Array,
    jumps: jax.Array,
    state: _S,
    hop_cap: int,
    max_branches: int,
    max_iters: int,
):
    """Up to max_iters greedy branch extractions in ONE device program.

    One branch per loop round costs a log-step jump-table trace plus an
    N x hop_cap KNN tile sweep; hundreds of branches in a single
    unbounded program can exceed the relay RPC deadline and fault the chip
    (docs/PERF.md) — the host re-dispatches on a scalar `more` fetch with
    all state device-resident (donated, so no HBM doubling)."""
    radii = medial_radii.reshape(-1)

    def more_work(s: _S):
        return (jnp.max(s.dist) > 0) & (s.count < max_branches)

    def cond(state):
        i, s = state
        return (i < max_iters) & more_work(s)

    def body(state):
        i, s = state
        farthest = jnp.argmax(s.dist).astype(jnp.int32)
        path, length, term = trace_route_jump(jumps, farthest, s.allocated, hop_cap)
        # a trace that stopped only because of the hop cap (still mid-tree,
        # termination vertex unallocated) silently truncated a path — count it
        hop_hit = (
            (length >= hop_cap)
            & (term >= 0)
            & ~s.allocated[jnp.maximum(term, 0)]
        )
        pvalid = path >= 0
        psafe = jnp.maximum(path, 0)

        on_path = _select_path_points_chunked(
            medial_pts, s.dist >= 0, medial_pts, radii, path, length, hop_cap
        )

        make_branch = length >= 2
        bid = s.count
        parent = jnp.where(term >= 0, s.branch_ids[jnp.maximum(term, 0)], -1)

        allocated = s.allocated | on_path
        allocated = allocated.at[psafe].set(pvalid | allocated[psafe])
        dist = jnp.where(on_path, -1.0, s.dist)
        dist = dist.at[psafe].set(jnp.where(pvalid, -1.0, dist[psafe]))

        wid = jnp.where(make_branch, bid, -1)
        branch_ids = jnp.where(make_branch & on_path, wid, s.branch_ids)
        branch_ids = branch_ids.at[psafe].set(
            jnp.where(pvalid & make_branch, wid, branch_ids[psafe])
        )
        path_branch = s.path_branch.at[psafe].set(
            jnp.where(pvalid & make_branch, wid, s.path_branch[psafe])
        )
        pos = jnp.arange(hop_cap, dtype=jnp.int32)
        path_pos = s.path_pos.at[psafe].set(
            jnp.where(pvalid & make_branch, pos, s.path_pos[psafe])
        )
        parents = s.parents.at[jnp.maximum(bid, 0)].set(
            jnp.where(make_branch, parent, s.parents[jnp.maximum(bid, 0)])
        )
        count = s.count + make_branch.astype(jnp.int32)
        return i + 1, _S(
            dist, allocated, branch_ids, path_branch, path_pos, parents,
            count, s.hop_hits + hop_hit.astype(jnp.int32),
        )

    iters, out = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
    work_left = jnp.max(out.dist) > 0
    return out, work_left, out.count < max_branches, iters


def sample_tree_device(
    medial_pts: jax.Array,
    medial_radii: jax.Array,
    preds: jax.Array,
    distances: jax.Array,
    component_mask: jax.Array,
    hop_cap: int = 2048,
    max_branches: int = 4096,
    branches_per_dispatch: int = 256,
) -> SampleTreeResult:
    state = _sample_init(preds, distances, component_mask, max_branches)
    jumps = build_jump_tables(jnp.asarray(preds, jnp.int32), hop_cap)
    total_iters = 0
    while True:
        state, work_left, under_cap, iters = _sample_chunk(
            medial_pts, medial_radii, jumps, state,
            hop_cap, max_branches, branches_per_dispatch,
        )
        work_left, under_cap = bool(work_left), bool(under_cap)
        total_iters += int(iters)
        if not (work_left and under_cap):
            break
    log.debug("sample_tree_device: %d greedy iterations", total_iters)
    return SampleTreeResult(
        path_branch=state.path_branch,
        path_pos=state.path_pos,
        branch_ids=state.branch_ids,
        branch_parents=state.parents,
        branch_count=state.count,
        hop_cap_hits=state.hop_hits,
        branch_cap_hit=work_left and not under_cap,
    )


def sample_tree(
    medial_pts,
    medial_radii,
    preds,
    distances,
    component_mask,
    hop_cap: int = 2048,
    max_branches: int = 4096,
    strict: bool = True,
    host_pts: "np.ndarray | None" = None,
    host_radii: "np.ndarray | None" = None,
) -> Dict[int, BranchSkeleton]:
    """Host wrapper: run the device loop, pull once, assemble branches.

    strict=True (default) raises when either static cap truncated real work
    (mirroring the inference overflow raise, infer/inference.py:205-210);
    strict=False keeps the truncated result.

    host_pts/host_radii: optional pre-fetched numpy copies of
    medial_pts/medial_radii — the skeletonizer calls this once per
    component over the SAME arrays, and re-downloading them each time costs
    a device->host transfer per component on thin interconnects."""
    medial_pts = jnp.asarray(medial_pts, jnp.float32)
    radii = jnp.asarray(medial_radii, jnp.float32).reshape(-1)
    res = sample_tree_device(
        medial_pts, radii, jnp.asarray(preds), jnp.asarray(distances),
        jnp.asarray(component_mask), hop_cap, max_branches,
    )
    if strict:
        if int(res.hop_cap_hits):
            raise RuntimeError(
                f"sample_tree: {int(res.hop_cap_hits)} trace(s) truncated at "
                f"hop_cap={hop_cap}; raise hop_cap"
            )
        if bool(res.branch_cap_hit):
            raise RuntimeError(
                f"sample_tree: unallocated vertices remain at "
                f"max_branches={max_branches}; raise max_branches"
            )
    path_branch, path_pos, parents, count = jax.device_get(
        (res.path_branch, res.path_pos, res.branch_parents, res.branch_count)
    )
    count = int(count)
    pts = host_pts if host_pts is not None else np.asarray(medial_pts)
    rad = (host_radii if host_radii is not None else np.asarray(radii)).reshape(-1)

    branches: Dict[int, BranchSkeleton] = {}
    for b, v in _branch_vertex_runs(path_branch, path_pos, count):
        branches[b] = BranchSkeleton(
            b, int(parents[b]), pts[v], rad[v].reshape(-1, 1)
        )
    return branches


def _branch_vertex_runs(path_branch, path_pos, count):
    """Yield (branch id, ordered member vertex ids) for every emitted
    branch with >= 2 vertices, from the packed in-place path encoding."""
    member = path_branch >= 0
    order = np.lexsort((path_pos[member], path_branch[member]))
    verts = np.nonzero(member)[0][order]
    bids = path_branch[member][order]
    starts = np.searchsorted(bids, np.arange(count))
    ends = np.searchsorted(bids, np.arange(count), side="right")
    for b in range(count):
        v = verts[starts[b] : ends[b]]
        if len(v) >= 2:
            yield b, v


def sample_forest(
    medial_pts,
    medial_radii,
    preds,
    distances,
    component_mask,
    labels_np: np.ndarray,
    hop_cap: int = 2048,
    max_branches: int = 4096,
    strict: bool = True,
    host_pts: "np.ndarray | None" = None,
    host_radii: "np.ndarray | None" = None,
) -> Dict[int, Dict[int, BranchSkeleton]]:
    """sample_tree over the UNION of all selected components in ONE device
    run, split per component afterwards.

    Exactly equivalent to one sample_tree per component (up to branch
    renumbering): allocation state is per-vertex and components are
    vertex-disjoint, so extracting a branch in one component never changes
    another component's farthest-unallocated argmax sequence; traces follow
    predecessors, which stay within a component; parents are the owners of
    termination vertices, also same-component. Per-component ids are
    assigned by extraction order, matching the per-component runs. One
    dispatch chain instead of one per component — the per-component loop
    was the last multi-dispatch stage of the skeletonizer (round-5 host-gap
    work, docs/PERF.md).

    Returns {component label: {branch id: BranchSkeleton}}.
    """
    medial_pts = jnp.asarray(medial_pts, jnp.float32)
    radii = jnp.asarray(medial_radii, jnp.float32).reshape(-1)
    res = sample_tree_device(
        medial_pts, radii, jnp.asarray(preds), jnp.asarray(distances),
        jnp.asarray(component_mask), hop_cap, max_branches,
    )
    if strict:
        if int(res.hop_cap_hits):
            raise RuntimeError(
                f"sample_forest: {int(res.hop_cap_hits)} trace(s) truncated "
                f"at hop_cap={hop_cap}; raise hop_cap"
            )
        if bool(res.branch_cap_hit):
            raise RuntimeError(
                f"sample_forest: unallocated vertices remain at "
                f"max_branches={max_branches}; raise max_branches"
            )
    path_branch, path_pos, parents, count = jax.device_get(
        (res.path_branch, res.path_pos, res.branch_parents, res.branch_count)
    )
    count = int(count)
    pts = host_pts if host_pts is not None else np.asarray(medial_pts)
    rad = (host_radii if host_radii is not None else np.asarray(radii)).reshape(-1)

    # split by component and renumber by extraction order (global branch
    # ids are monotone in extraction order, so sorting by global id within
    # a component reproduces the per-component id sequence)
    out: Dict[int, Dict[int, BranchSkeleton]] = {}
    local_id: Dict[int, int] = {}
    for b, v in _branch_vertex_runs(path_branch, path_pos, count):
        comp = int(labels_np[v[0]])
        comp_branches = out.setdefault(comp, {})
        lb = len(comp_branches)
        local_id[b] = lb
        gp = int(parents[b])
        lp = local_id.get(gp, -1) if gp >= 0 else -1
        comp_branches[lb] = BranchSkeleton(
            lb, lp, pts[v], rad[v].reshape(-1, 1)
        )
    return out
