"""Single-source shortest paths with predecessors — cugraph.sssp replacement.

The reference runs cugraph.sssp twice per component
(smart_tree/skeleton/skeletonize.py:73-85, shortest_path.py:12-21): once on
the KNN graph for the path tree, once on the predecessor tree for true
root distances. TPU formulation:

  sssp:            Bellman-Ford relaxation in GATHER form over a
                   symmetrized neighbor table (graph/table.py) —
                   `min(dist, row-min(dist[tbl.idx] + tbl.w))` per round,
                   one [n, cap] gather, NO scatter — under a
                   convergence-checked lax.while_loop; predecessors
                   recovered afterwards because the converged distances
                   satisfy dist[v] = dist[pred]+w. (A flat-edge-list
                   scatter formulation is kept as method="scatter" for
                   comparison benches: XLA:TPU lowers duplicate-index
                   scatter-min effectively serially — at 219k vertices /
                   3.5M edges one scatter round cost seconds and blew the
                   relay RPC deadline, round-4 campaign log.)
  tree_distances:  for the second pass the graph IS a tree, so root
                   distances accumulate by pointer doubling in O(log n)
                   steps — no iteration-to-convergence at all.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .table import NeighborTable, build_neighbor_table

INF = jnp.float32(jnp.inf)


def sssp(
    edges: jax.Array,
    weights: jax.Array,
    edge_valid: jax.Array,
    source: jax.Array,
    num_vertices: int,
) -> Tuple[jax.Array, jax.Array]:
    """Undirected weighted SSSP (single source — see sssp_multi)."""
    return sssp_multi(
        edges, weights, edge_valid,
        jnp.asarray(source, jnp.int32).reshape(1), num_vertices,
    )


@partial(jax.jit, static_argnames=("num_vertices",))
def _bf_init(edges, weights, edge_valid, sources, num_vertices):
    n = num_vertices
    u = jnp.where(edge_valid, edges[:, 0], 0)
    v = jnp.where(edge_valid, edges[:, 1], 0)
    w = jnp.where(edge_valid, weights, INF)
    src_safe = jnp.clip(sources, 0, n - 1)
    dist0 = jnp.full((n,), INF).at[src_safe].min(
        jnp.where(sources >= 0, 0.0, INF)
    )
    return u, v, w, dist0


@partial(jax.jit, static_argnames=("max_rounds",), donate_argnums=(3,))
def _bf_chunk(u, v, w, dist, max_rounds: int, tol=0.0):
    """Up to max_rounds Bellman-Ford relaxation rounds in ONE device
    program. Bounding the per-dispatch round count keeps each device call
    under this environment's relay RPC deadline (a ~70 s single program
    faulted the chip — docs/PERF.md); the host re-dispatches on a scalar
    `changed` fetch with dist left device-resident, so the chunking costs
    one scalar roundtrip per chunk, not a dist transfer.

    `tol`: improvements are always APPLIED exactly (.min), but only count
    as progress when they exceed tol. With shortcut edges, composite path
    sums differ from sequential sums by float addition order, and the
    exact change detector would chase that ulp-level refinement wave one
    hop per round — the full diameter the shortcuts exist to avoid."""

    def cond(state):
        dist, changed, rounds = state
        return changed & (rounds < max_rounds)

    def body(state):
        dist, _, rounds = state
        cand_v = dist[u] + w  # relax u -> v
        cand_u = dist[v] + w  # relax v -> u
        new = dist
        new = new.at[v].min(cand_v)
        new = new.at[u].min(cand_u)
        # tol is RELATIVE (+ equal absolute floor): the refinements to
        # suppress are 1-ulp corrections, which scale with |dist|
        thresh = jnp.where(jnp.isfinite(dist), dist - tol * dist - tol, INF)
        return new, jnp.any(new < thresh), rounds + 1

    dist, changed, rounds = jax.lax.while_loop(
        cond, body, (dist, jnp.bool_(True), jnp.int32(0))
    )
    return dist, changed, rounds


@partial(jax.jit, static_argnames=("max_rounds",), donate_argnums=(2,))
def _bf_chunk_tbl(tbl_idx, tbl_w, dist, max_rounds: int, tol=0.0):
    """Gather-form Bellman-Ford rounds: same chunked-dispatch and `tol`
    contract as _bf_chunk (see its docstring), but each round is one
    [n, cap] gather + row-min over the neighbor table — no scatter."""

    def cond(state):
        dist, changed, rounds = state
        return changed & (rounds < max_rounds)

    def body(state):
        dist, _, rounds = state
        cand = dist[tbl_idx] + tbl_w  # [n, cap]; empty entries are +inf
        new = jnp.minimum(dist, jnp.min(cand, axis=1))
        thresh = jnp.where(jnp.isfinite(dist), dist - tol * dist - tol, INF)
        return new, jnp.any(new < thresh), rounds + 1

    dist, changed, rounds = jax.lax.while_loop(
        cond, body, (dist, jnp.bool_(True), jnp.int32(0))
    )
    return dist, changed, rounds


@partial(jax.jit, static_argnames=("max_rounds",), donate_argnums=(4,))
def _bf_chunk_tbl2(tbl_idx, tbl_w, sc_idx, sc_w, dist, max_rounds: int,
                   tol=0.0):
    """Gather-form Bellman-Ford with a SECOND, source-aligned shortcut
    table (graph/shortcuts.py::chain_shortcut_table): each round relaxes
    over the real-edge table and over each vertex's own composite
    endpoints — two fixed-width gathers, no scatter, no cap interaction.
    Shortcut weights are real path sums, so no relaxation can undercut a
    true shortest path; convergence collapses from hop-depth rounds to
    ~log(depth) (600-chain: 600 -> 10 rounds, docs/PERF.md round-3)."""

    def cond(state):
        dist, changed, rounds = state
        return changed & (rounds < max_rounds)

    def body(state):
        dist, _, rounds = state
        cand = dist[tbl_idx] + tbl_w
        new = jnp.minimum(dist, jnp.min(cand, axis=1))
        cand2 = dist[sc_idx] + sc_w
        new = jnp.minimum(new, jnp.min(cand2, axis=1))
        thresh = jnp.where(jnp.isfinite(dist), dist - tol * dist - tol, INF)
        return new, jnp.any(new < thresh), rounds + 1

    dist, changed, rounds = jax.lax.while_loop(
        cond, body, (dist, jnp.bool_(True), jnp.int32(0))
    )
    return dist, changed, rounds


@partial(jax.jit, static_argnames=("num_vertices",))
def _dist_init(sources, num_vertices: int):
    n = num_vertices
    src_safe = jnp.clip(sources, 0, n - 1)
    return jnp.full((n,), INF).at[src_safe].min(
        jnp.where(sources >= 0, 0.0, INF)
    )


def sssp_multi(
    edges: jax.Array,
    weights: jax.Array,
    edge_valid: jax.Array,
    sources: jax.Array,
    num_vertices: int,
    return_rounds: bool = False,
    rounds_per_dispatch: int = 256,
    shortcuts: Tuple[jax.Array, jax.Array, jax.Array] | None = None,
    shortcut_tbl: Tuple[jax.Array, jax.Array] | None = None,
    table: NeighborTable | None = None,
    method: str | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Undirected weighted shortest paths from MULTIPLE sources in one
    Bellman-Ford pass.

    The skeletonizer needs one SSSP per connected component (reference
    skeletonize.py:73-85 loops cugraph.sssp per component); since component
    vertex sets are disjoint, seeding every component's root at distance 0
    solves all of them simultaneously over the global padded edge list —
    O(E * diameter) total instead of O(C * E * diameter).

    Rounds run in device programs of at most `rounds_per_dispatch`
    relaxations each (host re-dispatch while changed): exact-SSSP frontiers
    advance one hop per round, so total rounds = shortest-path-forest hop
    depth (thousands on a tall tree at 1 cm voxels) — an unbounded single
    program can exceed the relay's RPC deadline and fault the chip.

    edges [E,2] int32, weights [E] float32 >= 0, edge_valid [E] bool,
    sources [S] int32 (-1 entries are padding).

    Returns (dist [n] float32 — inf if unreachable from every source,
             pred [n] int32 — predecessor on a shortest path, -1 at the
             sources and at unreachable vertices), matching cugraph.sssp's
    vertex/predecessor/distance contract per component.

    `shortcuts` — optional (edges, weights, valid) from
    graph/shortcuts.py::chain_shortcuts: composite real-path edges used for
    RELAXATION ONLY (they collapse the round count exponentially on
    filament graphs); predecessor extraction stays on the original edges,
    so the returned forest is identical up to float addition order.

    `shortcut_tbl` — optional (idx2 [n,S], w2 [n,S]) ALIGNED shortcut table
    (graph/shortcuts.py::chain_shortcut_table), the gather-method form of
    the same acceleration: a second fixed-width gather per round instead of
    extra table entries, so the main table's cap never widens (the failure
    mode that made flat `shortcuts` a 0.13x regression on device, round 4).

    `table` — optional prebuilt NeighborTable (graph/table.py) covering
    the SAME edges (+ shortcuts as real=False extras); pass it when the
    caller already built one (the skeletonizer shares a table between
    connected_components and sssp_multi). `method`: None auto-picks by
    backend — "gather" on accelerators (XLA:TPU lowers duplicate-index
    scatter-min effectively serially; docs/PERF.md round-4), "scatter" on
    CPU (measured 5x faster per round there: scatter is cheap on CPU and
    the gather table pays for hub-widened caps).
    """
    n = num_vertices
    if method is None:
        method = "scatter" if jax.default_backend() == "cpu" else "gather"
    # with shortcuts, sub-tolerance (addition-order) refinements must not
    # count as progress or the round count regrows toward the diameter;
    # 1e-6 m is geometrically nil and well under _bf_pred's 1e-5 tolerance
    tol = 1e-6 if (shortcuts is not None or shortcut_tbl is not None) else 0.0
    rounds = 0
    if method == "gather":
        if table is None:
            table = build_neighbor_table(
                edges, weights, edge_valid, n, extra=shortcuts
            )
        dist = _dist_init(sources, n)
        while True:
            if shortcut_tbl is not None:
                dist, changed, r = _bf_chunk_tbl2(
                    table.idx, table.w, shortcut_tbl[0], shortcut_tbl[1],
                    dist, rounds_per_dispatch, jnp.float32(tol),
                )
            else:
                dist, changed, r = _bf_chunk_tbl(
                    table.idx, table.w, dist, rounds_per_dispatch,
                    jnp.float32(tol),
                )
            rounds += int(r)
            if not bool(changed):
                break
        pred = _pred_tbl(table, sources, dist, n)
    else:
        if shortcuts is None and shortcut_tbl is not None:
            # scatter path accelerates via flat extra edges; derive them
            # from the aligned table (same composite paths)
            idx2, w2 = shortcut_tbl
            s = idx2.shape[1]
            src = jnp.broadcast_to(
                jnp.arange(n, dtype=jnp.int32)[:, None], (n, s)
            ).reshape(-1)
            shortcuts = (
                jnp.stack([src, idx2.reshape(-1)], axis=1),
                w2.reshape(-1),
                jnp.isfinite(w2.reshape(-1)),
            )
        if shortcuts is not None:
            se, sw, sv = shortcuts
            redges = jnp.concatenate([edges, se], axis=0)
            rweights = jnp.concatenate([weights, sw], axis=0)
            rvalid = jnp.concatenate([edge_valid, sv], axis=0)
        else:
            redges, rweights, rvalid = edges, weights, edge_valid
        u, v, w, dist = _bf_init(redges, rweights, rvalid, sources, n)
        while True:
            dist, changed, r = _bf_chunk(
                u, v, w, dist, rounds_per_dispatch, jnp.float32(tol)
            )
            rounds += int(r)
            if not bool(changed):
                break
        if shortcuts is not None:
            ne = edges.shape[0]
            u, v, w = u[:ne], v[:ne], w[:ne]
        pred = _bf_pred(u, v, w, edge_valid, sources, dist, n)
    if return_rounds:
        # rounds == hop-depth of the shortest-path forest + 1 (the final
        # no-change round). Exposed for tools/bench_sssp.py (VERDICT r2
        # weak #6).
        return dist, pred, jnp.int32(rounds)
    return dist, pred


@partial(jax.jit, static_argnames=("num_vertices",))
def _pred_tbl(table, sources, dist, num_vertices: int):
    """Gather-form predecessor extraction over the neighbor table — the
    same candidate set and tie-breaks as _bf_pred (row v of the table
    holds exactly the vertices incident to v via original edges, both
    directions), so the returned forest is identical. Entries with
    real=False (shortcut edges) are excluded: true shortest paths use
    real edges only."""
    n = num_vertices
    u = table.idx  # [n, cap]
    w = table.w
    vid = jnp.arange(n, dtype=jnp.int32)[:, None]
    dv = dist[:, None]
    du = dist[u]
    tol = 1e-5 * jnp.abs(dv) + 1e-5
    near = du + w <= dv + tol
    acyclic = (du < dv) | ((du == dv) & (u < vid))
    hit = table.real & near & acyclic & jnp.isfinite(dv) & (u != vid)
    big = jnp.int32(n)
    cand = jnp.min(jnp.where(hit, u, big), axis=1)
    pred = jnp.where(cand < big, cand, -1)
    src_safe = jnp.clip(sources, 0, n - 1)
    is_src = jnp.zeros((n,), bool).at[src_safe].max(sources >= 0)
    return jnp.where(is_src, -1, pred)


@partial(jax.jit, static_argnames=("num_vertices",))
def _bf_pred(u, v, w, edge_valid, sources, dist, num_vertices: int):
    n = num_vertices
    src_safe = jnp.clip(sources, 0, n - 1)
    # Predecessor extraction. At the fixpoint dist[v] == fl(dist[u*] + w)
    # for a relaxation winner u*, but bit-exact matching is brittle: when
    # two points sit within one float32 ulp, parallel edge copies (the KNN
    # graph stores (i,j) and (j,i) with independently-rounded weights) can
    # leave a vertex whose only exact match violates the tie-break. Use a
    # small tolerance instead; the acyclicity guard (strict dist decrease,
    # or exact-equal dist broken by vertex id) keeps the forest cycle-free —
    # any cycle would need zero total decrease, forcing all-equal dists and
    # strictly increasing ids, a contradiction. Self-loops are excluded
    # (the KNN graph contains (i,i) at weight 0).
    pred = jnp.full((n,), -1, jnp.int32)
    ne = edge_valid & (u != v)

    def _hit(src, dst):
        # abs term covers duplicate-point clusters whose minimum member must
        # exit via a near-tie outside edge; 1e-5 m is geometrically nil
        tol = 1e-5 * jnp.abs(dist[dst]) + 1e-5
        near = dist[src] + w <= dist[dst] + tol
        acyclic = (dist[src] < dist[dst]) | (
            (dist[src] == dist[dst]) & (src < dst)
        )
        return ne & near & acyclic & jnp.isfinite(dist[dst])

    hit_v = _hit(u, v)
    hit_u = _hit(v, u)
    big = jnp.int32(n)
    cand = jnp.full((n,), big, jnp.int32)
    cand = cand.at[jnp.where(hit_v, v, 0)].min(jnp.where(hit_v, u, big))
    cand = cand.at[jnp.where(hit_u, u, 0)].min(jnp.where(hit_u, v, big))
    pred = jnp.where((cand < big), cand, -1)
    # force pred=-1 at the sources with a duplicate-safe scatter: padding
    # sources (-1, clipped to 0) must not race a REAL root at vertex 0 —
    # .set with duplicate indices is nondeterministic (ADVICE r2); .max of
    # booleans is order-independent.
    is_src = jnp.zeros((n,), bool).at[src_safe].max(sources >= 0)
    pred = jnp.where(is_src, -1, pred)
    return pred


@partial(jax.jit, static_argnames=("num_vertices",))
def tree_distances(
    pred: jax.Array,
    step_weight: jax.Array,
    num_vertices: int,
) -> jax.Array:
    """Root distance along a predecessor tree by pointer doubling.

    pred [n] int32 (-1 at roots), step_weight [n] float32 (distance from
    each vertex to its predecessor; ignored at roots). O(log n) steps.
    """
    n = num_vertices
    d = jnp.where(pred >= 0, step_weight, 0.0)
    p = pred
    steps = max(int(n - 1).bit_length(), 1)

    # accumulate: d_i += d_{p_i}; p_i = p_{p_i} (reads are from the previous
    # iterate — jnp arrays are immutable, so no double counting)
    def body2(_, state):
        d, p = state
        has = p >= 0
        pc = jnp.clip(p, 0, n - 1)
        d = d + jnp.where(has, d[pc], 0.0)
        p = jnp.where(has, p[pc], p)
        return d, p

    d, p = jax.lax.fori_loop(0, steps, body2, (d, p))
    return d
