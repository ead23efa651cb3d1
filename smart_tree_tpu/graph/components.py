"""Connected components on padded edge lists — cugraph replacement.

The reference calls cugraph.connected_components + subgraph extraction
(smart_tree/data_types/graph.py:32-51). TPU formulation: min-label
propagation — every vertex carries the minimum vertex id of its component;
each round pulls the row-min of its neighbors' labels from the gather-form
neighbor table (graph/table.py — one [n, cap] gather, NO scatter; see
table.py for why scatter rounds are untenable on TPU) and then
pointer-doubles; converges in O(log n)-ish rounds for typical graphs,
under a convergence-checked lax.while_loop. No host round-trips beyond
the table build.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .table import NeighborTable, build_neighbor_table


@partial(jax.jit, static_argnames=("num_vertices", "has_shortcuts"))
def _cc_rounds(tbl_idx, tbl_w, num_vertices: int, sc_idx=None, sc_w=None,
               has_shortcuts: bool = False):
    n = num_vertices
    empty = ~jnp.isfinite(tbl_w)  # [n, cap] padding entries
    big = jnp.int32(n)
    if has_shortcuts:
        sc_empty = ~jnp.isfinite(sc_w)

    def cond(state):
        labels, changed = state
        return changed

    def body(state):
        labels, _ = state
        lnbr = jnp.where(empty, big, labels[tbl_idx])  # [n, cap]
        new = jnp.minimum(labels, jnp.min(lnbr, axis=1))
        if has_shortcuts:
            # shortcut endpoints are same-component by construction
            # (composite REAL paths) — labels propagate along them too,
            # collapsing rounds on filament graphs like SSSP relaxation
            lsc = jnp.where(sc_empty, big, new[sc_idx])
            new = jnp.minimum(new, jnp.min(lsc, axis=1))
        # pointer doubling (labels form a decreasing pointer forest)
        for _ in range(2):
            new = jnp.minimum(new, new[new])
        changed = jnp.any(new != labels)
        return new, changed

    labels0 = jnp.arange(n, dtype=jnp.int32)
    labels, _ = jax.lax.while_loop(cond, body, (labels0, jnp.bool_(True)))
    return labels


def connected_components(
    edges: jax.Array,
    edge_valid: jax.Array,
    num_vertices: int,
    vertex_valid: jax.Array | None = None,
    table: NeighborTable | None = None,
    shortcut_tbl=None,
) -> jax.Array:
    """labels [num_vertices] int32: min vertex id of each component.

    edges: [E,2] int32 (undirected), edge_valid: [E] bool. Invalid vertices
    keep their own id as label. `table`: optional prebuilt NeighborTable
    over the same edges (the skeletonizer shares one with sssp_multi; a
    table with relaxation-only extras is fine — shortcut edges connect
    vertices already in the same component). `shortcut_tbl`: optional
    aligned (idx2, w2) composite-edge table (chain_shortcut_table) for
    round-count collapse on filament graphs.
    """
    n = num_vertices
    if table is None:
        table = build_neighbor_table(
            edges, jnp.zeros(edges.shape[0], jnp.float32), edge_valid, n
        )
    if shortcut_tbl is not None:
        labels = _cc_rounds(
            table.idx, table.w, n, shortcut_tbl[0], shortcut_tbl[1],
            has_shortcuts=True,
        )
    else:
        labels = _cc_rounds(table.idx, table.w, n)
    if vertex_valid is not None:
        labels = jnp.where(vertex_valid, labels, jnp.arange(n, dtype=jnp.int32))
    return labels


def component_sizes(labels: jax.Array, vertex_valid: jax.Array) -> jax.Array:
    """[num_vertices] size of the component rooted at each label id
    (0 elsewhere)."""
    n = labels.shape[0]
    ones = vertex_valid.astype(jnp.int32)
    return jnp.zeros((n,), jnp.int32).at[labels].add(ones)
