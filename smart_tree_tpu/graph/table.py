"""Gather-form neighbor table: the TPU-shaped adjacency for iterative
graph algorithms (SSSP relaxation, connected-components label propagation).

Why: the flat-edge-list formulation relaxes with `dist.at[v].min(...)` —
an arbitrary-duplicate-index SCATTER, which XLA:TPU lowers to effectively
serial updates. At skeleton scale (219k vertices, 3.5M edges) one
Bellman-Ford round took seconds and the unbounded run blew the relay's
RPC deadline (round-4 campaign log). A KNN graph has bounded degree, so
the same relaxation is a pure GATHER + row-min over a per-vertex neighbor
table `dist_new[v] = min(dist[v], min_c(dist[tbl.idx[v,c]] + tbl.w[v,c]))`
— one [n, cap] gather per round, no scatter anywhere.

Build is sort + searchsorted + gather only (no scatter): both edge
directions are sorted by destination, per-vertex segments located by
searchsorted, and the table gathered from the sorted arrays at
`start[v] + arange(cap)`. Degree overflow beyond `cap` is COUNTED and
surfaced; `build_neighbor_table` retries with a doubled cap (the
counts-driven-retry pattern used across this repo) so results are always
exact.

`real` marks entries that come from original edges (True) vs auxiliary
relaxation-only edges such as chain shortcuts (graph/shortcuts.py) —
predecessor extraction must ignore the latter.

Reference boundary: cugraph's CSR adjacency behind cugraph.sssp /
connected_components (smart_tree/skeleton/shortest_path.py:12-21,
smart_tree/data_types/graph.py:32-51); this is the static-shape,
gather-only TPU equivalent.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

INF = jnp.float32(jnp.inf)


class NeighborTable(NamedTuple):
    idx: jax.Array   # [n, cap] int32 neighbor vertex (0 where empty)
    w: jax.Array     # [n, cap] float32 edge weight (inf where empty)
    real: jax.Array  # [n, cap] bool: entry from an original (non-aux) edge


@partial(jax.jit, static_argnames=("num_vertices", "cap"))
def _build(
    srcs, dsts, ws, vals, reals, num_vertices: int, cap: int
) -> Tuple[NeighborTable, jax.Array]:
    n = num_vertices
    e2 = srcs.shape[0]
    key = jnp.where(vals, dsts, n)  # invalid edges sort past every vertex
    order = jnp.argsort(key)
    sd = key[order]
    ss = jnp.where(vals[order], srcs[order], 0).astype(jnp.int32)
    sw = jnp.where(vals[order], ws[order], INF)
    sr = reals[order] & vals[order]
    vid = jnp.arange(n, dtype=sd.dtype)
    start = jnp.searchsorted(sd, vid, side="left", method="sort")
    end = jnp.searchsorted(sd, vid, side="right", method="sort")
    pos = start[:, None] + jnp.arange(cap, dtype=start.dtype)[None, :]
    ok = pos < end[:, None]
    posc = jnp.clip(pos, 0, e2 - 1)
    tbl = NeighborTable(
        idx=jnp.where(ok, ss[posc], 0),
        w=jnp.where(ok, sw[posc], INF),
        real=jnp.where(ok, sr[posc], False),
    )
    overflow = jnp.sum(jnp.maximum(end - start - cap, 0))
    return tbl, overflow


def build_neighbor_table(
    edges: jax.Array,
    weights: jax.Array,
    edge_valid: jax.Array,
    num_vertices: int,
    extra: Tuple[jax.Array, jax.Array, jax.Array] | None = None,
    cap: int = 48,
    max_cap: int = 4096,
) -> NeighborTable:
    """Symmetrized [n, cap] neighbor table from an undirected edge list.

    edges [E,2] int32, weights [E] float32, edge_valid [E] bool.
    extra: optional (edges, weights, valid) of auxiliary relaxation-only
    edges (chain shortcuts) — included in the table with real=False.
    cap: initial per-vertex capacity; doubled (recompiling) on overflow
    until every incident edge fits, so the table is always exact. The one
    scalar `overflow` fetch per attempt is the only host round-trip.
    """
    u, v, w = edges[:, 0], edges[:, 1], weights
    srcs = [u, v]
    dsts = [v, u]
    ws = [w, w]
    vals = [edge_valid, edge_valid]
    reals = [jnp.ones_like(edge_valid), jnp.ones_like(edge_valid)]
    if extra is not None:
        se, sw_, sv = extra
        srcs += [se[:, 0], se[:, 1]]
        dsts += [se[:, 1], se[:, 0]]
        ws += [sw_, sw_]
        vals += [sv, sv]
        reals += [jnp.zeros_like(sv), jnp.zeros_like(sv)]
    srcs = jnp.concatenate(srcs)
    dsts = jnp.concatenate(dsts)
    ws = jnp.concatenate(ws)
    vals = jnp.concatenate(vals)
    reals = jnp.concatenate(reals)
    while True:
        tbl, overflow = _build(srcs, dsts, ws, vals, reals, num_vertices, cap)
        if int(overflow) == 0:
            return tbl
        if cap >= max_cap:
            raise RuntimeError(
                f"neighbor table overflow at cap={cap} "
                f"({int(overflow)} edges dropped); degree exceeds max_cap="
                f"{max_cap} — a hub vertex (duplicate points?) in the graph"
            )
        cap = min(cap * 2, max_cap)
