"""Chain-shortcut edges: exponential-reach composites that collapse
Bellman-Ford round counts on filament graphs.

Exact SSSP relaxation advances one hop per round, so rounds = hop depth of
the shortest-path forest — thousands on a tall tree at 1 cm voxels
(tools/bench_sssp.py measured 2,584 rounds on a 4 m tree), and each round
is a full-edge-list scatter. The skeleton graph is filament-shaped (KNN
over medial points of branches), so a tiny set of long composite edges
compresses it: level l holds, per vertex, the `keep` farthest endpoints
reachable by composing two level-(l-1) shortcuts — real path lengths, so
relaxing over them can never undercut a true shortest path, while reach
doubles per level. Relaxation runs over originals + shortcuts; predecessor
extraction stays on the ORIGINAL edges (true shortest paths use real
edges), so `sssp_multi` results are unchanged up to float addition order.

The reference has no analog (cugraph.sssp is a delta-stepping CUDA kernel,
smart_tree/skeleton/shortest_path.py:12-21); this is the TPU-shaped answer
to the same diameter problem: O(levels) extra scatter rounds of work buy
an exponential cut in sequential rounds.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _shortcut_levels(idxs, dists, valid, levels: int, keep: int):
    """Per-level [N, keep] composite endpoints/weights/valid lists; shared
    by the flat-edge and aligned-table outputs below."""
    n, k = idxs.shape
    vid = jnp.arange(n, dtype=jnp.int32)

    # level-0 seeds: the `keep` farthest real neighbors (longest reach
    # compresses chains fastest; exactness never depends on the choice)
    d0 = jnp.where(valid, dists, -jnp.inf)
    order = jnp.argsort(-d0, axis=1)[:, :keep]
    cur_i = jnp.take_along_axis(idxs, order, 1)
    cur_v = jnp.take_along_axis(valid, order, 1) & (cur_i >= 0)
    cur_d = jnp.where(cur_v, jnp.take_along_axis(dists, order, 1), jnp.inf)
    cur_i = jnp.where(cur_v, cur_i, -1)

    out_i, out_d, out_v = [], [], []
    for _ in range(levels):
        mid = jnp.maximum(cur_i, 0)
        hop_i = cur_i[mid]                       # [N, keep, keep]
        hop_ok = cur_v[:, :, None] & cur_v[mid] & (hop_i >= 0)
        hop_ok &= hop_i != vid[:, None, None]    # drop round trips to self
        hop_d = cur_d[:, :, None] + cur_d[mid]
        score = jnp.where(hop_ok, hop_d, -jnp.inf).reshape(n, keep * keep)
        sel = jnp.argsort(-score, axis=1)[:, :keep]
        cur_i = jnp.take_along_axis(hop_i.reshape(n, keep * keep), sel, 1)
        cur_v = jnp.take_along_axis(hop_ok.reshape(n, keep * keep), sel, 1)
        cur_d = jnp.where(
            cur_v, jnp.take_along_axis(hop_d.reshape(n, keep * keep), sel, 1),
            jnp.inf,
        )
        cur_i = jnp.where(cur_v, cur_i, -1)
        out_i.append(cur_i)
        out_d.append(cur_d)
        out_v.append(cur_v)

    return (
        jnp.concatenate(out_i, axis=1),   # [N, levels*keep]
        jnp.concatenate(out_d, axis=1),
        jnp.concatenate(out_v, axis=1),
    )


@partial(jax.jit, static_argnames=("levels", "keep"))
def chain_shortcuts(
    idxs: jax.Array,
    dists: jax.Array,
    valid: jax.Array,
    levels: int = 8,
    keep: int = 4,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Build shortcut edges from a [N, k] KNN adjacency.

    idxs  [N, k] int32 neighbor rows (-1 = missing)
    dists [N, k] float32 edge weights
    valid [N, k] bool — edge usable (source kept & radius-gated)

    Returns (edges [N*levels*keep, 2] int32, weights [...], valid [...]):
    for every level l in [1, levels], per-vertex `keep` composite edges
    whose weight is the summed length of a real 2^l-hop-bounded path.
    """
    n, _ = idxs.shape
    vid = jnp.arange(n, dtype=jnp.int32)
    ci, cd, cv = _shortcut_levels(idxs, dists, valid, levels, keep)
    dst = ci.reshape(-1)
    w = cd.reshape(-1)
    ev = cv.reshape(-1) & jnp.isfinite(w)
    src = jnp.broadcast_to(vid[:, None], (n, levels * keep)).reshape(-1)
    edges = jnp.stack([src, jnp.maximum(dst, 0)], axis=1)
    return edges, jnp.where(ev, w, jnp.inf), ev


@partial(jax.jit, static_argnames=("levels", "keep"))
def chain_shortcut_table(
    idxs: jax.Array,
    dists: jax.Array,
    valid: jax.Array,
    levels: int = 10,
    keep: int = 4,
) -> Tuple[jax.Array, jax.Array]:
    """Source-ALIGNED shortcut table: (idx2 [N, levels*keep] int32,
    w2 [...] float32, inf where empty) — row v holds v's own composite
    endpoints, so relaxation is one extra fixed-width gather per round
    (`min(dist, row-min(dist[idx2] + w2))`; valid by path symmetry on an
    undirected graph).

    This is what makes shortcuts pay on TPU: merging them into the main
    neighbor table (round 4) widened its cap 48 -> 128+ for EVERY round
    (hub vertices aggregate incoming shortcuts), a 0.13x regression
    (docs/PERF.md). The aligned form has no cap interaction at all —
    per-vertex width is levels*keep by construction."""
    ci, cd, cv = _shortcut_levels(idxs, dists, valid, levels, keep)
    ok = cv & jnp.isfinite(cd)
    return (
        jnp.where(ok, ci, 0).astype(jnp.int32),
        jnp.where(ok, cd, jnp.inf),
    )
