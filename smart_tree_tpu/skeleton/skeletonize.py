"""Skeletonizer: medial cloud -> DisjointTreeSkeleton.

Rebuild of reference smart_tree/skeleton/skeletonize.py:18-95, restructured
TPU-first. The reference round-trips every connected component through
cugraph/cudf/pandas with renumbering; here components never leave the
device and are never renumbered — a per-component SSSP from that
component's root on the *global* padded edge list reaches exactly the
component (everything else stays at inf), so the only host work is the
small per-component loop and branch assembly.

Stages (parity with skeletonize.py:31-95):
  1. outlier_removal on medial points             (filter.py)
  2. nn_graph, radius clamped to min_connection   (graph.py, K=16)
  3. connected components >= minimum_graph_vertices, largest first
  4. per component: SSSP from lowest-y surface point -> predecessor tree
     -> pointer-doubled root distances -> greedy sample_tree
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..data.cloud import Cloud
from ..data.tree import DisjointTreeSkeleton, TreeSkeleton
from ..graph import chain_shortcut_table, component_sizes, tree_distances
from ..graph.components import _cc_rounds
from ..graph.sssp import _bf_chunk_tbl, _bf_chunk_tbl2, _dist_init, _pred_tbl
from ..graph.table import _build as _table_build
from .filter import outlier_removal
from .graph import nn_graph
from .path import sample_forest
from .quantize import medial_reduce


@jax.jit
def _component_roots(labels, keep, y, comp_ids):
    """Lowest-y surface vertex per component, all components at once.

    Two O(N) scatter-mins instead of a per-component argmin loop: first the
    min y per label bucket, then the min vertex id among that component's
    y-minimizers."""
    n = y.shape[0]
    safe_l = jnp.clip(labels, 0, n - 1)
    ymin = jnp.full((n,), jnp.inf).at[safe_l].min(jnp.where(keep, y, jnp.inf))
    is_min = keep & (y == ymin[safe_l])
    vid = jnp.arange(n, dtype=jnp.int32)
    root_of = jnp.full((n,), n, jnp.int32).at[safe_l].min(
        jnp.where(is_min, vid, n)
    )
    roots = root_of[jnp.clip(comp_ids, 0, n - 1)]
    return jnp.where((comp_ids >= 0) & (roots < n), roots, -1)

log = logging.getLogger(__name__)


@jax.jit
def _gather_reduced(medial_pts, radii, xyz, rep_idx):
    """Apply a medial_reduce representative selection in one dispatch."""
    n = medial_pts.shape[0]
    sel = jnp.minimum(rep_idx, n - 1)
    pad = rep_idx >= n
    return medial_pts[sel], radii[sel], xyz[sel], ~pad


@partial(
    jax.jit,
    static_argnames=("k", "cap", "max_components", "use_shortcuts",
                     "max_rounds"),
)
def _graph_program(
    medial_pts,
    radii,
    surface_y,
    keep,
    min_connection,
    min_vertices,
    k: int,
    cap: int,
    max_components: int,
    use_shortcuts: bool,
    max_rounds: int,
):
    """The ENTIRE graph stage in ONE device program: KNN graph, shortcut
    table, neighbor table, connected components, component selection,
    per-component roots, multi-source SSSP, predecessors, and
    pointer-doubled root distances.

    Why one program: through this environment's relay each dispatch costs
    3 ms-3 s of overhead; the round-4 stage bench measured an ~11 s gap
    between the stage sum and the whole forward — almost entirely the
    ~15 separate dispatches and scalar fetches between stages
    (docs/PERF.md round-4 table). Overflow/convergence are returned as
    scalars and checked by the host AFTER the single fetch; the
    counts-driven-retry pattern reruns the program with a doubled cap
    (rare — cap 4K covers the reduced graph with margin).
    """
    n = medial_pts.shape[0]
    graph = nn_graph(
        medial_pts, jnp.maximum(radii, min_connection), k=k, valid=keep
    )

    sc_idx = sc_w = None
    if use_shortcuts:
        sc_idx, sc_w = chain_shortcut_table(
            graph.edges[:, 1].reshape(n, k),
            graph.weights.reshape(n, k),
            graph.valid.reshape(n, k),
        )

    # symmetrized gather table over the real edges (graph/table.py _build:
    # both directions, sort by dst, searchsorted segments)
    e = graph.edges
    srcs = jnp.concatenate([e[:, 0], e[:, 1]])
    dsts = jnp.concatenate([e[:, 1], e[:, 0]])
    ws = jnp.concatenate([graph.weights, graph.weights])
    vals = jnp.concatenate([graph.valid, graph.valid])
    reals = jnp.ones_like(vals)
    table, tbl_overflow = _table_build(srcs, dsts, ws, vals, reals, n, cap)

    if use_shortcuts:
        labels = _cc_rounds(table.idx, table.w, n, sc_idx, sc_w,
                            has_shortcuts=True)
    else:
        labels = _cc_rounds(table.idx, table.w, n)
    labels = jnp.where(keep, labels, jnp.arange(n, dtype=jnp.int32))
    sizes = component_sizes(labels, keep)

    # component selection ON DEVICE: labels are min vertex ids, so sizes
    # is nonzero exactly at component roots; top_k orders by size desc
    # (the reference sorts components by size, data_types/graph.py:32-51)
    top_sizes, comp_ids = jax.lax.top_k(sizes, max_components)
    comp_ids = jnp.where(top_sizes >= min_vertices, comp_ids, -1).astype(
        jnp.int32
    )

    roots = _component_roots(labels, keep, surface_y, comp_ids)

    dist = _dist_init(roots, n)
    tol = jnp.float32(1e-6 if use_shortcuts else 0.0)
    if use_shortcuts:
        dist, sssp_changed, rounds = _bf_chunk_tbl2(
            table.idx, table.w, sc_idx, sc_w, dist, max_rounds, tol
        )
    else:
        dist, sssp_changed, rounds = _bf_chunk_tbl(
            table.idx, table.w, dist, max_rounds, tol
        )
    preds = _pred_tbl(table, roots, dist, n)

    step = jnp.linalg.norm(
        medial_pts - medial_pts[jnp.maximum(preds, 0)], axis=1
    )
    root_dist = tree_distances(preds, step, n)

    return (labels, sizes, comp_ids, roots, dist, preds, root_dist,
            tbl_overflow, sssp_changed, rounds)


@dataclass
class Skeletonizer:
    K: int = 16
    min_connection_length: float = 0.02
    minimum_graph_vertices: int = 32
    hop_cap: int = 4096
    max_components: int = 64
    max_branches: int = 1024
    strict: bool = True  # raise on hop/branch-cap truncation (see path.py)
    # extension (None = reference-faithful): clamp outlier-filter acceptance
    # radii so sub-voxel twigs survive — see skeleton/filter.py docstring.
    # Default ON at 0.02 m (mirroring the reference's min_connection_length
    # clamp, skeletonize.py:37) from the round-4 measurement campaign:
    # on predicted inputs it is a wash on standard eval trees (every metric
    # within +-0.4%, seeds 100/102/103, BASELINE.md) and recovers +8%
    # skeleton length (+4 branches) on the twig-rich e2e workload, with no
    # precision_dist cost; the gt-oracle ceiling lifts 36% -> 48%
    # (tools/diagnose_e2e.py). Set None for reference-faithful filtering.
    min_filter_radius: float | None = 0.02
    # chain-shortcut acceleration (graph/shortcuts.py): composite
    # relaxation edges collapse the Bellman-Ford/label-prop round count on
    # filament graphs; results unchanged up to float addition order.
    # Round 4 rejected the FLAT form (extras merged into the neighbor
    # table blew its cap 48 -> 128+, 0.13x); round 5 re-lands it as a
    # source-ALIGNED second gather table (chain_shortcut_table) with no
    # cap interaction — the main table stays at its real-edge cap and each
    # round pays one extra fixed-width gather. Default ON.
    sssp_shortcuts: bool = True
    # medial-point voxel reduction (skeleton/quantize.py): collapse
    # coincident medial points to one representative per cell BEFORE graph
    # construction. Predicted medial points pile onto the branch axis
    # (12.5x duplication at 1 cm on the bench tree), creating the hub
    # vertices and zero-length edges that made device SSSP unusable
    # (docs/PERF.md round-4). Default matches the pipeline's inference
    # voxel size (conf/pipeline.yaml:15); None = full unreduced graph
    # (reference-faithful, smart_tree/skeleton/skeletonize.py:31-95).
    medial_quantize: float | None = 0.01

    def _graph_stages_cpu(self, medial_pts, radii, xyz, keep, n):
        """The pre-fusion modular graph stage, kept for the CPU backend
        where sssp_multi auto-picks the scatter formulation (XLA:CPU
        scatters are cheap; the gather table pays for hub-widened caps).
        Bit-identical results to the fused program
        (tests/test_graph.py::test_gather_vs_scatter_bit_equivalence)."""
        from ..graph import build_neighbor_table, connected_components, sssp_multi

        graph = nn_graph(
            medial_pts,
            jnp.maximum(radii, self.min_connection_length),
            k=self.K,
            valid=keep,
        )
        shortcut_tbl = None
        if self.sssp_shortcuts:
            shortcut_tbl = chain_shortcut_table(
                graph.edges[:, 1].reshape(n, self.K),
                graph.weights.reshape(n, self.K),
                graph.valid.reshape(n, self.K),
            )
        table = build_neighbor_table(
            graph.edges, graph.weights, graph.valid, n, cap=4 * self.K
        )
        labels = connected_components(
            graph.edges, graph.valid, n, vertex_valid=keep, table=table,
            shortcut_tbl=shortcut_tbl,
        )
        sizes = component_sizes(labels, keep)
        sizes_np = np.asarray(sizes)
        comp_sel = np.nonzero(sizes_np >= self.minimum_graph_vertices)[0]
        comp_sel = comp_sel[np.argsort(-sizes_np[comp_sel])][
            : self.max_components
        ]
        comp_pad = np.full((self.max_components,), -1, np.int64)
        comp_pad[: len(comp_sel)] = comp_sel
        comp_ids_d = jnp.asarray(comp_pad, jnp.int32)
        roots = _component_roots(labels, keep, xyz[:, 1], comp_ids_d)
        dist, preds = sssp_multi(
            graph.edges, graph.weights, graph.valid, roots, n,
            shortcut_tbl=shortcut_tbl, table=table,
        )
        step = jnp.linalg.norm(
            medial_pts - medial_pts[jnp.maximum(preds, 0)], axis=1
        )
        root_dist = tree_distances(preds, step, n)
        return labels, sizes, comp_ids_d, preds, root_dist

    def forward(self, cloud: Cloud) -> DisjointTreeSkeleton:
        cloud = cloud.device()
        medial_pts = jnp.asarray(cloud.medial_pts, jnp.float32)
        radii = jnp.asarray(cloud.radius, jnp.float32).reshape(-1)
        xyz = jnp.asarray(cloud.xyz, jnp.float32)
        n = medial_pts.shape[0]

        keep = outlier_removal(
            medial_pts, radii, nb_points=8, min_radius=self.min_filter_radius
        )

        if self.medial_quantize:
            rep_idx, n_unique = medial_reduce(
                medial_pts, xyz[:, 1], keep, self.medial_quantize
            )
            medial_pts, radii, xyz, keep = _gather_reduced(
                medial_pts, radii, xyz, rep_idx
            )
            n = int(rep_idx.shape[0])
            log.info(
                "skeletonize: medial_quantize %.3f m -> %d unique cells "
                "(bucket %d)", self.medial_quantize, n_unique, n,
            )

        if jax.default_backend() == "cpu":
            # CPU lane: the modular path with the scatter-form SSSP —
            # measured 5x faster per round there than the gather table, and
            # dispatch overhead is nil on CPU so fusion buys nothing
            # (docs/PERF.md round-4/5)
            labels, sizes, comp_ids_d, preds, root_dist = (
                self._graph_stages_cpu(medial_pts, radii, xyz, keep, n)
            )
        else:
            # accelerator lane: the whole graph stage (KNN -> shortcuts ->
            # table -> CC -> component selection -> roots -> SSSP ->
            # predecessors -> root distances) runs as ONE device program;
            # overflow/convergence scalars come back with the single fetch
            # below and drive the counts-driven retry (docs/PERF.md
            # round-4: the per-stage dispatch/fetch gap was ~11 s of the
            # 27.4 s total)
            cap = 4 * self.K
            max_rounds = 4096
            while True:
                (labels, sizes, comp_ids_d, roots, dist, preds, root_dist,
                 tbl_overflow, sssp_changed, rounds) = _graph_program(
                    medial_pts, radii, xyz[:, 1], keep,
                    jnp.float32(self.min_connection_length),
                    jnp.int32(self.minimum_graph_vertices),
                    k=self.K, cap=cap, max_components=self.max_components,
                    use_shortcuts=self.sssp_shortcuts, max_rounds=max_rounds,
                )
                overflow, changed = jax.device_get(
                    (tbl_overflow, sssp_changed)
                )
                if int(overflow) > 0:
                    cap *= 2
                    log.info("skeletonize: neighbor-table overflow, "
                             "cap -> %d", cap)
                    continue
                if bool(changed):
                    max_rounds *= 4
                    log.info("skeletonize: SSSP unconverged at %d rounds, "
                             "retrying with %d", int(rounds), max_rounds)
                    continue
                break

        sizes_np, comp_ids, labels_np, host_pts, host_radii = jax.device_get(
            (sizes, comp_ids_d, labels, medial_pts, radii)
        )
        comp_ids = comp_ids[comp_ids >= 0]

        # ONE tracer run over the union of all selected components
        # (path.py::sample_forest — exactly equivalent to per-component
        # runs up to renumbering), then split per component
        union_mask = keep & jnp.isin(
            labels, jnp.asarray(comp_ids, jnp.int32)
        )
        per_comp = sample_forest(
            medial_pts,
            radii,
            preds,
            root_dist,
            union_mask,
            labels_np,
            hop_cap=self.hop_cap,
            max_branches=self.max_branches,
            strict=self.strict,
            host_pts=host_pts,
            host_radii=host_radii,
        )

        skeletons: List[TreeSkeleton] = []
        for skeleton_id, comp in enumerate(comp_ids):
            branches = per_comp.get(int(comp), {})
            log.info(
                "component %d: %d vertices -> %d branches",
                skeleton_id, int(sizes_np[comp]), len(branches),
            )
            if branches:
                skeletons.append(TreeSkeleton(skeleton_id, branches))

        return DisjointTreeSkeleton(skeletons)
