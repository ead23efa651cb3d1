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
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..data.cloud import Cloud
from ..data.tree import DisjointTreeSkeleton, TreeSkeleton
from ..graph import (
    build_neighbor_table,
    component_sizes,
    connected_components,
    sssp_multi,
    tree_distances,
)
from .filter import outlier_removal
from .graph import nn_graph
from .path import sample_tree
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
    # chain-shortcut SSSP acceleration (graph/shortcuts.py): composite
    # relaxation edges collapse the Bellman-Ford round count on filament
    # graphs; results unchanged up to float addition order. OFF from the
    # round-4 on-device measurement (tools/bench_skeleton_stage.py, v5e,
    # 219k-point tree after medial reduction): the shortcut extras blow the
    # gather table cap 48 -> 128+ and every round pays the wider gather —
    # sssp 4.4 s plain vs 34.2 s with shortcuts (0.13x), whole forward
    # 27.4 s vs 82.8 s. The mechanism only pays in the scatter (CPU)
    # formulation it was designed against (1.8x there, docs/PERF.md).
    sssp_shortcuts: bool = False
    # medial-point voxel reduction (skeleton/quantize.py): collapse
    # coincident medial points to one representative per cell BEFORE graph
    # construction. Predicted medial points pile onto the branch axis
    # (12.5x duplication at 1 cm on the bench tree), creating the hub
    # vertices and zero-length edges that made device SSSP unusable
    # (docs/PERF.md round-4). Default matches the pipeline's inference
    # voxel size (conf/pipeline.yaml:15); None = full unreduced graph
    # (reference-faithful, smart_tree/skeleton/skeletonize.py:31-95).
    medial_quantize: float | None = 0.01

    def forward(self, cloud: Cloud) -> DisjointTreeSkeleton:
        cloud = cloud.device()
        medial_pts = jnp.asarray(cloud.medial_pts, jnp.float32)
        radii = jnp.asarray(cloud.radius, jnp.float32).reshape(-1)
        xyz = jnp.asarray(cloud.xyz, jnp.float32)
        n = medial_pts.shape[0]

        keep = outlier_removal(
            medial_pts, radii, nb_points=8, min_radius=self.min_filter_radius
        )
        log.info("skeletonize: %d medial pts, %d after outlier removal",
                 n, int(keep.sum()))

        if self.medial_quantize:
            rep_idx, n_unique = medial_reduce(
                medial_pts, xyz[:, 1], keep, self.medial_quantize
            )
            sel = jnp.minimum(rep_idx, n - 1)
            pad = rep_idx >= n
            medial_pts = medial_pts[sel]
            radii = radii[sel]
            xyz = xyz[sel]
            keep = ~pad
            n = int(rep_idx.shape[0])
            log.info(
                "skeletonize: medial_quantize %.3f m -> %d unique cells "
                "(bucket %d)", self.medial_quantize, n_unique, n,
            )

        graph = nn_graph(
            medial_pts,
            jnp.clip(radii, min=self.min_connection_length),
            k=self.K,
            valid=keep,
        )

        shortcuts = None
        if self.sssp_shortcuts:
            from ..graph import chain_shortcuts

            # nn_graph lays edges out as [n*K] rows with src = i at row
            # i*K + j (skeleton/graph.py::nn_graph), so the [n, K] KNN
            # adjacency is a reshape away
            shortcuts = chain_shortcuts(
                graph.edges[:, 1].reshape(n, self.K),
                graph.weights.reshape(n, self.K),
                graph.valid.reshape(n, self.K),
            )
        # ONE gather-form neighbor table (graph/table.py) serves CC label
        # propagation, SSSP relaxation, and predecessor extraction —
        # shortcut edges ride along as real=False relaxation-only entries
        table = build_neighbor_table(
            graph.edges, graph.weights, graph.valid, n, extra=shortcuts,
            cap=4 * self.K,
        )
        labels = connected_components(
            graph.edges, graph.valid, n, vertex_valid=keep, table=table
        )
        sizes = component_sizes(labels, keep)

        # component ids = min vertex ids; pick those above threshold,
        # largest first (reference graph.py sorts components by size)
        sizes_np = np.asarray(sizes)
        comp_ids = np.nonzero(sizes_np >= self.minimum_graph_vertices)[0]
        comp_ids = comp_ids[np.argsort(-sizes_np[comp_ids])][: self.max_components]

        # roots = lowest-y *surface* point per component (Cloud.root_idx
        # convention, reference cloud.py:204-206), ALL components at once,
        # then ONE multi-source SSSP solves every component's path tree
        # simultaneously (components are vertex-disjoint) — the reference
        # loops cugraph.sssp per component (skeletonize.py:73-85)
        comp_pad = np.full((self.max_components,), -1, np.int64)
        comp_pad[: len(comp_ids)] = comp_ids
        roots = _component_roots(
            labels, keep, xyz[:, 1], jnp.asarray(comp_pad, jnp.int32)
        )
        dist, preds = sssp_multi(
            graph.edges, graph.weights, graph.valid, roots, n,
            shortcuts=shortcuts, table=table,
        )
        # predecessor forest with euclidean medial-space step weights
        # (reference shortest_path.py:46-56 + second sssp)
        step = jnp.linalg.norm(
            medial_pts - medial_pts[jnp.maximum(preds, 0)], axis=1
        )
        root_dist = tree_distances(preds, step, n)

        skeletons: List[TreeSkeleton] = []
        for skeleton_id, comp in enumerate(comp_ids):
            comp_mask = (labels == int(comp)) & keep
            branches = sample_tree(
                medial_pts,
                radii,
                preds,
                root_dist,
                comp_mask,
                hop_cap=self.hop_cap,
                max_branches=self.max_branches,
                strict=self.strict,
            )
            log.info(
                "component %d: %d vertices -> %d branches",
                skeleton_id, int(sizes_np[comp]), len(branches),
            )
            if branches:
                skeletons.append(TreeSkeleton(skeleton_id, branches))

        return DisjointTreeSkeleton(skeletons)
