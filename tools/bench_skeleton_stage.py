"""Per-stage device timing of the FULL skeleton stage + shortcuts decision.

VERDICT r3 next-step #1: the skeleton machinery (KNN -> CC -> multi-source
SSSP -> log-step tracer) existed and was CPU-benchmarked, but no on-device
per-stage numbers backed the clouds/min headline or the `sssp_shortcuts`
default. This tool times every stage of Skeletonizer.forward on the active
backend, then the whole forward with shortcuts off/on.

Stage sync is by SCALAR FETCH (float()/int() of a reduction), never
block_until_ready — the relay can ack the latter before execution
completes (docs/PERF.md round-3 methodology; ADVICE r3).

Reference being matched: smart_tree/skeleton/skeletonize.py:31-95 (all on
GPU via cugraph/FRNN). Usage:
    python tools/bench_skeleton_stage.py [--height 12] [--reps 2]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=float, default=12.0)
    ap.add_argument("--points-per-m2", type=float, default=12000.0)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--no-quantize", action="store_true",
                    help="bench the full unreduced graph (pre-round-4 path)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from smart_tree_tpu.data.augmentations import CentreCloud
    from smart_tree_tpu.data.synthetic import generate_tree
    from smart_tree_tpu.graph import (
        build_neighbor_table,
        chain_shortcuts,
        connected_components,
        component_sizes,
        sssp_multi,
        tree_distances,
    )
    from smart_tree_tpu.skeleton.filter import outlier_removal
    from smart_tree_tpu.skeleton.graph import nn_graph
    from smart_tree_tpu.skeleton.path import sample_tree
    from smart_tree_tpu.skeleton.skeletonize import Skeletonizer, _component_roots
    from smart_tree_tpu.utils.misc import voxel_downsample

    cloud, _ = generate_tree(
        seed=0, height=args.height, trunk_radius=0.25,
        points_per_m2=args.points_per_m2, foliage_points=0,
    )
    # the skeletonizer's real input is per-VOXEL predictions (bench_sssp.py)
    cloud = cloud.filter(voxel_downsample(np.asarray(cloud.xyz), 0.01))
    cloud = CentreCloud()(cloud).device()
    medial_pts = jnp.asarray(np.asarray(cloud.medial_pts), jnp.float32)
    radii = jnp.asarray(np.asarray(cloud.radius), jnp.float32).reshape(-1)
    xyz = jnp.asarray(np.asarray(cloud.xyz), jnp.float32)
    n = int(medial_pts.shape[0])
    K = 16
    out = {"vertices": n, "backend": jax.devices()[0].platform}
    print(f"# {n} medial points", file=sys.stderr, flush=True)

    def timed(name, fn, sync):
        """fn() -> result; sync(result) -> fetches a scalar. Warm once
        (compile), then min over reps."""
        r = fn()
        sync(r)
        walls = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            r = fn()
            sync(r)
            walls.append(time.perf_counter() - t0)
        out[f"{name}_s"] = round(min(walls), 4)
        print(f"# {name}: {min(walls):.3f}s", file=sys.stderr, flush=True)
        return r

    keep = timed(
        "outlier_filter",
        lambda: outlier_removal(medial_pts, radii, nb_points=8),
        lambda r: int(jnp.sum(r)),
    )
    if not args.no_quantize:
        # the shipped Skeletonizer path (skeleton/quantize.py): collapse
        # coincident medial points to one representative per pipeline voxel
        from smart_tree_tpu.skeleton.quantize import medial_reduce

        rep = timed(
            "medial_reduce",
            lambda: medial_reduce(medial_pts, xyz[:, 1], keep, 0.01),
            lambda r: int(r[1]),
        )
        rep_idx, n_unique = rep
        sel = jnp.minimum(rep_idx, n - 1)
        pad = rep_idx >= n
        medial_pts = medial_pts[sel]
        radii = radii[sel]
        xyz = xyz[sel]
        keep = ~pad
        n = int(rep_idx.shape[0])
        out["vertices_reduced"] = int(n_unique)
        out["bucket"] = n
        print(f"# medial_reduce: {n_unique} unique cells (bucket {n})",
              file=sys.stderr, flush=True)
    graph = timed(
        "nn_graph",
        lambda: nn_graph(medial_pts, jnp.clip(radii, min=0.02), k=K, valid=keep),
        lambda g: int(jnp.sum(g.valid)),
    )
    table = timed(
        "neighbor_table",
        lambda: build_neighbor_table(
            graph.edges, graph.weights, graph.valid, n, cap=4 * K
        ),
        lambda tb: int(jnp.sum(tb.idx[:, 0])),
    )
    labels = timed(
        "connected_components",
        lambda: connected_components(
            graph.edges, graph.valid, n, vertex_valid=keep, table=table
        ),
        lambda l: int(jnp.sum(l)),
    )
    sizes_np = np.asarray(component_sizes(labels, keep))
    comp_ids = np.nonzero(sizes_np >= 32)[0]
    comp_ids = comp_ids[np.argsort(-sizes_np[comp_ids])][:64]
    comp_pad = np.full((64,), -1, np.int64)
    comp_pad[: len(comp_ids)] = comp_ids
    roots = _component_roots(labels, keep, xyz[:, 1], jnp.asarray(comp_pad, jnp.int32))
    int(jnp.sum(roots))

    def run_sssp(shortcuts):
        # a fresh table per variant (shortcut extras change its contents);
        # the build cost is timed separately above
        tbl = table if shortcuts is None else None
        d, p = sssp_multi(graph.edges, graph.weights, graph.valid, roots, n,
                          shortcuts=shortcuts, table=tbl)
        return d, p

    def sync_sssp(r):
        d, p = r
        float(jnp.sum(jnp.where(jnp.isfinite(d), d, 0)))
        int(jnp.sum(p))

    _, preds = timed("sssp", lambda: run_sssp(None), sync_sssp)

    # round-5 aligned shortcut TABLE (graph/shortcuts.py::chain_shortcut_
    # table): a second fixed-width gather per round, no cap interaction —
    # vs the round-4 flat form that widened the main table's cap (0.13x)
    from smart_tree_tpu.graph import chain_shortcut_table

    sct = timed(
        "shortcut_table_build",
        lambda: chain_shortcut_table(
            graph.edges[:, 1].reshape(n, K),
            graph.weights.reshape(n, K),
            graph.valid.reshape(n, K),
        ),
        lambda s: int(jnp.sum(jnp.isfinite(s[1]))),
    )
    timed(
        "sssp_with_shortcut_tbl",
        lambda: sssp_multi(graph.edges, graph.weights, graph.valid, roots, n,
                           shortcut_tbl=sct, table=table),
        sync_sssp,
    )
    timed(
        "cc_with_shortcut_tbl",
        lambda: connected_components(
            graph.edges, graph.valid, n, vertex_valid=keep, table=table,
            shortcut_tbl=sct,
        ),
        lambda l: int(jnp.sum(l)),
    )
    sc = timed(
        "shortcut_build",
        lambda: chain_shortcuts(
            graph.edges[:, 1].reshape(n, K),
            graph.weights.reshape(n, K),
            graph.valid.reshape(n, K),
        ),
        lambda s: int(jnp.sum(s[2])),  # (edges, weights, valid) tuple
    )
    timed("sssp_with_shortcuts", lambda: run_sssp(sc), sync_sssp)

    # the round-5 fused program: the whole graph stage in ONE dispatch
    from smart_tree_tpu.skeleton.skeletonize import _graph_program

    timed(
        "graph_program_fused",
        lambda: _graph_program(
            medial_pts, radii, xyz[:, 1], keep, jnp.float32(0.02),
            jnp.int32(32), k=K, cap=4 * K, max_components=64,
            use_shortcuts=True, max_rounds=4096,
        ),
        lambda r: float(jnp.sum(jnp.where(jnp.isfinite(r[6]), r[6], 0))),
    )

    step = jnp.linalg.norm(medial_pts - medial_pts[jnp.maximum(preds, 0)], axis=1)
    root_dist = timed(
        "tree_distances",
        lambda: tree_distances(preds, step, n),
        lambda r: float(jnp.sum(jnp.where(jnp.isfinite(r), r, 0))),
    )
    comp_mask = (labels == int(comp_ids[0])) & keep
    timed(
        "branch_tracer",
        lambda: sample_tree(medial_pts, radii, preds, root_dist, comp_mask,
                            hop_cap=4096, max_branches=1024, strict=False),
        lambda branches: len(branches),
    )

    # whole-forward walls, both shortcut settings (host assembly included)
    for name, flag in [("forward_total", False), ("forward_total_shortcuts", True)]:
        sk = Skeletonizer(sssp_shortcuts=flag)
        timed(name, lambda sk=sk: sk.forward(cloud), lambda s: len(s.skeletons))

    out["speedup_shortcuts"] = round(
        out["sssp_s"] / max(out["shortcut_build_s"] + out["sssp_with_shortcuts_s"], 1e-9), 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
