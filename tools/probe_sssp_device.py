"""Targeted device probe of gather-form SSSP cost structure.

The round-4b campaign's bench_skeleton_stage spent 26+ minutes inside
sssp_multi at 219k vertices without completing — this probe separates the
two factors (per-round gather cost x total round count) so the fix can be
chosen from data instead of another 40-minute timeout.

Measures, on the same workload as tools/bench_skeleton_stage.py:
  1. per-round cost of _bf_chunk_tbl (8 vs 264 rounds differenced, with
     convergence disabled by an unreachable round budget on a fresh dist —
     every round does full work because dist keeps improving until the
     true fixpoint)
  2. total rounds to convergence (chunked, wall-capped, progress printed)
  3. same for the table widened by chain shortcuts
Sync is by scalar fetch (docs/PERF.md methodology).

Usage: python tools/probe_sssp_device.py [--height 12] [--wall-cap 300]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=float, default=12.0)
    ap.add_argument("--points-per-m2", type=float, default=12000.0)
    ap.add_argument("--wall-cap", type=float, default=300.0)
    ap.add_argument("--rounds-per-dispatch", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from smart_tree_tpu.data.augmentations import CentreCloud
    from smart_tree_tpu.data.synthetic import generate_tree
    from smart_tree_tpu.graph import build_neighbor_table, chain_shortcuts
    from smart_tree_tpu.graph.sssp import _bf_chunk_tbl, _dist_init
    from smart_tree_tpu.skeleton.filter import outlier_removal
    from smart_tree_tpu.skeleton.graph import nn_graph
    from smart_tree_tpu.utils.misc import voxel_downsample

    def note(msg):
        print(f"# {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr,
              flush=True)

    cloud, _ = generate_tree(
        seed=0, height=args.height, trunk_radius=0.25,
        points_per_m2=args.points_per_m2, foliage_points=0,
    )
    cloud = cloud.filter(voxel_downsample(np.asarray(cloud.xyz), 0.01))
    cloud = CentreCloud()(cloud).device()
    medial_pts = jnp.asarray(np.asarray(cloud.medial_pts), jnp.float32)
    radii = jnp.asarray(np.asarray(cloud.radius), jnp.float32).reshape(-1)
    n = int(medial_pts.shape[0])
    note(f"{n} medial points")

    keep = outlier_removal(medial_pts, radii, nb_points=8)
    graph = nn_graph(medial_pts, jnp.clip(radii, min=0.02), k=16, valid=keep)
    int(jnp.sum(graph.valid))
    note("graph built")

    root = int(jnp.argmin(jnp.where(keep, medial_pts[:, 1], jnp.inf)))
    sources = jnp.asarray([root], jnp.int32)

    def per_round(tbl, label):
        # fresh dist each call; unreachable budget => no early exit while
        # distances still improve. 8 vs 64+8 rounds differenced.
        def run(k):
            d = _dist_init(sources, n)
            d, _, r = _bf_chunk_tbl(tbl.idx, tbl.w, d, k, jnp.float32(0.0))
            return float(jnp.sum(jnp.where(jnp.isfinite(d), d, 0))), int(r)

        run(8)  # compile both shapes? (k is static -> separate programs)
        run(72)
        t0 = time.perf_counter(); run(8); t8 = time.perf_counter() - t0
        t0 = time.perf_counter(); run(72); t72 = time.perf_counter() - t0
        ms = (t72 - t8) / 64 * 1e3
        note(f"{label}: cap={tbl.idx.shape[1]} per-round {ms:.2f} ms "
             f"(t8={t8:.3f}s t72={t72:.3f}s)")
        return ms

    def converge(tbl, label, tol=0.0):
        d = _dist_init(sources, n)
        rounds, t0 = 0, time.perf_counter()
        while True:
            d, changed, r = _bf_chunk_tbl(
                tbl.idx, tbl.w, d, args.rounds_per_dispatch, jnp.float32(tol)
            )
            rounds += int(r)
            wall = time.perf_counter() - t0
            note(f"{label}: {rounds} rounds, {wall:.1f}s")
            if not bool(changed):
                note(f"{label}: CONVERGED {rounds} rounds in {wall:.1f}s")
                return rounds, wall
            if wall > args.wall_cap:
                note(f"{label}: WALL CAP at {rounds} rounds ({wall:.1f}s)")
                return -rounds, wall

    tbl = build_neighbor_table(graph.edges, graph.weights, graph.valid, n,
                               cap=64)
    note("table built (cap 64)")
    per_round(tbl, "plain")
    converge(tbl, "plain")

    t0 = time.perf_counter()
    sc = chain_shortcuts(
        graph.edges[:, 1].reshape(n, 16),
        graph.weights.reshape(n, 16),
        graph.valid.reshape(n, 16),
    )
    int(jnp.sum(sc[2]))
    note(f"shortcut build: {time.perf_counter() - t0:.2f}s")
    tbl_sc = build_neighbor_table(graph.edges, graph.weights, graph.valid, n,
                                  extra=sc)
    note(f"shortcut table built (cap {tbl_sc.idx.shape[1]})")
    per_round(tbl_sc, "shortcuts")
    converge(tbl_sc, "shortcuts", tol=1e-6)


if __name__ == "__main__":
    main()
