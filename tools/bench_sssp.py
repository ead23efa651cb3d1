"""Measure sssp_multi's convergence rounds + wall time on a tall-tree graph
(VERDICT r2 weak #6: Bellman-Ford is O(diameter) sequential rounds; a 12 m
tree at 1 cm voxels could need thousands — measure whether that dominates
the skeleton stage before redesigning).

Builds the bench workload's skeleton-stage graph (ground-truth medial
vectors so machinery, not model quality, is measured), then reports:
  - vertices / edges / Bellman-Ford rounds (= shortest-path forest hop
    depth + 1),
  - sssp wall time (min of reps — relay noise is one-sided),
  - full Skeletonizer.forward wall time for share context.

Usage: python tools/bench_sssp.py [--height 12] [--points-per-m2 12000]
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
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from smart_tree_tpu.data.augmentations import CentreCloud
    from smart_tree_tpu.data.synthetic import generate_tree
    from smart_tree_tpu.graph import connected_components, sssp_multi
    from smart_tree_tpu.skeleton.filter import outlier_removal
    from smart_tree_tpu.skeleton.graph import nn_graph
    from smart_tree_tpu.skeleton.skeletonize import Skeletonizer, _component_roots

    cloud, _ = generate_tree(
        seed=0, height=args.height, trunk_radius=0.25,
        points_per_m2=args.points_per_m2, foliage_points=0,
    )
    # voxel-dedup like the real pipeline: the skeletonizer's input is the
    # model's per-VOXEL predictions (one point per 1 cm cell), not raw
    # points — raw gt points are ~0.5 mm apart, which inflates the
    # shortest-path hop depth (= BF rounds) ~10x beyond the real workload
    from smart_tree_tpu.utils.misc import voxel_downsample

    cloud = cloud.filter(voxel_downsample(np.asarray(cloud.xyz), 0.01))
    cloud = CentreCloud()(cloud).device()
    medial_pts = jnp.asarray(np.asarray(cloud.medial_pts), jnp.float32)
    radii = jnp.asarray(np.asarray(cloud.radius), jnp.float32).reshape(-1)
    xyz = jnp.asarray(np.asarray(cloud.xyz), jnp.float32)
    n = int(medial_pts.shape[0])
    print(f"# {n} medial points (height {args.height} m)", file=sys.stderr)

    # stage notes + wall times to stderr: through a degraded relay any one
    # compile can take minutes, so a killed run must still say where the
    # time went and what was measured up to that point
    def note(msg, t0=[time.perf_counter()]):
        t = time.perf_counter()
        print(f"# +{t - t0[0]:.1f}s {msg}", file=sys.stderr, flush=True)
        t0[0] = t

    # stage sync by fetching a scalar, same as the timed runs below: the
    # relay can ack block_until_ready before execution completes, which
    # would under-report stage wall times (ADVICE r3)
    keep = outlier_removal(medial_pts, radii, nb_points=8)
    int(jnp.sum(keep))
    note("outlier_removal done")
    graph = nn_graph(medial_pts, jnp.clip(radii, min=0.02), k=16, valid=keep)
    int(jnp.sum(graph.valid))
    note("nn_graph done")
    labels = connected_components(graph.edges, graph.valid, n, vertex_valid=keep)
    int(jnp.sum(labels))
    note("connected_components done")
    comp_pad = np.full((64,), -1, np.int64)
    comp_pad[0] = int(jnp.min(jnp.where(keep, labels, n)))
    roots = _component_roots(labels, keep, xyz[:, 1],
                             jnp.asarray(comp_pad, jnp.int32))
    n_edges = int(jnp.sum(graph.valid))

    def run():
        d, p, r = sssp_multi(graph.edges, graph.weights, graph.valid,
                             roots, n, return_rounds=True)
        # fetch scalars (not block_until_ready): the relay can ack before
        # execution completes; transferring a value cannot
        float(jnp.sum(jnp.where(jnp.isfinite(d), d, 0))); float(jnp.sum(p))
        return int(r)

    rounds = run()  # compile + rounds
    note(f"sssp compile+first run done ({rounds} rounds)")
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    sssp_s = min(times)
    note(f"sssp timed: {sssp_s:.3f}s over {rounds} rounds")
    print(json.dumps({"partial": "sssp", "vertices": n, "edges": n_edges,
                      "bf_rounds": rounds, "sssp_s": round(sssp_s, 3)}),
          flush=True)

    # chain-shortcut acceleration (graph/shortcuts.py): round-collapse +
    # wall time, incl. the shortcut build itself
    from smart_tree_tpu.graph import chain_shortcuts

    k = 16

    def run_sc():
        sc = chain_shortcuts(
            graph.edges[:, 1].reshape(n, k),
            graph.weights.reshape(n, k),
            graph.valid.reshape(n, k),
        )
        d, p, r = sssp_multi(graph.edges, graph.weights, graph.valid,
                             roots, n, return_rounds=True, shortcuts=sc)
        float(jnp.sum(jnp.where(jnp.isfinite(d), d, 0))); float(jnp.sum(p))
        return int(r)

    rounds_sc = run_sc()
    note(f"shortcut sssp compile+first run done ({rounds_sc} rounds)")
    times_sc = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        run_sc()
        times_sc.append(time.perf_counter() - t0)
    sssp_sc_s = min(times_sc)
    note(f"shortcut sssp timed: {sssp_sc_s:.3f}s over {rounds_sc} rounds")
    print(json.dumps({"partial": "sssp_shortcut", "bf_rounds_shortcut": rounds_sc,
                      "sssp_shortcut_s": round(sssp_sc_s, 3)}), flush=True)

    # full skeleton stage for share context (warm second run timed)
    sk = Skeletonizer()
    sk.forward(cloud)
    note("skeletonizer compile+first run done")
    t0 = time.perf_counter()
    sk.forward(cloud)
    skel_s = time.perf_counter() - t0

    out = {
        "vertices": n,
        "edges": n_edges,
        "bf_rounds": rounds,
        "sssp_s": round(sssp_s, 3),
        "sssp_us_per_round": round(1e6 * sssp_s / max(rounds, 1), 1),
        "bf_rounds_shortcut": rounds_sc,
        "sssp_shortcut_s": round(sssp_sc_s, 3),
        "skeleton_stage_s": round(skel_s, 3),
        "sssp_share": round(sssp_s / skel_s, 3),
        "backend": jax.devices()[0].platform,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
