"""Stretch benchmark: multi-million-point scan, tiled chunked inference
(BASELINE.json config 5). Generates a procedural forest (several trees),
runs the block-tiled inference path, reports points/sec and clouds/min.

Usage: python tools/bench_scan.py [--trees 6] [--points-per-m2 8000]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from smart_tree_tpu.data.cloud import Cloud
from smart_tree_tpu.data.synthetic import generate_tree
from smart_tree_tpu.infer.inference import ModelInference


def make_forest(n_trees: int, points_per_m2: float, seed: int = 0) -> Cloud:
    rng = np.random.default_rng(seed)
    xyz, rgb = [], []
    for i in range(n_trees):
        cloud, _ = generate_tree(
            seed=seed + i, height=float(rng.uniform(8, 14)),
            trunk_radius=float(rng.uniform(0.15, 0.3)),
            points_per_m2=points_per_m2, foliage_points=30000,
        )
        offset = np.asarray(
            [rng.uniform(-20, 20), 0.0, rng.uniform(-20, 20)], np.float32
        )
        xyz.append(np.asarray(cloud.xyz) + offset)
        rgb.append(np.asarray(cloud.rgb))
    return Cloud(xyz=np.concatenate(xyz), rgb=np.concatenate(rgb))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trees", type=int, default=6)
    ap.add_argument("--points-per-m2", type=float, default=8000.0)
    ap.add_argument(
        "--weights",
        default=str(Path(__file__).resolve().parent.parent
                    / "smart_tree_tpu/weights/noble-elevator-58.npz"),
    )
    ap.add_argument("--skeletonize", action="store_true",
                    help="also run the full skeleton stage (grid KNN path)")
    args = ap.parse_args()

    cloud = make_forest(args.trees, args.points_per_m2)
    n = len(cloud)
    print(f"# forest: {n/1e6:.2f}M points, {args.trees} trees", file=sys.stderr)

    # shipped-pipeline transfer config: download cull + a batch ceiling —
    # overflow-retry recompiles of large-capacity programs can exceed the
    # local compile helper's memory limit (SIGKILL; see bench.py). 131k
    # keeps every program in the size class that compiles reliably, and at
    # 2M+ points the batch count (not size) amortizes dispatch anyway.
    mi = ModelInference(args.weights, precision="bfloat16",
                        medial_classes=(0,))
    mi.max_batch_capacity = min(mi.max_batch_capacity, 131072)
    t0 = time.perf_counter()
    mi.forward(cloud)  # warm (compiles)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    lc = mi.forward(cloud)
    dt = time.perf_counter() - t0
    out = {
        "metric": "tiled scan inference points/sec",
        "value": round(n / dt, 1),
        "unit": "points/sec",
        "n_points": n,
        "warm_s": round(dt, 2),
        "cold_s": round(warm, 2),
        "trees_per_min": round(args.trees / dt * 60, 2),
    }
    if args.skeletonize:
        from smart_tree_tpu.skeleton.skeletonize import Skeletonizer

        sk = Skeletonizer(max_components=args.trees * 4, strict=False)
        t0 = time.perf_counter()
        skel = sk.forward(lc.filter_by_class([0]))
        t_sk = time.perf_counter() - t0
        out.update({
            "skeletonize_s": round(t_sk, 2),
            "skeletons": len(skel.skeletons),
            "end_to_end_trees_per_min": round(args.trees / (dt + t_sk) * 60, 2),
        })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
