"""End-to-end quality evaluation: run the full pipeline with a checkpoint on
held-out synthetic trees and report parity metrics (seg IoU, radius MAE,
direction cosine, skeleton coverage/length) — the quantities BASELINE.md
tracks.

Usage:
    python tools/evaluate.py runs/local-run/best_weights.npz --seeds 100 101
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# --cpu must take effect BEFORE the smart_tree_tpu imports below: module
# import touches jax (graph/sssp.py builds jnp constants), which initializes
# the backend — and this environment pins JAX_PLATFORMS=axon in the shell
# AND via sitecustomize, so only an early jax.config update reroutes it.
if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from smart_tree_tpu.data.augmentations import CentreCloud
from smart_tree_tpu.data.synthetic import generate_tree
from smart_tree_tpu.infer.inference import ModelInference
from smart_tree_tpu.neighbors import nn as nn_query
from smart_tree_tpu.skeleton.skeletonize import Skeletonizer
from smart_tree_tpu.train.metrics import segmentation_iou, skeleton_distance


_DEFAULT = object()  # sentinel: follow the Skeletonizer class default


def evaluate_tree(mi: ModelInference, seed: int, height=8.0, trunk_radius=0.15,
                  points=3000.0, foliage=4000, min_filter_radius=_DEFAULT):
    cloud, gt_skel = generate_tree(
        seed=seed, height=height, trunk_radius=trunk_radius,
        points_per_m2=points, foliage_points=foliage,
    )
    raw_xyz0 = np.asarray(cloud.xyz[0])
    cloud = CentreCloud()(cloud)
    # the pipeline (and so the predicted skeleton) lives in the CENTRED
    # frame; move ground truth into it too or every skeleton<->skeleton
    # distance is dominated by the centring translation (coverage read 0.0
    # and precision_dist ~bbox/2 before this fix)
    offset = np.asarray(cloud.xyz[0]) - raw_xyz0
    from smart_tree_tpu.data.branch import BranchSkeleton
    from smart_tree_tpu.data.tree import TreeSkeleton

    gt_skel = TreeSkeleton(
        gt_skel._id,
        {
            k: BranchSkeleton(b._id, b.parent_id, b.xyz + offset, b.radii,
                              b.child_id)
            for k, b in gt_skel.branches.items()
        },
    )
    t0 = time.perf_counter()
    lc = mi.forward(cloud)
    t_inf = time.perf_counter() - t0

    # row-align predictions to ground truth by nearest point
    d, idx = map(np.asarray, nn_query(np.asarray(lc.xyz), np.asarray(cloud.xyz), 0.05))
    ok = idx >= 0
    gt_cls = np.asarray(cloud.class_l).reshape(-1)[idx[ok]]
    pr_cls = np.asarray(lc.class_l).reshape(-1)[ok]
    iou = segmentation_iou(pr_cls, gt_cls)

    gt_mv = np.asarray(cloud.medial_vector)[idx[ok]]
    gt_r = np.linalg.norm(gt_mv, axis=1)
    pr_r = np.asarray(lc.radius)[ok]
    pr_d = np.asarray(lc.medial_vector)[ok]
    pr_dn = pr_d / np.maximum(np.linalg.norm(pr_d, axis=1, keepdims=True), 1e-9)
    gt_dn = gt_mv / np.maximum(np.linalg.norm(gt_mv, axis=1, keepdims=True), 1e-9)

    branch = gt_cls == 0
    metrics = {
        "n_points": len(cloud),
        "inference_s": round(t_inf, 2),
        "points_per_s": round(len(cloud) / t_inf, 1),
        "iou_branch": round(iou[0], 4),
        "iou_foliage": round(iou.get(1, float("nan")), 4),
        "radius_mae": round(float(np.abs(pr_r - gt_r)[branch].mean()), 4),
        "radius_rel_mae": round(
            float((np.abs(pr_r - gt_r) / np.maximum(gt_r, 1e-6))[branch].mean()), 4
        ),
        "direction_cos": round(float((pr_dn * gt_dn).sum(1)[branch].mean()), 4),
    }

    t0 = time.perf_counter()
    sk = (
        Skeletonizer()
        if min_filter_radius is _DEFAULT
        else Skeletonizer(min_filter_radius=min_filter_radius)
    )
    skel = sk.forward(lc.filter_by_class([0]))
    metrics["skeletonize_s"] = round(time.perf_counter() - t0, 2)
    if skel.skeletons:
        metrics.update(
            {k: round(v, 4) for k, v in
             skeleton_distance(skel.skeletons[0], gt_skel).items()}
        )
        metrics["n_branches"] = len(skel.skeletons[0].branches)
    return metrics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("weights")
    ap.add_argument("--seeds", type=int, nargs="+", default=[100, 101])
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--min-filter-radius", default=None,
        help="Skeletonizer min_filter_radius extension (skeleton/filter.py):"
        " a float clamp, 'none' for reference-faithful filtering, or omit"
        " to follow the Skeletonizer class default",
    )
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (this env's sitecustomize "
                    "pins the TPU plugin over JAX_PLATFORMS)")
    args = ap.parse_args()

    mi = ModelInference(args.weights)
    results = []
    for seed in args.seeds:
        if args.min_filter_radius is None:
            mfr = _DEFAULT
        elif str(args.min_filter_radius).lower() == "none":
            mfr = None
        else:
            mfr = float(args.min_filter_radius)
        m = evaluate_tree(mi, seed, min_filter_radius=mfr)
        m["seed"] = seed
        print(json.dumps(m))
        results.append(m)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
