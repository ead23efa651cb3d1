"""Diagnose the direction-head quality by ground-truth radius bucket.

Round-1 held-out direction cosine was ~0.25 overall. Two very different
failure modes produce that number:
  (a) the head is broken everywhere, or
  (b) direction is geometrically unlearnable for sub-voxel twigs (opposite
      surface points share one 0.01 m voxel → ± ambiguous target) and fine
      on thick branches that actually carry the skeleton.
This buckets cosine/radius-MAE by gt radius to tell them apart.

Usage: python tools/diagnose_direction.py smart_tree_tpu/weights/synthetic-v3.npz --seed 100
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from smart_tree_tpu.data.augmentations import CentreCloud
from smart_tree_tpu.data.synthetic import generate_tree
from smart_tree_tpu.infer.inference import ModelInference
from smart_tree_tpu.neighbors import nn as nn_query

BUCKETS = [0.0, 0.005, 0.01, 0.02, 0.04, 0.08, 10.0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("weights")
    ap.add_argument("--seed", type=int, default=100)
    ap.add_argument("--height", type=float, default=8.0)
    ap.add_argument("--trunk-radius", type=float, default=0.15)
    ap.add_argument("--points", type=float, default=3000.0)
    ap.add_argument("--foliage", type=int, default=4000)
    args = ap.parse_args()

    cloud, _ = generate_tree(
        seed=args.seed, height=args.height, trunk_radius=args.trunk_radius,
        points_per_m2=args.points, foliage_points=args.foliage,
    )
    cloud = CentreCloud()(cloud)
    mi = ModelInference(args.weights)
    lc = mi.forward(cloud)

    d, idx = map(np.asarray, nn_query(np.asarray(lc.xyz), np.asarray(cloud.xyz), 0.05))
    ok = idx >= 0
    gt_cls = np.asarray(cloud.class_l).reshape(-1)[idx[ok]]
    gt_mv = np.asarray(cloud.medial_vector)[idx[ok]]
    gt_r = np.linalg.norm(gt_mv, axis=1)
    pr_r = np.asarray(lc.radius)[ok]
    pr_d = np.asarray(lc.medial_vector)[ok]
    pr_dn = pr_d / np.maximum(np.linalg.norm(pr_d, axis=1, keepdims=True), 1e-9)
    gt_dn = gt_mv / np.maximum(gt_r[:, None], 1e-9)
    cos = (pr_dn * gt_dn).sum(1)
    branch = gt_cls == 0

    # medial point error relative to gt radius — the quantity that actually
    # drives skeleton quality (a wrong direction on a 3mm twig still lands
    # within 6mm of the axis)
    medial_err = np.linalg.norm(pr_r[:, None] * pr_dn - gt_mv, axis=1)

    out = {"overall_cos": round(float(cos[branch].mean()), 4),
           "n_branch_pts": int(branch.sum())}
    rows = []
    for lo, hi in zip(BUCKETS[:-1], BUCKETS[1:]):
        m = branch & (gt_r >= lo) & (gt_r < hi)
        if m.sum() == 0:
            continue
        rows.append({
            "r_lo": lo, "r_hi": hi, "n": int(m.sum()),
            "frac": round(float(m.mean() / max(branch.mean(), 1e-9)), 3),
            "cos": round(float(cos[m].mean()), 3),
            "radius_rel_mae": round(float((np.abs(pr_r - gt_r) / np.maximum(gt_r, 1e-6))[m].mean()), 3),
            "medial_err_mm": round(float(medial_err[m].mean() * 1000), 2),
            "medial_err_over_r": round(float((medial_err[m] / np.maximum(gt_r[m], 1e-6)).mean()), 2),
        })
    out["buckets"] = rows
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
