"""Per-stage diagnosis of the e2e quality gap (VERDICT r2 #2: 27.5 m
recovered vs 55.9 m ground truth with synthetic-r2.npz).

Runs the EXACT tests/test_e2e_quality.py workload and accounts for where
skeleton length is lost, stage by stage:

  model:    class IoU, direction cosine + radius MAE by gt-radius bucket
  filter:   points surviving outlier_removal
  graph:    components >= minimum_graph_vertices vs total, dropped mass
  tracer:   recovered length per component vs gt, + an ORACLE run
            (ground-truth medial vectors through the same skeletonizer)
            to separate model quality from skeleton machinery.

Usage: python tools/diagnose_e2e.py smart_tree_tpu/weights/synthetic-r2.npz
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def bucket_stats(gt_r, cos, abs_err, buckets=(0.0, 0.005, 0.01, 0.02, 0.04, 10.0)):
    rows = []
    for lo, hi in zip(buckets[:-1], buckets[1:]):
        m = (gt_r >= lo) & (gt_r < hi)
        if m.sum() == 0:
            continue
        rows.append({
            "r_lo": lo, "r_hi": hi, "n": int(m.sum()),
            "dir_cos": round(float(cos[m].mean()), 3),
            "radius_mae": round(float(abs_err[m].mean()), 4),
        })
    return rows


def skeleton_accounting(cloud_branch, sk, gt_len, label):
    import jax.numpy as jnp

    from smart_tree_tpu.skeleton.filter import outlier_removal
    from smart_tree_tpu.skeleton.graph import nn_graph
    from smart_tree_tpu.graph import component_sizes, connected_components

    medial_pts = jnp.asarray(np.asarray(cloud_branch.medial_pts), jnp.float32)
    radii = jnp.asarray(np.asarray(cloud_branch.radius), jnp.float32).reshape(-1)
    n = medial_pts.shape[0]
    keep = outlier_removal(medial_pts, radii, nb_points=8)
    graph = nn_graph(medial_pts, jnp.clip(radii, min=sk.min_connection_length),
                     k=sk.K, valid=keep)
    labels = connected_components(graph.edges, graph.valid, n, vertex_valid=keep)
    sizes = np.asarray(component_sizes(labels, keep))
    big = sizes[sizes >= sk.minimum_graph_vertices]
    small_mass = int(sizes[(sizes > 0) & (sizes < sk.minimum_graph_vertices)].sum())
    out = sk.forward(cloud_branch)
    got = sum(s.length for s in out.skeletons)
    per_comp = [round(sum(b.length for b in s.branches.values()), 2)
                for s in out.skeletons]
    print(json.dumps({
        "stage": label,
        "medial_pts": int(n),
        "after_outlier_removal": int(np.asarray(keep).sum()),
        "components_kept": int(len(big)),
        "component_sizes_top10": sizes[np.argsort(-sizes)][:10].tolist(),
        "small_component_mass": small_mass,
        "recovered_len": round(float(got), 2),
        "gt_len": round(float(gt_len), 2),
        "recovery_pct": round(100 * float(got) / gt_len, 1),
        "per_component_len": per_comp[:10],
    }))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("weights")
    ap.add_argument("--seed", type=int, default=1000)
    args = ap.parse_args()

    from smart_tree_tpu.data.augmentations import CentreCloud
    from smart_tree_tpu.data.cloud import Cloud
    from smart_tree_tpu.data.synthetic import generate_tree
    from smart_tree_tpu.infer.inference import ModelInference
    from smart_tree_tpu.neighbors import nn as nn_query
    from smart_tree_tpu.skeleton.skeletonize import Skeletonizer
    from smart_tree_tpu.train.metrics import segmentation_iou

    cloud, gt = generate_tree(seed=args.seed, height=7.0, trunk_radius=0.14,
                              points_per_m2=4000.0, foliage_points=3000)
    cloud = CentreCloud()(cloud)
    gt_len = gt.length

    mi = ModelInference(str(args.weights))
    lc = mi.forward(cloud)

    # align predictions to gt rows
    d, idx = map(np.asarray, nn_query(np.asarray(lc.xyz), np.asarray(cloud.xyz), 0.05))
    ok = idx >= 0
    gt_cls = np.asarray(cloud.class_l).reshape(-1)[idx[ok]]
    pr_cls = np.asarray(lc.class_l).reshape(-1)[ok]
    iou = segmentation_iou(pr_cls, gt_cls)
    gt_mv = np.asarray(cloud.medial_vector)[idx[ok]]
    gt_r = np.linalg.norm(gt_mv, axis=1)
    pr_mv = np.asarray(lc.medial_vector)[ok]
    pr_r = np.linalg.norm(pr_mv, axis=1)
    gdn = gt_mv / np.maximum(gt_r[:, None], 1e-9)
    pdn = pr_mv / np.maximum(pr_r[:, None], 1e-9)
    cos = (gdn * pdn).sum(1)
    branch = gt_cls == 0
    print(json.dumps({
        "stage": "model",
        "n_points": len(cloud),
        "iou": {str(k): round(v, 3) for k, v in iou.items()},
        "branch_buckets": bucket_stats(
            gt_r[branch], cos[branch], np.abs(pr_r - gt_r)[branch]
        ),
    }))

    sk = Skeletonizer(hop_cap=16384, strict=False)
    pred_branch = lc.filter_by_class([0])
    skeleton_accounting(pred_branch, sk, gt_len, "predicted")

    # oracle: gt medial vectors + gt classes through the same machinery
    gt_branch_mask = np.asarray(cloud.class_l).reshape(-1) == 0
    oracle = Cloud(
        xyz=np.asarray(cloud.xyz)[gt_branch_mask],
        rgb=(np.asarray(cloud.rgb)[gt_branch_mask]
             if cloud.rgb is not None else None),
        medial_vector=np.asarray(cloud.medial_vector)[gt_branch_mask],
    )
    skeleton_accounting(oracle, sk, gt_len, "oracle")


if __name__ == "__main__":
    main()
