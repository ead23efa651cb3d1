"""End-to-end capability test (VERDICT round-1 item 1): the full pipeline on
a HELD-OUT procedural tree, using the self-trained checkpoint, must recover
a skeleton from the model's OWN predictions — total length within 1.5x of
ground truth and branches near the true medial axis.

Runs against the best round-2 checkpoint when present (synthetic-r2.npz,
copied from the training run); falls back to skipping so the suite stays
green while a training run is still in flight.
"""

from pathlib import Path

import numpy as np
import pytest

WEIGHTS = Path(__file__).resolve().parent.parent / (
    "smart_tree_tpu/weights/synthetic-r2.npz"
)

pytestmark = [
    pytest.mark.slow,  # ~9 min on this 1-core host
    pytest.mark.skipif(
        not WEIGHTS.exists(), reason="round-2 trained checkpoint not present yet"
    ),
]


def test_pipeline_recovers_skeleton_from_predictions():
    from smart_tree_tpu.data.augmentations import CentreCloud
    from smart_tree_tpu.data.synthetic import generate_tree
    from smart_tree_tpu.infer.inference import ModelInference
    from smart_tree_tpu.skeleton.skeletonize import Skeletonizer

    # seed 1000: far outside every training/val/test seed (0..299 + eval 100s
    # use the same generator family but this exact tree was never seen)
    cloud, gt = generate_tree(seed=1000, height=7.0, trunk_radius=0.14,
                              points_per_m2=4000.0, foliage_points=3000)
    cloud = CentreCloud()(cloud)
    gt_len = gt.length

    mi = ModelInference(str(WEIGHTS))
    lc = mi.forward(cloud)
    branch = lc.filter_by_class([0])
    assert len(branch.xyz) > 0.3 * len(cloud)

    sk = Skeletonizer(hop_cap=16384, strict=False)
    out = sk.forward(branch)
    assert out.skeletons, "no skeleton recovered from predictions"
    main = out.skeletons[0]
    got_len = sum(s.length for s in out.skeletons)
    assert got_len > gt_len / 1.5, (got_len, gt_len)
    assert got_len < gt_len * 1.5, (got_len, gt_len)

    # branch midpoints must lie near the true medial axis. The gt medial
    # points of the input cloud sample that axis densely.
    gt_medial = np.asarray(cloud.medial_pts)[
        np.asarray(cloud.class_l).reshape(-1) == 0
    ]
    mids = np.stack([b.xyz[len(b) // 2] for b in main.branches.values()])
    d = np.sqrt(((mids[:, None, :] - gt_medial[None]) ** 2).sum(-1)).min(1)
    frac_near = float((d < 0.05).mean())
    assert frac_near > 0.8, f"only {frac_near:.0%} of branches near gt axis"
