"""Stretch-config path (BASELINE.json config 5) at reduced scale: a
multi-tree forest scan through make_forest -> BlockTiler'd ModelInference
-> class filter -> multi-component Skeletonizer — the exact code path
tools/bench_scan.py measures at 2M+ points on the chip (reference analog:
SingleTreeInference block tiling, dataset.py:144-229, which the reference
never composes with multi-tree skeletonization)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


@pytest.mark.slow  # forest forward + multi-component skeletonization (~4 min)
def test_forest_scan_reduced_scale():
    from bench_scan import make_forest

    from smart_tree_tpu.infer.inference import ModelInference
    from smart_tree_tpu.skeleton.skeletonize import Skeletonizer

    n_trees = 3
    cloud = make_forest(n_trees, points_per_m2=300.0, seed=0)
    assert len(cloud) > 50_000  # multi-block, multi-batch workload

    mi = ModelInference(
        "smart_tree_tpu/weights/synthetic-r3.npz",
        medial_classes=(0,),
    )
    lc = mi.forward(cloud)
    assert len(lc) > 0
    branch = lc.filter_by_class([0])
    assert len(branch) > 1000

    sk = Skeletonizer(max_components=n_trees * 4, strict=False)
    skel = sk.forward(branch)
    # every tree trunk is a large component; foliage/noise may add more
    assert len(skel.skeletons) >= 1
    total_branches = sum(len(s.branches) for s in skel.skeletons)
    assert total_branches >= n_trees  # at least a trunk per recovered tree
    # geometry sane: skeleton points inside the scan bounds
    pts = np.concatenate(
        [b.xyz for s in skel.skeletons for b in s.branches.values()]
    )
    lo = np.asarray(cloud.xyz).min(0) - 1.0
    hi = np.asarray(cloud.xyz).max(0) + 1.0
    assert bool(((pts >= lo) & (pts <= hi)).all())
