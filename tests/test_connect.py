import numpy as np

from smart_tree_tpu.data.branch import BranchSkeleton
from smart_tree_tpu.data.tree import DisjointTreeSkeleton, TreeSkeleton
from smart_tree_tpu.skeleton.connect import connect_skeletons


def line_branch(bid, parent, start, end, n=5, r=0.05):
    t = np.linspace(0, 1, n)[:, None]
    xyz = np.asarray(start) * (1 - t) + np.asarray(end) * t
    return BranchSkeleton(bid, parent, xyz, np.full((n, 1), r, np.float32))


def test_connect_grafts_near_skeleton():
    trunk = TreeSkeleton(0, {0: line_branch(0, -1, [0, 0, 0], [0, 2, 0])})
    # secondary skeleton whose lowest point is 0.1m from the trunk
    sec = TreeSkeleton(1, {0: line_branch(0, -1, [0.1, 1.0, 0], [1.0, 1.5, 0])})
    far = TreeSkeleton(2, {0: line_branch(0, -1, [5, 0, 0], [5, 1, 0])})
    out = connect_skeletons(DisjointTreeSkeleton([trunk, sec, far]), max_distance=0.5)
    assert len(out.skeletons) == 2  # sec merged, far kept separate
    merged = out.skeletons[0]
    assert len(merged.branches) == 2
    grafted = merged.branches[1]
    assert grafted.parent_id == 0
    # grafted branch got a connection point prepended onto the trunk
    assert len(grafted) == 6
    assert np.linalg.norm(grafted.xyz[0] - [0, 1.0, 0]) < 0.08


def test_connect_noop_for_single():
    trunk = TreeSkeleton(0, {0: line_branch(0, -1, [0, 0, 0], [0, 2, 0])})
    d = DisjointTreeSkeleton([trunk])
    assert connect_skeletons(d) is d
