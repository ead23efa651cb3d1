"""Runtime shape-contract tests — parity with the reference's single unit
test (tests/type_checks.py:9-14: BranchSkeleton must reject wrong-rank
arrays)."""

import numpy as np
import pytest

from smart_tree_tpu.data.branch import BranchSkeleton


def test_branch_skeleton_type_error():
    with pytest.raises(TypeError):
        BranchSkeleton(0, -1, xyz=np.random.rand(10), radii=np.random.rand(10, 1))
    with pytest.raises(TypeError):
        BranchSkeleton(0, -1, xyz=np.random.rand(10, 4), radii=np.random.rand(10, 1))
    with pytest.raises(TypeError):
        BranchSkeleton(0, -1, xyz=np.random.rand(10, 3), radii=np.random.rand(7, 1))


def test_branch_skeleton_accepts_flat_radii():
    b = BranchSkeleton(0, -1, xyz=np.random.rand(10, 3), radii=np.random.rand(10))
    assert b.radii.shape == (10, 1)
