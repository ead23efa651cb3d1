import numpy as np
import pytest

from smart_tree_tpu.data.cloud import Cloud
from smart_tree_tpu.data.file import (
    load_cloud,
    load_data_npz,
    load_ply_cloud,
    save_data_npz,
    save_ply_cloud,
)
from smart_tree_tpu.data.synthetic import generate_tree
from smart_tree_tpu.data.tree import TreeSkeleton
from smart_tree_tpu.data.branch import BranchSkeleton


def test_synthetic_tree_medial_ground_truth():
    cloud, skeleton = generate_tree(seed=0, height=3.0, points_per_m2=2000.0)
    assert len(cloud) > 500
    assert len(skeleton.branches) >= 2
    # medial vectors should be roughly perpendicular-ish projections with
    # |mv| close to local radius; check magnitudes are in the radii range
    r = np.asarray(cloud.radius)
    all_radii = np.concatenate(
        [b.radii.reshape(-1) for b in skeleton.branches.values()]
    )
    assert r.min() >= 0
    assert r.max() <= all_radii.max() * 1.5 + 0.05
    # root (lowest y) is near the trunk base
    assert cloud.xyz[cloud.root_idx][1] < 0.2


def test_npz_roundtrip(tmp_path):
    cloud, skeleton = generate_tree(seed=1, height=2.0, points_per_m2=1000.0)
    p = tmp_path / "tree.npz"
    save_data_npz(p, skeleton, cloud)
    cloud2, skeleton2 = load_data_npz(p)
    np.testing.assert_allclose(cloud2.xyz, np.asarray(cloud.xyz), rtol=1e-6)
    np.testing.assert_allclose(
        cloud2.medial_vector, np.asarray(cloud.medial_vector), rtol=1e-6
    )
    assert len(skeleton2.branches) == len(skeleton.branches)
    for k, b in skeleton.branches.items():
        b2 = skeleton2.branches[k]
        assert b2.parent_id == b.parent_id
        np.testing.assert_allclose(b2.xyz, b.xyz, rtol=1e-6)


def test_legacy_vector_key():
    c = Cloud.from_numpy(xyz=np.zeros((5, 3)), vector=np.ones((5, 3)))
    assert c.medial_vector is not None
    np.testing.assert_allclose(np.asarray(c.radius), np.sqrt(3.0), rtol=1e-6)


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    rgb = rng.uniform(size=(100, 3)).astype(np.float32)
    p = tmp_path / "cloud.ply"
    save_ply_cloud(p, xyz, rgb)
    c = load_ply_cloud(p)
    np.testing.assert_allclose(np.asarray(c.xyz), xyz, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c.rgb), rgb, atol=1 / 255)
    # load_cloud dispatches by suffix
    c2 = load_cloud(p)
    assert len(c2) == 100


def test_cloud_filter_and_class():
    xyz = np.arange(30, dtype=np.float32).reshape(10, 3)
    cls = np.asarray([[0], [1]] * 5, np.float32)
    c = Cloud(xyz=xyz, class_l=cls)
    branch = c.filter_by_class([0])
    assert len(branch) == 5
    sub = c.filter(np.asarray([0, 2, 4]))
    assert len(sub) == 3


def test_prune_smooth_repair():
    cloud, skeleton = generate_tree(seed=2, height=3.0, points_per_m2=1000.0)
    n_before = len(skeleton.branches)
    skeleton.smooth(kernel_size=5)
    removed = skeleton.prune(min_radius=0.001, min_length=0.05)
    assert len(skeleton.branches) + len(removed.branches) == n_before
    skeleton.repair()  # child branch starts connect to parent tubes
    for b in skeleton.branches.values():
        assert len(b) >= 2


def test_prune_drops_orphans():
    branches = {
        0: BranchSkeleton(0, -1, np.asarray([[0, 0, 0], [0, 1, 0]]), np.asarray([[0.1], [0.1]])),
        1: BranchSkeleton(1, 0, np.asarray([[0, 1, 0], [1, 1, 0]]), np.asarray([[0.0001], [0.0001]])),
        2: BranchSkeleton(2, 1, np.asarray([[1, 1, 0], [2, 1, 0]]), np.asarray([[0.1], [0.1]])),
    }
    sk = TreeSkeleton(0, branches)
    sk.prune(min_radius=0.01, min_length=0.05)
    # branch 1 too thin -> dropped; branch 2 orphaned -> dropped
    assert set(sk.branches.keys()) == {0}
