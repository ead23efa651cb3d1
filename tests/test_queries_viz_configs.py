import numpy as np
import pytest
import yaml

from smart_tree_tpu.data.branch import BranchSkeleton
from smart_tree_tpu.data.tree import TreeSkeleton
from smart_tree_tpu.data.tube import CollatedTube, collate_tubes, Tube
from smart_tree_tpu.utils.configs import apply_overrides, compose, instantiate, resolve
from smart_tree_tpu.utils.queries import pts_to_nearest_tube, skeleton_to_points
from smart_tree_tpu.viz.mesh import branch_tube_mesh, skeleton_lineset, skeleton_tube_mesh


def test_pts_to_nearest_tube_matches_bruteforce():
    rng = np.random.default_rng(0)
    tubes = [
        Tube(rng.normal(size=3), rng.normal(size=3), rng.uniform(0.05, 0.2),
             rng.uniform(0.05, 0.2))
        for _ in range(20)
    ]
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    v, idx, r = pts_to_nearest_tube(pts, collate_tubes(tubes))

    # brute force: |dist(point, capsule segment) - lerped radius| argmin
    def seg_proj(p, a, b, r1, r2):
        ab = b - a
        t = np.clip(np.dot(p - a, ab) / (np.dot(ab, ab) + 1e-12), 0, 1)
        proj = a + t * ab
        rr = (1 - t) * r1 + t * r2
        return proj, np.linalg.norm(proj - p), rr

    for i, p in enumerate(pts[:20]):
        scores = []
        for t in tubes:
            a, b = np.asarray(t.a, np.float64), np.asarray(t.b, np.float64)
            proj, d, rr = seg_proj(p.astype(np.float64), a, b, t.r1, t.r2)
            scores.append(abs(d - rr))
        assert abs(scores[idx[i]] - min(scores)) < 1e-4


def test_skeleton_to_points_chunks():
    b = BranchSkeleton(0, -1, np.asarray([[0, 0, 0], [0, 1, 0], [0, 2, 0]]),
                       np.asarray([[0.1], [0.1], [0.1]]))
    sk = TreeSkeleton(0, {0: b})
    pts = np.asarray([[0.1, 0.5, 0], [0.5, 1.5, 0]], np.float32)
    d, r, v = skeleton_to_points(pts, collate_tubes(sk.to_tubes()), chunk_size=1)
    np.testing.assert_allclose(d, [0.1, 0.5], atol=1e-5)
    np.testing.assert_allclose(r, [0.1, 0.1], atol=1e-6)


def test_tube_mesh_geometry():
    xyz = np.asarray([[0, 0, 0], [0, 1, 0], [0, 2, 0]], np.float32)
    radii = np.asarray([0.2, 0.15, 0.1], np.float32)
    verts, tris = branch_tube_mesh(xyz, radii, n=8)
    assert verts.shape == (24, 3)
    assert tris.max() < len(verts) and tris.min() >= 0
    # ring radii approximately match input
    ring0 = verts[:8]
    d = np.linalg.norm(ring0 - xyz[0], axis=1)
    np.testing.assert_allclose(d, 0.2, rtol=1e-4)


def test_skeleton_mesh_and_lineset():
    b0 = BranchSkeleton(0, -1, np.asarray([[0, 0, 0], [0, 1, 0]]), np.asarray([[0.1], [0.1]]))
    b1 = BranchSkeleton(1, 0, np.asarray([[0, 1, 0], [1, 1, 0], [2, 1, 0]]),
                        np.asarray([[0.05], [0.05], [0.05]]))
    sk = TreeSkeleton(0, {0: b0, 1: b1})
    v, e = skeleton_lineset(sk)
    assert len(v) == 5 and len(e) == 3
    mv, mt, mc = skeleton_tube_mesh(sk, n=6)
    assert len(mv) == len(mc) and len(mt) > 0


def test_config_compose_interpolation_and_instantiate(tmp_path):
    cfg_file = tmp_path / "c.yaml"
    cfg_file.write_text(
        """
voxel: 0.25
pipe:
  _target_: smart_tree_tpu.data.augmentations.VoxelDownsample
  voxel_size: ${voxel}
nested:
  msg: "v=${voxel}"
"""
    )
    cfg = compose(cfg_file, ["voxel=0.5", "+extra.k=3"])
    assert cfg["voxel"] == 0.5
    assert cfg["pipe"]["voxel_size"] == 0.5
    assert cfg["nested"]["msg"] == "v=0.5"
    assert cfg["extra"]["k"] == 3
    obj = instantiate(cfg["pipe"])
    assert obj.voxel_size == 0.5


def test_config_partial():
    node = {
        "_target_": "smart_tree_tpu.train.losses.focal_loss",
        "_partial_": True,
        "gamma": 3.0,
    }
    fn = instantiate(node)
    import jax.numpy as jnp

    out = fn(jnp.zeros((4, 2)), jnp.zeros(4), jnp.ones(4, bool))
    assert np.isfinite(float(out))
