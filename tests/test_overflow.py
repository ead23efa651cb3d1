"""Every static-capacity overflow must be detected loudly (VERDICT round-1:
training collate, sample_tree caps, and voxel_downsample grid clipping were
silent, while inference raised)."""

import numpy as np
import pytest


def test_collate_overflow_raises():
    from smart_tree_tpu.data.dataset import collate

    coords = np.stack([np.arange(100)] * 3, axis=1).astype(np.int32)
    item = (coords, np.zeros((100, 3), np.float32), np.zeros((100, 5), np.float32), "x")
    with pytest.raises(RuntimeError, match="collate overflow"):
        collate([item], 1, capacity=64)
    # explicit opt-out keeps the old truncation behavior
    vb = collate([item], 1, capacity=64, on_overflow="truncate")
    assert vb.valid.sum() == 64


@pytest.mark.slow  # ~39 s on this 1-core host
def test_sample_tree_hop_cap_raises():
    from smart_tree_tpu.skeleton.path import sample_tree

    # a straight 64-vertex chain: root 0 <- 1 <- ... <- 63
    n = 64
    pts = np.zeros((n, 3), np.float32)
    pts[:, 1] = np.arange(n) * 0.05
    radii = np.full((n,), 0.03, np.float32)
    preds = np.arange(-1, n - 1, dtype=np.int32)
    dist = np.arange(n, dtype=np.float32) * 0.05
    mask = np.ones((n,), bool)

    with pytest.raises(RuntimeError, match="hop_cap"):
        sample_tree(pts, radii, preds, dist, mask, hop_cap=16, max_branches=8)

    branches = sample_tree(pts, radii, preds, dist, mask, hop_cap=128,
                           max_branches=8)
    assert len(branches) >= 1
    # non-strict keeps the truncated result instead of raising
    truncated = sample_tree(pts, radii, preds, dist, mask, hop_cap=16,
                            max_branches=8, strict=False)
    assert isinstance(truncated, dict)


def test_sample_tree_branch_cap_raises():
    from smart_tree_tpu.skeleton.path import sample_tree

    # many independent 2-vertex chains -> one branch each; cap below count
    chains = 12
    n = 2 * chains
    pts = np.zeros((n, 3), np.float32)
    pts[:, 0] = np.repeat(np.arange(chains), 2) * 10.0
    pts[1::2, 1] = 1.0
    radii = np.full((n,), 0.1, np.float32)
    preds = np.full((n,), -1, np.int32)
    preds[1::2] = np.arange(0, n, 2)
    dist = np.zeros((n,), np.float32)
    dist[1::2] = 1.0
    mask = np.ones((n,), bool)

    with pytest.raises(RuntimeError, match="max_branches"):
        sample_tree(pts, radii, preds, dist, mask, hop_cap=16, max_branches=4)


@pytest.mark.slow  # ~3 min on this 1-core host
def test_inference_level_overflow_retries_at_full_capacity():
    """A too-small level_capacity_factor must not corrupt output OR fail the
    forward: the offending batch reruns once at factor 1.0 (round-3 policy;
    VERDICT r2 #1b)."""
    from pathlib import Path

    from smart_tree_tpu.data.augmentations import CentreCloud
    from smart_tree_tpu.data.synthetic import generate_tree
    from smart_tree_tpu.infer.inference import ModelInference

    weights = (
        Path(__file__).resolve().parent.parent
        / "smart_tree_tpu/weights/noble-elevator-58.npz"
    )
    cloud, _ = generate_tree(
        seed=3, height=6.0, trunk_radius=0.12, points_per_m2=300.0,
        foliage_points=500,
    )
    cloud = CentreCloud()(cloud)
    tiny = ModelInference(str(weights), level_capacity_factor=0.05)
    ref = ModelInference(str(weights), level_capacity_factor=1.0)
    out_tiny = tiny.forward(cloud)
    out_ref = ref.forward(cloud)
    assert len(out_tiny) == len(out_ref) > 0
    np.testing.assert_allclose(
        np.asarray(out_tiny.medial_vector),
        np.asarray(out_ref.medial_vector),
        rtol=1e-4, atol=1e-6,
    )


def test_voxel_downsample_reports_out_of_grid():
    import jax.numpy as jnp

    from smart_tree_tpu.core.voxelize import voxel_downsample_indices

    xyz = np.zeros((8, 3), np.float32)
    xyz[-1] = 2000.0  # at voxel 1.0 this lands outside the 1024^3 grid
    idx, valid, count, oob = voxel_downsample_indices(
        jnp.asarray(xyz), 1.0, capacity=16
    )
    assert int(oob) == 1
    xyz[-1] = 100.0
    _, _, _, oob2 = voxel_downsample_indices(jnp.asarray(xyz), 1.0, capacity=16)
    assert int(oob2) == 0
