import json

import numpy as np
import pytest

from smart_tree_tpu.data.augmentations import (
    AugmentationPipeline,
    CentreCloud,
    RandomCubicCrop,
    Scale,
)
from smart_tree_tpu.data.dataset import BlockTiler, TreeDataset, collate, voxelize_host
from smart_tree_tpu.data.file import save_data_npz
from smart_tree_tpu.data.synthetic import generate_tree


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ds")
    names = []
    for i in range(3):
        cloud, skel = generate_tree(seed=i, height=2.5, points_per_m2=800.0)
        name = f"tree_{i:03d}.npz"
        save_data_npz(d / name, skel, cloud)
        names.append(name)
    split = {"train": names[:2], "validation": names[2:], "test": names[2:]}
    with open(d / "split.json", "w") as f:
        json.dump(split, f)
    return d


def test_voxelize_host_dedup():
    xyz = np.asarray([[0, 0, 0], [0.001, 0.001, 0.001], [0.05, 0, 0]], np.float32)
    coords, data, _origin = voxelize_host(xyz, xyz, 0.01)
    assert len(coords) == 2  # first two share a voxel
    # surviving point is the first occurrence
    assert (data[0] == xyz[0]).all()


def test_tree_dataset_items_and_batches(dataset_dir):
    ds = TreeDataset(
        voxel_size=0.01,
        json_path=dataset_dir / "split.json",
        directory=dataset_dir,
        mode="train",
        input_features=["xyz"],
        target_features=["radius", "direction", "class_l"],
        augmentation=AugmentationPipeline([RandomCubicCrop(4.0)]),
    )
    assert len(ds) == 2
    coords, inp, tgt, name, origin = ds.item(0)
    assert inp.shape[1] == 3 and tgt.shape[1] == 5
    assert coords.min() >= 0
    # targets: radius col positive, direction cols unit-ish
    assert (tgt[:, 0] > 0).all()
    np.testing.assert_allclose(
        np.linalg.norm(tgt[:, 1:4], axis=1), 1.0, atol=1e-3
    )
    vb = next(ds.batches(2, capacity=65536))
    assert vb.coords.shape == (65536, 4)
    assert vb.valid.sum() > 0
    assert set(np.unique(vb.coords[vb.valid][:, 0])) <= {0, 1}


def test_val_crops_deterministic_across_epochs(dataset_dir):
    """Validation/test items must be identical across epochs (deterministic
    per-index crop rng) so the val loss is comparable epoch to epoch; train
    items keep the mutable rng (different crops each pass)."""
    def make(mode):
        return TreeDataset(
            voxel_size=0.01,
            json_path=dataset_dir / "split.json",
            directory=dataset_dir,
            mode=mode,
            input_features=["xyz"],
            target_features=["radius", "direction", "class_l"],
            augmentation=AugmentationPipeline([RandomCubicCrop(1.0)]),
            cache=True,
        )

    val = make("validation")
    a = val.item(0)
    b = val.item(0)  # "next epoch": same item again
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])

    tr = make("train")
    c = tr.item(0)
    d = tr.item(0)
    assert c[0].shape != d[0].shape or not np.array_equal(c[0], d[0])


def test_block_tiler_interior_masks():
    cloud, _ = generate_tree(seed=5, height=6.0, points_per_m2=600.0)
    cloud = CentreCloud()(cloud)
    tiler = BlockTiler(cloud, voxel_size=0.01, block_size=4.0, buffer_size=0.4)
    assert len(tiler) >= 1
    total_interior = 0
    for vb in tiler.batches(2):
        assert vb.spatial_shape == tiler.grid_shape
        total_interior += int(vb.mask[vb.valid].sum())
    # every point lands in exactly one interior region (approximately: the
    # voxelized interior count is <= points and > half)
    assert total_interior > 0


def test_augmentations_basic():
    cloud, _ = generate_tree(seed=6, height=2.0, points_per_m2=500.0)
    rng = np.random.default_rng(0)
    scaled = Scale(0.5, 0.5)(cloud, rng)
    np.testing.assert_allclose(
        np.asarray(scaled.xyz), np.asarray(cloud.xyz) * 0.5, rtol=1e-6
    )
    centred = CentreCloud()(cloud, rng)
    c, dims = centred.bbox
    np.testing.assert_allclose(c[[0, 2]], 0, atol=1e-4)
    assert abs(float(centred.min_xyz[1])) < 1e-3  # y base kept at 0
    cropped = RandomCubicCrop(1.0)(cloud, rng)
    assert len(cropped) <= len(cloud)
    ext = cropped.max_xyz - cropped.min_xyz
    assert (np.asarray(ext) <= 1.0 + 1e-5).all()
