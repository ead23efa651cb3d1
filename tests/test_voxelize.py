"""Device voxelizer vs reference sparse_quantize semantics
(smart_tree/model/sparse.py:64-103: floor-div, ravel-hash dedup keeping the
first original row per voxel)."""

import jax.numpy as jnp
import numpy as np

from smart_tree_tpu.core.coords import ravel_hash_np
from smart_tree_tpu.core.voxelize import voxelize


def reference_quantize(xyz, voxel_size):
    coords = np.floor(xyz / voxel_size).astype(np.int32)
    h = ravel_hash_np(coords)
    _, index, inverse = np.unique(h, return_index=True, return_inverse=True)
    return coords[index], index, inverse


def test_voxelize_matches_reference_semantics():
    rng = np.random.default_rng(0)
    xyz = rng.uniform(0, 1.0, size=(500, 3)).astype(np.float32)
    feats = rng.normal(size=(500, 4)).astype(np.float32)
    vs = 0.05
    origin = xyz.min(axis=0)

    res = voxelize(
        jnp.asarray(xyz), jnp.asarray(feats), vs, jnp.asarray(origin),
        spatial_shape=(32, 32, 32), capacity=512,
    )
    got_coords = np.asarray(res.coords)[np.asarray(res.valid)]
    got_idx = np.asarray(res.point_idx)[np.asarray(res.valid)]

    ref_coords, ref_index, ref_inverse = reference_quantize(xyz - origin, vs)
    assert int(res.count) == len(ref_coords)
    # same voxel set
    got_sorted = got_coords[np.lexsort(got_coords.T[::-1])]
    ref4 = np.concatenate([np.zeros((len(ref_coords), 1), int), ref_coords], axis=1)
    ref_sorted = ref4[np.lexsort(ref4.T[::-1])]
    np.testing.assert_array_equal(got_sorted, ref_sorted)
    # surviving point per voxel = first original row
    ref_map = {tuple(c): i for c, i in zip(ref_coords, ref_index)}
    for c, i in zip(got_coords, got_idx):
        assert ref_map[tuple(c[1:])] == i
    # features carried through
    np.testing.assert_allclose(
        np.asarray(res.feats)[np.asarray(res.valid)], feats[got_idx], rtol=1e-6
    )
    # inverse maps every point to its voxel row
    inv = np.asarray(res.inverse)
    ukeys_coords = got_coords  # valid-prefix rows (sorted keys => valid first)
    for p in range(0, 500, 37):
        v = inv[p]
        assert v >= 0
        grid = np.floor((xyz[p] - origin) / vs).astype(int)
        np.testing.assert_array_equal(np.asarray(res.coords)[v][1:], grid)


def test_voxelize_batched():
    rng = np.random.default_rng(1)
    xyz = rng.uniform(0, 0.5, size=(200, 3)).astype(np.float32)
    batch = (np.arange(200) % 3).astype(np.int32)
    res = voxelize(
        jnp.asarray(xyz), jnp.asarray(xyz), 0.05, jnp.zeros(3),
        spatial_shape=(16, 16, 16), capacity=256,
        batch_idx=jnp.asarray(batch), batch_size=3,
    )
    coords = np.asarray(res.coords)[np.asarray(res.valid)]
    assert set(np.unique(coords[:, 0])) <= {0, 1, 2}
    # same grid cell in different batch items stays distinct
    c0 = coords[coords[:, 0] == 0][:, 1:]
    c1 = coords[coords[:, 0] == 1][:, 1:]
    assert len(c0) > 0 and len(c1) > 0
