"""Native host kernels vs their numpy fallbacks."""

import numpy as np
import pytest

from smart_tree_tpu import native
from smart_tree_tpu.utils.maths import cube_filter as np_cube_filter

requires_native = pytest.mark.skipif(
    native.get_lib() is None, reason="no C++ toolchain"
)


@requires_native
def test_native_voxelize_matches_numpy():
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-3, 3, size=(20000, 3)).astype(np.float32)
    origin = xyz.min(axis=0)
    coords, first = native.voxelize(xyz, 0.05, origin)
    g = np.floor((xyz - origin) / 0.05).astype(np.int32)
    ref_coords, ref_first = np.unique(g, axis=0, return_index=True)
    np.testing.assert_array_equal(coords, ref_coords)
    np.testing.assert_array_equal(first, ref_first)


@requires_native
def test_native_cube_filter_matches_numpy():
    rng = np.random.default_rng(1)
    xyz = rng.uniform(-2, 2, size=(5000, 3)).astype(np.float32)
    centre = np.asarray([0.25, -0.5, 0.1], np.float32)
    got = native.cube_filter(xyz, centre, 1.2)
    ref = np_cube_filter(xyz, centre, 1.2)
    np.testing.assert_array_equal(got, ref)


@requires_native
def test_native_block_ids():
    rng = np.random.default_rng(2)
    xyz = rng.uniform(-6, 6, size=(10000, 3)).astype(np.float32)
    ids, blocks = native.block_ids(xyz, 4.0)
    g = np.floor(xyz / 4.0).astype(np.int32)
    # every point's id maps back to its own block coord
    np.testing.assert_array_equal(blocks[ids], g)
    # number of blocks matches np.unique
    assert len(blocks) == len(np.unique(g, axis=0))


@requires_native
def test_native_voxelize_speedup_at_scale():
    import time

    rng = np.random.default_rng(3)
    xyz = rng.uniform(-20, 20, size=(2_000_000, 3)).astype(np.float32)
    origin = xyz.min(axis=0)
    native.voxelize(xyz[:1000], 0.01, origin)  # warm the lib load
    t0 = time.perf_counter()
    coords, first = native.voxelize(xyz, 0.01, origin)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    g = np.floor((xyz - origin) / 0.01).astype(np.int32)
    ref_coords, ref_first = np.unique(g, axis=0, return_index=True)
    t_np = time.perf_counter() - t0
    np.testing.assert_array_equal(coords, ref_coords)
    assert t_nat < t_np, f"native {t_nat:.2f}s not faster than numpy {t_np:.2f}s"
