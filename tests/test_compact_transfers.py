"""Valid-rows-only transfer compaction (infer/inference.py).

The compact path must be a pure transfer-layer change: the host-recomputed
sort permutation must equal the device's bit-for-bit, and the product
surface (ModelInference.forward) must return the same clouds as the legacy
full-capacity path. Reference boundary being beaten:
smart_tree/model/model_inference.py:73-78 (per-batch full host<->device
round trips).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from smart_tree_tpu.core.coords import (
    INVALID_KEY,
    pack_coords,
    pack_coords_np,
    sort_keys,
)


def test_host_keys_and_order_match_device():
    rng = np.random.default_rng(0)
    spatial, batch = (37, 41, 29), 5
    n = 4096
    coords = np.concatenate(
        [
            rng.integers(-1, batch + 1, size=(n, 1)),  # incl. out-of-range
            rng.integers(-2, 48, size=(n, 3)),         # incl. out-of-grid
        ],
        axis=1,
    ).astype(np.int32)
    valid = rng.random(n) < 0.8
    hk = pack_coords_np(coords, spatial, batch, valid=valid)
    dk = np.asarray(pack_coords(jnp.asarray(coords), spatial, batch,
                                valid=jnp.asarray(valid)))
    np.testing.assert_array_equal(hk, dk)
    # stable argsort of equal key arrays is a unique permutation
    _, dev_order = sort_keys(jnp.asarray(dk))
    np.testing.assert_array_equal(
        np.argsort(hk, kind="stable"), np.asarray(dev_order)
    )
    # active rows are a prefix of the sorted arrangement, length = #valid keys
    n_act = int((hk != INVALID_KEY).sum())
    skeys = hk[np.argsort(hk, kind="stable")]
    assert (skeys[:n_act] != INVALID_KEY).all()
    assert (skeys[n_act:] == INVALID_KEY).all()


def test_compact_upload_roundtrip_int8():
    from smart_tree_tpu.data.dataset import collate

    rng = np.random.default_rng(1)
    voxel = 0.01
    m = 1000
    coords = np.unique(rng.integers(0, 40, size=(m, 3)).astype(np.int32), axis=0)
    origin = np.array([0.3, -1.2, 0.7], np.float32)
    xyz = (origin + (coords + 0.5) * voxel
           + rng.uniform(-voxel / 2, voxel / 2, (len(coords), 3))).astype(
        np.float32
    )
    vb = collate([(coords, xyz, None, "t", origin)], 1, capacity=4096,
                 voxel_size=voxel)
    c16, q, orig, n = vb.compact_upload(granularity=256, res_dtype=np.int8)
    assert n == len(coords) and len(c16) == 1024 and q.dtype == np.int8
    centre = orig[0] + (c16[:n, 1:].astype(np.float32) + 0.5) * voxel
    rec = centre + q[:n].astype(np.float32) * (voxel / 254.0)
    np.testing.assert_allclose(rec, xyz[: n], atol=voxel / 254.0)


@pytest.mark.slow  # two ModelInference compiles (~80 s on this 1-core host)
def test_forward_compact_equals_legacy_local_model():
    """local-feature model (fp16 residuals in BOTH paths): compaction is
    bit-transparent — identical clouds out."""
    from smart_tree_tpu.data.augmentations import CentreCloud
    from smart_tree_tpu.data.synthetic import generate_tree
    from smart_tree_tpu.infer.inference import ModelInference

    cloud, _ = generate_tree(seed=5, height=5.0, trunk_radius=0.1,
                             points_per_m2=600.0, foliage_points=800)
    cloud = CentreCloud()(cloud)
    mi_c = ModelInference("smart_tree_tpu/weights/synthetic-v3.npz",
                          batch_size=2, compact_transfers=True)
    mi_l = ModelInference("smart_tree_tpu/weights/synthetic-v3.npz",
                          batch_size=2, compact_transfers=False)
    a, b = mi_c.forward(cloud), mi_l.forward(cloud)
    np.testing.assert_array_equal(np.asarray(a.xyz), np.asarray(b.xyz))
    np.testing.assert_array_equal(
        np.asarray(a.medial_vector), np.asarray(b.medial_vector)
    )
    np.testing.assert_array_equal(np.asarray(a.class_l), np.asarray(b.class_l))


@pytest.mark.slow  # two ModelInference compiles (~80 s on this 1-core host)
def test_forward_compact_close_legacy_xyz_model():
    """absolute-xyz model: the compact path additionally quantizes residuals
    to voxel/254 (~20 um) — outputs agree to quantization-level tolerance."""
    from smart_tree_tpu.data.augmentations import CentreCloud
    from smart_tree_tpu.data.synthetic import generate_tree
    from smart_tree_tpu.infer.inference import ModelInference

    cloud, _ = generate_tree(seed=6, height=5.0, trunk_radius=0.1,
                             points_per_m2=500.0, foliage_points=500)
    cloud = CentreCloud()(cloud)
    w = "smart_tree_tpu/weights/noble-elevator-58.npz"
    a = ModelInference(w, batch_size=2, compact_transfers=True).forward(cloud)
    b = ModelInference(w, batch_size=2, compact_transfers=False).forward(cloud)
    # same voxel set, same order
    np.testing.assert_array_equal(np.asarray(a.xyz), np.asarray(b.xyz))
    cls_agree = (
        np.asarray(a.class_l).ravel() == np.asarray(b.class_l).ravel()
    ).mean()
    assert cls_agree > 0.99, cls_agree
    ra = np.linalg.norm(np.asarray(a.medial_vector), axis=1)
    rb = np.linalg.norm(np.asarray(b.medial_vector), axis=1)
    rel = np.abs(ra - rb) / np.maximum(rb, 1e-3)
    assert float(np.median(rel)) < 0.02, float(np.median(rel))
