"""Block-parallel inference over the 8-virtual-device CPU mesh: outputs
must match the single-device forward exactly, both at the kernel level and
through the full ModelInference product surface (VERDICT round-1 item 4)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from smart_tree_tpu.core.plan import build_plan
from smart_tree_tpu.core.sparse_tensor import SparseVoxelTensor
from smart_tree_tpu.infer.inference import init_template
from smart_tree_tpu.nn.model import SmartTree
from smart_tree_tpu.parallel import make_mesh, make_sharded_forward


@pytest.mark.slow  # ~100 s on this 1-core host
def test_sharded_forward_matches_single_device():
    n_dev, cap, db, grid = 8, 128, 2, 24
    voxel = 0.01
    model = SmartTree(
        unet_planes=(8, 16),
        radius_fc_planes=(8, 4, 1),
        direction_fc_planes=(8, 4, 3),
        class_fc_planes=(8, 4, 2),
    )
    variables = init_template(model)
    mesh = make_mesh(n_dev)
    fwd = make_sharded_forward(model, variables, (grid,) * 3, db, mesh,
                               voxel_size=voxel)

    rng = np.random.default_rng(0)
    coords16 = np.full((n_dev, cap, 4), -1, np.int16)
    valid = np.zeros((n_dev, cap), bool)
    for d in range(n_dev):
        c = np.unique(
            np.concatenate(
                [
                    rng.integers(0, db, size=(cap, 1)),
                    rng.integers(0, grid, size=(cap, 3)),
                ],
                axis=1,
            ).astype(np.int16),
            axis=0,
        )
        coords16[d, : len(c)] = c
        valid[d, : len(c)] = True
    res16 = rng.uniform(-voxel / 2, voxel / 2,
                        size=(n_dev, cap, 3)).astype(np.float16)
    origins = np.zeros((n_dev, db, 3), np.float32)

    preds, order, active, counts, caps = fwd(
        jnp.asarray(coords16), jnp.asarray(res16), jnp.asarray(valid),
        jnp.asarray(origins),
    )
    assert counts.shape == (n_dev, 2) and caps.shape == (n_dev, 2)

    # reference: run each device slice independently (compare through the
    # same fp16/int8 payload compression the sharded path applies)
    from smart_tree_tpu.infer.inference import compress_preds

    for d in range(n_dev):
        coords = coords16[d].astype(np.int32)
        xyz = ((coords[:, 1:] + 0.5) * voxel
               + res16[d].astype(np.float32)).astype(np.float32)
        x = SparseVoxelTensor.from_coords(
            jnp.asarray(coords), jnp.asarray(xyz), (grid,) * 3, db,
            valid=jnp.asarray(valid[d]),
        )
        plan = build_plan(x, 2)
        ref = compress_preds(model.apply(variables, plan, x.feats[:, :3], train=False))
        for k in ref:
            # direction is int8-quantized: fp drift across a rounding
            # boundary flips a quantized component by 1 step
            atol = 1.0 if k == "direction" else 1e-4
            np.testing.assert_allclose(
                np.asarray(preds[k][d]).astype(np.float32),
                np.asarray(ref[k]).astype(np.float32),
                rtol=2e-3, atol=atol, err_msg=f"device {d} key {k}",
            )
        np.testing.assert_array_equal(np.asarray(active[d]), np.asarray(x.active))


@pytest.mark.slow  # ~2.5 min on this 1-core host
def test_model_inference_multichip_equals_single(tmp_path, monkeypatch):
    """Full ModelInference: the multichip block-sharded path (taken
    automatically when len(jax.devices()) > 1) must produce the same point
    set and predictions as the single-device path."""
    from smart_tree_tpu.data.augmentations import CentreCloud
    from smart_tree_tpu.data.synthetic import generate_tree
    from smart_tree_tpu.infer import inference as inf_mod
    from smart_tree_tpu.infer.inference import ModelInference

    cloud, _ = generate_tree(seed=21, height=6.0, trunk_radius=0.12,
                             points_per_m2=800.0)
    cloud = CentreCloud()(cloud)
    mi = ModelInference("smart_tree_tpu/weights/synthetic-v3.npz", batch_size=2)

    assert len(jax.devices()) == 8  # conftest CPU mesh
    lc_multi = mi.forward(cloud)

    # force the single-device path
    dev0 = jax.devices()[0]
    monkeypatch.setattr(inf_mod.jax, "devices", lambda: [dev0])
    lc_single = mi.forward(cloud)

    assert len(lc_multi.xyz) == len(lc_single.xyz)
    om = np.lexsort(np.asarray(lc_multi.xyz).T)
    os_ = np.lexsort(np.asarray(lc_single.xyz).T)
    np.testing.assert_allclose(
        np.asarray(lc_multi.xyz)[om], np.asarray(lc_single.xyz)[os_], atol=0
    )
    # shard_map and single-device jit fuse differently; few-ulp fp32 drift
    # crossing an int8 direction-quantization boundary flips a component by
    # one step (1/127 ~ 0.8%)
    np.testing.assert_allclose(
        np.asarray(lc_multi.medial_vector)[om],
        np.asarray(lc_single.medial_vector)[os_],
        rtol=2e-2, atol=2e-4,
    )
    cls_agree = (
        np.asarray(lc_multi.class_l)[om] == np.asarray(lc_single.class_l)[os_]
    ).mean()
    assert cls_agree > 0.995, cls_agree
