"""Block-parallel inference over the 8-virtual-device CPU mesh: outputs
must match the single-device forward exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from smart_tree_tpu.core.plan import build_plan
from smart_tree_tpu.core.sparse_tensor import SparseVoxelTensor
from smart_tree_tpu.infer.inference import init_template
from smart_tree_tpu.nn.model import SmartTree
from smart_tree_tpu.parallel import make_mesh, make_sharded_forward


def test_sharded_forward_matches_single_device():
    n_dev, cap, db, grid = 8, 128, 2, 24
    model = SmartTree(
        unet_planes=(8, 16),
        radius_fc_planes=(8, 4, 1),
        direction_fc_planes=(8, 4, 3),
        class_fc_planes=(8, 4, 2),
    )
    variables = init_template(model)
    mesh = make_mesh(n_dev)
    fwd = make_sharded_forward(model, variables, (grid,) * 3, db, mesh)

    rng = np.random.default_rng(0)
    coords = np.concatenate(
        [
            rng.integers(0, db, size=(n_dev, cap, 1)),
            rng.integers(0, grid, size=(n_dev, cap, 3)),
        ],
        axis=2,
    ).astype(np.int32)
    feats = rng.normal(size=(n_dev, cap, 3)).astype(np.float32)
    valid = rng.uniform(size=(n_dev, cap)) > 0.2

    preds, sorted_feats, active = fwd(
        jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid)
    )

    # reference: run each device slice independently
    for d in range(n_dev):
        x = SparseVoxelTensor.from_coords(
            jnp.asarray(coords[d]), jnp.asarray(feats[d]), (grid,) * 3, db,
            valid=jnp.asarray(valid[d]),
        )
        plan = build_plan(x, 2)
        ref = model.apply(variables, plan, x.feats[:, :3], train=False)
        for k in ref:
            np.testing.assert_allclose(
                np.asarray(preds[k][d]), np.asarray(ref[k]), rtol=1e-5, atol=1e-6,
                err_msg=f"device {d} key {k}",
            )
        np.testing.assert_array_equal(np.asarray(active[d]), np.asarray(x.active))
