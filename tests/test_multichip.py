"""Multi-device data-parallel training over the 8-virtual-device CPU mesh:
compiles, executes, reduces losses, and keeps replicas identical."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from smart_tree_tpu.infer.inference import init_template
from smart_tree_tpu.nn.model import SmartTree
from smart_tree_tpu.parallel.dp import TrainState, make_dp_eval_step, make_dp_train_step
from smart_tree_tpu.parallel.mesh import make_mesh


def make_batch(rng, n_dev, cap, device_batch, grid, voxel=0.01):
    """Random batch in the compressed upload encoding (int16 coords, fp16
    voxel residuals, fp16 targets, per-item origins)."""
    coords = np.full((n_dev, cap, 4), -1, np.int16)
    valid = np.zeros((n_dev, cap), bool)
    for d in range(n_dev):
        c = np.concatenate(
            [
                rng.integers(0, device_batch, size=(cap, 1)),
                rng.integers(0, grid, size=(cap, 3)),
            ],
            axis=1,
        ).astype(np.int16)
        c = np.unique(c, axis=0)  # voxelizer guarantees unique coords
        coords[d, : len(c)] = c
        valid[d, : len(c)] = True
    res = rng.uniform(-voxel / 2, voxel / 2, size=(n_dev, cap, 3)).astype(np.float16)
    origins = np.zeros((n_dev, device_batch, 3), np.float32)
    radius16 = rng.uniform(0.02, 0.1, size=(n_dev, cap, 1)).astype(np.float16)
    direction = rng.normal(size=(n_dev, cap, 3))
    direction /= np.linalg.norm(direction, axis=2, keepdims=True)
    labels = rng.integers(0, 2, size=(n_dev, cap, 1))
    dir_cls8 = np.concatenate(
        [np.clip(np.round(direction * 127), -127, 127), labels], axis=2
    ).astype(np.int8)
    return tuple(
        jnp.asarray(a)
        for a in (coords, res, radius16, dir_cls8, valid, origins)
    )


def test_dp_train_step_runs_and_learns():
    mesh = make_mesh(8)
    model = SmartTree(
        unet_planes=(8, 16),
        radius_fc_planes=(8, 4, 1),
        direction_fc_planes=(8, 4, 3),
        class_fc_planes=(8, 4, 2),
        bn_axis_name="dp",
    )
    variables = init_template(model)
    optimizer = optax.adam(1e-2)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    grid, cap, db = 24, 256, 2
    step = make_dp_train_step(model, optimizer, (grid, grid, grid), db, mesh)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, 8, cap, db, grid)

    losses_hist = []
    for _ in range(5):
        state, losses = step(state, *batch)
        losses_hist.append(float(sum(jax.tree.leaves(losses))))
    assert np.isfinite(losses_hist).all()
    assert losses_hist[-1] < losses_hist[0], losses_hist

    # eval step works and returns finite scalars
    eval_step = make_dp_eval_step(model, (grid, grid, grid), db, mesh)
    ev = eval_step(state, *batch)
    for v in jax.tree.leaves(ev):
        assert np.isfinite(float(v))

    # params stay replicated (no sharding drift)
    for leaf in jax.tree.leaves(state.params):
        assert leaf.sharding.is_fully_replicated
