"""Single-tree overfit probe for the training path.

If a few hundred steps on ONE tree can't drive the in-sample direction
cosine near 1, the training machinery (loss plumbing, normalization, BN) is
broken and no amount of data will fix it; if it can, direction quality is a
data/generalization problem. Prints per-head losses every `--log-every`
steps (direction loss = mean(1 - cos) over branch voxels).

Usage: python tools/overfit_probe.py --steps 400
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np
import optax

from smart_tree_tpu.data.dataset import collate, voxelize_host
from smart_tree_tpu.data.synthetic import generate_tree
from smart_tree_tpu.infer.inference import init_template
from smart_tree_tpu.nn.model import SmartTree
from smart_tree_tpu.parallel.dp import TrainState, make_dp_train_step
from smart_tree_tpu.parallel.mesh import make_mesh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--capacity", type=int, default=65536)
    ap.add_argument("--log-every", type=int, default=25)
    ap.add_argument("--fp16", action="store_true")
    ap.add_argument("--features", default="xyz", choices=["xyz", "local"])
    ap.add_argument("--direction-loss", default="cosine",
                    choices=["cosine", "l2raw"])
    args = ap.parse_args()

    cloud, _ = generate_tree(seed=args.seed, height=8.0, trunk_radius=0.15,
                             points_per_m2=4000.0, foliage_points=4000)
    xyz = np.asarray(cloud.xyz, np.float32)
    targets = np.concatenate(
        [
            np.asarray(cloud.radius).reshape(-1, 1).astype(np.float32),
            np.asarray(cloud.direction).astype(np.float32),
            np.asarray(cloud.class_l).reshape(-1, 1).astype(np.float32),
        ],
        axis=1,
    )
    coords, data, origin = voxelize_host(xyz, np.concatenate([xyz, targets], 1), 0.01)
    print(f"tree: {len(xyz)} pts -> {len(coords)} voxels")
    vb = collate([(coords, data[:, :3], data[:, 3:], "probe", origin)], 1,
                 capacity=args.capacity, voxel_size=0.01)

    model = SmartTree(
        bn_axis_name="dp",
        input_channels=4 if args.features == "local" else 3,
    )
    variables = init_template(model)
    mesh = make_mesh()
    n_dev = mesh.devices.size
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=args.lr)
    state = TrainState(variables["params"], variables["batch_stats"],
                       optimizer.init(variables["params"]),
                       jnp.zeros((), jnp.int32))
    step_fn = make_dp_train_step(
        model, optimizer, vb.spatial_shape, 1, mesh,
        compute_dtype=jnp.bfloat16 if args.fp16 else jnp.float32,
        voxel_size=0.01,
        direction_loss=args.direction_loss,
        feature_mode=args.features,
    )

    def tile(a):
        a = np.asarray(a)
        return jnp.asarray(np.broadcast_to(a[None], (n_dev,) + a.shape).copy())

    c16, res, orig = vb.compressed_xyz_upload()
    radius16 = vb.targets[:, 0:1].astype(np.float16)
    dir_cls8 = np.concatenate(
        [np.clip(np.round(vb.targets[:, 1:4] * 127), -127, 127),
         vb.targets[:, 4:5]],
        axis=1,
    ).astype(np.int8)
    batch = tuple(
        tile(a) for a in (c16, res, radius16, dir_cls8, vb.valid, orig)
    )
    t0 = time.time()
    for i in range(args.steps):
        state, losses = step_fn(state, *batch)
        if i % args.log_every == 0 or i == args.steps - 1:
            l = {k: float(np.asarray(v)) for k, v in losses.items()}
            print(
                f"step {i:4d}  radius {l['radius']:.4f}  "
                f"direction {l['direction']:.4f} (cos {1 - l['direction']:.3f})  "
                f"class {l['class_l']:.4f}  [{time.time() - t0:.1f}s]",
                flush=True,
            )


if __name__ == "__main__":
    main()
