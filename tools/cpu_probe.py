"""Tiny CPU training probe over augmented/varied batches.

Reproduces (off-TPU, in minutes) the direction-head constant-solution stall
seen in full training, for A/B tests of recipe variables.

Usage: python tools/cpu_probe.py --steps 400 --aug full|crop|none \
         [--trees 6] [--lr 0.01] [--direction-loss l2raw] [--features local]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--aug", default="full", choices=["full", "crop", "none"])
    ap.add_argument("--trees", type=int, default=6)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--direction-loss", default="l2raw")
    ap.add_argument("--features", default="local")
    ap.add_argument("--items", type=int, default=2)
    ap.add_argument("--log-every", type=int, default=25)
    ap.add_argument("--cap", type=int, default=8192)
    ap.add_argument("--dir-weight", type=float, default=1.0)
    ap.add_argument("--planes", default="8,16,32")
    args = ap.parse_args()

    import jax.numpy as jnp
    import optax

    from smart_tree_tpu.data.augmentations import (
        AugmentationPipeline, RandomCubicCrop, RandomDropout, RandomRotateY,
        RandomScale,
    )
    from smart_tree_tpu.data.dataset import collate, voxelize_host
    from smart_tree_tpu.data.synthetic import generate_tree
    from smart_tree_tpu.infer.inference import init_template
    from smart_tree_tpu.nn.model import SmartTree
    from smart_tree_tpu.parallel.dp import TrainState, make_dp_train_step
    from smart_tree_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    clouds = [
        generate_tree(seed=s, height=4.0, trunk_radius=0.12,
                      points_per_m2=4000.0, foliage_points=1000,
                      max_depth=3)[0]
        for s in range(args.trees)
    ]
    if args.aug == "full":
        aug = AugmentationPipeline([RandomRotateY(), RandomScale(0.8, 1.2),
                                    RandomCubicCrop(1.5), RandomDropout(0.3)])
    elif args.aug == "crop":
        aug = AugmentationPipeline([RandomCubicCrop(1.5)])
    else:
        aug = AugmentationPipeline([RandomCubicCrop(1.5)])  # bound voxels
        # "none": same fixed crop per tree each time (deterministic rng)

    def item(c, det_seed=None):
        r = np.random.default_rng(det_seed) if det_seed is not None else rng
        cl = aug(c, r)
        xyz = np.asarray(cl.xyz, np.float32)
        tg = np.concatenate(
            [np.asarray(cl.radius).reshape(-1, 1), np.asarray(cl.direction),
             np.asarray(cl.class_l).reshape(-1, 1)], 1
        ).astype(np.float32)
        co, da, o = voxelize_host(xyz, np.concatenate([xyz, tg], 1), 0.01)
        return co, da[:, :3], da[:, 3:], "x", o

    cap = args.cap
    model = SmartTree(
        bn_axis_name="dp",
        input_channels=4 if args.features == "local" else 3,
        unet_planes=tuple(int(x) for x in args.planes.split(",")),
    )
    variables = init_template(model)
    opt = optax.inject_hyperparams(optax.adam)(learning_rate=args.lr)
    state = TrainState(variables["params"], variables["batch_stats"],
                       opt.init(variables["params"]),
                       jnp.zeros((), jnp.int32))
    step = make_dp_train_step(
        model, opt, (256, 256, 256), args.items, make_mesh(1),
        voxel_size=0.01, direction_loss=args.direction_loss,
        feature_mode=args.features, direction_weight=args.dir_weight,
    )
    t0 = time.time()
    for i in range(args.steps):
        if args.aug == "none":
            if args.items == args.trees:
                idxs = list(range(args.trees))  # identical batch every step
            else:
                idxs = [int(rng.integers(0, args.trees))
                        for _ in range(args.items)]
            items = [item(clouds[j], det_seed=j) for j in idxs]
        else:
            items = [item(clouds[rng.integers(0, args.trees)])
                     for _ in range(args.items)]
        vb = collate(items, args.items, capacity=cap, on_overflow="truncate",
                     voxel_size=0.01)
        c16, res, orig = vb.compressed_xyz_upload()
        r16 = vb.targets[:, 0:1].astype(np.float16)
        d8 = np.concatenate(
            [np.clip(np.round(vb.targets[:, 1:4] * 127), -127, 127),
             vb.targets[:, 4:5]], 1
        ).astype(np.int8)
        state, losses = step(
            state, *(jnp.asarray(a)[None]
                     for a in (c16, res, r16, d8, vb.valid, orig))
        )
        if i % args.log_every == 0 or i == args.steps - 1:
            print(
                f"{i:4d} dir {float(losses['direction']):.4f} "
                f"rad {float(losses['radius']):.4f} "
                f"cls {float(losses['class_l']):.4f} [{time.time()-t0:.0f}s]",
                flush=True,
            )


if __name__ == "__main__":
    main()
