"""Input-pipeline throughput bench — rebuild of reference
smart_tree/scripts/bench_dataloader.py (epoch wall-time loop)."""

from __future__ import annotations

import argparse
import time

from ..data.dataset import TreeDataset
from ..data.augmentations import AugmentationPipeline, RandomCubicCrop


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("directory")
    ap.add_argument("--json-path", required=True)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--voxel-size", type=float, default=0.01)
    args = ap.parse_args(argv)

    ds = TreeDataset(
        voxel_size=args.voxel_size,
        json_path=args.json_path,
        directory=args.directory,
        mode="train",
        input_features=["xyz"],
        target_features=["radius", "direction", "class_l"],
        augmentation=AugmentationPipeline([RandomCubicCrop(4.0)]),
        cache=True,
    )
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        n_items, n_voxels = 0, 0
        for vb in ds.batches(args.batch_size):
            n_items += vb.batch_size
            n_voxels += int(vb.valid.sum())
        dt = time.perf_counter() - t0
        print(
            f"epoch {epoch}: {dt:.2f}s, {n_items / dt:.1f} items/s, "
            f"{n_voxels / dt / 1e6:.2f}M voxels/s"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
