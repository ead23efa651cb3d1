"""Generate a synthetic-trees style dataset + split json so train-smart-tree
runs without the external dataset (reference split: conf/training-split.json,
480/60/60 over 6 species — here: 6 parameter families).

Usage: python tools/make_synthetic_dataset.py data/synthetic-trees --per-family 10
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from smart_tree_tpu.data.file import save_data_npz
from smart_tree_tpu.data.synthetic import generate_tree

FAMILIES = {
    "cherry": dict(height=8.0, trunk_radius=0.15, max_depth=4),
    "apple": dict(height=6.0, trunk_radius=0.14, max_depth=4),
    "ginkgo": dict(height=10.0, trunk_radius=0.18, max_depth=3),
    "walnut": dict(height=12.0, trunk_radius=0.25, max_depth=4),
    "pine": dict(height=14.0, trunk_radius=0.3, max_depth=3),
    "eucalyptus": dict(height=16.0, trunk_radius=0.28, max_depth=3),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--per-family", type=int, default=10)
    ap.add_argument("--points-per-m2", type=float, default=4000.0)
    ap.add_argument("--foliage", type=int, default=4000)
    ap.add_argument(
        "--vary",
        action="store_true",
        help="randomize density/noise/foliage per tree (log-uniform around "
        "the nominal values) so the model can't key on one sampling pattern",
    )
    args = ap.parse_args()

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    split = {"train": [], "validation": [], "test": []}
    seed = 0
    for fam, kw in FAMILIES.items():
        for i in range(args.per_family):
            pts = args.points_per_m2
            fol = args.foliage
            noise = 0.002
            if args.vary:
                vrng = np.random.default_rng(10_000 + seed)
                pts = float(args.points_per_m2 * np.exp(vrng.uniform(-0.9, 0.9)))
                fol = int(args.foliage * np.exp(vrng.uniform(-0.9, 0.9)))
                noise = float(vrng.uniform(0.001, 0.004))
            cloud, skel = generate_tree(
                seed=seed,
                points_per_m2=pts,
                foliage_points=fol,
                noise=noise,
                **kw,
            )
            name = f"{fam}_{i:03d}.npz"
            save_data_npz(out / name, skel, cloud)
            if args.per_family >= 3 and i == args.per_family - 2:
                bucket = "test"
            elif args.per_family >= 3 and i == args.per_family - 1:
                bucket = "validation"
            else:
                frac = i / max(args.per_family, 1)
                bucket = (
                    "train" if frac < 0.8 else ("test" if frac < 0.9 else "validation")
                )
            split[bucket].append(name)
            seed += 1
            print(f"{name}: {len(cloud)} pts, {len(skel.branches)} branches -> {bucket}")
    with open(out / "split.json", "w") as f:
        json.dump(split, f, indent=1)
    print(f"wrote {out}/split.json")


if __name__ == "__main__":
    main()
