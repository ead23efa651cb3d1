"""Wall anatomy of ModelInference.forward on the bench workload.

VERDICT r4 #2 ("close the end-to-end 10x gap") needs a bytes/seconds
accounting of the non-device wall: host tiling, upload staging, dispatch,
download fetch, and host collect. The device step itself is 0.38 s of the
~5.3-5.7 s end-to-end wall (bench.py r4/r5 probes) — this tool locates the
rest so the right lever gets pulled (the download payload is only ~1.8 MB
at 6 B/voxel; culling it cannot buy 1.7 s).

Usage: python tools/bench_forward_anatomy.py [--reps 3]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from smart_tree_tpu.core.coords import pack_coords_np
    from smart_tree_tpu.data.augmentations import CentreCloud
    from smart_tree_tpu.data.dataset import BlockTiler
    from smart_tree_tpu.data.synthetic import generate_tree
    from smart_tree_tpu.infer.inference import ModelInference, decode_direction

    cloud, _ = generate_tree(seed=0, height=12.0, trunk_radius=0.25,
                             points_per_m2=12000.0, foliage_points=20000)
    cloud = CentreCloud()(cloud)
    n_points = len(cloud)

    mi = ModelInference(
        str(Path(__file__).resolve().parent.parent
            / "smart_tree_tpu/weights/noble-elevator-58.npz"),
        voxel_size=0.01, block_size=4.0, buffer_size=0.4, batch_size=4,
        precision="bfloat16",
    )
    mi.forward(cloud)  # warm every bucket compile

    out = {"n_points": n_points, "backend": jax.devices()[0].platform}

    def once():
        t = {}
        t0 = time.perf_counter()
        tiler = BlockTiler(cloud.host(), 0.01, 4.0, 0.4)
        batches = list(tiler.batches(4, max_capacity=mi.max_batch_capacity))
        t["tile_s"] = time.perf_counter() - t0

        up_bytes = down_bytes = 0
        t["upload_stage_s"] = t["dispatch_s"] = t["fetch_s"] = 0.0
        t["host_collect_s"] = 0.0
        outs = []
        for vb in batches:
            t0 = time.perf_counter()
            res_int8 = mi.model.input_channels != 4
            c16, res, orig, nv = vb.compact_upload(
                mi.upload_granularity, np.int8 if res_int8 else np.float16)
            up_bytes += c16.nbytes + res.nbytes + orig.nbytes
            t["upload_stage_s"] += time.perf_counter() - t0

            t0 = time.perf_counter()
            cap = len(vb.coords)
            stage = len(c16)
            coords_d, res_d, valid_d = mi._pad_fn(stage, cap, res_int8)(
                jnp.asarray(c16), jnp.asarray(res), jnp.int32(nv))
            run = mi._compiled(cap, vb.spatial_shape, vb.batch_size, None)
            preds, order, active, counts, caps = run(
                mi.variables, coords_d, res_d, jnp.asarray(orig), valid_d)
            radius, direction, class_l = mi._slice_fn(cap, stage)(
                preds["radius"], preds["direction"], preds["class_l"])
            t["dispatch_s"] += time.perf_counter() - t0
            outs.append((vb, radius, direction, class_l, counts, caps))

        for vb, radius, direction, class_l, counts, caps in outs:
            t0 = time.perf_counter()
            r, d, c, cnt, cp = jax.device_get(
                (radius, direction, class_l, counts, caps))
            down_bytes += r.nbytes + d.nbytes + c.nbytes
            t["fetch_s"] += time.perf_counter() - t0

            t0 = time.perf_counter()
            keys = pack_coords_np(vb.coords, vb.spatial_shape, vb.batch_size,
                                  valid=vb.valid)
            n_act = int((keys != np.uint32(0xFFFFFFFF)).sum())
            order = np.argsort(keys, kind="stable")[:n_act]
            keep = vb.mask[order]
            _ = vb.feats[order[keep]][:, :6]
            keep_s = np.zeros(len(r), bool)
            keep_s[: len(keep)] = keep
            _ = r.astype(np.float32)[keep_s]
            _ = decode_direction(d[keep_s])
            t["host_collect_s"] += time.perf_counter() - t0
        t["up_bytes"] = up_bytes
        t["down_bytes"] = down_bytes
        return t

    walls = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        r = once()
        r["total_s"] = time.perf_counter() - t0
        walls.append(r)
        print(f"# {json.dumps({k: round(v, 3) if isinstance(v, float) else v for k, v in r.items()})}",
              file=sys.stderr, flush=True)

    best = min(walls, key=lambda r: r["total_s"])
    # reference total: the shipped forward (pipelined), same workload
    t0 = time.perf_counter()
    mi.forward(cloud)
    best["shipped_forward_s"] = round(time.perf_counter() - t0, 3)
    best = {k: round(v, 4) if isinstance(v, float) else v
            for k, v in best.items()}
    best["points_per_sec"] = round(n_points / best["total_s"], 1)
    print(json.dumps(best))


if __name__ == "__main__":
    main()
