"""Per-level sparse-conv microbenchmark on the current backend.

Times, for each UNet level's (N, Cin) at a realistic tree-block sparsity:
  - z9 rulebook construction (subm_rulebook9) vs the full 27-column lookup
  - gather_conv via the z-window path vs the full rulebook path
and compares against the HBM speed-of-light for the gather+GEMM traffic.

VERDICT round-1 item 2 asks for a recorded per-level comparison on the
real TPU; run `python tools/bench_conv.py` there (exclusive — benchmark
numbers are garbage if anything else shares the chip) and paste the JSON
into docs/PERF.md.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from smart_tree_tpu.core.rulebook import subm_rulebook, subm_rulebook9
from smart_tree_tpu.core.sparse_ops import gather_conv
from smart_tree_tpu.core.sparse_tensor import SparseVoxelTensor
from smart_tree_tpu.data.synthetic import generate_tree


def _level_tensor(level: int, cap: int, spatial, batch):
    """Realistic sparsity: voxelize a synthetic tree block and downsample
    2^level (dividing coords — occupancy pattern approximates the strided
    pyramid well enough for kernel timing)."""
    cloud, _ = generate_tree(seed=1, height=8.0, trunk_radius=0.15,
                             points_per_m2=8000.0)
    xyz = np.asarray(cloud.xyz, np.float32)
    g = np.floor((xyz - xyz.min(0)) / 0.01).astype(np.int32) >> level
    g = np.unique(g, axis=0)
    n = min(len(g), cap)
    coords = np.full((cap, 4), -1, np.int32)
    coords[:n, 0] = 0
    coords[:n, 1:] = g[:n]
    return coords, n


def bench(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=131072)
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--level", type=int, default=-1, help="bench only this level")
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    spatial = (448, 448, 448)
    results = []
    for level, cin in enumerate([8, 16, 32, 64]):
        if args.level >= 0 and level != args.level:
            continue
        cap = max(args.cap >> level, 1024)
        coords, n = _level_tensor(level, cap, spatial, 1)
        shape = tuple(s >> level for s in spatial)
        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.normal(size=(cap, cin)), dtype)
        st = SparseVoxelTensor.from_coords(
            jnp.asarray(coords), feats, shape, 1
        )
        w = jnp.asarray(rng.normal(size=(27, cin, cin)), dtype)

        rb9_fn = jax.jit(lambda k: subm_rulebook9(k, shape, 1))
        rb27_fn = jax.jit(lambda k: subm_rulebook(k, shape, 1, 3))
        t_rb9 = bench(rb9_fn, st.keys)
        t_rb27 = bench(rb27_fn, st.keys)
        rb9 = rb9_fn(st.keys)
        rb27 = rb27_fn(st.keys)

        conv9 = jax.jit(lambda f, r: gather_conv(f, r, w))
        conv27 = jax.jit(lambda f, r: gather_conv(f, r, w))
        t_c9 = bench(conv9, st.feats, rb9)
        t_c27 = bench(conv27, st.feats, rb27)

        bytes_gather = n * 27 * cin * np.dtype(np.float32).itemsize
        hbm_gbps = 819.0  # v5e
        results.append({
            "level": level, "n_voxels": n, "cin": cin, "cap": cap,
            "rulebook_z9_ms": round(t_rb9 * 1e3, 3),
            "rulebook_full_ms": round(t_rb27 * 1e3, 3),
            "conv_z9_ms": round(t_c9 * 1e3, 3),
            "conv_full_ms": round(t_c27 * 1e3, 3),
            "gather_sol_ms": round(bytes_gather / (hbm_gbps * 1e9) * 1e3, 3),
        })
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"backend": jax.default_backend(), "dtype": args.dtype,
                      "levels": results}))


if __name__ == "__main__":
    main()
