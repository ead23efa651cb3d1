"""Per-UNet-level roofline table on the real chip (VERDICT r2 next-step #3).

For each level's (rows, channels) at the bench workload's factor-0.5
capacities, HONEST-chained (in-jit fori_loop with an elementwise data
dependency, result value fetched) timings of the two dominant costs:

  - subm rulebook build (sort-method searchsorted over 27*N queries)
  - subm gather_conv (27-row gather + one GEMM)

and for each, the static traffic/FLOP model and the achieved fraction of
the v5e peaks (819 GB/s HBM, ~197 bf16 TFLOP/s), plus the effective
per-index gather cost — the quantity that actually bounds this kernel
(docs/PERF.md round 3: TPU gathers cost ~3-7 ns PER INDEX regardless of
slice width, so at 8-64 channels the kernel is gather-issue bound, far
from both classic rooflines).

Usage: python tools/bench_levels.py [--top-cap 262144] [--chain 8]
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

from smart_tree_tpu.core.coords import pack_coords
from smart_tree_tpu.core.rulebook import subm_rulebook
from smart_tree_tpu.core.sparse_ops import gather_conv
from smart_tree_tpu.data.synthetic import generate_tree

V5E_HBM_GBPS = 819.0
V5E_BF16_TFLOPS = 197.0


def _level_keys(level: int, cap: int, spatial, batch=1):
    """Realistic occupancy: voxelize a synthetic tree at 1 cm, downsample
    2^level by integer shift + dedup (approximates the strided pyramid)."""
    cloud, _ = generate_tree(seed=1, height=12.0, trunk_radius=0.25,
                             points_per_m2=12000.0, foliage_points=20000)
    xyz = np.asarray(cloud.xyz, np.float32)
    g = np.floor((xyz - xyz.min(0)) / 0.01).astype(np.int32) >> level
    g = np.unique(g, axis=0)
    rng = np.random.default_rng(level)
    if len(g) > cap:
        g = g[rng.choice(len(g), cap, replace=False)]
    coords = np.zeros((cap, 4), np.int32)
    coords[: len(g), 0] = 0
    coords[: len(g), 1:] = g
    valid = np.zeros((cap,), bool)
    valid[: len(g)] = True
    keys = pack_coords(jnp.asarray(coords), spatial, batch,
                       valid=jnp.asarray(valid))
    return jnp.sort(keys), int(len(g))


def chained_ms(fn, x0, chain):
    """fn: x -> (x_next, scalar). Returns ms/iter by two-length difference."""

    @jax.jit
    def run_n(x, nn):
        def it(i, carry):
            x, acc = carry
            x2, s = fn(x)
            return x2, acc + s
        x, acc = jax.lax.fori_loop(0, nn, it, (x, jnp.float32(0)))
        return acc

    float(run_n(x0, jnp.int32(1)))  # compile + warm
    t0 = time.perf_counter(); float(run_n(x0, jnp.int32(1)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run_n(x0, jnp.int32(1 + chain)))
    tn = time.perf_counter() - t0
    return max((tn - t1) / chain, 0.0) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top-cap", type=int, default=262144)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--factor", type=float, default=0.5)
    args = ap.parse_args()

    planes = [8, 16, 32, 64]
    spatial = (481, 481, 481)
    rows = []
    for lvl, ch in enumerate(planes):
        cap = max(int(args.top_cap * args.factor ** lvl), 256)
        sp = tuple(s >> lvl for s in spatial)
        keys, n_active = _level_keys(lvl, cap, sp)
        rng = np.random.default_rng(0)
        feats0 = jnp.asarray(rng.normal(size=(cap, ch)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(27, ch, ch)), jnp.float32)
        rb0 = subm_rulebook(keys, sp, 1, 3)

        # --- rulebook build, chained (keys perturbed by a 0-valued dep) ---
        def rb_step(k, sp=sp):
            rb = subm_rulebook(k, sp, 1, 3)
            s = jnp.sum(rb).astype(jnp.float32)
            # elementwise dep over the whole key table
            return k + (rb[:, 0] * 0).astype(k.dtype), s
        t_rb = chained_ms(rb_step, keys, args.chain)

        # --- gather+GEMM conv, chained on features ---
        def conv_step(f, rb=rb0, w=w, ch=ch):
            o = gather_conv(f, rb, w, precision="bfloat16", use_pallas=False)
            return f + o * jnp.float32(1e-30), jnp.sum(o)
        t_conv = chained_ms(conv_step, feats0, args.chain)

        n_idx = 27 * cap
        gather_bytes = n_idx * ch * 4 + cap * ch * 4      # read + write f32
        gemm_flops = 2.0 * cap * 27 * ch * ch
        rb_idx = n_idx  # 27N searchsorted queries (sort method: ~1 pass)
        rows.append({
            "level": lvl, "cap": cap, "active": n_active, "ch": ch,
            "rulebook_ms": round(t_rb, 3),
            "conv_ms": round(t_conv, 3),
            "conv_gather_GB": round(gather_bytes / 1e9, 4),
            "conv_GFLOP": round(gemm_flops / 1e9, 4),
            "achieved_GBps": round(gather_bytes / 1e9 / (t_conv / 1e3), 1),
            "pct_hbm_peak": round(
                100 * gather_bytes / 1e9 / (t_conv / 1e3) / V5E_HBM_GBPS, 2),
            "achieved_GFLOPs": round(gemm_flops / 1e9 / (t_conv / 1e3), 1),
            "pct_mxu_peak": round(
                100 * gemm_flops / 1e9 / (t_conv / 1e3)
                / (V5E_BF16_TFLOPS * 1e3), 3),
            "gather_ns_per_index": round(t_conv * 1e6 / n_idx, 2),
            "rb_ns_per_query": round(t_rb * 1e6 / rb_idx, 2),
        })
        print(json.dumps(rows[-1]), file=sys.stderr, flush=True)

    print(json.dumps({"backend": jax.default_backend(), "levels": rows}))


if __name__ == "__main__":
    main()
