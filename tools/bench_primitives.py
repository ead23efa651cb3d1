"""TPU primitive microbenchmarks driving the sparse-conv redesign.

tools/bench_conv.py (round 3, real v5e) showed XLA convs 300-1000x off the
HBM roofline and searchsorted-based rulebooks at 140-486 ms/level: on TPU
every random-row access (gather, scatter, searchsorted's inner gathers) runs
on the scalar core at ~ns/row, so algorithm choice is entirely about
minimizing random-access ROWS, not bytes. This tool times the candidate
primitives so docs/PERF.md decisions cite measurements, not folklore.

Run on the real chip (exclusive): python tools/bench_primitives.py
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


def bench(fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262144)
    args = ap.parse_args()
    n = args.n
    rng = np.random.default_rng(0)
    res = {"backend": jax.default_backend(), "n": n}

    keys = jnp.asarray(
        np.sort(rng.choice(np.uint32(1 << 27), size=n, replace=False).astype(np.uint32))
    )
    queries = jnp.asarray(
        rng.choice(np.uint32(1 << 27), size=n).astype(np.uint32)
    )
    idx = jnp.asarray(rng.integers(0, n, size=n).astype(np.int32))
    idx27 = jnp.asarray(rng.integers(0, n, size=27 * n).astype(np.int32))

    res["sort_u32_ms"] = round(bench(jax.jit(jnp.sort), queries) * 1e3, 3)
    res["argsort_u32_ms"] = round(bench(jax.jit(jnp.argsort), queries) * 1e3, 3)
    res["cumsum_ms"] = round(
        bench(jax.jit(lambda x: jnp.cumsum(x.astype(jnp.int32))), queries) * 1e3, 3
    )

    for method in ("scan", "scan_unrolled", "sort"):
        f = jax.jit(lambda k, q, m=method: jnp.searchsorted(k, q, method=m))
        res[f"searchsorted_{method}_N_ms"] = round(bench(f, keys, queries) * 1e3, 3)

    # row gathers: cost vs row width (bf16)
    for c in (8, 32, 128):
        tab = jnp.asarray(rng.normal(size=(n, c)), jnp.bfloat16)
        f = jax.jit(lambda t, i: t[i])
        res[f"gather_rows_c{c}_N_ms"] = round(bench(f, tab, idx) * 1e3, 3)
    tab8 = jnp.asarray(rng.normal(size=(n, 8)), jnp.bfloat16)
    f27 = jax.jit(lambda t, i: t[i])
    res["gather_rows_c8_27N_ms"] = round(bench(f27, tab8, idx27) * 1e3, 3)
    # 1-column u32 gather (what searchsorted does 18x per query)
    tab1 = jnp.asarray(rng.integers(0, 1 << 30, size=n).astype(np.uint32))
    res["gather_u32_N_ms"] = round(
        bench(jax.jit(lambda t, i: t[i]), tab1, idx) * 1e3, 3
    )
    res["gather_u32_27N_ms"] = round(
        bench(jax.jit(lambda t, i: t[i]), tab1, idx27) * 1e3, 3
    )

    # scatter N rows into a table (dense-grid build step)
    grid16 = 1 << 24
    f = jax.jit(
        lambda i, v: jnp.full((grid16,), -1, jnp.int32).at[i].set(v)
    )
    res["scatter_16M_N_ms"] = round(
        bench(f, idx, jnp.arange(n, dtype=jnp.int32)) * 1e3, 3
    )

    # dense-grid rulebook simulation: scatter N then gather 27N
    gidx = jnp.asarray(rng.integers(0, grid16, size=n).astype(np.int32))
    gq = jnp.asarray(rng.integers(0, grid16, size=27 * n).astype(np.int32))

    def grid_rb(gi, q):
        grid = jnp.full((grid16,), -1, jnp.int32).at[gi].set(
            jnp.arange(n, dtype=jnp.int32)
        )
        return grid[q]

    res["dense_grid_rulebook_27N_ms"] = round(
        bench(jax.jit(grid_rb), gidx, gq) * 1e3, 3
    )

    # one-hot routing einsum vs explicit mask-accumulate (z9's router)
    m9 = 9
    g = jnp.asarray(rng.normal(size=(n, m9, 3, 8)), jnp.bfloat16)
    msk = jnp.asarray(rng.integers(0, 2, size=(n, m9, 3, 3)).astype(np.float32), jnp.bfloat16)

    def einsum_route(g, m):
        return jnp.einsum("mosc,mosd->modc", g, m)

    def mask_route(g, m):
        acc = [
            sum(g[:, :, s, :] * m[:, :, s, d][..., None] for s in range(3))
            for d in range(3)
        ]
        return jnp.stack(acc, axis=2)

    res["route_einsum_ms"] = round(bench(jax.jit(einsum_route), g, msk) * 1e3, 3)
    res["route_mask_ms"] = round(bench(jax.jit(mask_route), g, msk) * 1e3, 3)

    # MXU GEMM reference: [N, 216] @ [216, 8] (level-0 conv GEMM)
    a = jnp.asarray(rng.normal(size=(n, 216)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(216, 8)), jnp.bfloat16)
    res["gemm_N216x8_ms"] = round(
        bench(jax.jit(lambda a, b: a @ b), a, b) * 1e3, 3
    )

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
