"""One-shot device diagnostics: (a) host<->device link RTT + bandwidth
through this environment's relay, (b) Bellman-Ford per-round device cost at
skeleton-stage scale — the two numbers that decide how to hit VERDICT r3
items #1 (device skeleton stage / clouds/min) and #4 (end-to-end >=10x).

The SSSP probe times _bf_chunk dispatches with a SMALL bounded round count
(the round-3 campaign's unbounded-until-converged runs never returned at
219k vertices within the 40-min stage timeout — this isolates round cost
from round count).

Usage: python tools/diag_link_sssp.py [--n 219435]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def note(msg):
    print(f"# {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=219_435)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--skip-link", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    note(f"backend={jax.devices()[0].platform}")

    if not args.skip_link:
        # --- link RTT: tiny scalar round trips ---
        one = jnp.float32(1.0) + 0  # device scalar
        float(one)
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            float(one)
        note(f"scalar fetch RTT: {(time.perf_counter() - t0) / reps * 1e3:.1f} ms")

        # --- upload bandwidth (host->device): asarray + checksum fetch ---
        s = jax.jit(jnp.sum)
        for mb in (1, 4, 16):
            a = np.random.rand(mb * 131072, 1).astype(np.float32)  # mb MB
            float(s(jnp.asarray(a)))  # warm compile for this shape
            t0 = time.perf_counter()
            for _ in range(3):
                float(s(jnp.asarray(a)))
            dt = (time.perf_counter() - t0) / 3
            note(f"upload {mb} MB: {dt:.3f}s -> {mb / dt:.1f} MB/s")

        # --- download bandwidth (device->host) ---
        for mb in (1, 4, 16):
            d = jnp.zeros((mb * 131072, 1), jnp.float32) + 1.0
            np.asarray(d)
            t0 = time.perf_counter()
            for _ in range(3):
                np.asarray(d)
            dt = (time.perf_counter() - t0) / 3
            note(f"download {mb} MB: {dt:.3f}s -> {mb / dt:.1f} MB/s")

    # --- SSSP per-round cost at skeleton scale ---
    from smart_tree_tpu.graph.sssp import _bf_chunk, _bf_chunk_tbl, _bf_init
    from smart_tree_tpu.graph.table import build_neighbor_table

    n, k = args.n, args.k
    rng = np.random.default_rng(0)
    # filament-ish chain graph + random extra edges, like a tall tree
    src = np.repeat(np.arange(n, dtype=np.int32), k)
    dst = np.empty((n, k), np.int32)
    dst[:, 0] = np.maximum(np.arange(n, dtype=np.int32) - 1, 0)
    dst[:, 1:] = rng.integers(
        np.maximum(np.arange(n) - 40, 0)[:, None],
        np.arange(n)[:, None] + 1,
        size=(n, k - 1),
    ).astype(np.int32)
    edges = jnp.asarray(np.stack([src, dst.reshape(-1)], axis=1))
    weights = jnp.asarray(rng.uniform(0.005, 0.03, size=n * k).astype(np.float32))
    valid = jnp.ones((n * k,), bool)
    sources = jnp.asarray([0], jnp.int32)

    u, v, w, dist = _bf_init(edges, weights, valid, sources, n)
    float(jnp.sum(jnp.where(jnp.isfinite(dist), dist, 0)))
    note(f"sssp probe: n={n} E={n * k}")

    # gather-form rounds (the shipped path, graph/table.py)
    t0 = time.perf_counter()
    tbl = build_neighbor_table(edges, weights, valid, n)
    int(jnp.sum(tbl.idx[:, 0]))
    note(f"neighbor table build (cap={tbl.idx.shape[1]}): "
         f"{time.perf_counter() - t0:.2f}s (incl. compile)")
    for rounds in (16, 64, 256):
        t0 = time.perf_counter()
        d2, changed, r = _bf_chunk_tbl(tbl.idx, tbl.w, dist + 0, rounds,
                                       jnp.float32(0))
        float(jnp.sum(jnp.where(jnp.isfinite(d2), d2, 0)))
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        d2, changed, r = _bf_chunk_tbl(tbl.idx, tbl.w, dist + 0, rounds,
                                       jnp.float32(0))
        float(jnp.sum(jnp.where(jnp.isfinite(d2), d2, 0)))
        warm = time.perf_counter() - t0
        note(
            f"bf_chunk_tbl rounds={rounds}: cold={cold:.2f}s warm={warm:.2f}s"
            f" -> {warm / rounds * 1e3:.2f} ms/round"
        )

    # legacy scatter rounds, SMALL bounded counts only (a 256-round scatter
    # chunk at this scale previously blew the relay RPC deadline)
    for rounds in (4, 16):
        t0 = time.perf_counter()
        d2, changed, r = _bf_chunk(u, v, w, dist + 0, rounds, jnp.float32(0))
        float(jnp.sum(jnp.where(jnp.isfinite(d2), d2, 0)))
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        d2, changed, r = _bf_chunk(u, v, w, dist + 0, rounds, jnp.float32(0))
        float(jnp.sum(jnp.where(jnp.isfinite(d2), d2, 0)))
        warm = time.perf_counter() - t0
        note(
            f"bf_chunk (scatter) rounds={rounds}: cold={cold:.2f}s "
            f"warm={warm:.2f}s -> {warm / rounds * 1e3:.1f} ms/round"
        )


if __name__ == "__main__":
    main()
