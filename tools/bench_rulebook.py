"""Rulebook construction: symmetric/scatter builders vs sorted-lookup oracles.

Quantifies the round-3 change (core/rulebook.py): subm via 13 searched
offsets + mirror scatter, strided via the downsample candidate sweep, and
inverse as the strided transpose — against the straight 27-column lookup
formulations (kept in-tree as test oracles). Honest chained timing (full-
tensor dependency, two chain lengths differenced) at the bench workload's
level-0 shape.

Usage: python tools/bench_rulebook.py [--cap 131072] [--occupancy 0.25]
"""

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=131072)
    ap.add_argument("--occupancy", type=float, default=0.25)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from smart_tree_tpu.core.coords import INVALID_KEY, lookup, pack_coords, unpack_keys
    from smart_tree_tpu.core.rulebook import (
        _query_keys,
        downsample_coords,
        downsample_with_rulebook,
        inverse_from_strided,
        inverse_rulebook,
        kernel_offsets,
        strided_rulebook,
        subm_rulebook,
    )

    cap = args.cap
    spatial, batch = (416, 416, 416), 4
    rng = np.random.default_rng(0)
    # branch-like filament coords: random walks so occupancy patterns match
    # the workload (uniform random coords under-populate the 3x3x3 stencil)
    n = int(cap * args.occupancy)
    walks = 64
    steps = n // walks
    pts = []
    for w in range(walks):
        p = rng.integers(40, 370, size=3)
        stepv = rng.integers(-1, 2, size=(steps, 3))
        pts.append(np.clip(np.cumsum(stepv, axis=0) + p, 1, 414))
    c = np.concatenate(pts, axis=0)
    b = rng.integers(0, batch, size=(len(c), 1))
    coords = np.concatenate([b, c], axis=1).astype(np.int32)
    coords = np.unique(coords, axis=0)
    pad = cap - len(coords)
    coords = np.concatenate([coords, np.full((pad, 4), -1, np.int32)], axis=0)

    keys = pack_coords(jnp.asarray(coords), spatial, batch)
    keys = jnp.sort(keys)
    out_cap = cap // 2

    def subm_lookup_oracle(keys):
        coords_ = unpack_keys(keys, spatial, batch)
        active = keys != INVALID_KEY
        offs = kernel_offsets(3) - 1
        q = _query_keys(coords_, offs, spatial, batch, active)
        return lookup(keys, q.reshape(-1)).reshape(q.shape)

    def transitions_lookup_oracle(keys):
        ok, os_, _ = downsample_coords(keys, spatial, batch, out_cap)
        drb = strided_rulebook(keys, ok, spatial, os_, batch)
        urb = inverse_rulebook(keys, ok, spatial, os_, batch)
        return drb, urb

    def transitions_scatter(keys):
        ok, os_, _, drb = downsample_with_rulebook(keys, spatial, batch, out_cap)
        urb = inverse_from_strided(drb, keys.shape[0])
        return drb, urb

    variants = {
        "subm_scatter": lambda k: (subm_rulebook(k, spatial, batch, 3),),
        "subm_lookup": lambda k: (subm_lookup_oracle(k),),
        "trans_scatter": transitions_scatter,
        "trans_lookup": transitions_lookup_oracle,
    }

    results = {"cap": cap, "active": int(np.sum(coords[:, 0] >= 0)),
               "backend": str(next(iter(jax.devices())).platform)}
    for name, fn in variants.items():

        @partial(jax.jit, static_argnames=())
        def run_n(keys, nn, fn=fn):
            def it(i, carry):
                k, acc = carry
                outs = fn(k)
                dep = sum(jnp.sum(jnp.abs(o).astype(jnp.int64)) for o in outs)
                # full-tensor dependency: 1e-30*dep underflows to 0 as
                # uint32 at runtime, but the compiler cannot fold it (the
                # inference chained-step trick, infer/inference.py)
                eps = (dep.astype(jnp.float32) * jnp.float32(1e-30)).astype(
                    jnp.uint32
                )
                return k + eps, acc + dep
            _, acc = jax.lax.fori_loop(0, nn, it, (keys, jnp.int64(0)))
            return acc

        def timed(nn):
            jax.block_until_ready(run_n(keys, jnp.int32(nn)))
            t0 = time.perf_counter()
            for _ in range(args.reps):
                float(run_n(keys, jnp.int32(nn)))
            return (time.perf_counter() - t0) / args.reps

        t1 = timed(1)
        chain = max(2, min(8, int(20.0 / max(t1, 0.05))))
        tn = timed(1 + chain)
        per_ms = max((tn - t1) / chain, 0.0) * 1e3
        results[f"{name}_ms"] = round(per_ms, 2)
        print(json.dumps({name: round(per_ms, 2)}), file=sys.stderr, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
