"""Slab gather-conv (Pallas) vs XLA gather+GEMM — the VERDICT r3 #3 shootout.

Honest chained timing (full-tensor dependency, two chain lengths
differenced, scalar FETCH-forced) of one [M,27]-rulebook conv on
branch-like filament coords, at the bench workload's level shapes. The
slab kernel replaces the per-index gather (~3 ns/idx floor, docs/PERF.md
roofline) with contiguous slab DMAs + one-hot MXU selection
(core/pallas_slab.py). Both paths run at bf16 matmul precision (the
bench.py configuration), and a bf16-feature-row variant halves DMA bytes.

Usage: python tools/bench_slab.py [--cap 131072] [--cin 16 32 64]
"""

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def filament_keys(cap: int, occupancy: float, spatial, batch):
    """Random-walk voxel keys like tools/bench_rulebook.py (uniform random
    under-populates the stencil vs the real workload)."""
    import jax.numpy as jnp

    from smart_tree_tpu.core.coords import pack_coords

    rng = np.random.default_rng(0)
    n = int(cap * occupancy)
    walks = 64
    steps = n // walks
    pts = []
    for _ in range(walks):
        p = rng.integers(40, spatial[0] - 46, size=3)
        stepv = rng.integers(-1, 2, size=(steps, 3))
        pts.append(np.clip(np.cumsum(stepv, axis=0) + p, 1, spatial[0] - 2))
    c = np.concatenate(pts, axis=0)
    b = rng.integers(0, batch, size=(len(c), 1))
    coords = np.unique(np.concatenate([b, c], axis=1).astype(np.int32), axis=0)
    pad = cap - len(coords)
    coords = np.concatenate([coords, np.full((pad, 4), -1, np.int32)], axis=0)
    return jnp.sort(pack_coords(jnp.asarray(coords), spatial, batch))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=131072)
    ap.add_argument("--occupancy", type=float, default=0.25)
    ap.add_argument("--cin", type=int, nargs="*", default=[16, 32, 64])
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from smart_tree_tpu.core.pallas_slab import slab_gather_conv
    from smart_tree_tpu.core.rulebook import subm_rulebook, subm_rulebook9
    from smart_tree_tpu.core.sparse_ops import gather_conv

    cap = args.cap
    spatial, batch = (416, 416, 416), 4
    keys = filament_keys(cap, args.occupancy, spatial, batch)
    rb = jax.jit(partial(subm_rulebook, spatial_shape=spatial,
                         batch_size=batch))(keys)
    rb.block_until_ready()
    # z9 compact rulebook (fixed slot->dz routing, VERDICT r3 #6): 9N gather
    # indices instead of 27N — a 3x cut below the kernel level
    rb9 = jax.jit(partial(subm_rulebook9, spatial_shape=spatial,
                          batch_size=batch))(keys)
    rb9.pos.block_until_ready()
    results = {
        "cap": cap,
        "backend": str(next(iter(jax.devices())).platform),
        "active": int(jnp.sum(keys != jnp.uint32(0xFFFFFFFF))),
    }
    print(f"# rulebook ready, active={results['active']}", file=sys.stderr,
          flush=True)

    def note(msg):
        print(f"# {msg}", file=sys.stderr, flush=True)

    rng = np.random.default_rng(1)
    for cin in args.cin:
        cout = cin
        feats32 = jnp.asarray(rng.normal(size=(cap, cin)).astype(np.float32))
        w = jnp.asarray(
            (rng.normal(size=(27, cin, cout)) / np.sqrt(27 * cin)).astype(
                np.float32
            )
        )

        def chain(conv, feats0, rbook=rb):
            @jax.jit
            def run_n(feats, rbk, wk, nn):
                def it(i, carry):
                    f, acc = carry
                    out = conv(f, rbk, wk)
                    # data-dependent but value-preserving feedback: 1e-30 *
                    # out rounds away against O(1) feats, so every
                    # iteration is the SAME conv yet none can be folded
                    f = f + (out * jnp.asarray(1e-30, out.dtype)).astype(
                        f.dtype
                    )
                    return f, acc + jnp.sum(out.astype(jnp.float32))
                _, acc = jax.lax.fori_loop(
                    0, nn, it, (feats0, jnp.float32(0.0))
                )
                return acc

            def timed(k):
                float(run_n(feats0, rbook, w, jnp.int32(k)))  # warm/compile
                t0 = time.perf_counter()
                for _ in range(args.reps):
                    float(run_n(feats0, rbook, w, jnp.int32(k)))
                return (time.perf_counter() - t0) / args.reps

            t1 = timed(1)
            n_chain = max(2, min(16, int(10.0 / max(t1, 0.02))))
            tn = timed(1 + n_chain)
            return max((tn - t1) / n_chain, 0.0) * 1e3

        def attempt(name, fn):
            """One variant; a Mosaic/compile rejection is a RESULT (the
            round-4 layout hunt produced three of them), not a reason to
            kill the rest of the campaign."""
            try:
                ms = fn()
                note(f"cin={cin} {name}: {ms:.2f} ms")
                return round(ms, 3)
            except Exception as e:  # noqa: BLE001 — record and move on
                note(f"cin={cin} {name}: FAILED {type(e).__name__}: "
                     f"{str(e).splitlines()[0][:200]}")
                return None

        fb16 = feats32.astype(jnp.bfloat16)
        with jax.default_matmul_precision("bfloat16"):
            xla_ms = attempt("xla fp32-rows", lambda: chain(
                lambda f, r, wk: gather_conv(f, r, wk), feats32))
            slab_ms = attempt("slab fp32-rows", lambda: chain(
                lambda f, r, wk: slab_gather_conv(f, r, wk), feats32))
            slab16_ms = attempt("slab bf16-rows", lambda: chain(
                lambda f, r, wk: slab_gather_conv(f, r, wk), fb16))
            xla16_ms = attempt("xla bf16-rows", lambda: chain(
                lambda f, r, wk: gather_conv(f, r, wk), fb16))
            z9_ms = attempt("xla z9 (fixed routing)", lambda: chain(
                lambda f, r, wk: gather_conv(f, r, wk), feats32, rbook=rb9))
        results[f"cin{cin}"] = {
            "xla_ms": xla_ms,
            "slab_ms": slab_ms,
            "slab_bf16_ms": slab16_ms,
            "xla_bf16_ms": xla16_ms,
            "z9_ms": z9_ms,
            "speedup": round(xla_ms / slab_ms, 2)
            if xla_ms and slab_ms else None,
        }
        print(json.dumps({f"cin{cin}": results[f"cin{cin}"]}), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
