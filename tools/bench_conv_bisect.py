"""Bisect WHERE the sparse conv and rulebook lose their time on TPU.

bench_primitives.py shows every primitive at sub-0.05 ms, yet bench_conv.py
measures 20-80 ms convs and 140-486 ms rulebooks. This times the actual
composition stage by stage at the real level-1 configuration to find the
pathological op (suspect: layout changes around [M,27,C]->[M,27C] reshape).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from smart_tree_tpu.core.coords import lookup, pack_coords, unpack_keys
from smart_tree_tpu.core.rulebook import (
    _query_keys, kernel_offsets, subm_rulebook, subm_rulebook9,
)
from smart_tree_tpu.core.sparse_tensor import SparseVoxelTensor
from smart_tree_tpu.data.synthetic import generate_tree


def bench(fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return round((time.perf_counter() - t0) / reps * 1e3, 3)


def main():
    level = 1
    cap = 131072
    cin = 16
    spatial = (448, 448, 448)
    shape = tuple(s >> level for s in spatial)

    cloud, _ = generate_tree(seed=1, height=8.0, trunk_radius=0.15,
                             points_per_m2=8000.0)
    xyz = np.asarray(cloud.xyz, np.float32)
    g = np.floor((xyz - xyz.min(0)) / 0.01).astype(np.int32) >> level
    g = np.unique(g, axis=0)
    n = min(len(g), cap)
    coords = np.full((cap, 4), -1, np.int32)
    coords[:n, 0] = 0
    coords[:n, 1:] = g[:n]
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(cap, cin)), jnp.bfloat16)
    st = SparseVoxelTensor.from_coords(jnp.asarray(coords), feats, shape, 1)
    keys = st.keys
    res = {"level": level, "cap": cap, "n": n, "cin": cin}

    # rulebook pieces
    res["unpack_ms"] = bench(jax.jit(lambda k: unpack_keys(k, shape, 1)), keys)
    cds = jax.jit(lambda k: unpack_keys(k, shape, 1))(keys)
    offs = kernel_offsets(3) - 1
    res["query_keys_ms"] = bench(
        jax.jit(lambda c, k: _query_keys(c, offs, shape, 1, k != np.uint32(0xFFFFFFFF))),
        cds, keys,
    )
    q = jax.jit(lambda c, k: _query_keys(c, offs, shape, 1, k != np.uint32(0xFFFFFFFF)))(cds, keys)
    res["lookup_27N_ms"] = bench(
        jax.jit(lambda k, qq: lookup(k, qq.reshape(-1)).reshape(qq.shape)), keys, q
    )
    res["searchsorted_1col_ms"] = bench(
        jax.jit(lambda k, qq: jnp.searchsorted(k, qq[:, 0], side="left")), keys, q
    )
    res["rb9_full_fn_ms"] = bench(
        jax.jit(lambda k: subm_rulebook9(k, shape, 1)), keys
    )
    res["rb27_full_fn_ms"] = bench(
        jax.jit(lambda k: subm_rulebook(k, shape, 1, 3)), keys
    )

    # conv pieces on the full rulebook
    rb = jax.jit(lambda k: subm_rulebook(k, shape, 1, 3))(keys)
    w = jnp.asarray(rng.normal(size=(27, cin, cin)), jnp.bfloat16)
    fx = jnp.concatenate([feats, jnp.zeros((1, cin), feats.dtype)], 0)

    def gather_only(fx, rb):
        idx = jnp.where(rb >= 0, rb, cap)
        return fx[idx]  # [M,27,C]

    res["conv_gather_M27C_ms"] = bench(jax.jit(gather_only), fx, rb)

    def gather_reshape(fx, rb):
        idx = jnp.where(rb >= 0, rb, cap)
        return fx[idx].reshape(cap, 27 * cin)

    res["conv_gather_reshape_ms"] = bench(jax.jit(gather_reshape), fx, rb)

    def full_conv(fx, rb, w):
        idx = jnp.where(rb >= 0, rb, cap)
        g2 = fx[idx].reshape(cap, 27 * cin)
        return jnp.dot(g2, w.reshape(27 * cin, cin),
                       preferred_element_type=jnp.float32)

    res["conv_full_ms"] = bench(jax.jit(full_conv), fx, rb, w)

    # flat-gather variant: gather [27N] flat idx from fx, transposing rb
    def flat_conv(fx, rb, w):
        idx = jnp.where(rb >= 0, rb, cap).T.reshape(-1)   # [27*M] k-major
        gf = fx[idx].reshape(27, cap, cin)                 # [27,M,C]
        out = jnp.einsum("kmc,kcd->md", gf, w,
                         preferred_element_type=jnp.float32)
        return out

    res["conv_flat_einsum_ms"] = bench(jax.jit(flat_conv), fx, rb, w)

    # per-offset GEMM accumulation (no wide reshape at all)
    def peroff_conv(fx, rb, w):
        acc = jnp.zeros((cap, cin), jnp.float32)
        for k in range(27):
            idx = jnp.where(rb[:, k] >= 0, rb[:, k], cap)
            acc = acc + jnp.dot(fx[idx], w[k],
                                preferred_element_type=jnp.float32)
        return acc

    res["conv_peroffset_ms"] = bench(jax.jit(peroff_conv), fx, rb, w)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
