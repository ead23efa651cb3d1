"""HONEST (chained in-jit, fetch-forced) microbench of subm-conv variants.

Per-call timings through this environment's relay are unusable (PERF.md);
this tool chains each conv variant n times inside one jit with an
elementwise data dependency and differences two chain lengths, fetching the
result so the relay cannot ack early.

Variants:
  full27   — [M,27] row gather + one GEMM (current default)
  z9       — 9 window gathers + einsum routing (subm_mode="z9")
  z9sel    — 9 window gathers + select routing (no batched-matmul routing)

Usage: python tools/bench_conv_honest.py [--cap 131072] [--cin 8]
"""

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from smart_tree_tpu.core.coords import INVALID_KEY, pack_coords
from smart_tree_tpu.core.rulebook import SubmRB9, subm_rulebook, subm_rulebook9
from smart_tree_tpu.core.sparse_ops import _gather_conv_z, gather_conv
from smart_tree_tpu.data.augmentations import CentreCloud
from smart_tree_tpu.data.dataset import BlockTiler
from smart_tree_tpu.data.synthetic import generate_tree


def gather_conv_z_select(feats, keys, rb, weights, *, precision=None):
    """z9 window gather with SELECT routing: the [3slot x 3dz] key-match is
    applied as three masked adds instead of a batched tiny matmul (einsum
    over [3,3] lowers to an MXU-hostile batched GEMM)."""
    n, cin = feats.shape
    k3, _, cout = weights.shape
    assert k3 == 27

    z1 = jnp.zeros((1, cin), feats.dtype)
    w3 = [
        jnp.concatenate([z1, feats[:-1]], axis=0),
        feats,
        jnp.concatenate([feats[1:], z1], axis=0),
    ]
    inv = jnp.asarray([INVALID_KEY], keys.dtype)
    k3w = [
        jnp.concatenate([inv, keys[:-1]]),
        keys,
        jnp.concatenate([keys[1:], inv]),
    ]
    w3 = jnp.concatenate(w3, axis=1)          # [N, 3*Cin]
    k3w = jnp.stack(k3w, axis=1)              # [N, 3]

    dz = jnp.asarray([0xFFFFFFFF, 0, 1], rb.qkey.dtype)
    zmask = jnp.asarray((1 << rb.zbits) - 1, rb.qkey.dtype)
    posc = jnp.clip(rb.pos, 0, n - 1)                    # [M, 9]
    g = w3[posc].reshape(posc.shape[0], 9, 3, cin)       # [M, 9, 3slot, Cin]
    kw = k3w[posc]                                       # [M, 9, 3slot]
    tgt = rb.qkey[..., None] + dz[None, None, :]         # [M, 9, 3dz]
    zq = (rb.qkey & zmask).astype(jnp.int32)
    ok_dz = jnp.stack(
        [zq >= 1, jnp.ones_like(zq, bool), zq + 1 < rb.zmax], axis=-1
    )
    ok = ok_dz & (rb.qkey != INVALID_KEY)[..., None]     # [M, 9, 3dz]
    # select routing: for (o, dz) at most one slot matches
    g27 = jnp.zeros((posc.shape[0], 9, 3, cin), feats.dtype)
    for s in range(3):
        m_s = (kw[..., s, None] == tgt) & ok             # [M, 9, 3dz]
        g27 = g27 + jnp.where(m_s[..., None], g[:, :, s, None, :], 0)
    g2 = g27.reshape(g27.shape[0], 27 * cin)
    w2 = weights.reshape(27 * cin, cout)
    return jnp.dot(
        g2, w2, preferred_element_type=jnp.float32, precision=precision
    ).astype(feats.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=131072)
    ap.add_argument("--cin", type=int, default=8)
    ap.add_argument("--cout", type=int, default=8)
    ap.add_argument("--chain", type=int, default=8)
    args = ap.parse_args()

    cloud, _ = generate_tree(seed=0, height=12.0, trunk_radius=0.25,
                             points_per_m2=12000.0, foliage_points=20000)
    cloud = CentreCloud()(cloud)
    tiler = BlockTiler(cloud.host(), 0.01, 4.0, 0.4)
    vb = [b for b in tiler.batches(4) if len(b.coords) == args.cap][0]
    spatial, batch = vb.spatial_shape, vb.batch_size
    keys = pack_coords(
        jnp.asarray(vb.coords), spatial, batch, valid=jnp.asarray(vb.valid)
    )
    keys = jnp.sort(keys)
    n = keys.shape[0]
    rng = np.random.default_rng(0)
    feats0 = jnp.asarray(rng.normal(size=(n, args.cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(27, args.cin, args.cout)), jnp.float32)

    rb_full = subm_rulebook(keys, spatial, batch, 3)
    rb_z9 = subm_rulebook9(keys, spatial, batch)

    variants = {
        "full27": lambda f: gather_conv(f, rb_full, w, precision="bfloat16",
                                        use_pallas=False),
        "z9": lambda f: _gather_conv_z(f, keys, rb_z9, w, precision="bfloat16"),
        "z9sel": lambda f: gather_conv_z_select(f, keys, rb_z9, w,
                                                precision="bfloat16"),
    }

    out = {"cap": n, "cin": args.cin}
    for name, fn in variants.items():
        @jax.jit
        def run_n(f0, nn, fn=fn):
            def it(i, carry):
                f, acc = carry
                o = fn(f)
                # elementwise dep: output feeds the next iteration's input
                pad = jnp.zeros((n, args.cin), f.dtype)
                dep = pad.at[:, : min(args.cin, args.cout)].set(
                    o[:, : min(args.cin, args.cout)]
                )
                return f + dep * jnp.float32(1e-30), acc + jnp.sum(o)
            f, acc = jax.lax.fori_loop(0, nn, it, (f0, jnp.float32(0)))
            return acc + jnp.sum(f)

        float(run_n(feats0, jnp.int32(1)))  # compile+warm
        t0 = time.perf_counter(); float(run_n(feats0, jnp.int32(1)))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run_n(feats0, jnp.int32(1 + args.chain)))
        tn = time.perf_counter() - t0
        per = max((tn - t1) / args.chain, 0.0)
        out[name + "_ms"] = round(per * 1e3, 3)
        print(json.dumps(out), file=sys.stderr, flush=True)
    # parity check of the select routing
    o_full = np.asarray(variants["full27"](feats0))
    o_sel = np.asarray(variants["z9sel"](feats0))
    out["z9sel_max_err"] = float(np.abs(o_full - o_sel).max())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
