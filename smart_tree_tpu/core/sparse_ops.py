"""Sparse convolution compute: gather -> single MXU GEMM -> (no scatter).

Replaces spconv's gather-GEMM-scatter CUDA kernels (the compute behind every
layer of the reference model, smart_tree/model/model_blocks.py). The TPU
formulation avoids scatters entirely: every conv variant is expressed from
the *output* side as a gather of its receptive field followed by one big
matmul

    out[N, Cout] = gather(feats)[N, K3*Cin] @ W[K3*Cin, Cout]

with K3*Cin as the contraction axis (27*64 = 1728 for the deepest layer) —
large enough to keep the 128x128 MXU busy even at this model's tiny channel
counts. Missing neighbors gather a zero row, so no masking is needed in the
GEMM itself.

A fused Pallas kernel for gather+GEMM (avoiding the [N, K3*Cin] HBM
materialization) lives in core/pallas_ops.py and is used on TPU for large N.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from . import pallas_ops, pallas_slab
from .coords import INVALID_KEY
from .rulebook import SubmRB9

# Row chunking bounds the [chunk, 27*Cin] gather transients for VERY large
# (capacity x channel) products — the factor-1.0 retry path at 262k voxels x
# 128ch would otherwise materialize 2 x 3.6 GB (the round-2 bench OOM).
# IMPORTANT (measured, real v5e): a gather inside lax.map loses XLA's fast
# TPU gather lowering — the SAME conv is 0.07 ms unchunked vs 11.6 ms
# chunked (tools/bench_conv_bisect.py vs bench_conv.py, round 3). So
# chunking must engage ONLY when the unchunked transient would threaten HBM:
# never on the default factor-0.5 path (largest transient there is ~450 MB
# fp32), only on oversized retry shapes.
_ROW_CHUNK = 32768
_CHUNK_TRANSIENT_BYTES = 1 << 30  # chunk only past ~1 GB per gather buffer

# Slab-kernel row threshold: each pallas instance adds Mosaic compile cost,
# and a full-UNet program with EVERY conv on the slab path (~20 instances)
# OOM-killed this environment's remote compile helper (SIGKILL, round-4
# campaign). The win also concentrates in the big-M convs (fixed per-tile
# one-hot work amortizes over more rows), so only rulebooks at least this
# tall take the kernel.
_SLAB_MIN_M = int(os.environ.get("SMART_TREE_TPU_SLAB_MIN_M", "65536"))

# Batch-capacity-scaled floor: at 524k-cap forest batches a FIXED 65536
# threshold admits every level's convs (~20 slab instances in one program)
# and the compile helper is SIGKILLed again (bench_scan, round 4). The
# inference driver declares the batch capacity before tracing; the
# effective threshold max(_SLAB_MIN_M, cap // 4) keeps the instance count
# roughly constant across capacities — at <= 262k caps it is identical to
# the measured-good fixed threshold (262144 // 4 == 65536).
_SLAB_CAP_HINT = 0


def set_slab_cap_hint(cap: int) -> None:
    """Declare the current batch's voxel capacity (trace-time hint)."""
    global _SLAB_CAP_HINT
    _SLAB_CAP_HINT = int(cap)


def _slab_min_rows() -> int:
    return max(_SLAB_MIN_M, _SLAB_CAP_HINT // 4)


def _map_row_chunks(fn, m: int, width: int, *arrays):
    """Apply fn over row-chunks of the leading axis only when the gather
    transient (m rows x `width` fp32 elements) would exceed the ~1 GB
    threshold; otherwise run unchunked (fast XLA gather lowering).

    Capacities are pow2 (>= 1024), so m either divides evenly by _ROW_CHUNK
    or is smaller than it; lax.map serializes the chunks, so only one
    chunk's transients are live at a time."""
    if (
        m * width * 4 <= _CHUNK_TRANSIENT_BYTES
        or m <= _ROW_CHUNK
        or m % _ROW_CHUNK != 0
    ):
        return fn(*arrays)
    n_chunks = m // _ROW_CHUNK
    chunked = tuple(
        a.reshape((n_chunks, _ROW_CHUNK) + a.shape[1:]) for a in arrays
    )
    out = jax.lax.map(lambda xs: fn(*xs), chunked)
    return out.reshape((m,) + out.shape[2:])


def gather_conv(
    feats: jax.Array,
    rulebook,
    weights: jax.Array,
    *,
    keys: jax.Array | None = None,
    precision=None,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Apply a sparse conv given a gather rulebook.

    feats:    [N, Cin]   (zero rows at padding)
    rulebook: [M, K3] int32 rows into feats (-1 = missing), or a SubmRB9
              (compact z-window form, carries its level's keys)
    weights:  [K3, Cin, Cout]
    returns:  [M, Cout]
    """
    if isinstance(rulebook, SubmRB9):
        return _gather_conv_z(
            feats, rulebook.keys, rulebook, weights, precision=precision
        )
    n = feats.shape[0]
    k3, cin, cout = weights.shape
    # Slab kernel (core/pallas_slab.py): contiguous-DMA gather + one-hot MXU
    # selection — attacks the ~3 ns/index gather floor. bf16-exact, so only
    # taken when the ambient matmul precision is already bfloat16 (the
    # bench/deploy configuration); fp32-parity paths keep the XLA gather.
    if (
        k3 == 27
        and rulebook.shape[0] >= _slab_min_rows()
        and pallas_slab.enabled()
        and (precision or jax.config.jax_default_matmul_precision) == "bfloat16"
    ):
        return pallas_slab.slab_gather_conv(feats, rulebook, weights).astype(
            feats.dtype
        )
    if use_pallas is None:
        use_pallas = pallas_ops.should_use_pallas(rulebook.shape[0], k3, cin, cout)
    if use_pallas:
        return pallas_ops.fused_gather_gemm(feats, rulebook, weights)
    feats_ext = jnp.concatenate([feats, jnp.zeros((1, cin), feats.dtype)], axis=0)
    idx = jnp.where(rulebook >= 0, rulebook, n)
    w2 = weights.reshape(k3 * cin, cout)

    def chunk(idx_c):
        g = feats_ext[idx_c]  # [m, K3, Cin]
        g2 = g.reshape(g.shape[0], k3 * cin)
        return jnp.dot(
            g2, w2, preferred_element_type=jnp.float32, precision=precision
        ).astype(feats.dtype)

    return _map_row_chunks(chunk, idx.shape[0], k3 * cin, idx)


def _gather_conv_z(
    feats: jax.Array,
    keys: jax.Array,
    rb: SubmRB9,
    weights: jax.Array,
    *,
    precision=None,
) -> jax.Array:
    """Submanifold conv from the compact z-window rulebook (subm_rulebook9).

    Keys sort z fastest, so feats rows [pos-1, pos+1] around each (dx,dy,0)
    insertion position hold every dz in {-1,0,+1} neighbor: 9 gathers of
    3*Cin-wide windows replace 27 gathers of Cin-wide rows (TPU gathers are
    row-latency-bound — fewer, wider rows win), and a tiny [3slot x 3dz]
    key-match routing einsum restores exact spconv slot order before the
    single MXU GEMM.
    """
    n, cin = feats.shape
    k3, _, cout = weights.shape
    assert k3 == 27 and keys is not None

    z1 = jnp.zeros((1, cin), feats.dtype)
    w3 = jnp.concatenate(
        [
            jnp.concatenate([z1, feats[:-1]], axis=0),   # row j-1
            feats,                                        # row j
            jnp.concatenate([feats[1:], z1], axis=0),     # row j+1
        ],
        axis=1,
    )  # [N, 3*Cin]
    inv = jnp.asarray([INVALID_KEY], keys.dtype)
    k3w = jnp.stack(
        [
            jnp.concatenate([inv, keys[:-1]]),
            keys,
            jnp.concatenate([keys[1:], inv]),
        ],
        axis=1,
    )  # [N, 3]

    w2 = weights.reshape(27 * cin, cout)
    dz = jnp.asarray([0xFFFFFFFF, 0, 1], rb.qkey.dtype)  # -1 mod 2^32, 0, +1
    zmask = jnp.asarray((1 << rb.zbits) - 1, rb.qkey.dtype)

    def chunk(pos_c, q_c):
        posc = jnp.clip(pos_c, 0, n - 1)              # [m, 9]
        g = w3[posc].reshape(posc.shape[0], 9, 3, cin)  # [m, 9, 3slot, Cin]
        kw = k3w[posc]                                # [m, 9, 3slot]
        # target keys per dz; uint32 +-1 also walks the z field of the key
        tgt = q_c[..., None] + dz[None, None, :]
        # z-field edge guards: at z=0 a -1 borrows into y, at z=zmax-1 (when
        # zmax fills the field) a +1 carries into y — both could alias REAL
        # keys
        zq = (q_c & zmask).astype(jnp.int32)
        ok_dz = jnp.stack(
            [zq >= 1, jnp.ones_like(zq, bool), zq + 1 < rb.zmax], axis=-1
        )
        ok = ok_dz & (q_c != INVALID_KEY)[..., None]  # [m, 9, 3dz]
        m = (kw[..., :, None] == tgt[..., None, :]) & ok[..., None, :]
        # route slots -> dz positions with explicit broadcast multiply-adds:
        # einsum("mosc,mosd->modc") lowered to tiny batched matmuls on TPU
        # and dominated the z9 path (docs/PERF.md round 3 "~4x slower than
        # full"); at most one slot matches per (m,o,dz), so this elementwise
        # form is bit-identical and pure VPU work that XLA fuses
        md = m.astype(feats.dtype)  # [m, 9, 3slot, 3dz]
        g27 = (
            g[:, :, 0, None, :] * md[:, :, 0, :, None]
            + g[:, :, 1, None, :] * md[:, :, 1, :, None]
            + g[:, :, 2, None, :] * md[:, :, 2, :, None]
        )  # [m, 9, 3dz, Cin] — (dx,dy) kx-major x dz fastest == offsets order
        g2 = g27.reshape(g27.shape[0], 27 * cin)
        return jnp.dot(
            g2, w2, preferred_element_type=jnp.float32, precision=precision
        ).astype(feats.dtype)

    return _map_row_chunks(chunk, rb.pos.shape[0], 27 * cin, rb.pos, rb.qkey)


def linear(feats: jax.Array, weights: jax.Array, bias: jax.Array | None = None):
    """Per-voxel linear layer (the reference's 1x1x1 SparseFC / MLP heads,
    model_blocks.py:246-320)."""
    out = jnp.dot(feats, weights, preferred_element_type=jnp.float32).astype(
        feats.dtype
    )
    if bias is not None:
        out = out + bias
    return out
