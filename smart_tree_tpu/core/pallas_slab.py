"""Sorted-key SLAB gather-conv: the Pallas kernel that attacks the ~3 ns
per-gather-index floor (docs/PERF.md roofline; VERDICT r3 next-step #3).

Why a slab: every rulebook column k (core/rulebook.py) maps sorted output
row i -> sorted input row rb[i, k], and adding a fixed packed-key offset
preserves key order — so each column is MONOTONE over i. A tile of T
consecutive outputs therefore reads, per kernel offset, one CONTIGUOUS
range ("slab") of the feature table whose length is ~T + local density
drift. Contiguous ranges stream from HBM at bandwidth via async DMA —
no per-index gather latency at all. Keys order z fastest, so the three
dz in {-1,0,+1} columns of one (dx,dy) group land in the SAME slab
(within +-1 row): 9 slab DMAs serve all 27 columns.

Layout — shaped by the round-4 real-TPU Mosaic campaign:
  1. "Slice shape along dimension 1 must be aligned to tiling (128)":
     DMA slices of a 2-D [N, Cin] table can't start at arbitrary rows.
  2. "Failed to prove that a tile index ... is divisible by the tiling":
     even pre-rounded runtime starts can't be PROVEN aligned, on any
     dimension the (8, 128) tiling touches.
  So the table crosses HBM as [nblk, cin_t, 128] — one 128-element key
  block per leading index, channels on sublanes — and slabs slice
  dimension 0, which carries no tiling constraint at all. Slab starts
  are pre-rounded to the 128-element block outside the kernel, so a
  1024-element slab (8 blocks) covers a 512-output tile's span plus
  alignment + density drift; overflow accumulates over a chunk loop.
  Channel rows pad to a multiple of 16 (cin_t) to stay tile-aligned
  for bf16's (16, 128) tiling.

Inside the kernel the slab->row selection is an exact ONE-HOT MATMUL
per 128-block: rows_b [cin_t, 128] (dot LHS) times onehot_b [128, T].
Mosaic rejects dynamic vector indexing of VMEM ("Cannot do int
indexing" — round-1 probes, core/pallas_ops.py), and the round-4
alternatives measured WORSE on hardware:
  - whole-slab one-hot dots at S=2048 granularity: 17.7 ms @cin16 vs
    XLA's 16.3 — every [128,128] one-hot weight-tile load (~128
    cycles) feeds only cin_t streamed rows, and S*T/128^2 tile loads
    per column are irreducible at that slab size (the 128-block layout
    above exists to halve S);
  - tpu.dynamic_gather lane shuffles (jnp.take_along_axis, vreg-local:
    width-128 only — hardware probe) + 16-way block selects: 52.6 ms —
    per-op overhead of 192 gathers/selects per chunk swamps the saved
    MXU work; 16-bit rows additionally unsupported ("Gather indices
    and result have different bitwidths").
A 1.0/0.0 one-hot times bf16 rows is exact (each output row matches
exactly one (chunk, block), so the bf16 += accumulation never
collides), and the conv GEMM runs at bf16 precision — the same
rounding the XLA path applies under
`jax.default_matmul_precision('bfloat16')` (the bench.py
configuration). Slab DMAs double-buffer across the 9 (dx,dy) groups
and across overflow chunks.

Replaces (at equal output): XLA gather + GEMM in core/sparse_ops.py —
the TPU-native analog of spconv's fused gather-GEMM-scatter CUDA kernels
behind the reference's model_blocks.py:24-101.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile of output rows per grid step; slab length per DMA chunk. The slab
# (8 blocks = 1024 elements) covers the tile span (~T plus local density
# drift) plus the <=127-element start alignment before a second chunk is
# needed.
_TILE_T = 512
_BLK = 128  # elements per key block (one lane row)
_SLAB_B = 8  # blocks per slab DMA
_SLAB_S = _SLAB_B * _BLK


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def enabled() -> bool:
    """Default ON (opt out with SMART_TREE_TPU_SLAB=0) since the round-4
    campaign measured the win on hardware: 2.03x per-conv at the bench
    shape and 155 -> 87 ms whole-forward at 131k voxels (docs/PERF.md).
    Activation is further gated per conv call on bf16 matmul precision and
    rulebook height (core/sparse_ops.py::_SLAB_MIN_M) — fp32-parity paths
    and small/CPU shapes keep the XLA gather."""
    return os.environ.get("SMART_TREE_TPU_SLAB", "1") == "1"


def _precompute(rulebook: jax.Array, tile: int, slab: int):
    """Host-of-kernel (XLA) prep: per-(tile, xy-group) slab starts (rounded
    down to the 128-element block) + chunk counts, and the rulebook rebased
    to slab-relative indices.

    rulebook: [M, 27] int32 (-1 missing), columns k = 9*kx + 3*ky + kz with
    kz fastest — columns [3g, 3g+3) share one (dx,dy) group g.
    Returns (rel [M_pad, 27] int32, starts_b [tiles, 9] int32 in block
             units, nchunks [tiles, 9] int32, tiles).
    """
    m, k3 = rulebook.shape
    assert k3 == 27
    tiles = -(-m // tile)
    m_pad = tiles * tile
    if m_pad != m:
        rulebook = jnp.concatenate(
            [rulebook, jnp.full((m_pad - m, 27), -1, rulebook.dtype)], axis=0
        )
    rbt = rulebook.reshape(tiles, tile, 9, 3)
    valid = rbt >= 0
    big = jnp.int32(2**30)
    start = jnp.min(jnp.where(valid, rbt, big), axis=(1, 3))  # [tiles, 9]
    any_valid = jnp.any(valid, axis=(1, 3))
    start = jnp.where(any_valid, start, 0)
    start = (start // _BLK) * _BLK  # block-aligned DMA starts
    maxrel = jnp.max(jnp.where(valid, rbt, -1), axis=(1, 3)) - start
    nchunks = jnp.where(any_valid, maxrel // slab + 1, 0).astype(jnp.int32)
    rel = jnp.where(valid, rbt - start[:, None, :, None], -1)
    return (
        rel.reshape(m_pad, 27).astype(jnp.int32),
        (start // _BLK).astype(jnp.int32),
        nchunks,
        tiles,
    )


def _kernel(
    starts_ref,  # SMEM [tiles, 9] (scalar prefetch, block units)
    nchunks_ref,  # SMEM [tiles, 9] (scalar prefetch)
    rel_ref,  # VMEM [T, 27] int32, this tile's slab-relative rulebook
    w_ref,  # VMEM [27*cin_t, Cout] bf16 (zero rows at channel padding)
    feats_hbm,  # ANY/HBM [nblk, cin_t, 128] blocked — DMA'd per slab
    out_ref,  # VMEM [T, Cout]
    g_scr,  # VMEM [27*cin_t, T] bf16 scratch (gathered rows, transposed)
    slab_scr,  # VMEM [2, SLAB_B, cin_t, 128] feats-dtype (double buffer)
    sem,  # DMA semaphores (2,)
    *,
    cin_t: int,
    slab: int,
):
    t = pl.program_id(0)
    tile = rel_ref.shape[0]
    g_scr[:] = jnp.zeros_like(g_scr)

    def slab_dma(g, c, slot):
        return pltpu.make_async_copy(
            feats_hbm.at[
                pl.ds(starts_ref[t, g] + c * _SLAB_B, _SLAB_B), :, :
            ],
            slab_scr.at[slot],
            sem.at[slot],
        )

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (128, tile), 0)

    # double-buffered segment stream over the 9 (dx,dy) groups (and any
    # overflow chunks within a group): the next segment's DMA is in flight
    # while the current slab feeds the MXU
    slab_dma(0, 0, 0).start()
    slot = jnp.int32(0)
    for g in range(9):  # static unroll: 9 groups x 3 dz columns
        def chunk_body(c, slot, g=g):
            nch = nchunks_ref[t, g]
            nxt = (slot + 1) % 2

            @pl.when(c + 1 < nch)
            def _():
                slab_dma(g, c + 1, nxt).start()

            if g + 1 < 9:

                @pl.when(c + 1 >= nch)
                def _():
                    slab_dma(g + 1, 0, nxt).start()

            slab_dma(g, c, slot).wait()
            # per 128-block one-hot selection: rows_b is one block's
            # channel rows, the dot's contraction dim is exactly the 128
            # lanes. Each output row matches exactly ONE (c, b) block, so
            # the bf16 += accumulation never collides (zero + exact value).
            rows = [
                slab_scr[slot, b, :, :].astype(jnp.bfloat16)
                for b in range(_SLAB_B)
            ]  # each [cin_t, 128]
            for dz in range(3):
                k = 3 * g + dz
                relk = rel_ref[:, k] - c * slab  # [T]
                for b in range(_SLAB_B):
                    onehot_b = (col_iota == (relk - b * _BLK)[None, :]).astype(
                        jnp.bfloat16
                    )  # [128, T]
                    gathered_t = jnp.dot(  # [cin_t, T]
                        rows[b], onehot_b, preferred_element_type=jnp.float32
                    )
                    g_scr[k * cin_t : (k + 1) * cin_t, :] += (
                        gathered_t.astype(jnp.bfloat16)
                    )
            return nxt

        # a group whose tile has no valid entries (nch == 0) still runs one
        # chunk iteration: its DMA was already started by the previous
        # segment's prefetch (or the warmup), and all-(-1) rel matches no
        # row, so the one-hot is zero — simpler than skipping, and keeps
        # the prefetch chain unbroken
        slot = jax.lax.fori_loop(
            0, jnp.maximum(nchunks_ref[t, g], 1), chunk_body, slot
        )

    out_ref[:] = jax.lax.dot_general(
        g_scr[:],
        w_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def slab_gather_conv(
    feats: jax.Array,
    rulebook: jax.Array,
    weights: jax.Array,
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """out[M, Cout] = gather(feats by rulebook) @ weights, via slab DMA +
    one-hot MXU selection. bf16 matmul precision (see module docstring).

    feats: [N, Cin] fp32/bf16; rulebook: [M, 27] int32 (-1 missing);
    weights: [27, Cin, Cout].
    """
    if interpret is None:
        interpret = _interpret()
    n, cin = feats.shape
    m = rulebook.shape[0]
    k3, wcin, cout = weights.shape
    assert k3 == 27 and wcin == cin
    cin_t = -(-cin // 16) * 16  # bf16 sublane tile = 16 rows
    tile, slab = _TILE_T, _SLAB_S
    rel, starts_b, nchunks, tiles = _precompute(rulebook, tile, slab)
    # blocked, channel-padded table; pad N so the last chunk's fixed-size
    # DMA stays in bounds (aligned start + nchunks*S <= N + S + BLK)
    nblk = -(-(n + slab + _BLK) // _BLK)
    feats_p = jnp.zeros((nblk * _BLK, cin_t), feats.dtype)
    feats_p = feats_p.at[:n, :cin].set(feats)
    feats_b = feats_p.reshape(nblk, _BLK, cin_t).transpose(0, 2, 1)
    w2 = jnp.zeros((27, cin_t, cout), jnp.bfloat16)
    w2 = w2.at[:, :cin, :].set(weights.astype(jnp.bfloat16))
    w2 = w2.reshape(27 * cin_t, cout)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((tile, 27), lambda t, s0, s1: (t, 0)),
            pl.BlockSpec(
                (27 * cin_t, cout),
                lambda t, s0, s1: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # feats_b stay in HBM
        ],
        out_specs=pl.BlockSpec((tile, cout), lambda t, s0, s1: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((27 * cin_t, tile), jnp.bfloat16),
            pltpu.VMEM((2, _SLAB_B, cin_t, 128), feats.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, cin_t=cin_t, slab=slab),
        out_shape=jax.ShapeDtypeStruct((tiles * tile, cout), feats.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts_b, nchunks, rel, w2, feats_b)
    return out[:m]
