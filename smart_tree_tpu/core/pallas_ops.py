"""Pallas TPU kernels for sparse convolution.

First kernel: fused gather+GEMM for the deeper UNet levels where the feature
table fits in VMEM. The XLA path (core/sparse_ops.py) materializes the
gathered [M, K3*Cin] tensor in HBM (2x HBM traffic); this kernel keeps the
whole feature table resident in VMEM and gathers locally per output tile, so
HBM sees only feats once + rulebook once + out once.

Sorted-key slab gathering for the large shallow levels (exploiting the
monotonicity of per-offset rulebook columns over sorted keys) is the planned
follow-up; until then `should_use_pallas` only opts in when the table fits.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the feature table (leave room for weights/tiles).
_VMEM_FEATS_BYTES = 8 * 1024 * 1024
_TILE_M = 512


def _enabled() -> bool:
    return os.environ.get("SMART_TREE_TPU_PALLAS", "0") == "1"


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def should_use_pallas(m: int, k3: int, cin: int, cout: int) -> bool:
    if not _enabled():
        return False
    # Mosaic (real TPU) rejects dynamic int-array indexing of VMEM refs
    # ("Cannot do int indexing on TPU"), so this first kernel runs only in
    # interpreter mode; the real-TPU version needs the sorted-key slab
    # formulation (contiguous DMA ranges per kernel offset — rulebook
    # columns are monotone over sorted keys). Until that lands, XLA's
    # native gather (hardware dynamic-gather loop) is the TPU path.
    if not _interpret():
        return False
    return m * cin * 4 <= _VMEM_FEATS_BYTES


def _fused_kernel(rb_ref, feats_ref, w_ref, out_ref):
    """One grid step: out tile [TILE_M, Cout] from VMEM-resident feats."""
    rb = rb_ref[:]  # [TILE_M, K3]
    n = feats_ref.shape[0] - 1  # last row is the zero row
    idx = jnp.where(rb >= 0, rb, n)
    g = feats_ref[idx.reshape(-1), :]  # [TILE_M*K3, Cin] VMEM gather
    tile_m, k3 = rb.shape
    cin = feats_ref.shape[1]
    g2 = g.reshape(tile_m, k3 * cin)
    out_ref[:] = jnp.dot(
        g2, w_ref[:], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def fused_gather_gemm(
    feats: jax.Array, rulebook: jax.Array, weights: jax.Array
) -> jax.Array:
    """out[M, Cout] = gather(feats by rulebook) @ weights, fused in VMEM.

    feats: [N, Cin], rulebook: [M, K3] int32 (-1 missing),
    weights: [K3, Cin, Cout].
    """
    n, cin = feats.shape
    m, k3 = rulebook.shape
    cout = weights.shape[-1]
    tile_m = min(_TILE_M, m)
    # pad M to a multiple of tile_m; padded rulebook rows are -1 -> zero row
    m_pad = ((m + tile_m - 1) // tile_m) * tile_m
    if m_pad != m:
        rulebook = jnp.concatenate(
            [rulebook, jnp.full((m_pad - m, k3), -1, rulebook.dtype)], axis=0
        )
    feats_ext = jnp.concatenate([feats, jnp.zeros((1, cin), feats.dtype)], axis=0)
    w2 = weights.reshape(k3 * cin, cout)

    out = pl.pallas_call(
        _fused_kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, cout), feats.dtype),
        grid=(m_pad // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, k3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # feats_ext, whole table
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
        ],
        out_specs=pl.BlockSpec(
            (tile_m, cout), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(rulebook, feats_ext, w2)
    return out[:m]
