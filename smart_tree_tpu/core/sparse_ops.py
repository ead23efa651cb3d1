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

import jax
import jax.numpy as jnp

from . import pallas_ops


def gather_conv(
    feats: jax.Array,
    rulebook: jax.Array,
    weights: jax.Array,
    *,
    precision=None,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Apply a sparse conv given a gather rulebook.

    feats:    [N, Cin]   (zero rows at padding)
    rulebook: [M, K3]    int32 rows into feats, -1 = missing
    weights:  [K3, Cin, Cout]
    returns:  [M, Cout]
    """
    n = feats.shape[0]
    k3, cin, cout = weights.shape
    if use_pallas is None:
        use_pallas = pallas_ops.should_use_pallas(rulebook.shape[0], k3, cin, cout)
    if use_pallas:
        return pallas_ops.fused_gather_gemm(feats, rulebook, weights)
    feats_ext = jnp.concatenate([feats, jnp.zeros((1, cin), feats.dtype)], axis=0)
    idx = jnp.where(rulebook >= 0, rulebook, n)
    g = feats_ext[idx]  # [M, K3, Cin]
    g2 = g.reshape(g.shape[0], k3 * cin)
    w2 = weights.reshape(k3 * cin, cout)
    return jnp.dot(
        g2, w2, preferred_element_type=jnp.float32, precision=precision
    ).astype(feats.dtype)


def linear(feats: jax.Array, weights: jax.Array, bias: jax.Array | None = None):
    """Per-voxel linear layer (the reference's 1x1x1 SparseFC / MLP heads,
    model_blocks.py:246-320)."""
    out = jnp.dot(feats, weights, preferred_element_type=jnp.float32).astype(
        feats.dtype
    )
    if bias is not None:
        out = out + bias
    return out
