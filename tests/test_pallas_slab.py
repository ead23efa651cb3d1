"""Slab gather-conv kernel (core/pallas_slab.py) vs the XLA gather path.

The kernel must reproduce gather->GEMM exactly at bf16 matmul precision:
the one-hot selection copies bf16-rounded rows exactly (1.0 x bf16 with
fp32 accumulation), so the only rounding is the same bf16 rounding XLA's
dot applies under `jax.default_matmul_precision('bfloat16')`. Runs in
interpret mode on CPU; the real-chip measurement lives in
tools/bench_slab.py. Reference boundary: spconv's fused
gather-GEMM-scatter CUDA kernels (smart_tree/model/model_blocks.py:24-101).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from smart_tree_tpu.core.pallas_slab import _TILE_T, _SLAB_S, slab_gather_conv


def _bf16_reference(feats, rb, w):
    """gather -> GEMM with explicit bf16 rounding of both operands and fp32
    accumulation — the semantics the kernel implements."""
    n, cin = feats.shape
    m, k3 = rb.shape
    cout = w.shape[-1]
    fe = np.concatenate(
        [
            np.asarray(jnp.asarray(feats).astype(jnp.bfloat16).astype(jnp.float32)),
            np.zeros((1, cin), np.float32),
        ],
        axis=0,
    )
    idx = np.where(rb >= 0, rb, n)
    g = fe[idx].reshape(m, k3 * cin)
    w2 = np.asarray(
        jnp.asarray(w).reshape(k3 * cin, cout).astype(jnp.bfloat16).astype(jnp.float32)
    )
    return g @ w2


def _monotone_rulebook(rng, m, n, density=0.8, group_drift=False):
    """Random rulebook with per-column monotone structure like the real
    ones: column k sorted unique rows, some invalid. group_drift spreads
    the three dz columns of each (dx,dy) group within +-1 like sorted keys
    do (they share one slab in the kernel)."""
    rb = np.full((m, 27), -1, np.int32)
    for g in range(9):
        base = np.sort(rng.choice(n - 2, size=m, replace=n - 2 < m)) + 1
        for dz in range(3):
            col = base + (dz - 1 if group_drift else 0)
            mask = rng.random(m) < density
            rb[mask, 3 * g + dz] = col[mask]
    return rb


def test_matches_gather_gemm_bf16():
    rng = np.random.default_rng(0)
    n, m, cin, cout = 900, 700, 16, 8
    feats = rng.normal(size=(n, cin)).astype(np.float32)
    rb = _monotone_rulebook(rng, m, n, group_drift=True)
    w = rng.normal(size=(27, cin, cout)).astype(np.float32)
    out = np.asarray(
        slab_gather_conv(jnp.asarray(feats), jnp.asarray(rb), jnp.asarray(w))
    )
    ref = _bf16_reference(feats, rb, w)
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-5)


def test_multi_chunk_spans():
    """Columns spanning many slabs (batch-boundary jumps in real rulebooks)
    must accumulate across chunk iterations correctly."""
    rng = np.random.default_rng(1)
    n = 4 * _SLAB_S + 37  # forces rel spans across >4 chunks
    m = _TILE_T  # single tile
    cin, cout = 8, 8
    feats = rng.normal(size=(n, cin)).astype(np.float32)
    rb = np.full((m, 27), -1, np.int32)
    for k in range(27):
        # uniform over the whole table: span >> slab for every tile
        col = np.sort(rng.choice(n, size=m, replace=False))
        mask = rng.random(m) < 0.9
        rb[mask, k] = col[mask]
    w = rng.normal(size=(27, cin, cout)).astype(np.float32)
    out = np.asarray(
        slab_gather_conv(jnp.asarray(feats), jnp.asarray(rb), jnp.asarray(w))
    )
    np.testing.assert_allclose(out, _bf16_reference(feats, rb, w), atol=1e-4)


def test_ragged_m_and_empty_tiles():
    """m not a multiple of the tile, plus a tile whose groups are entirely
    invalid (padding tiles at the end of every capacity bucket)."""
    rng = np.random.default_rng(2)
    n, cin, cout = 600, 4, 16
    m = _TILE_T + 123
    feats = rng.normal(size=(n, cin)).astype(np.float32)
    rb = _monotone_rulebook(rng, m, n)
    rb[_TILE_T // 2 :] = -1  # second tile fully invalid, first half-invalid
    w = rng.normal(size=(27, cin, cout)).astype(np.float32)
    out = np.asarray(
        slab_gather_conv(jnp.asarray(feats), jnp.asarray(rb), jnp.asarray(w))
    )
    ref = _bf16_reference(feats, rb, w)
    np.testing.assert_allclose(out, ref, atol=1e-4)
    assert np.all(out[_TILE_T // 2 :] == 0)


@pytest.mark.parametrize("cin,cout", [(8, 16), (32, 32), (64, 64)])
def test_channel_widths(cin, cout):
    rng = np.random.default_rng(3)
    n, m = 500, 400
    feats = rng.normal(size=(n, cin)).astype(np.float32)
    rb = _monotone_rulebook(rng, m, n, group_drift=True)
    w = rng.normal(size=(27, cin, cout)).astype(np.float32)
    out = np.asarray(
        slab_gather_conv(jnp.asarray(feats), jnp.asarray(rb), jnp.asarray(w))
    )
    np.testing.assert_allclose(out, _bf16_reference(feats, rb, w), atol=2e-4)


def test_real_plan_rulebooks():
    """Slab conv on REAL rulebooks from a plan build (subm + strided +
    inverse all share the [M, 27] form and per-column monotonicity)."""
    from smart_tree_tpu.core.plan import build_plan
    from smart_tree_tpu.core.sparse_tensor import SparseVoxelTensor

    rng = np.random.default_rng(4)
    n_pts, grid, cap = 1500, 48, 2048
    coords = np.unique(
        np.concatenate(
            [
                np.zeros((n_pts, 1), np.int32),
                rng.integers(0, grid, size=(n_pts, 3)).astype(np.int32),
            ],
            axis=1,
        ),
        axis=0,
    )
    pad = np.full((cap - len(coords), 4), -1, np.int32)
    coords = np.concatenate([coords, pad], axis=0)
    feats_in = rng.normal(size=(cap, 3)).astype(np.float32)
    x = SparseVoxelTensor.from_coords(
        jnp.asarray(coords), jnp.asarray(feats_in), (grid,) * 3, 1,
        valid=jnp.asarray(coords[:, 0] >= 0),
    )
    plan = build_plan(x, 2)
    lv0, lv1 = plan.levels
    cin, cout = 8, 8
    feats = rng.normal(size=(cap, cin)).astype(np.float32)
    w = rng.normal(size=(27, cin, cout)).astype(np.float32)
    for rb in [np.asarray(lv0.subm_rb), np.asarray(lv0.up_rb)]:
        out = np.asarray(
            slab_gather_conv(jnp.asarray(feats), jnp.asarray(rb), jnp.asarray(w))
        )
        np.testing.assert_allclose(out, _bf16_reference(feats, rb, w), atol=2e-4)
    # strided rulebook gathers from the FINE level's table
    drb = np.asarray(lv1.subm_rb)  # coarse subm as well (different density)
    feats1 = rng.normal(size=(drb.shape[0], cin)).astype(np.float32)
    out = np.asarray(
        slab_gather_conv(jnp.asarray(feats1), jnp.asarray(drb), jnp.asarray(w))
    )
    np.testing.assert_allclose(out, _bf16_reference(feats1, drb, w), atol=2e-4)
