"""Sparse conv kernels vs dense XLA conv oracle on tiny grids.

Strategy (SURVEY.md §4): densify the sparse tensor, run
lax.conv_general_dilated, compare at active sites.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smart_tree_tpu.core import (
    SparseVoxelTensor,
    downsample_coords,
    gather_conv,
    inverse_rulebook,
    strided_rulebook,
    subm_rulebook,
)
from smart_tree_tpu.core.coords import INVALID_KEY, unpack_keys


def make_sparse(rng, n, shape, batch, cin, capacity=None):
    cap = capacity or n + 7
    c = np.unique(
        np.stack(
            [
                rng.integers(0, batch, n),
                rng.integers(0, shape[0], n),
                rng.integers(0, shape[1], n),
                rng.integers(0, shape[2], n),
            ],
            axis=1,
        ).astype(np.int32),
        axis=0,
    )
    f = rng.normal(size=(len(c), cin)).astype(np.float32)
    # pad to capacity with invalid rows
    pad = cap - len(c)
    cpad = np.concatenate([c, np.full((pad, 4), -1, np.int32)], axis=0)
    fpad = np.concatenate([f, np.zeros((pad, cin), np.float32)], axis=0)
    st = SparseVoxelTensor.from_coords(
        jnp.asarray(cpad), jnp.asarray(fpad), shape, batch
    )
    return st, c, f


def densify(st):
    coords = np.asarray(st.coords())
    feats = np.asarray(st.feats)
    active = np.asarray(st.active)
    X, Y, Z = st.spatial_shape
    dense = np.zeros((st.batch_size, X, Y, Z, st.num_features), np.float32)
    for i in range(len(coords)):
        if active[i]:
            b, x, y, z = coords[i]
            dense[b, x, y, z] = feats[i]
    return dense


def dense_conv(dense, w, stride=1, padding=1):
    # dense: [B,X,Y,Z,C]; w: [K3,Cin,Cout] in (kx,ky,kz) row-major order
    k3, cin, cout = w.shape
    k = round(k3 ** (1 / 3))
    wk = np.asarray(w).reshape(k, k, k, cin, cout)
    out = jax.lax.conv_general_dilated(
        jnp.asarray(dense),
        jnp.asarray(wk),
        window_strides=(stride,) * 3,
        padding=[(padding, padding)] * 3,
        dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
    )
    return np.asarray(out)


@pytest.mark.parametrize("kernel_size", [1, 3])
def test_subm_conv_matches_dense(kernel_size):
    rng = np.random.default_rng(0)
    shape, batch, cin, cout = (10, 9, 8), 2, 5, 7
    st, c, f = make_sparse(rng, 60, shape, batch, cin)
    w = rng.normal(size=(kernel_size**3, cin, cout)).astype(np.float32)

    rb = subm_rulebook(st.keys, shape, batch, kernel_size)
    out = gather_conv(st.feats, rb, jnp.asarray(w))

    dense = densify(st)
    pad = (kernel_size - 1) // 2
    dref = dense_conv(dense, w, stride=1, padding=pad)
    coords = np.asarray(st.coords())
    active = np.asarray(st.active)
    out = np.asarray(out)
    for i in np.nonzero(active)[0]:
        b, x, y, z = coords[i]
        np.testing.assert_allclose(out[i], dref[b, x, y, z], rtol=1e-4, atol=1e-5)
    # padding rows produce zeros
    assert np.allclose(out[~active], 0)


def test_downsample_coords_match_dense_support():
    rng = np.random.default_rng(1)
    shape, batch, cin = (11, 12, 13), 2, 3
    st, c, f = make_sparse(rng, 80, shape, batch, cin)
    out_keys, out_shape, count = downsample_coords(st.keys, shape, batch, 256)
    assert out_shape == tuple((s + 2 - 3) // 2 + 1 for s in shape)

    dense = densify(st)
    occ = (np.abs(dense).sum(-1, keepdims=True) > 0).astype(np.float32)
    w = np.ones((27, 1, 1), np.float32)
    dref = dense_conv(occ, w, stride=2, padding=1)[..., 0]
    expect = np.argwhere(dref > 0)
    got_coords = np.asarray(
        unpack_keys(out_keys, out_shape, batch)
    )[np.asarray(out_keys) != INVALID_KEY]
    expect_sorted = expect[np.lexsort(expect.T[::-1])]
    got_sorted = got_coords[np.lexsort(got_coords.T[::-1])]
    np.testing.assert_array_equal(got_sorted, expect_sorted)
    assert int(count) == len(expect)


def test_strided_conv_matches_dense():
    rng = np.random.default_rng(2)
    shape, batch, cin, cout = (11, 12, 13), 2, 4, 6
    st, c, f = make_sparse(rng, 70, shape, batch, cin)
    w = rng.normal(size=(27, cin, cout)).astype(np.float32)

    out_keys, out_shape, _ = downsample_coords(st.keys, shape, batch, 256)
    rb = strided_rulebook(st.keys, out_keys, shape, out_shape, batch)
    out = np.asarray(gather_conv(st.feats, rb, jnp.asarray(w)))

    dref = dense_conv(densify(st), w, stride=2, padding=1)
    out_coords = np.asarray(unpack_keys(out_keys, out_shape, batch))
    valid = np.asarray(out_keys) != INVALID_KEY
    for i in np.nonzero(valid)[0]:
        b, x, y, z = out_coords[i]
        np.testing.assert_allclose(out[i], dref[b, x, y, z], rtol=1e-4, atol=1e-5)


def test_inverse_conv_is_pair_replay_transpose():
    """Decode must replay Encode's pairs transposed: for every (fine f,
    coarse o, offset k) pair used by the strided conv, the inverse conv
    contributes W_inv[k] @ coarse[o] to fine f. Verify against an explicit
    pair enumeration on a tiny grid."""
    rng = np.random.default_rng(3)
    shape, batch, cc, cf = (9, 8, 7), 1, 6, 4
    st, c, f = make_sparse(rng, 40, shape, batch, 3)
    out_keys, out_shape, _ = downsample_coords(st.keys, shape, batch, 128)
    coarse_feats = rng.normal(
        size=(out_keys.shape[0], cc)
    ).astype(np.float32)
    coarse_feats[np.asarray(out_keys) == INVALID_KEY] = 0
    w = rng.normal(size=(27, cc, cf)).astype(np.float32)

    rb_inv = inverse_rulebook(st.keys, out_keys, shape, out_shape, batch)
    got = np.asarray(gather_conv(jnp.asarray(coarse_feats), rb_inv, jnp.asarray(w)))

    # explicit enumeration from the encoder side
    fine_coords = np.asarray(st.coords())
    fine_active = np.asarray(st.active)
    coarse_coords = np.asarray(unpack_keys(out_keys, out_shape, batch))
    coarse_valid = np.asarray(out_keys) != INVALID_KEY
    expect = np.zeros((len(fine_coords), cf), np.float32)
    fine_map = {
        tuple(fine_coords[i]): i for i in np.nonzero(fine_active)[0]
    }
    for o in np.nonzero(coarse_valid)[0]:
        b, ox, oy, oz = coarse_coords[o]
        for kk in range(27):
            kx, ky, kz = kk // 9, (kk // 3) % 3, kk % 3
            fc = (b, 2 * ox - 1 + kx, 2 * oy - 1 + ky, 2 * oz - 1 + kz)
            i = fine_map.get(fc)
            if i is not None:
                expect[i] += coarse_feats[o] @ w[kk]
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_pallas_fused_gather_gemm_matches_xla():
    from smart_tree_tpu.core import pallas_ops

    rng = np.random.default_rng(4)
    n, m, k3, cin, cout = 300, 200, 27, 8, 16
    feats = jnp.asarray(rng.normal(size=(n, cin)).astype(np.float32))
    rb = jnp.asarray(rng.integers(-1, n, size=(m, k3)).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(k3, cin, cout)).astype(np.float32))
    ref = gather_conv(feats, rb, w, use_pallas=False)
    got = pallas_ops.fused_gather_gemm(feats, rb, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_subm_rulebook9_conv_matches_full():
    """The compact z-window rulebook (8 searchsorteds + 9 wide gathers) must
    reproduce the full 27-column rulebook conv bit-for-bit."""
    import jax.numpy as jnp

    from smart_tree_tpu.core.rulebook import subm_rulebook, subm_rulebook9
    from smart_tree_tpu.core.sparse_ops import gather_conv
    from smart_tree_tpu.core.sparse_tensor import SparseVoxelTensor

    rng = np.random.default_rng(7)
    for shape, batch, n in [((16, 16, 16), 2, 300), ((8, 8, 8), 1, 64),
                            ((32, 4, 4), 1, 100)]:
        cap = 512
        coords = np.concatenate(
            [
                rng.integers(0, batch, size=(n, 1)),
                rng.integers(0, shape[0], size=(n, 1)),
                rng.integers(0, shape[1], size=(n, 1)),
                rng.integers(0, shape[2], size=(n, 1)),
            ],
            axis=1,
        ).astype(np.int32)
        coords = np.unique(coords, axis=0)  # voxelizer guarantees uniqueness
        coords = np.concatenate(
            [coords, np.full((cap - len(coords), 4), -1, np.int32)], axis=0
        )
        feats = rng.normal(size=(cap, 8)).astype(np.float32)
        st = SparseVoxelTensor.from_coords(
            jnp.asarray(coords), jnp.asarray(feats), shape, batch,
        )
        w = rng.normal(size=(27, 8, 16)).astype(np.float32)

        rb27 = subm_rulebook(st.keys, shape, batch, 3)
        rb9 = subm_rulebook9(st.keys, shape, batch)
        ref = np.asarray(gather_conv(st.feats, rb27, jnp.asarray(w)))
        got = np.asarray(gather_conv(st.feats, rb9, jnp.asarray(w)))
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.slow  # ~90 s on this 1-core host
def test_scatter_rulebooks_match_lookup_oracles():
    # the scatter-based builders used by build_plan (symmetric-half subm,
    # candidate-sweep strided, transpose inverse) must be entry-for-entry
    # identical to the straightforward sorted-lookup formulations
    from smart_tree_tpu.core.rulebook import (
        _query_keys,
        downsample_with_rulebook,
        inverse_from_strided,
        kernel_offsets,
    )
    from smart_tree_tpu.core.coords import lookup

    for seed, n in ((0, 40), (5, 150), (9, 400)):
        rng = np.random.default_rng(seed)
        shape, batch = (14, 11, 13), 2
        st, _, _ = make_sparse(rng, n, shape, batch, cin=2)

        # subm: symmetric-half construction vs full 27-column lookup
        rb = np.asarray(subm_rulebook(st.keys, shape, batch, 3))
        coords = unpack_keys(st.keys, shape, batch)
        active = st.keys != INVALID_KEY
        offs = kernel_offsets(3) - 1
        q = _query_keys(coords, offs, shape, batch, active)
        rb_ref = np.asarray(lookup(st.keys, q.reshape(-1)).reshape(q.shape))
        np.testing.assert_array_equal(rb, rb_ref)

        # strided: candidate-sweep scatter vs lookup oracle
        cap = 256
        ok_, os_, cnt_ = downsample_coords(st.keys, shape, batch, cap)
        ok2, os2, cnt2, drb = downsample_with_rulebook(st.keys, shape, batch, cap)
        assert int(cnt_) == int(cnt2) and os_ == os2
        np.testing.assert_array_equal(np.asarray(ok_), np.asarray(ok2))
        drb_ref = strided_rulebook(st.keys, ok_, shape, os_, batch)
        np.testing.assert_array_equal(np.asarray(drb), np.asarray(drb_ref))

        # inverse: transpose of strided vs lookup oracle
        urb = inverse_from_strided(jnp.asarray(drb), st.keys.shape[0])
        urb_ref = inverse_rulebook(st.keys, ok_, shape, os_, batch)
        np.testing.assert_array_equal(np.asarray(urb), np.asarray(urb_ref))
