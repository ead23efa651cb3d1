import numpy as np

from smart_tree_tpu.neighbors import knn, nn


def brute_knn(src, dst, k, r, dst_valid=None):
    d2 = ((src[:, None, :] - dst[None, :, :]) ** 2).sum(-1)
    if dst_valid is not None:
        d2[:, ~dst_valid] = np.inf
    order = np.argsort(d2, axis=1, kind="stable")[:, :k]
    dists = np.sqrt(np.take_along_axis(d2, order, axis=1))
    idxs = order.astype(np.int32)
    bad = dists > r
    idxs[bad] = -1
    dists[bad] = np.inf
    return dists, idxs


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(300, 3)).astype(np.float32)
    dst = rng.normal(size=(257, 3)).astype(np.float32)
    k, r = 5, 0.6
    d_ref, i_ref = brute_knn(src, dst, k, r)
    d, i = map(np.asarray, knn(src, dst, k, r))
    # compare by distance (ties may reorder equal-distance indices)
    np.testing.assert_allclose(
        np.where(np.isfinite(d), d, 0), np.where(np.isfinite(d_ref), d_ref, 0),
        rtol=1e-4, atol=1e-5,
    )
    assert ((i >= 0) == (i_ref >= 0)).all()
    # non-tied entries must match exactly
    match = (i == i_ref) | (i < 0)
    assert match.mean() > 0.95


def test_knn_self_query_includes_self():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    d, i = map(np.asarray, knn(pts, pts, 3, 10.0))
    np.testing.assert_array_equal(i[:, 0], np.arange(50))
    np.testing.assert_allclose(d[:, 0], 0, atol=1e-3)


def test_knn_respects_masks():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(64, 3)).astype(np.float32)
    dst_valid = np.zeros(64, bool)
    dst_valid[:10] = True
    d, i = map(np.asarray, knn(pts, pts, 4, 10.0, dst_valid=dst_valid))
    assert (i[i >= 0] < 10).all()
    src_valid = np.zeros(64, bool)
    src_valid[5:] = True
    d, i = map(np.asarray, knn(pts, pts, 4, 10.0, src_valid=src_valid))
    assert (i[:5] == -1).all()


def test_nn_shape():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(20, 3)).astype(np.float32)
    b = rng.normal(size=(30, 3)).astype(np.float32)
    d, i = map(np.asarray, nn(a, b, 5.0))
    assert d.shape == (20,) and i.shape == (20,)


def test_grid_knn_matches_brute_force():
    """Uniform-grid KNN (multi-million-point path) vs the exact tiled brute
    force, on a clustered metre-scale cloud."""
    import jax.numpy as jnp

    from smart_tree_tpu.neighbors import knn
    from smart_tree_tpu.neighbors.grid import grid_knn

    rng = np.random.default_rng(11)
    centres = rng.uniform(-6, 6, size=(40, 3)).astype(np.float32)
    pts = (
        centres[:, None, :] + rng.normal(scale=0.03, size=(40, 50, 3))
    ).reshape(-1, 3).astype(np.float32)
    r, k = 0.08, 8
    gd, gi = map(np.asarray, grid_knn(pts, pts, k, r, cell_cap=256))
    bd, bi = map(np.asarray, knn(pts, pts, k, r))
    np.testing.assert_allclose(
        np.where(np.isinf(gd), 1e9, gd), np.where(np.isinf(bd), 1e9, bd),
        atol=1e-5,
    )
    assert (gi >= 0).sum() == (bi >= 0).sum()


def test_grid_knn_cell_cap_overflow():
    """Overcrowded cells: auto_grow (default) reruns with a grown cap and
    returns EXACT results; auto_grow=False + strict raises (ADVICE r2)."""
    import pytest

    from smart_tree_tpu.neighbors import knn as brute_knn
    from smart_tree_tpu.neighbors.grid import grid_knn

    rng = np.random.default_rng(12)
    pts = rng.normal(scale=0.01, size=(500, 3)).astype(np.float32)  # one cell
    with pytest.raises(RuntimeError, match="cell_cap"):
        grid_knn(pts, pts, 4, 0.5, cell_cap=16, auto_grow=False)
    d, i = map(np.asarray, grid_knn(pts, pts, 4, 0.5, cell_cap=16))
    bd, bi = map(np.asarray, brute_knn(pts, pts, 4, 0.5))
    np.testing.assert_allclose(d, bd, rtol=1e-5, atol=1e-6)


def test_grid_knn_src_outside_dst_extent():
    """Queries just outside the dst bounding box still see in-radius
    neighbors (grid margin regression)."""
    from smart_tree_tpu.neighbors.grid import grid_knn

    dst = np.asarray([[0, 0, 0], [1, 1, 1]], np.float32)
    src = np.asarray([[-0.05, 0, 0], [1.05, 1.0, 1.0], [5, 5, 5]], np.float32)
    d, i = map(np.asarray, grid_knn(src, dst, 1, 0.1, cell_cap=8))
    assert i[0, 0] == 0 and i[1, 0] == 1 and i[2, 0] == -1
