import jax.numpy as jnp
import numpy as np
import pytest

from smart_tree_tpu.core import coords as C


def random_coords(rng, n, shape, batch):
    c = np.stack(
        [
            rng.integers(0, batch, n),
            rng.integers(0, shape[0], n),
            rng.integers(0, shape[1], n),
            rng.integers(0, shape[2], n),
        ],
        axis=1,
    ).astype(np.int32)
    return c


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    shape, batch = (480, 480, 480), 4
    c = random_coords(rng, 1000, shape, batch)
    keys = C.pack_coords(jnp.asarray(c), shape, batch)
    back = np.asarray(C.unpack_keys(keys, shape, batch))
    np.testing.assert_array_equal(back, c)


def test_pack_order_matches_lexicographic():
    rng = np.random.default_rng(1)
    shape, batch = (100, 200, 50), 3
    c = random_coords(rng, 500, shape, batch)
    keys = np.asarray(C.pack_coords(jnp.asarray(c), shape, batch))
    order_keys = np.argsort(keys, kind="stable")
    order_lex = np.lexsort((c[:, 3], c[:, 2], c[:, 1], c[:, 0]))
    np.testing.assert_array_equal(
        c[order_keys], c[order_lex]
    )


def test_out_of_range_is_invalid():
    shape, batch = (16, 16, 16), 2
    c = jnp.asarray([[0, -1, 0, 0], [0, 0, 16, 0], [2, 0, 0, 0], [1, 15, 15, 15]])
    keys = np.asarray(C.pack_coords(c, shape, batch))
    assert keys[0] == C.INVALID_KEY
    assert keys[1] == C.INVALID_KEY
    assert keys[2] == C.INVALID_KEY
    assert keys[3] != C.INVALID_KEY


def test_lookup_hits_and_misses():
    shape, batch = (64, 64, 64), 1
    rng = np.random.default_rng(2)
    c = np.unique(random_coords(rng, 300, shape, batch), axis=0)
    keys = C.pack_coords(jnp.asarray(c), shape, batch)
    skeys, order = C.sort_keys(keys)
    # query every key -> hit; query a missing key -> -1
    idx = np.asarray(C.lookup(skeys, skeys))
    np.testing.assert_array_equal(idx, np.arange(len(c)))
    missing = C.pack_coords(jnp.asarray([[0, 63, 63, 63]]), shape, batch)
    if np.asarray(missing)[0] not in np.asarray(skeys):
        assert np.asarray(C.lookup(skeys, missing))[0] == -1
    invalid = jnp.asarray([C.INVALID_KEY])
    assert np.asarray(C.lookup(skeys, invalid))[0] == -1


def test_unique_keys_matches_numpy_unique():
    shape, batch = (32, 32, 32), 2
    rng = np.random.default_rng(3)
    c = random_coords(rng, 400, shape, batch)
    c = np.concatenate([c, c[:100]], axis=0)  # force duplicates
    keys = C.pack_coords(jnp.asarray(c), shape, batch)
    cap = 512
    ukeys, first_idx, inverse, count = C.unique_keys(keys, cap)
    ukeys, first_idx, inverse = map(np.asarray, (ukeys, first_idx, inverse))
    kn = np.asarray(keys)
    expect_u, expect_first, expect_inv = np.unique(
        kn, return_index=True, return_inverse=True
    )
    m = int(count)
    assert m == len(expect_u)
    np.testing.assert_array_equal(ukeys[:m], expect_u)
    np.testing.assert_array_equal(first_idx[:m], expect_first)
    np.testing.assert_array_equal(inverse, expect_inv)
    assert np.all(ukeys[m:] == C.INVALID_KEY)


def test_unique_keys_with_invalid_rows():
    shape, batch = (32, 32, 32), 1
    c = jnp.asarray(
        [[0, 1, 1, 1], [0, -5, 0, 0], [0, 1, 1, 1], [0, 2, 2, 2]], jnp.int32
    )
    keys = C.pack_coords(c, shape, batch)
    ukeys, first_idx, inverse, count = C.unique_keys(keys, 8)
    assert int(count) == 2
    inv = np.asarray(inverse)
    assert inv[1] == -1
    assert inv[0] == inv[2] != -1
