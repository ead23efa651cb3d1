import numpy as np
import scipy.sparse as sp
import scipy.sparse.csgraph as csgraph

from smart_tree_tpu.graph import (
    component_sizes,
    connected_components,
    sssp,
    tree_distances,
)


def random_graph(rng, n, e):
    edges = rng.integers(0, n, size=(e, 2)).astype(np.int32)
    weights = rng.uniform(0.1, 1.0, size=e).astype(np.float32)
    valid = rng.uniform(size=e) > 0.1
    # drop duplicate undirected pairs: scipy's coo_matrix SUMS duplicates
    # while parallel edges should take the min — not what we're testing
    key = np.stack([edges.min(1), edges.max(1)], axis=1)
    _, first = np.unique(key, axis=0, return_index=True)
    dup = np.ones(e, bool)
    dup[first] = False
    valid = valid & ~dup
    return edges, weights, valid


def scipy_graph(edges, weights, valid, n):
    e, w = edges[valid], weights[valid]
    m = sp.coo_matrix((w, (e[:, 0], e[:, 1])), shape=(n, n))
    return (m + m.T).tocsr()


def test_connected_components_vs_scipy():
    rng = np.random.default_rng(0)
    n = 200
    edges, weights, valid = random_graph(rng, n, 150)
    labels = np.asarray(connected_components(edges, valid, n))
    g = scipy_graph(edges, weights, valid, n)
    _, ref = csgraph.connected_components(g, directed=False)
    # same partition (label values differ: ours are min-vertex ids)
    for lab in np.unique(labels):
        members = labels == lab
        assert len(np.unique(ref[members])) == 1
    for lab in np.unique(ref):
        members = ref == lab
        assert len(np.unique(labels[members])) == 1
    # our label is the min vertex id of the component
    for lab in np.unique(labels):
        assert labels[lab] == lab


def test_component_sizes():
    edges = np.asarray([[0, 1], [1, 2], [4, 5]], np.int32)
    valid = np.ones(3, bool)
    labels = np.asarray(connected_components(edges, valid, 7))
    sizes = np.asarray(
        component_sizes(labels, np.ones(7, bool))
    )
    assert sizes[0] == 3 and sizes[4] == 2 and sizes[3] == 1 and sizes[6] == 1


def test_sssp_vs_scipy():
    rng = np.random.default_rng(1)
    n = 150
    edges, weights, valid = random_graph(rng, n, 400)
    src = 3
    dist, pred = map(np.asarray, sssp(edges, weights, valid, src, n))
    g = scipy_graph(edges, weights, valid, n)
    ref = csgraph.dijkstra(g, directed=False, indices=src)
    np.testing.assert_allclose(
        np.where(np.isfinite(dist), dist, -1),
        np.where(np.isfinite(ref), ref, -1),
        rtol=1e-4, atol=1e-5,
    )
    # predecessors: walking pred must reach the source (acyclic forest)
    assert pred[src] == -1
    for v in range(n):
        if np.isfinite(dist[v]) and v != src:
            p, hops = v, 0
            while p != src:
                p = pred[p]
                hops += 1
                assert p >= 0
                assert hops <= n, f"pred cycle at vertex {v}"


def test_tree_distances_pointer_doubling():
    # chain 0 <- 1 <- 2 <- ... <- 9 with unit-ish weights
    n = 10
    pred = np.asarray([-1] + list(range(0, n - 1)), np.int32)
    w = np.linspace(0.5, 1.4, n).astype(np.float32)
    d = np.asarray(tree_distances(pred, w, n))
    expect = np.concatenate([[0], np.cumsum(w[1:])])
    np.testing.assert_allclose(d, expect, rtol=1e-5)


def test_tree_distances_branching():
    #      0
    #    /   \
    #   1     2
    #  / \     \
    # 3   4     5
    pred = np.asarray([-1, 0, 0, 1, 1, 2], np.int32)
    w = np.asarray([0, 1.0, 2.0, 0.5, 0.25, 3.0], np.float32)
    d = np.asarray(tree_distances(pred, w, 6))
    np.testing.assert_allclose(d, [0, 1.0, 2.0, 1.5, 1.25, 5.0], rtol=1e-6)
