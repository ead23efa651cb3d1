import pytest
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


def test_sssp_chunked_dispatch_equivalence():
    # rounds_per_dispatch bounds each DEVICE PROGRAM, not the algorithm:
    # tiny chunks must give bit-identical dist/pred to one big dispatch
    # (graph/sssp.py::sssp_multi host re-dispatch loop)
    from smart_tree_tpu.graph import sssp_multi

    rng = np.random.default_rng(7)
    n = 120
    edges, weights, valid = random_graph(rng, n, 300)
    sources = np.asarray([5, -1], np.int32)
    d1, p1, r1 = sssp_multi(edges, weights, valid, sources, n,
                            return_rounds=True, rounds_per_dispatch=4096)
    d2, p2, r2 = sssp_multi(edges, weights, valid, sources, n,
                            return_rounds=True, rounds_per_dispatch=2)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    # chunking may add one extra no-change probe round per dispatch
    assert int(r2) >= int(r1)


@pytest.mark.slow  # ~70 s on this 1-core host
def test_sample_tree_chunked_dispatch_equivalence():
    # branches_per_dispatch=1 (one greedy branch per device program) must
    # produce the same branches as one unbounded program
    import jax.numpy as jnp

    from smart_tree_tpu.skeleton.path import sample_tree_device

    rng = np.random.default_rng(3)
    n = 60
    # random tree: pred[v] < v, unit steps, distances = depth
    pred = np.asarray(
        [-1] + [rng.integers(0, v) for v in range(1, n)], np.int32)
    depth = np.zeros(n, np.float32)
    for v in range(1, n):
        depth[v] = depth[pred[v]] + 1
    pts = rng.uniform(0, 4, size=(n, 3)).astype(np.float32)
    radii = np.full(n, 0.01, np.float32)  # tiny: no off-path capture
    mask = np.ones(n, bool)

    outs = []
    for bpd in (4096, 1):
        res = sample_tree_device(
            jnp.asarray(pts), jnp.asarray(radii), jnp.asarray(pred),
            jnp.asarray(depth), jnp.asarray(mask),
            hop_cap=64, max_branches=128, branches_per_dispatch=bpd,
        )
        outs.append(res)
    a, b = outs
    np.testing.assert_array_equal(np.asarray(a.path_branch),
                                  np.asarray(b.path_branch))
    np.testing.assert_array_equal(np.asarray(a.branch_ids),
                                  np.asarray(b.branch_ids))
    np.testing.assert_array_equal(np.asarray(a.branch_parents),
                                  np.asarray(b.branch_parents))
    assert int(a.branch_count) == int(b.branch_count)


def test_sssp_shortcuts_exact_and_fewer_rounds():
    # chain-shortcut relaxation (graph/shortcuts.py) must leave dist/pred
    # unchanged (up to float addition order) while collapsing the round
    # count on a long chain
    import jax.numpy as jnp

    from smart_tree_tpu.graph import chain_shortcuts, sssp_multi

    # long chain with k=2 adjacency: worst-case diameter
    n, k = 600, 4
    idxs = np.full((n, k), -1, np.int32)
    dists = np.full((n, k), np.inf, np.float32)
    rng = np.random.default_rng(0)
    wchain = rng.uniform(0.5, 1.5, n).astype(np.float32)
    for i in range(n):
        if i > 0:
            idxs[i, 0], dists[i, 0] = i - 1, wchain[i - 1]
        if i < n - 1:
            idxs[i, 1], dists[i, 1] = i + 1, wchain[i]
    valid = idxs >= 0
    edges = np.stack(
        [np.repeat(np.arange(n, dtype=np.int32), k),
         np.maximum(idxs.reshape(-1), 0)], axis=1)
    weights = np.where(valid.reshape(-1), dists.reshape(-1), np.inf)
    evalid = valid.reshape(-1)
    sources = np.asarray([0], np.int32)

    d0, p0, r0 = sssp_multi(edges, weights, evalid, sources, n,
                            return_rounds=True)
    sc = chain_shortcuts(jnp.asarray(idxs), jnp.asarray(dists),
                         jnp.asarray(valid))
    d1, p1, r1 = sssp_multi(edges, weights, evalid, sources, n,
                            return_rounds=True, shortcuts=sc)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))
    assert int(r0) >= n - 1  # exact BF needs diameter rounds
    assert int(r1) < int(r0) // 8, (int(r0), int(r1))

    # random graphs: shortcut dist must match the plain run everywhere
    for seed in (1, 2):
        rng = np.random.default_rng(seed)
        nn = 150
        e, w, v = random_graph(rng, nn, 400)
        kk = 6
        # build a [nn, kk] adjacency view of the same graph (pad with -1)
        adj_i = np.full((nn, kk), -1, np.int32)
        adj_d = np.full((nn, kk), np.inf, np.float32)
        fill = np.zeros(nn, np.int32)
        for (a, b), wt, ok in zip(np.asarray(e), np.asarray(w), np.asarray(v)):
            if not ok:
                continue
            for s, t in ((a, b), (b, a)):
                if fill[s] < kk:
                    adj_i[s, fill[s]], adj_d[s, fill[s]] = t, wt
                    fill[s] += 1
        src = np.asarray([3, -1], np.int32)
        d0, p0 = sssp_multi(e, w, v, src, nn)
        sc = chain_shortcuts(jnp.asarray(adj_i), jnp.asarray(adj_d),
                             jnp.asarray(adj_i >= 0), levels=4, keep=3)
        d1, p1 = sssp_multi(e, w, v, src, nn, shortcuts=sc)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), rtol=1e-5)


def test_sssp_aligned_shortcut_table_exact_and_fewer_rounds():
    """The ALIGNED shortcut table (chain_shortcut_table — a second gather
    beside the neighbor table, NOT extra table entries) must leave
    dist/pred unchanged while collapsing gather-method rounds on a chain,
    and must accelerate CC identically."""
    import jax.numpy as jnp

    from smart_tree_tpu.graph import chain_shortcut_table, sssp_multi

    n, k = 600, 4
    idxs = np.full((n, k), -1, np.int32)
    dists = np.full((n, k), np.inf, np.float32)
    rng = np.random.default_rng(0)
    wchain = rng.uniform(0.5, 1.5, n).astype(np.float32)
    for i in range(n):
        if i > 0:
            idxs[i, 0], dists[i, 0] = i - 1, wchain[i - 1]
        if i < n - 1:
            idxs[i, 1], dists[i, 1] = i + 1, wchain[i]
    valid = idxs >= 0
    edges = np.stack(
        [np.repeat(np.arange(n, dtype=np.int32), k),
         np.maximum(idxs.reshape(-1), 0)], axis=1)
    weights = np.where(valid.reshape(-1), dists.reshape(-1), np.inf)
    evalid = valid.reshape(-1)
    sources = np.asarray([0], np.int32)

    d0, p0, r0 = sssp_multi(edges, weights, evalid, sources, n,
                            return_rounds=True, method="gather")
    sct = chain_shortcut_table(jnp.asarray(idxs), jnp.asarray(dists),
                               jnp.asarray(valid))
    d1, p1, r1 = sssp_multi(edges, weights, evalid, sources, n,
                            return_rounds=True, shortcut_tbl=sct,
                            method="gather")
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))
    assert int(r0) >= n - 1
    assert int(r1) < int(r0) // 8, (int(r0), int(r1))

    # the scatter method derives flat edges from the same table
    d2, p2 = sssp_multi(edges, weights, evalid, sources, n,
                        shortcut_tbl=sct, method="scatter")
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d0), rtol=1e-5)

    # CC with the shortcut table must give identical labels
    base = np.asarray(connected_components(edges, evalid, n))
    acc = np.asarray(connected_components(edges, evalid, n,
                                          shortcut_tbl=sct))
    np.testing.assert_array_equal(acc, base)

    # random graphs: aligned-table dist must match plain everywhere
    for seed in (1, 2):
        rng = np.random.default_rng(seed)
        nn = 150
        e, w, v = random_graph(rng, nn, 400)
        kk = 6
        adj_i = np.full((nn, kk), -1, np.int32)
        adj_d = np.full((nn, kk), np.inf, np.float32)
        fill = np.zeros(nn, np.int32)
        for (a, b), wt, ok in zip(np.asarray(e), np.asarray(w), np.asarray(v)):
            if not ok:
                continue
            for s, t in ((a, b), (b, a)):
                if fill[s] < kk:
                    adj_i[s, fill[s]], adj_d[s, fill[s]] = t, wt
                    fill[s] += 1
        src = np.asarray([3, -1], np.int32)
        d0, p0 = sssp_multi(e, w, v, src, nn, method="gather")
        sct = chain_shortcut_table(jnp.asarray(adj_i), jnp.asarray(adj_d),
                                   jnp.asarray(adj_i >= 0), levels=4, keep=3)
        d1, p1 = sssp_multi(e, w, v, src, nn, shortcut_tbl=sct,
                            method="gather")
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), rtol=1e-5)


def test_gather_vs_scatter_bit_equivalence():
    """The gather-form (neighbor-table) SSSP must reproduce the legacy
    scatter formulation BIT-EXACTLY: both compute the same min-plus
    fixpoint over the same fp32 path sums, and predecessor extraction
    scans the same candidate set with the same tie-breaks."""
    from smart_tree_tpu.graph import sssp_multi

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n = 300
        edges, weights, valid = random_graph(rng, n, 900)
        sources = np.asarray([3, 77, -1], np.int32)
        dg, pg = sssp_multi(edges, weights, valid, sources, n,
                            method="gather")
        ds, ps = sssp_multi(edges, weights, valid, sources, n,
                            method="scatter")
        np.testing.assert_array_equal(np.asarray(dg), np.asarray(ds))
        np.testing.assert_array_equal(np.asarray(pg), np.asarray(ps))


def test_neighbor_table_overflow_retry():
    """A hub vertex whose degree exceeds the initial cap must trigger the
    counts-driven cap doubling, never silent edge drops."""
    from smart_tree_tpu.graph import build_neighbor_table, sssp_multi

    n = 140
    hub_edges = np.stack(
        [np.zeros(n - 1, np.int32), np.arange(1, n, dtype=np.int32)], axis=1
    )
    weights = np.linspace(0.1, 1.0, n - 1).astype(np.float32)
    valid = np.ones(n - 1, bool)
    tbl = build_neighbor_table(hub_edges, weights, valid, n, cap=8)
    assert tbl.idx.shape[1] >= n - 1  # grew past the hub's degree
    dist, pred = map(np.asarray, sssp_multi(
        hub_edges, weights, valid, np.asarray([0], np.int32), n,
        method="gather"))
    np.testing.assert_allclose(dist[1:], weights, rtol=1e-6)
    assert (pred[1:] == 0).all() and pred[0] == -1


def test_connected_components_shared_table():
    """CC through a shared table (with shortcut extras marked real=False)
    must equal CC built from the raw edge list."""
    import jax.numpy as jnp
    from smart_tree_tpu.graph import build_neighbor_table

    rng = np.random.default_rng(5)
    n = 200
    edges, weights, valid = random_graph(rng, n, 300)
    base = np.asarray(connected_components(edges, valid, n))
    # fake relaxation-only extras INSIDE components: self-edges are a
    # degenerate but legal case
    extra_e = np.stack([np.arange(n, dtype=np.int32)] * 2, axis=1)
    extra = (jnp.asarray(extra_e), jnp.full((n,), 0.5, jnp.float32),
             jnp.ones((n,), bool))
    tbl = build_neighbor_table(edges, weights, valid, n, extra=extra)
    via_tbl = np.asarray(connected_components(edges, valid, n, table=tbl))
    np.testing.assert_array_equal(via_tbl, base)
