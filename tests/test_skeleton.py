"""Skeleton stage tests on synthetic data with exact medial ground truth —
the skeletonizer should recover the branch structure when fed perfect
predictions (segmentation IoU / topology parity per SURVEY.md §4)."""

import numpy as np
import pytest

from smart_tree_tpu.data.synthetic import generate_tree
from smart_tree_tpu.skeleton.filter import outlier_removal
from smart_tree_tpu.skeleton.graph import nn_graph
from smart_tree_tpu.skeleton.path import sample_tree, select_path_points, trace_route
from smart_tree_tpu.skeleton.skeletonize import Skeletonizer


def test_trace_route_follows_predecessors():
    import jax.numpy as jnp

    preds = jnp.asarray([-1, 0, 1, 2, 3], jnp.int32)
    allocated = jnp.zeros(5, bool)
    path, length, term = trace_route(preds, jnp.int32(4), allocated, 8)
    assert int(length) == 5
    np.testing.assert_array_equal(np.asarray(path[:5]), [0, 1, 2, 3, 4])
    assert int(term) == -1
    # stops at allocated vertices
    allocated = allocated.at[1].set(True)
    path, length, term = trace_route(preds, jnp.int32(4), allocated, 8)
    assert int(length) == 3
    np.testing.assert_array_equal(np.asarray(path[:3]), [2, 3, 4])
    assert int(term) == 1


def test_select_path_points_radius_gate():
    import jax.numpy as jnp

    pts = jnp.asarray([[0, 0, 0], [0.05, 0, 0], [1, 0, 0]], jnp.float32)
    path_pts = jnp.asarray([[0, 0, 0], [0.5, 0, 0]], jnp.float32)
    radii = jnp.asarray([0.1, 0.1], jnp.float32)
    on = np.asarray(
        select_path_points(
            pts, jnp.ones(3, bool), path_pts, radii, jnp.ones(2, bool)
        )
    )
    assert on.tolist() == [True, True, False]


def test_select_path_points_chunked_matches_oneshot():
    """The windowed select (path swept _SEL_CHUNK vertices at a time, true
    length only) must reproduce the one-shot nearest-path-vertex predicate
    exactly — including paths spanning several windows and the
    nearest-vertex-radius (not any-vertex-covers) semantics."""
    import jax.numpy as jnp

    from smart_tree_tpu.skeleton.path import (
        _SEL_CHUNK,
        _select_path_points_chunked,
    )

    rng = np.random.default_rng(7)
    n = 3000
    hop_cap = 2048
    medial = jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32)
    radii = jnp.asarray(rng.uniform(0.01, 0.4, (n,)), jnp.float32)
    pvalid = jnp.asarray(rng.uniform(size=n) < 0.7)
    for length in [1, 3, _SEL_CHUNK, _SEL_CHUNK + 1, 5 * _SEL_CHUNK + 17]:
        verts = rng.choice(n, size=length, replace=False).astype(np.int32)
        path = np.full((hop_cap,), -1, np.int32)
        path[:length] = verts
        path_d = jnp.asarray(path)
        pv = path_d >= 0
        ps = jnp.maximum(path_d, 0)
        ref = select_path_points(
            medial, pvalid, medial[ps], jnp.where(pv, radii[ps], 0.0), pv
        )
        got = _select_path_points_chunked(
            medial, pvalid, medial, radii, path_d, jnp.int32(length), hop_cap
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.slow  # ~40s
def test_skeletonizer_recovers_synthetic_tree():
    cloud, gt_skel = generate_tree(
        seed=3, height=4.0, trunk_radius=0.12, points_per_m2=4000.0, max_depth=2
    )
    # hop_cap 1024 silently truncated one trace in round 1 (mm vertex
    # spacing -> thousands of hops tip-to-root); strict mode now catches it
    sk = Skeletonizer(K=16, min_connection_length=0.02, minimum_graph_vertices=32,
                      hop_cap=8192)
    out = sk.forward(cloud.device())
    assert len(out.skeletons) >= 1
    main = out.skeletons[0]
    assert len(main.branches) >= 2
    # total skeleton length should be within 2x of ground truth
    gt_len = gt_skel.length
    got_len = main.length
    assert got_len > 0.3 * gt_len
    assert got_len < 3.0 * gt_len
    # branch path points should lie near the ground-truth medial axis
    gt_medial = np.asarray(cloud.medial_pts)
    for b in list(main.branches.values())[:5]:
        d = np.linalg.norm(gt_medial - b.xyz[len(b) // 2], axis=1).min()
        assert d < 0.1, f"branch {b._id} far from gt medial axis ({d:.3f} m)"
    # parent relationships are consistent
    ids = set(main.branches.keys())
    for b in main.branches.values():
        assert b.parent_id == -1 or b.parent_id in ids or b.parent_id < max(ids)


@pytest.mark.slow  # ~2.5 min on this 1-core host
def test_skeletonizer_separates_disjoint_trees():
    """Two spatially separated trees must come out as separate skeletons
    (connected-components path, reference graph.py:32-51)."""
    import numpy as np

    from smart_tree_tpu.data.cloud import Cloud

    c1, _ = generate_tree(seed=10, height=2.5, points_per_m2=2000.0, max_depth=1)
    c2, _ = generate_tree(seed=11, height=2.5, points_per_m2=2000.0, max_depth=1)
    xyz = np.concatenate([np.asarray(c1.xyz), np.asarray(c2.xyz) + [5.0, 0, 0]])
    mv = np.concatenate([np.asarray(c1.medial_vector), np.asarray(c2.medial_vector)])
    cloud = Cloud(xyz=xyz, medial_vector=mv)
    sk = Skeletonizer(K=16, minimum_graph_vertices=32, hop_cap=4096)
    out = sk.forward(cloud.device())
    # at least one skeleton per spatial cluster; sparse branch tips may
    # split off extra components, but none may span the 5 m gap
    assert len(out.skeletons) >= 2
    sides = set()
    for s in out.skeletons:
        xs = np.concatenate([b.xyz for b in s.branches.values()])[:, 0]
        assert xs.max() - xs.min() < 4.0, "skeleton spans both trees"
        sides.add(xs.mean() > 2.5)
    assert sides == {False, True}, "expected skeletons on both sides"


def test_outlier_removal_matches_bruteforce_oracle():
    """The counting formulation of the outlier filter (MXU radius counts +
    exact resolution of the margin shell) must reproduce the reference
    semantics — keep iff the nb_points-th nearest neighbour lies within the
    point's radius (filter.py:6-11) — on realistic medial geometry,
    including the coincident piles that predicted medial points form."""
    import jax.numpy as jnp
    import numpy as np

    cloud, _ = generate_tree(seed=3, height=6.0, trunk_radius=0.12,
                             points_per_m2=1500.0)
    m = np.asarray(cloud.class_l).reshape(-1) == 0
    pts = (np.asarray(cloud.xyz) + np.asarray(cloud.medial_vector))[m][:4000]
    radii = np.linalg.norm(np.asarray(cloud.medial_vector)[m], axis=1)[:4000]
    # stack coincident duplicates like real predictions do
    pts = np.concatenate([pts, pts[:500] + 1e-6])
    radii = np.concatenate([radii, radii[:500]])
    n = len(pts)
    valid = np.ones(n, bool)
    valid[-100:] = False  # padding rows must never be counted or kept

    keep = np.asarray(
        outlier_removal(jnp.asarray(pts, jnp.float32),
                        jnp.asarray(radii, jnp.float32),
                        nb_points=8, valid=jnp.asarray(valid),
                        min_radius=0.02)
    )
    r = np.maximum(radii, 0.02)
    d2 = np.sum(
        (pts[:, None, :].astype(np.float32)
         - pts[None, :, :].astype(np.float32)) ** 2, axis=2,
        dtype=np.float32,
    )
    d2[:, ~valid] = np.inf
    counts = np.sum(np.sqrt(d2) < r[:, None], axis=1)
    oracle = (counts >= 8) & valid
    np.testing.assert_array_equal(keep, oracle)


@pytest.mark.slow  # two full skeletonizer runs, ~1 min
def test_min_filter_radius_recovers_thin_branches():
    """The min_filter_radius extension (skeleton/filter.py): clamping the
    outlier filter's acceptance radius keeps sub-voxel twigs whose medial
    points are spaced wider than their own radius — recovered length must
    strictly improve over the reference-faithful default on a twig-rich
    tree (round-3 measured 36% -> 48% on the e2e workload)."""
    import numpy as np

    from smart_tree_tpu.data.cloud import Cloud

    cloud, gt = generate_tree(seed=1000, height=5.0, trunk_radius=0.12,
                              points_per_m2=4000.0)
    m = np.asarray(cloud.class_l).reshape(-1) == 0
    oracle = Cloud(
        xyz=np.asarray(cloud.xyz)[m],
        medial_vector=np.asarray(cloud.medial_vector)[m],
    )
    lengths = {}
    for clamp in (None, 0.02):
        sk = Skeletonizer(hop_cap=16384, strict=False, min_filter_radius=clamp)
        out = sk.forward(oracle)
        lengths[clamp] = sum(
            b.length for s in out.skeletons for b in s.branches.values()
        )
    assert lengths[0.02] > lengths[None] * 1.1, lengths


@pytest.mark.slow
def test_skeletonizer_shortcuts_equivalent():
    # sssp_shortcuts accelerates relaxation only; the skeleton it yields
    # must match the plain run (same branch count, same total length to
    # float addition order)
    cloud, _ = generate_tree(
        seed=3, height=4.0, trunk_radius=0.12, points_per_m2=4000.0, max_depth=2
    )
    base = Skeletonizer(hop_cap=8192).forward(cloud.device())
    fast = Skeletonizer(hop_cap=8192, sssp_shortcuts=True).forward(cloud.device())
    b, f = base.skeletons[0], fast.skeletons[0]
    assert len(f.branches) == len(b.branches)
    np.testing.assert_allclose(f.length, b.length, rtol=1e-4)


def test_trace_route_jump_matches_sequential():
    # the log-step jump-table trace must be bit-identical to the
    # sequential oracle across random forests, allocation patterns, start
    # vertices, and hop caps (incl. capped traces and allocated starts)
    import jax.numpy as jnp

    from smart_tree_tpu.skeleton.path import build_jump_tables, trace_route_jump

    rng = np.random.default_rng(11)
    for trial in range(6):
        n = int(rng.integers(20, 300))
        pred = np.asarray(
            [-1] + [rng.integers(0, v) for v in range(1, n)], np.int32)
        allocated = rng.random(n) < (0.0, 0.15, 0.6)[trial % 3]
        hop_cap = int(rng.choice([4, 16, 64, 512]))
        jumps = build_jump_tables(jnp.asarray(pred), hop_cap)
        for start in rng.integers(0, n, size=8):
            a = jnp.asarray(allocated)
            p0, l0, t0 = trace_route(
                jnp.asarray(pred), jnp.int32(start), a, hop_cap)
            p1, l1, t1 = trace_route_jump(jumps, jnp.int32(start), a, hop_cap)
            np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))
            assert int(l1) == int(l0) and int(t1) == int(t0), (
                trial, start, hop_cap, int(l0), int(l1), int(t0), int(t1))


def test_medial_reduce_matches_numpy_oracle():
    # skeleton/quantize.py: one representative per cell, kept points only,
    # per-cell min surface-y (root convention, reference cloud.py:204-206)
    import jax.numpy as jnp

    from smart_tree_tpu.skeleton.quantize import medial_reduce

    rng = np.random.default_rng(0)
    base = rng.normal(size=(400, 3)).astype(np.float32) * 2
    pts = np.concatenate([
        np.repeat(base, 5, axis=0),
        rng.normal(size=(250, 3)).astype(np.float32) * 2,
    ])
    y = rng.normal(size=(len(pts),)).astype(np.float32)
    keep = rng.random(len(pts)) > 0.15
    rep, n_unique = medial_reduce(
        jnp.asarray(pts), jnp.asarray(y), jnp.asarray(keep), 0.01
    )
    cells = np.floor(pts[keep] / 0.01).astype(np.int64)
    assert n_unique == len(np.unique(cells, axis=0))
    ri = np.asarray(rep)
    sel = ri[ri < len(pts)]
    assert len(sel) == n_unique and keep[sel].all()
    qs = np.floor(pts[sel] / 0.01).astype(np.int64)
    assert len(np.unique(qs, axis=0)) == n_unique
    lut = {tuple(c): s for c, s in zip(qs, sel)}
    allq = np.floor(pts / 0.01).astype(np.int64)
    for j in np.nonzero(keep)[0]:
        assert y[lut[tuple(allq[j])]] <= y[j] + 1e-7


def test_skeletonizer_quantize_on_off_equivalent_quality():
    # the medial reduction must not change recovered structure materially
    # on a clean synthetic tree (duplicate medial points are interchangeable
    # at pipeline resolution)
    cloud, _ = generate_tree(
        seed=3, height=4.0, trunk_radius=0.12, points_per_m2=4000.0,
        max_depth=2,
    )
    full = Skeletonizer(hop_cap=8192, medial_quantize=None).forward(
        cloud.device()
    )
    red = Skeletonizer(hop_cap=8192, medial_quantize=0.01).forward(
        cloud.device()
    )
    lf = full.skeletons[0].length
    lr = red.skeletons[0].length
    assert abs(lr - lf) < 0.15 * lf + 0.05, (lf, lr)
