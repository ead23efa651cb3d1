"""HBM capacity policy tests (VERDICT r2 #4): the bench workload's shapes
must fit the v5e budget by the in-repo estimate, and BlockTiler must split
batches rather than exceed a capacity ceiling."""

import numpy as np

from smart_tree_tpu.core.memory import (
    estimate_forward_hbm,
    max_capacity_for_budget,
)

BENCH_PLANES = (8, 16, 32, 64)   # noble-elevator-58 (SURVEY §2.1)
BENCH_CAPACITY = 262_144         # the capacity that OOMed round 2
V5E_BUDGET = 12 << 30            # 16 GB HBM minus runtime reserve


def test_bench_workload_fits_v5e():
    for factor in (0.5, 1.0):  # normal path and the overflow-retry path
        est = estimate_forward_hbm(
            BENCH_CAPACITY, BENCH_PLANES, factor, in_flight=2
        )
        assert est["peak"] < V5E_BUDGET, (factor, est)
    assert (
        max_capacity_for_budget(
            V5E_BUDGET, BENCH_PLANES, factor=1.0, in_flight=2
        )
        >= BENCH_CAPACITY
    )


def test_transients_bounded_by_row_chunking():
    """Doubling capacity must not double the transient estimate — the
    row-chunked gather bounds it (only w3/rulebook terms scale)."""
    a = estimate_forward_hbm(262_144, BENCH_PLANES, 1.0)
    b = estimate_forward_hbm(524_288, BENCH_PLANES, 1.0)
    assert b["transient"] < 2 * a["transient"]
    # the dominant per-chunk gather term itself is capacity-independent
    from smart_tree_tpu.core.sparse_ops import _ROW_CHUNK

    gather_cap = 2 * _ROW_CHUNK * 27 * 2 * max(BENCH_PLANES) * 4
    assert gather_cap < 1 << 30  # single-chunk transient under 1 GB


def test_blocktiler_splits_at_max_capacity():
    from smart_tree_tpu.data.cloud import Cloud
    from smart_tree_tpu.data.dataset import BlockTiler

    rng = np.random.default_rng(0)
    xyz = rng.uniform(0, 3.9, size=(20_000, 3)).astype(np.float32)
    cloud = Cloud(xyz=xyz, rgb=np.zeros_like(xyz))
    tiler = BlockTiler(cloud, voxel_size=0.01, block_size=1.0, buffer_size=0.1)
    unlimited = list(tiler.batches(4))
    limited = list(tiler.batches(4, max_capacity=4096))
    assert len(limited) >= len(unlimited)
    for vb in limited:
        # a batch only exceeds the ceiling when a SINGLE block does
        if len(vb.coords) > 4096:
            assert int(np.sum(vb.coords[:, 0] >= 0) > 0)
            assert len(set(vb.coords[vb.valid][:, 0])) == 1
    # every voxel still ships exactly once
    tot_limited = sum(int(vb.valid.sum()) for vb in limited)
    tot_unlimited = sum(int(vb.valid.sum()) for vb in unlimited)
    assert tot_limited == tot_unlimited
