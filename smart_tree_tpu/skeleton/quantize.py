"""Medial-point voxel reduction: collapse coincident/sub-cell medial points
to one representative per grid cell before graph construction.

Why this exists (round-4 device measurement, docs/PERF.md): predicted
medial points CONVERGE onto the branch axis — on the 357k-point bench tree,
219,435 medial points occupy only 17,493 distinct 1 cm cells (12.5x), and
the 99th-percentile cell holds 117 coincident points. Those clusters are
exactly the hub vertices that forced the SSSP neighbor table from cap 48 to
cap 128 (graph/table.py auto-grow), and each coincident point pads KNN
lists with zero-length edges, shortening graph reach and inflating the
Bellman-Ford round count. One relaxation round at 219k x cap-128 measured
187 ms on the v5e (~6.6 ns per gather index, unamortized single-float
gathers); >1024 rounds made the skeleton stage unusable (tools/
probe_sssp_device.py).

Reducing to one representative per cell at the PIPELINE'S OWN resolution
(the inference voxel size, conf/pipeline.yaml) is exact in spirit: points
sharing a 1 cm cell are interchangeable at every later stage (branch
geometry, radii, tracing all operate at >= voxel scale). The representative
is the cell's (min surface-y, then min index) point so the reference's
lowest-y root convention (cloud.py:204-206) is preserved per cell.

The reference has no analog — cugraph/FRNN make the duplicate-laden graph
free on CUDA (smart_tree/skeleton/skeletonize.py:31-95); on TPU the
gather-per-index cost makes graph size the dominant term, so resolution-
matched reduction is the TPU-first design. `Skeletonizer(
medial_quantize=None)` restores the full unreduced graph.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

@jax.jit
def _cell_codes(medial_pts: jax.Array, y: jax.Array, keep: jax.Array,
                cell: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sort order by (valid-first, cell-x, cell-y, cell-z, y, idx) and the
    head-of-cell mask in sorted space. Multi-key lexsort — no bit packing,
    which would silently truncate without jax_enable_x64."""
    n = medial_pts.shape[0]
    q = jnp.floor(medial_pts / cell).astype(jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)
    inv = (~keep).astype(jnp.int32)  # invalid points sort last
    # lexsort: last key is primary
    order = jnp.lexsort((idx, y, q[:, 2], q[:, 1], q[:, 0], inv))
    qs = q[order]
    ks = keep[order]
    head = jnp.concatenate(
        [jnp.ones((1,), bool), jnp.any(qs[1:] != qs[:-1], axis=1)]
    )
    is_rep = head & ks
    return order, is_rep, jnp.sum(is_rep)


@partial(jax.jit, static_argnames=("bucket",))
def _gather_reps(order: jax.Array, is_rep: jax.Array, bucket: int):
    """Original-space indices of the representatives, padded to `bucket`
    with n (an out-of-range sentinel)."""
    n = order.shape[0]
    pos = jnp.nonzero(is_rep, size=bucket, fill_value=n)[0]
    return jnp.where(pos < n, order[jnp.minimum(pos, n - 1)], n).astype(
        jnp.int32
    )


def medial_reduce(
    medial_pts: jax.Array,
    surface_y: jax.Array,
    keep: jax.Array,
    cell: float,
    min_bucket: int = 1024,
) -> Tuple[jax.Array, int]:
    """Reduce kept medial points to one representative per `cell`-sized
    voxel. Returns (rep_idx [bucket] int32 — indices into the original
    arrays, == n at padding; n_unique). bucket is the next power of two
    >= n_unique (static shapes; a handful of distinct compiles per corpus).
    """
    order, is_rep, count = _cell_codes(
        medial_pts, surface_y, keep, jnp.float32(cell)
    )
    n_unique = int(count)
    bucket = max(min_bucket, 1 << max(n_unique - 1, 1).bit_length())
    bucket = min(bucket, int(medial_pts.shape[0]))
    if bucket < n_unique:  # n an exact power of two and zero dedup
        bucket = n_unique
    return _gather_reps(order, is_rep, bucket), n_unique
