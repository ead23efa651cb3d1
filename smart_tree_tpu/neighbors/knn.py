"""Masked fixed-radius K-nearest-neighbours on TPU.

Replaces the FRNN CUDA grid KNN used throughout the reference skeleton stage
(smart_tree/skeleton/graph.py:12-33 `knn`/`nn`). Formulation: tiled
brute-force — squared distances per (src-tile, dst-chunk) via an MXU matmul
(|s-d|^2 = |s|^2 + |d|^2 - 2 s.d), merged into a running top-K with
lax.top_k under a lax.scan. Fully static shapes; padding via validity masks.

Semantics match FRNN usage in the reference:
  - the query point itself is a neighbour (distance 0) when src is dst
  - results sorted ascending by distance
  - neighbours beyond `r` get idx=-1, dist=+inf
A grid-bucketed Pallas variant is the planned optimization for multi-million
point clouds; this formulation is exact and jit-friendly at the reference's
scales (<=1M medial points).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_SRC_TILE = 4096
_DST_CHUNK = 16384


@partial(jax.jit, static_argnames=("k",))
def _knn_impl(src, dst, src_valid, dst_valid, r2, k):
    # Candidate SELECTION tolerates small distance error (the selected pairs
    # are recomputed exactly below) but not bf16 error: on TPU the MXU
    # default rounds inputs to bf16, and at metre coordinates that is a
    # ~(0.25 m)^2 error — the true neighbour never even enters the top-K.
    # Centre the coordinates (minimises |s|^2, the cancellation magnitude)
    # and force full-fp32 MXU passes for the selection matmul.
    # mask padding rows before the reduction — a non-finite or far-away
    # padding coordinate would corrupt the centre (inf-inf -> NaN shifts
    # every distance; ADVICE r2). Fallback row 0 when nothing is valid.
    anchor = dst[jnp.argmax(dst_valid)]
    dst_m = jnp.where(dst_valid[:, None], dst, anchor[None, :])
    centre = (jnp.min(dst_m, axis=0) + jnp.max(dst_m, axis=0)) * 0.5
    src = src - centre
    dst = dst - centre
    n = src.shape[0]
    m = dst.shape[0]
    # over-select so exact recomputation can demote selection-error picks
    ksel = k + 8
    dst_norm2 = jnp.sum(dst * dst, axis=1)  # [M]
    big = jnp.float32(jnp.inf)

    # tile/chunk widths scale DOWN to the actual operand sizes: fixed
    # 4096x16384 tiles made a 16k-src x 128-dst query (the branch tracer's
    # per-path select) cost a full 16k-wide distance + top_k sweep —
    # 80 ms/greedy-iteration, the whole tracer wall (docs/PERF.md round 5)
    chunk = 128
    while chunk < min(m, _DST_CHUNK):
        chunk *= 2
    src_tile = 512
    while src_tile < min(n, _SRC_TILE):
        src_tile *= 2
    n_chunks = (m + chunk - 1) // chunk
    m_pad = n_chunks * chunk
    dstp = jnp.pad(dst, ((0, m_pad - m), (0, 0)))
    dstv = jnp.pad(dst_valid, (0, m_pad - m))
    dstn2 = jnp.pad(dst_norm2, (0, m_pad - m))
    dst_chunks = dstp.reshape(n_chunks, chunk, 3)
    dstv_chunks = dstv.reshape(n_chunks, chunk)
    dstn2_chunks = dstn2.reshape(n_chunks, chunk)

    n_tiles = (n + src_tile - 1) // src_tile
    n_pad = n_tiles * src_tile
    srcp = jnp.pad(src, ((0, n_pad - n), (0, 0)))
    srcv = jnp.pad(src_valid, (0, n_pad - n))

    def src_tile_body(carry, tile):
        s, sv = tile  # [TS,3], [TS]
        s_norm2 = jnp.sum(s * s, axis=1)

        def dst_chunk_body(state, xs):
            best_d, best_i = state  # [TS,K]
            d, dv, dn2, base = xs
            # [TS, DC] squared distances on the MXU
            d2 = (
                s_norm2[:, None]
                + dn2[None, :]
                - 2.0
                * jnp.dot(
                    s,
                    d.T,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            )
            d2 = jnp.maximum(d2, 0.0)
            d2 = jnp.where(dv[None, :], d2, big)
            cand_d = jnp.concatenate([best_d, d2], axis=1)
            idx_cols = base + jnp.arange(chunk, dtype=jnp.int32)
            cand_i = jnp.concatenate(
                [best_i, jnp.broadcast_to(idx_cols[None, :], d2.shape)], axis=1
            )
            neg_top, arg = jax.lax.top_k(-cand_d, ksel)
            new_d = -neg_top
            new_i = jnp.take_along_axis(cand_i, arg, axis=1)
            return (new_d, new_i), None

        init = (
            jnp.full((s.shape[0], ksel), big),
            jnp.full((s.shape[0], ksel), -1, jnp.int32),
        )
        bases = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk)
        (best_d, best_i), _ = jax.lax.scan(
            dst_chunk_body, init, (dst_chunks, dstv_chunks, dstn2_chunks, bases)
        )
        # radius gate + invalid-src gate
        ok = (best_d <= r2) & sv[:, None] & (best_i >= 0)
        best_i = jnp.where(ok, best_i, -1)
        best_d = jnp.where(ok, best_d, big)
        return carry, (best_d, best_i)

    tiles_s = srcp.reshape(n_tiles, src_tile, 3)
    tiles_v = srcv.reshape(n_tiles, src_tile)
    _, (dists, idxs) = jax.lax.scan(src_tile_body, None, (tiles_s, tiles_v))
    dists = dists.reshape(n_pad, ksel)[:n]
    idxs = idxs.reshape(n_pad, ksel)[:n]

    # Even at full fp32 precision the |s|^2+|d|^2-2s.d formulation suffers
    # catastrophic cancellation for nearby points (errors ~ulp(|s|^2) —
    # sub-mm distances at metre coordinates collapse to 0). Selection only
    # needs ordering, but graph edge WEIGHTS need accuracy: recompute the
    # ksel selected pairs exactly, re-sort, keep the best k, and re-apply
    # the radius gate.
    safe = jnp.maximum(idxs, 0)
    diff = src[:, None, :] - dst[safe]  # [N,KSEL,3]
    d2 = jnp.sum(diff * diff, axis=2)
    d2 = jnp.where(idxs >= 0, d2, big)
    order2 = jnp.argsort(d2, axis=1)[:, :k]
    d2 = jnp.take_along_axis(d2, order2, axis=1)
    idxs = jnp.take_along_axis(idxs, order2, axis=1)
    ok = (d2 <= r2) & (idxs >= 0)
    idxs = jnp.where(ok, idxs, -1)
    d2 = jnp.where(ok, d2, big)
    return jnp.sqrt(d2), idxs


def knn(
    src: jax.Array,
    dst: jax.Array,
    k: int,
    r: jax.Array | float,
    src_valid: jax.Array | None = None,
    dst_valid: jax.Array | None = None,
):
    """K nearest dst per src within radius r.

    Returns (dists [N,K] float32 — euclidean, inf where missing;
             idxs [N,K] int32 — -1 where missing), sorted ascending.
    """
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)
    if src_valid is None:
        src_valid = jnp.ones((src.shape[0],), bool)
    if dst_valid is None:
        dst_valid = jnp.ones((dst.shape[0],), bool)
    r2 = jnp.asarray(r, jnp.float32) ** 2
    return _knn_impl(src, dst, src_valid, dst_valid, r2, k)


def nn(src, dst, r, src_valid=None, dst_valid=None):
    """Nearest single neighbour (reference graph.py:29-33)."""
    d, i = knn(src, dst, 1, r, src_valid, dst_valid)
    return d[:, 0], i[:, 0]


@partial(jax.jit, static_argnames=("cap",))
def _radius_count_impl(src, dst, src_valid, dst_valid, r2, delta2, cap):
    """Per-src counts of valid dst points with d^2 < r2 -+ delta2.

    Same tiled MXU distance formulation as _knn_impl, but counting instead
    of selecting — no lax.top_k (the dominant cost of the KNN at 16k-wide
    candidate rows) and no candidate recompute. delta2 bounds the fp32
    |s|^2+|d|^2-2s.d cancellation error, giving a certain (d2 < r2-delta2)
    and a possible (d2 < r2+delta2) count; callers resolve the thin
    boundary shell exactly (see skeleton/filter.py). Counts saturate at
    `cap` so the loop carry stays tiny."""
    anchor = dst[jnp.argmax(dst_valid)]
    dst_m = jnp.where(dst_valid[:, None], dst, anchor[None, :])
    centre = (jnp.min(dst_m, axis=0) + jnp.max(dst_m, axis=0)) * 0.5
    src = src - centre
    dst = dst - centre
    n = src.shape[0]
    m = dst.shape[0]

    dst_norm2 = jnp.sum(dst * dst, axis=1)
    n_chunks = (m + _DST_CHUNK - 1) // _DST_CHUNK
    m_pad = n_chunks * _DST_CHUNK
    dstp = jnp.pad(dst, ((0, m_pad - m), (0, 0)))
    dstv = jnp.pad(dst_valid, (0, m_pad - m))
    dstn2 = jnp.pad(dst_norm2, (0, m_pad - m))
    dst_chunks = dstp.reshape(n_chunks, _DST_CHUNK, 3)
    dstv_chunks = dstv.reshape(n_chunks, _DST_CHUNK)
    dstn2_chunks = dstn2.reshape(n_chunks, _DST_CHUNK)

    n_tiles = (n + _SRC_TILE - 1) // _SRC_TILE
    n_pad = n_tiles * _SRC_TILE
    srcp = jnp.pad(src, ((0, n_pad - n), (0, 0)))
    srcv = jnp.pad(src_valid, (0, n_pad - n))
    r2p = jnp.pad(r2, (0, n_pad - n))

    capi = jnp.int32(cap)

    def src_tile_body(carry, tile):
        s, sv, tr2 = tile
        s_norm2 = jnp.sum(s * s, axis=1)

        def dst_chunk_body(state, chunk):
            lo, hi = state  # [TS] int32 counts
            d, dv, dn2 = chunk
            d2 = (
                s_norm2[:, None]
                + dn2[None, :]
                - 2.0
                * jnp.dot(
                    s,
                    d.T,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            )
            d2 = jnp.where(dv[None, :], d2, jnp.inf)
            lo = lo + jnp.sum(
                (d2 < tr2[:, None] - delta2).astype(jnp.int32), axis=1
            )
            hi = hi + jnp.sum(
                (d2 < tr2[:, None] + delta2).astype(jnp.int32), axis=1
            )
            return (jnp.minimum(lo, capi), jnp.minimum(hi, capi)), None

        init = (jnp.zeros((s.shape[0],), jnp.int32),) * 2
        (lo, hi), _ = jax.lax.scan(
            dst_chunk_body, init, (dst_chunks, dstv_chunks, dstn2_chunks)
        )
        lo = jnp.where(sv, lo, 0)
        hi = jnp.where(sv, hi, 0)
        return carry, (lo, hi)

    tiles = (
        srcp.reshape(n_tiles, _SRC_TILE, 3),
        srcv.reshape(n_tiles, _SRC_TILE),
        r2p.reshape(n_tiles, _SRC_TILE),
    )
    _, (lo, hi) = jax.lax.scan(src_tile_body, None, tiles)
    return lo.reshape(n_pad)[:n], hi.reshape(n_pad)[:n]


def radius_count(src, dst, radii, src_valid=None, dst_valid=None, cap=8):
    """(certain, possible) counts of valid dst within each src's radius.

    certain[i] >= t guarantees >= t true neighbours (d < radii[i]);
    possible[i] < t guarantees fewer. Rows where the two straddle t must be
    resolved exactly by the caller — the margin delta2 scales with the
    centred coordinate extent, bounding the MXU formulation's cancellation
    error (the round-2 KNN lesson, docs/PERF.md)."""
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)
    if src_valid is None:
        src_valid = jnp.ones((src.shape[0],), bool)
    if dst_valid is None:
        dst_valid = jnp.ones((dst.shape[0],), bool)
    r2 = jnp.asarray(radii, jnp.float32).reshape(-1) ** 2
    # error ~ few ulps of the norm terms (<= 2 E^2 after centring); 32 ulps
    # is conservative and still thin next to r^2 >= (2 cm)^2 at tree extents
    anchor = dst[jnp.argmax(dst_valid)]
    dst_m = jnp.where(dst_valid[:, None], dst, anchor[None, :])
    half = (jnp.max(dst_m, axis=0) - jnp.min(dst_m, axis=0)) * 0.5
    e2 = jnp.sum(half * half)
    delta2 = jnp.maximum(1e-7, 32.0 * 1.2e-7 * e2)
    return _radius_count_impl(src, dst, src_valid, dst_valid, r2, delta2, cap)
