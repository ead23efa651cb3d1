"""Point -> tube (capsule) distance queries.

JAX rebuild of reference smart_tree/util/queries.py:89-168 (GPU einsum
variants; the CPU/keops paths there are dead code and excluded). Used by
skeleton repair (tree.py) and by skeleton->point labelling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..data.tube import CollatedTube


@jax.jit
def _nearest_tube(pts, a, b, r1, r2):
    """pts [N,3]; tubes a,b [M,3], r1,r2 [M].

    Returns (vector [N,3] to the nearest tube surface-projection point,
    idx [N] of that tube, radius [N] at the projection)."""
    ab = b - a  # [M,3]
    ap = pts[:, None, :] - a[None, :, :]  # [N,M,3]
    # contraction dim is 3 — no MXU upside, and the TPU default would round
    # metre coordinates to bf16 (~cm projection error); force full fp32
    hi = jax.lax.Precision.HIGHEST
    denom = jnp.einsum("md,md->m", ab, ab, precision=hi)
    t = jnp.clip(
        jnp.einsum("nmd,md->nm", ap, ab, precision=hi) / (denom + 1e-12),
        0.0,
        1.0,
    )  # [N,M]
    proj = a[None, :, :] + t[:, :, None] * ab[None, :, :]  # [N,M,3]
    r = (1 - t) * r1[None, :] + t * r2[None, :]  # [N,M]
    d = jnp.linalg.norm(proj - pts[:, None, :], axis=2)  # [N,M]
    score = jnp.abs(d - r)
    idx = jnp.argmin(score, axis=1)  # [N]
    rows = jnp.arange(pts.shape[0])
    return proj[rows, idx] - pts, idx, r[rows, idx]


def pts_to_nearest_tube(pts: np.ndarray, tubes: CollatedTube):
    """Host wrapper: vectors/idx/radius of the nearest tube per point
    (reference queries.py:107-133 semantics: argmin over |dist - r|)."""
    v, idx, r = _nearest_tube(
        jnp.asarray(pts, jnp.float32).reshape(-1, 3),
        jnp.asarray(tubes.a),
        jnp.asarray(tubes.b),
        jnp.asarray(tubes.r1),
        jnp.asarray(tubes.r2),
    )
    return np.asarray(v), np.asarray(idx), np.asarray(r)


def skeleton_to_points(xyz: np.ndarray, tubes: CollatedTube, chunk_size: int = 4096):
    """Chunked point->skeleton labelling (reference queries.py:140-168).

    Returns (distances [N], radii [N], vectors [N,3])."""
    xyz = np.asarray(xyz, np.float32)
    dists, radii, vecs = [], [], []
    for start in range(0, len(xyz), chunk_size):
        pts = xyz[start : start + chunk_size]
        v, _, r = pts_to_nearest_tube(pts, tubes)
        dists.append(np.sqrt(np.einsum("ij,ij->i", v, v)))
        radii.append(r)
        vecs.append(v)
    return np.concatenate(dists), np.concatenate(radii), np.concatenate(vecs)
