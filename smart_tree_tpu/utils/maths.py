"""Geometry/math utilities — numpy rebuild of reference
smart_tree/util/maths.py (rotation builders, AABB filters, tangent frames
for tube meshing)."""

from __future__ import annotations

import numpy as np


def euler_angles_to_rotation(xyz) -> np.ndarray:
    x, y, z = (float(v) for v in xyz)
    rx = np.array(
        [[1, 0, 0], [0, np.cos(x), -np.sin(x)], [0, np.sin(x), np.cos(x)]]
    )
    ry = np.array(
        [[np.cos(y), 0, np.sin(y)], [0, 1, 0], [-np.sin(y), 0, np.cos(y)]]
    )
    rz = np.array(
        [[np.cos(z), -np.sin(z), 0], [np.sin(z), np.cos(z), 0], [0, 0, 1]]
    )
    return rz @ ry @ rx


def rotation_matrix_from_vectors(vec1, vec2) -> np.ndarray:
    a = np.asarray(vec1, np.float64).reshape(3)
    b = np.asarray(vec2, np.float64).reshape(3)
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    v = np.cross(a, b)
    c = float(np.dot(a, b))
    s = float(np.linalg.norm(v))
    if s < 1e-12:
        return np.eye(3) if c > 0 else -np.eye(3)
    kmat = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + kmat + kmat @ kmat * ((1 - c) / (s**2))


def cube_filter(points, center, cube_size) -> np.ndarray:
    """AABB mask: center +- cube_size/2 (reference maths.py:145-155;
    half-open [min, max) like the reference's >= / <)."""
    points = np.asarray(points)
    center = np.asarray(center)
    mn = center - cube_size / 2
    mx = center + cube_size / 2
    return np.logical_and(points >= mn, points < mx).all(axis=1)


def vertex_dirs(points) -> np.ndarray:
    """Smoothed per-vertex tangents along a polyline
    (reference maths.py:158-165)."""
    d = points[1:] - points[:-1]
    d = d / np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-12)
    if len(d) == 1:
        return np.concatenate([d, d])
    smooth = (d[1:] + d[:-1]) * 0.5
    dirs = np.concatenate([d[0:1], smooth, d[-1:]])
    return dirs / np.maximum(np.linalg.norm(dirs, axis=1, keepdims=True), 1e-12)


def random_unit(rng=None, dtype=np.float32) -> np.ndarray:
    rng = rng or np.random.default_rng()
    x = rng.normal(size=3).astype(dtype)
    return x / np.linalg.norm(x)


def make_tangent(d, n) -> np.ndarray:
    t = np.cross(d, n)
    norm = np.linalg.norm(t, axis=-1, keepdims=True)
    if np.any(norm < 1e-9):
        n2 = random_unit()
        t = np.cross(d, n2)
        norm = np.linalg.norm(t, axis=-1, keepdims=True)
    t = t / norm
    return np.cross(t, d)


def gen_tangents(dirs, t0) -> np.ndarray:
    """Parallel-transport frames along a polyline (reference maths.py:179-186)."""
    tangents = []
    t = t0
    for d in dirs:
        t = make_tangent(d, t)
        tangents.append(t)
    return np.stack(tangents)
