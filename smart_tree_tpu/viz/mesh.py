"""Host-side tube meshing — numpy rebuild of reference
smart_tree/o3d_abstractions/geometries.py:155-235 (unit circles swept along
parallel-transport tangent frames), independent of Open3D. Output feeds the
PLY writers in data/file.py."""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..data.tree import DisjointTreeSkeleton, TreeSkeleton
from ..utils.maths import gen_tangents, random_unit, vertex_dirs


def unit_circle(n: int) -> np.ndarray:
    a = np.linspace(0, 2 * np.pi, n + 1)[:-1]
    return np.stack([np.sin(a), np.cos(a)], axis=1)


def cylinder_triangles(m: int, n: int) -> np.ndarray:
    tri1 = np.array([0, 1, 2])
    tri2 = np.array([2, 3, 0])
    v0 = np.arange(m)
    v1 = (v0 + 1) % m
    v2 = v1 + m
    v3 = v0 + m
    edges = np.stack([v0, v1, v2, v3], axis=1)
    segments = np.arange(n - 1) * m
    edges = edges.reshape(1, *edges.shape) + segments.reshape(n - 1, 1, 1)
    edges = edges.reshape(-1, 4)
    return np.concatenate([edges[:, tri1], edges[:, tri2]])


def tube_vertices(points: np.ndarray, radii: np.ndarray, n: int = 10) -> np.ndarray:
    circle = unit_circle(n).astype(np.float32)
    dirs = vertex_dirs(points)
    t = gen_tangents(dirs, random_unit(np.random.default_rng(0)))
    b = np.stack([t, np.cross(t, dirs)], axis=1)
    b = b * radii.reshape(-1, 1, 1)
    return np.einsum("bdx,md->bmx", b, circle) + points.reshape(len(points), 1, 3)


def branch_tube_mesh(
    xyz: np.ndarray, radii: np.ndarray, n: int = 10
) -> Tuple[np.ndarray, np.ndarray]:
    pts = tube_vertices(np.asarray(xyz, np.float32), np.asarray(radii).reshape(-1), n)
    rings, m, _ = pts.shape
    tris = cylinder_triangles(m, rings)
    return pts.reshape(-1, 3), tris


def skeleton_tube_mesh(
    skeleton: DisjointTreeSkeleton | TreeSkeleton, n: int = 10, colour_per_tree=True
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Merged tube mesh: (vertices, triangles, vertex_colors)."""
    skels = (
        skeleton.skeletons
        if isinstance(skeleton, DisjointTreeSkeleton)
        else [skeleton]
    )
    rng = np.random.default_rng(0)
    verts, tris, cols = [], [], []
    offset = 0
    for sk in skels:
        colour = rng.uniform(0.2, 0.9, 3)
        for b in sk.branches.values():
            if len(b) < 2:
                continue
            v, t = branch_tube_mesh(b.xyz, b.radii, n)
            verts.append(v)
            tris.append(t + offset)
            cols.append(np.broadcast_to(colour, v.shape).copy())
            offset += len(v)
    if not verts:
        return np.zeros((0, 3)), np.zeros((0, 3), int), np.zeros((0, 3))
    return np.concatenate(verts), np.concatenate(tris), np.concatenate(cols)


def skeleton_lineset(
    skeleton: DisjointTreeSkeleton | TreeSkeleton,
) -> Tuple[np.ndarray, np.ndarray]:
    """Merged polyline edges: (vertices, edges)."""
    skels = (
        skeleton.skeletons
        if isinstance(skeleton, DisjointTreeSkeleton)
        else [skeleton]
    )
    verts, edges = [], []
    offset = 0
    for sk in skels:
        for b in sk.branches.values():
            n = len(b)
            if n < 2:
                continue
            verts.append(b.xyz)
            idx = np.arange(n - 1) + offset
            edges.append(np.stack([idx, idx + 1], axis=1))
            offset += n
    if not verts:
        return np.zeros((0, 3)), np.zeros((0, 2), int)
    return np.concatenate(verts), np.concatenate(edges)
