"""Interactive viewing — optional Open3D adapter.

Open3D is not installed in this environment; viewing degrades to a warning
(saving PLY outputs is the headless path, reference pipeline.py:87-93
equivalent). When open3d IS importable the geometry converters below give
the same visuals as the reference o3d_abstractions."""

from __future__ import annotations

import logging

import numpy as np

log = logging.getLogger(__name__)

try:  # pragma: no cover - optional dependency
    import open3d as o3d

    HAVE_O3D = True
except Exception:  # pragma: no cover
    o3d = None
    HAVE_O3D = False


def view_cloud(cloud, cmap=None):  # pragma: no cover - interactive
    if not HAVE_O3D:
        log.warning("open3d not available; skipping interactive view "
                    "(use save_outputs: True for PLY export)")
        return
    geoms = []
    pc = o3d.geometry.PointCloud(o3d.utility.Vector3dVector(np.asarray(cloud.xyz)))
    if cloud.rgb is not None:
        pc.colors = o3d.utility.Vector3dVector(np.asarray(cloud.rgb))
    geoms.append(pc)
    if cloud.class_l is not None and cmap is not None:
        seg = o3d.geometry.PointCloud(o3d.utility.Vector3dVector(np.asarray(cloud.xyz)))
        seg.colors = o3d.utility.Vector3dVector(
            np.asarray(cmap)[np.asarray(cloud.class_l).reshape(-1).astype(int)]
        )
        geoms.append(seg)
    o3d.visualization.draw(geoms)


def view_skeleton(skeleton, cloud=None):  # pragma: no cover - interactive
    if not HAVE_O3D:
        log.warning("open3d not available; skipping interactive view "
                    "(use save_outputs: True for PLY export)")
        return
    from .mesh import skeleton_lineset, skeleton_tube_mesh

    verts, edges = skeleton_lineset(skeleton)
    ls = o3d.geometry.LineSet(
        o3d.utility.Vector3dVector(verts), o3d.utility.Vector2iVector(edges)
    )
    mv, mt, mc = skeleton_tube_mesh(skeleton)
    mesh = o3d.geometry.TriangleMesh(
        o3d.utility.Vector3dVector(mv), o3d.utility.Vector3iVector(mt)
    )
    mesh.vertex_colors = o3d.utility.Vector3dVector(mc)
    mesh.compute_vertex_normals()
    geoms = [ls, mesh]
    if cloud is not None:
        pc = o3d.geometry.PointCloud(o3d.utility.Vector3dVector(np.asarray(cloud.xyz)))
        geoms.append(pc)
    o3d.visualization.draw(geoms)
