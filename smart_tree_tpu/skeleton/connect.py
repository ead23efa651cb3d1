"""Connecting disjoint skeletons.

The reference ships only a broken dev scratch for this
(smart_tree/skeleton/connection.py imports a function that doesn't exist;
data_types/tree.py:207-233 `connect` references undefined variables —
SURVEY.md known-dead items). This is a working implementation: each
secondary skeleton whose root sits within `max_distance` of a tube of the
primary skeleton is grafted onto it (branch ids renumbered, parent wired to
the branch owning the nearest tube), mirroring the intent of the scratch
code.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..data.tree import DisjointTreeSkeleton, TreeSkeleton
from ..data.tube import collate_tubes
from ..utils.queries import pts_to_nearest_tube


def _root_point(skeleton: TreeSkeleton) -> np.ndarray:
    pts = np.concatenate([b.xyz for b in skeleton.branches.values()])
    return pts[np.argmin(pts[:, 1])]


def connect_skeletons(
    disjoint: DisjointTreeSkeleton, max_distance: float = 0.5
) -> DisjointTreeSkeleton:
    """Graft secondary skeletons onto the primary where close enough.

    Returns a new DisjointTreeSkeleton whose first element is the merged
    skeleton; skeletons farther than `max_distance` stay separate.
    """
    if len(disjoint.skeletons) <= 1:
        return disjoint
    primary = disjoint.skeletons[0]
    merged = {k: v for k, v in primary.branches.items()}
    tube_owner: List[int] = []
    tubes = []
    for bid, b in primary.branches.items():
        bt = b.to_tubes()
        tubes += bt
        tube_owner += [bid] * len(bt)
    remaining = []
    next_id = (max(merged.keys()) if merged else -1) + 1
    for sk in disjoint.skeletons[1:]:
        if not tubes or not sk.branches:
            remaining.append(sk)
            continue
        root = _root_point(sk)
        v, idx, _ = pts_to_nearest_tube(root.reshape(1, 3), collate_tubes(tubes))
        dist = float(np.linalg.norm(v[0]))
        if dist > max_distance:
            remaining.append(sk)
            continue
        parent_bid = tube_owner[int(idx[0])]
        # renumber this skeleton's branches into the merged id space
        id_map = {}
        for old_id, b in sk.branches.items():
            id_map[old_id] = next_id
            next_id += 1
        for old_id, b in sk.branches.items():
            new_parent = (
                id_map[b.parent_id] if b.parent_id in id_map else parent_bid
            )
            b._id = id_map[old_id]
            b.parent_id = new_parent
            merged[b._id] = b
        # extend the grafted root branch to touch the primary tube
        graft_root = min(id_map.values())
        gb = merged[graft_root]
        connection_pt = (root + v[0]).reshape(1, 3)
        gb.xyz = np.concatenate([connection_pt, gb.xyz])
        gb.radii = np.concatenate([gb.radii[[0]], gb.radii])
    return DisjointTreeSkeleton([TreeSkeleton(primary._id, merged)] + remaining)
