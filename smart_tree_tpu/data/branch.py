"""BranchSkeleton — host numpy mirror of reference
smart_tree/data_types/branch.py:17-75."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from .tube import Tube


@dataclass
class BranchSkeleton:
    _id: int
    parent_id: int
    xyz: np.ndarray   # [N,3]
    radii: np.ndarray  # [N,1]
    child_id: Optional[int] = None

    def __post_init__(self):
        self.xyz = np.asarray(self.xyz, np.float32).reshape(-1, 3)
        self.radii = np.asarray(self.radii, np.float32).reshape(-1, 1)

    def __len__(self):
        return self.xyz.shape[0]

    def to_tubes(self) -> List[Tube]:
        return [
            Tube(a, b, float(r1), float(r2))
            for a, b, r1, r2 in zip(
                self.xyz[:-1], self.xyz[1:], self.radii[:-1, 0], self.radii[1:, 0]
            )
        ]

    def filter(self, mask) -> "BranchSkeleton":
        return BranchSkeleton(
            self._id, self.parent_id, self.xyz[mask], self.radii[mask], self.child_id
        )

    @property
    def length(self) -> float:
        return float(np.linalg.norm(self.xyz[1:] - self.xyz[:-1], axis=1).sum())

    @property
    def initial_radius(self) -> float:
        # max of first/last radius, reference branch.py:65-70
        return float(max(self.radii[0, 0], self.radii[-1, 0]))

    @property
    def biggest_radius(self) -> float:
        return float(self.radii.max())
