"""Cloud: the point-cloud domain type.

Functional JAX analogue of the reference's torch Cloud dataclass
(smart_tree/data_types/cloud.py:19-264). Registered as a pytree so it can
flow through jit/vmap; all ops are pure (return new Clouds). Arrays may be
numpy (host) or jax (device) — `.device()` / `.host()` convert.

Behavioral parity notes:
  - root_idx is the lowest-y point (cloud.py:204-206, y-up convention)
  - medial_pts = xyz + medial_vector (cloud.py:229)
  - radius = |medial_vector|, direction = normalized (cloud.py:254-259)
  - scale/translate/rotate drop labels, like the reference (cloud.py:194-202)
  - from_numpy accepts the legacy "vector" key (cloud.py:248-250)
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_ARRAY_FIELDS = (
    "xyz",
    "rgb",
    "medial_vector",
    "branch_direction",
    "branch_ids",
    "class_l",
)


@jax.tree_util.register_pytree_node_class
@dataclass
class Cloud:
    xyz: np.ndarray | jax.Array
    rgb: Optional[np.ndarray | jax.Array] = None
    medial_vector: Optional[np.ndarray | jax.Array] = None
    branch_direction: Optional[np.ndarray | jax.Array] = None
    branch_ids: Optional[np.ndarray | jax.Array] = None
    class_l: Optional[np.ndarray | jax.Array] = None
    filename: Optional[Path] = None

    # -- pytree --
    def tree_flatten(self):
        children = tuple(getattr(self, f) for f in _ARRAY_FIELDS)
        return children, self.filename

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, filename=aux)

    def __len__(self):
        return int(self.xyz.shape[0])

    def __str__(self):
        return (
            f"Cloud with {self.xyz.shape[0]} points"
            + (f" ({self.filename})" if self.filename else "")
        )

    def _map(self, fn) -> "Cloud":
        kw = {
            f: (fn(getattr(self, f)) if getattr(self, f) is not None else None)
            for f in _ARRAY_FIELDS
        }
        return Cloud(**kw, filename=self.filename)

    def device(self) -> "Cloud":
        return self._map(jnp.asarray)

    def host(self) -> "Cloud":
        return self._map(np.asarray)

    def astype(self, dtype) -> "Cloud":
        return self._map(lambda a: a.astype(dtype))

    # -- filtering --
    def filter(self, mask_or_idx) -> "Cloud":
        return self._map(lambda a: a[mask_or_idx])

    def filter_by_class(self, classes) -> "Cloud":
        xp = jnp if isinstance(self.class_l, jax.Array) else np
        mask = xp.isin(self.class_l.reshape(-1), xp.asarray(classes))
        return self.filter(mask)

    def filter_by_skeleton(self, skeleton, threshold: float = 1.1) -> "Cloud":
        """Keep points within threshold*radius of the skeleton's tubes
        (reference cloud.py:105-108)."""
        from ..data.tube import collate_tubes
        from ..utils.queries import skeleton_to_points

        dists, radii, _ = skeleton_to_points(
            np.asarray(self.xyz), collate_tubes(skeleton.to_tubes())
        )
        return self.filter(dists < radii * threshold)

    # -- transforms (drop labels, reference parity) --
    def scale(self, factor) -> "Cloud":
        return Cloud(self.xyz * factor, self.rgb, filename=self.filename)

    def translate(self, offset) -> "Cloud":
        return Cloud(self.xyz + offset, self.rgb, filename=self.filename)

    def rotate(self, rot_mat) -> "Cloud":
        return Cloud(self.xyz @ rot_mat, self.rgb, filename=self.filename)

    # -- properties --
    @property
    def root_idx(self) -> int:
        xp = jnp if isinstance(self.xyz, jax.Array) else np
        return int(xp.argmin(self.xyz[:, 1]))

    @property
    def min_xyz(self):
        return self.xyz.min(axis=0)

    @property
    def max_xyz(self):
        return self.xyz.max(axis=0)

    @property
    def bbox(self):
        dims = (self.max_xyz - self.min_xyz) / 2
        centre = self.min_xyz + dims
        return centre, dims

    @property
    def medial_pts(self):
        return self.xyz + self.medial_vector

    @property
    def radius(self):
        xp = jnp if isinstance(self.medial_vector, jax.Array) else np
        return xp.sqrt((self.medial_vector**2).sum(axis=1))

    @property
    def direction(self):
        r = self.radius
        return self.medial_vector / (r[:, None] + 1e-12)

    @property
    def number_classes(self) -> int:
        if self.class_l is None:
            return 1
        return int(self.class_l.max()) + 1

    # -- constructors --
    @staticmethod
    def from_numpy(**kwargs) -> "Cloud":
        out = {}
        for key, value in kwargs.items():
            if key in _ARRAY_FIELDS:
                out[key] = np.asarray(value, np.float32)
            elif key == "vector":  # legacy synthetic-trees npz schema
                out["medial_vector"] = np.asarray(value, np.float32)
            elif key == "filename":
                out["filename"] = value
        return Cloud(**out)
