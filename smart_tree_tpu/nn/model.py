"""SmartTree UNet model (flax).

Rebuild of reference smart_tree/model/model.py:10-87: 1x1x1 subm input conv
-> recursive UBlock -> three heads (radius 1ch, direction 3ch L2-normalized,
class 2ch). Head layout matches the *shipped checkpoints* (1x1x1 SparseFC
stacks, planes [8,8,4,{1,3,2}], bias-free — SURVEY.md §2.1), not the
drifted nn.Linear code path.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.plan import UNetPlan, build_plan
from ..core.sparse_tensor import SparseVoxelTensor
from .blocks import ConvNormAct, SparseFC, UBlock


class SmartTree(nn.Module):
    input_channels: int = 3
    unet_planes: Tuple[int, ...] = (8, 16, 32, 64)
    radius_fc_planes: Tuple[int, ...] = (8, 8, 4, 1)
    direction_fc_planes: Tuple[int, ...] = (8, 8, 4, 3)
    class_fc_planes: Tuple[int, ...] = (8, 8, 4, 2)
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(
        self, plan: UNetPlan, feats: jax.Array, train: bool = False
    ) -> Dict[str, jax.Array]:
        lv0 = plan.levels[0]
        mask = lv0.active
        x = ConvNormAct(
            self.input_channels,
            self.unet_planes[0],
            1,
            self.bn_axis_name,
            name="input_conv.sequence",
        )(feats, None, mask, train)
        x = UBlock(tuple(self.unet_planes), 0, self.bn_axis_name, name="UNet")(
            plan, x, train
        )
        radius = SparseFC(
            tuple(self.radius_fc_planes), self.bn_axis_name, name="radius_head"
        )(x, mask, train)
        direction = SparseFC(
            tuple(self.direction_fc_planes), self.bn_axis_name, name="direction_head"
        )(x, mask, train)
        # F.normalize semantics (model.py:84): v / max(|v|, 1e-12).
        # rsqrt(max(n2, eps)) keeps the gradient finite at the exact-zero
        # vectors padding rows produce (norm() has a 0/0 NaN grad there).
        direction_raw = direction
        n2 = jnp.sum(jnp.square(direction), axis=1, keepdims=True)
        direction = direction * jax.lax.rsqrt(jnp.maximum(n2, 1e-24))
        class_l = SparseFC(
            tuple(self.class_fc_planes), self.bn_axis_name, name="class_head"
        )(x, mask, train)
        return {
            "radius": radius,
            "direction": direction,
            "direction_raw": direction_raw,
            "class_l": class_l,
        }

    def build_plan(self, x: SparseVoxelTensor, **kw) -> UNetPlan:
        return build_plan(x, num_levels=len(self.unet_planes), **kw)
