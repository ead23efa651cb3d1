"""Sparse UNet building blocks (flax).

TPU rebuild of reference smart_tree/model/model_blocks.py — same block
algebra (SubMConvBlock / Encoder / Decoder / ResBlock / recursive UBlock /
SparseFC heads), but convolutions are rulebook gathers + MXU GEMMs over a
precomputed UNetPlan (core/plan.py) instead of spconv CUDA calls.

Module/param names deliberately mirror the reference state_dict layout
(e.g. `UNet.U.Encode.sequence.0`) so the torch checkpoint converter
(nn/convert.py) is a mechanical rename.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.plan import UNetPlan
from ..core.sparse_ops import gather_conv
from .norm import MaskedBatchNorm


def _kaiming(key, shape, dtype=jnp.float32):
    # shape [K3, Cin, Cout]; fan_in = K3*Cin (matches torch conv default)
    fan_in = shape[0] * shape[1]
    bound = (6.0 / fan_in) ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class SparseConv(nn.Module):
    """One sparse conv (any variant — the rulebook decides the geometry)."""

    in_channels: int
    out_channels: int
    kernel_volume: int = 27

    @nn.compact
    def __call__(self, feats, rulebook=None):
        w = self.param(
            "weight", _kaiming, (self.kernel_volume, self.in_channels, self.out_channels)
        )
        if self.kernel_volume == 1:
            # 1x1x1 subm conv == per-voxel linear; padding rows stay zero.
            return jnp.dot(
                feats, w[0].astype(feats.dtype), preferred_element_type=jnp.float32
            ).astype(feats.dtype)
        return gather_conv(feats, rulebook, w.astype(feats.dtype))


class ConvNormAct(nn.Module):
    """conv -> BN -> ReLU, the reference's SparseSequential triple
    (model_blocks.py:23-35,57-70,90-101)."""

    in_channels: int
    out_channels: int
    kernel_volume: int = 27
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, feats, rulebook, mask, train: bool):
        x = SparseConv(self.in_channels, self.out_channels, self.kernel_volume, name="0")(
            feats, rulebook
        )
        x = MaskedBatchNorm(
            self.out_channels, axis_name=self.bn_axis_name, name="1"
        )(x, mask, use_running_average=not train)
        x = nn.relu(x)
        return jnp.where(mask[:, None], x, 0)


class ResBlock(nn.Module):
    """Two 3^3 subm convs + (optional 1^3 projection) identity, post-add ReLU
    (model_blocks.py:107-156)."""

    in_channels: int
    out_channels: int
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, feats, subm_rb, mask, train: bool):
        ident = feats
        if self.in_channels != self.out_channels:
            ident = SparseConv(
                self.in_channels, self.out_channels, 1, name="identity.0"
            )(feats)
        x = SparseConv(self.in_channels, self.out_channels, 27, name="sequence.0")(
            feats, subm_rb
        )
        x = MaskedBatchNorm(
            self.out_channels, axis_name=self.bn_axis_name, name="sequence.1"
        )(x, mask, use_running_average=not train)
        x = nn.relu(x)
        x = jnp.where(mask[:, None], x, 0)
        x = SparseConv(self.out_channels, self.out_channels, 27, name="sequence.3")(
            x, subm_rb
        )
        x = MaskedBatchNorm(
            self.out_channels, axis_name=self.bn_axis_name, name="sequence.4"
        )(x, mask, use_running_average=not train)
        x = nn.relu(x + ident)
        return jnp.where(mask[:, None], x, 0)


class UBlock(nn.Module):
    """Recursive U (model_blocks.py:159-243): Head ResBlock -> Encode ->
    recurse -> Decode -> concat skip -> Tail ResBlock."""

    planes: Tuple[int, ...]
    level: int = 0
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, plan: UNetPlan, feats, train: bool):
        lv = plan.levels[self.level]
        mask = lv.active
        out = ResBlock(
            self.planes[0], self.planes[0], self.bn_axis_name, name="Head"
        )(feats, lv.subm_rb, mask, train)

        if len(self.planes) > 1:
            nxt = plan.levels[self.level + 1]
            down = ConvNormAct(
                self.planes[0],
                self.planes[1],
                27,
                self.bn_axis_name,
                name="Encode.sequence",
            )(out, lv.down_rb, nxt.active, train)
            deep = UBlock(
                tuple(self.planes[1:]),
                self.level + 1,
                self.bn_axis_name,
                name="U",
            )(plan, down, train)
            up = ConvNormAct(
                self.planes[1],
                self.planes[0],
                27,
                self.bn_axis_name,
                name="Decode.sequence",
            )(deep, lv.up_rb, mask, train)
            cat = jnp.concatenate([out, up], axis=1)
            out = ResBlock(
                self.planes[0] * 2, self.planes[0], self.bn_axis_name, name="Tail"
            )(cat, lv.subm_rb, mask, train)
        return out


class SparseFC(nn.Module):
    """1x1x1 conv stack head: (linear -> BN -> ReLU)* -> linear, bias-free —
    the layout of the shipped checkpoints (model_blocks.py:246-285,
    SURVEY.md §2.1)."""

    planes: Tuple[int, ...]
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, feats, mask, train: bool):
        x = feats
        n = len(self.planes)
        for i in range(n - 2):
            w = self.param(
                f"sequence.{3 * i}.weight",
                _kaiming,
                (1, self.planes[i], self.planes[i + 1]),
            )
            x = jnp.dot(x, w[0].astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)
            x = MaskedBatchNorm(
                self.planes[i + 1], axis_name=self.bn_axis_name, name=f"sequence.{3 * i + 1}"
            )(x, mask, use_running_average=not train)
            x = nn.relu(x)
            x = jnp.where(mask[:, None], x, 0)
        w = self.param(
            f"sequence.{3 * (n - 2)}.weight",
            _kaiming,
            (1, self.planes[-2], self.planes[-1]),
        )
        x = jnp.dot(x, w[0].astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)
        return jnp.where(mask[:, None], x, 0)
