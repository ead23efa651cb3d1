"""Masked batch normalization over sparse voxel rows.

The reference normalizes every conv's features with torch BatchNorm1d
(model_blocks.py norm_fn). On padded TPU buffers the statistics must ignore
padding rows, and under data-parallel pjit training the statistics are
reduced across devices (psum) so DP training matches single-device BN on the
global batch — a strict improvement over the reference's single-GPU BN.

Torch semantics replicated exactly for checkpoint parity: eps=1e-5,
momentum=0.1 (new = (1-m)*old + m*batch), biased variance for normalization,
unbiased for the running-var update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    features: int
    eps: float = 1e-5
    momentum: float = 0.1
    use_running_average: bool = False
    axis_name: str | None = None  # set to mesh axis for cross-replica stats

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array, use_running_average=None):
        """x [N,C]; mask [N] bool. Returns normalized [N,C] (padding rows
        pass through scaled; callers keep them zeroed via mask anyway)."""
        use_ra = (
            self.use_running_average
            if use_running_average is None
            else use_running_average
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            m = mask.astype(jnp.float32)[:, None]
            cnt = jnp.sum(m)
            if self.axis_name is not None:
                cnt = jax.lax.psum(cnt, self.axis_name)
            cnt = jnp.maximum(cnt, 1.0)
            s1 = jnp.sum(x.astype(jnp.float32) * m, axis=0)
            s2 = jnp.sum(jnp.square(x.astype(jnp.float32)) * m, axis=0)
            if self.axis_name is not None:
                s1 = jax.lax.psum(s1, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
            mean = s1 / cnt
            var = jnp.maximum(s2 / cnt - jnp.square(mean), 0.0)
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        inv = jax.lax.rsqrt(var + self.eps)
        y = (x - mean) * (inv * scale) + bias
        return y.astype(x.dtype)
