"""Continuous (tanh-squashed) action head
(reference: action_heads/continuous.py:12-26)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..core.config import ContinuousHeadConfig

__all__ = ["ContinuousActionHead"]


class ContinuousActionHead(nn.Module):
    cfg: ContinuousHeadConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, readouts):  # (B, R, E)
        if self.cfg.pooling == "map":
            # MAP attention pooling over readout tokens (the reference has
            # this path commented out, continuous.py:20-21)
            from ..modules.attention import MultiHeadAttentionPooling
            emb = MultiHeadAttentionPooling(
                num_heads=self.cfg.map_num_heads, mlp_dim=readouts.shape[-1],
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="map_pooling")(readouts)[:, 0]
        else:
            emb = jnp.mean(readouts, axis=-2)
        mean = nn.Dense(self.cfg.action_space_dim, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        kernel_init=nn.initializers.he_normal(),
                        bias_init=nn.initializers.normal(),
                        name="mean")(emb)
        mean = mean[:, None, :]  # (B, 1, A) to match reference output shape
        return jnp.tanh(mean / self.cfg.max_action) * self.cfg.max_action
