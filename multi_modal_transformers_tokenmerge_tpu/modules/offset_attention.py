"""Offset attention from Point Cloud Transformer
(reference: attention_blocks/offset_attention.py:15-32; PCT paper
arXiv:2012.09688): ``x + LBR(x - SelfAttention(x))``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["OffsetAttention"]


class OffsetAttention(nn.Module):
    num_heads: int
    qkv_features: int
    out_features: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.qkv_features,
            out_features=self.out_features or x.shape[-1],
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="self_attention")(x, mask=mask, deterministic=not train)
        offset = x - attn
        y = nn.Dense(x.shape[-1], dtype=self.dtype,
                     param_dtype=self.param_dtype, name="lbr_dense")(offset)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="lbr_bn")(y)
        y = nn.relu(y)
        return y + x
