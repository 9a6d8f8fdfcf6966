"""Categorical (binned) action head
(reference: action_heads/categorical.py:12-40)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..core.config import CategoricalHeadConfig

__all__ = ["CategoricalActionHead", "assign_bins"]


def assign_bins(x, bounds, num_bins, bin_strategy: str = "uniform"):
    """Uniform binning via digitize (reference: categorical.py:12-22)."""
    if bin_strategy != "uniform":
        raise NotImplementedError(bin_strategy)
    bins = jnp.linspace(bounds[0], bounds[1], num_bins + 1)
    return jnp.digitize(x, bins)


class CategoricalActionHead(nn.Module):
    cfg: CategoricalHeadConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, readouts):  # (B, A*T, E)
        b, rt, e = readouts.shape
        a = self.cfg.action_space_dim
        # (B, A*T, E) -> (B, A, T, E) -> mean over T
        emb = readouts.reshape(b, a, rt // a, e).mean(axis=-2)
        emb = jnp.squeeze(emb)
        logits = nn.Dense(self.cfg.num_bins, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          kernel_init=nn.initializers.he_normal(),
                          bias_init=nn.initializers.normal(),
                          name="logits")(emb)
        return logits
