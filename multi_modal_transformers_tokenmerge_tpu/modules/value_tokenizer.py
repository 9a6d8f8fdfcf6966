"""Discrete/continuous value tokenization
(reference: tokenizers/numeric_values/value_tokenizer.py).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["ActionTokenizer", "mu_law_encode", "mu_law_decode"]


class ActionTokenizer(nn.Module):
    """Embeds discrete action indices (reference: :18-30)."""

    num_actions: int
    embedding_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, action):  # int32 (...,)
        return nn.Embed(self.num_actions, self.embedding_dim,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name="action_embedding")(action)


def mu_law_encode(x, mu: float = 255.0):
    """Mu-law companding of continuous values (reference: :33-34)."""
    return jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu)


def mu_law_decode(y, mu: float = 255.0):
    """Inverse companding (the reference omits it; needed to detokenize)."""
    return jnp.sign(y) * (jnp.expm1(jnp.abs(y) * jnp.log1p(mu))) / mu
