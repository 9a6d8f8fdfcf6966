"""Readout tokens.

The reference builds readout embeddings by adding a learned positional
embedding to a zeros dummy (reference: models/octo/octo.py:103-108,
tokenizers/readout/readout.py:8-33) — i.e. the readout tokens ARE the
positional embedding.  Here they are a learned parameter broadcast to the
batch: mathematically identical, with no zeros tensor materialized.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["ReadoutTokens"]


class ReadoutTokens(nn.Module):
    num_tokens: int
    embedding_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch_size: int):
        pe = self.param("pos_embedding", nn.initializers.he_normal(),
                        (1, self.num_tokens, self.embedding_dim),
                        self.param_dtype)
        return jnp.broadcast_to(
            pe.astype(self.dtype),
            (batch_size, self.num_tokens, self.embedding_dim))
