"""Attention-importance token pruning.

Per-token-set top-k selection by importance score
(reference: tokenizers/token_compression.py:15-46).  Token counts per set
are static Python ints from the sequence layout, so the pruned sequence has
a static shape — jit/scan safe.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["topk_tokens_per_set", "prune_gather"]


def topk_tokens_per_set(
    importance: jax.Array,
    set_slices: Sequence[Tuple[int, int]],
    keep_counts: Sequence[int],
    sort_kept: bool = True,
) -> jax.Array:
    """Indices (B, sum(keep_counts)) of the kept tokens.

    For each (start, size) set slice, keeps the ``k`` highest-importance
    tokens (k = keep_counts[i]); indices are offset back into the full
    sequence.

    ``sort_kept=True`` (default) re-sorts kept indices ascending so tokens
    keep their original relative order — required for sets with causal
    intra-attention.  ``sort_kept=False`` reproduces the reference exactly:
    kept tokens appear in descending-importance order (the reference
    reorders even sets it keeps in full, token_compression.py:27-44).
    """
    ids = []
    b = importance.shape[0]
    for (start, size), k in zip(set_slices, keep_counts):
        if k > size:
            raise ValueError(f"cannot keep {k} of {size} tokens")
        if k == size and sort_kept:
            idx = jnp.broadcast_to(
                jnp.arange(start, start + size, dtype=jnp.int32), (b, size))
            ids.append(idx)
            continue
        scores = jax.lax.dynamic_slice_in_dim(importance, start, size, axis=1)
        _, idx = jax.lax.top_k(scores, k)
        if sort_kept:
            idx = jnp.sort(idx, axis=-1)
        ids.append((idx + start).astype(jnp.int32))
    return jnp.concatenate(ids, axis=-1)


def prune_gather(x: jax.Array, keep_idx: jax.Array) -> jax.Array:
    """Gather kept tokens: (B, T, C), (B, K) -> (B, K, C)."""
    if x.ndim == keep_idx.ndim + 1:
        return jnp.take_along_axis(x, keep_idx[..., None], axis=1)
    return jnp.take_along_axis(x, keep_idx, axis=1)
