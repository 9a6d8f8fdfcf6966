"""Reference-compatible API surface.

Users migrating from ``maggieHao/multi_modal_transformers_TokenMerge`` can
import familiar names here; each maps onto the TPU-native implementation.

Covered (reference -> here):
  tokenizers.token_sequencer.TokenSequence      -> TokenSequence
  tokenizers.token_sequencer.TokenEmbeddings    -> TokenEmbeddings
  tokenizers.token_compression.bipartite_soft_matching -> same (merge-closure
      form, token_compression.py:54-112)
  tokenizers.token_compression.merge_wavg       -> merge_wavg
  tokenizers.token_compression.compute_top_k_tokens -> compute_top_k_tokens
  tokenizers.images.image_tokenizer.image_to_patches -> image_to_patches
  tokenizers.numeric_values.value_tokenizer.mu_law_encoder -> mu_law_encoder
  action_heads.categorical.assign_bins          -> assign_bins
  action_heads.diffusion.cosine_beta_schedule   -> cosine_beta_schedule
  models.octo.Octo                              -> models.octo.Octo (method
      API preserved natively)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .heads.categorical import assign_bins  # noqa: F401
from .heads.diffusion import cosine_beta_schedule  # noqa: F401
from .models.octo import Octo, TokenEmbeddings  # noqa: F401
from .modules.value_tokenizer import mu_law_encode as mu_law_encoder  # noqa: F401
from .ops import tome as _tome
from .ops.image_ops import patchify
from .ops.pruning import prune_gather, topk_tokens_per_set
from .sequence.layout import SequenceLayout

__all__ = [
    "TokenSequence", "TokenEmbeddings", "bipartite_soft_matching",
    "merge_wavg", "compute_top_k_tokens", "image_to_patches",
    "mu_law_encoder", "assign_bins", "cosine_beta_schedule", "Octo",
]


def image_to_patches(image, patch_size, normalize):
    """(H, W, C) image -> (P, p, p, C) patches
    (reference: images/image_tokenizer.py:35-71)."""
    return patchify(image, patch_size, normalize)


def bipartite_soft_matching(metric, r, class_token=False, distill_token=False):
    """Reference-style merge closure (token_compression.py:54-112): returns
    ``merge(x, mode='sum')`` built from a static match plan."""
    plan = _tome.bipartite_soft_matching(metric, r, class_token=class_token,
                                         distill_token=distill_token)

    def merge(x, mode="sum"):
        if plan is None:
            return x
        return _tome.apply_merge(plan, x, mode=mode)

    return merge


def merge_wavg(merge, x, size=None):
    """Size-weighted merge via a reference-style closure
    (token_compression.py:114-129)."""
    if size is None:
        size = jnp.ones_like(x[..., 0, None])
    x = merge(x * size, mode="sum")
    size = merge(size, mode="sum")
    return x / size, size


def compute_top_k_tokens(embeddings, importance_scores, tokenset_idx,
                         tokenset_k):
    """Per-set top-k pruning, unbatched reference signature
    (token_compression.py:15-46): embeddings (T, C), scores (T,)."""
    keep = topk_tokens_per_set(importance_scores[None], tuple(tokenset_idx),
                               tuple(tokenset_k), sort_kept=False)
    return prune_gather(embeddings[None], keep)[0]


class TokenSequence:
    """Reference-compatible facade over the static SequenceLayout
    (reference: tokenizers/token_sequencer.py:186-340).

    Differences by design: slice tables are reusable tuples (the reference
    returns one-shot iterators — token_sequencer.py:293,311), masks are
    numpy-backed constants, and assembly is a single static gather.
    """

    def __init__(self, token_sequence: str,
                 token_compression_sequence: Optional[str] = None):
        self.token_sequence_str = token_sequence
        self.token_compression_sequence_str = token_compression_sequence
        self.layout = SequenceLayout.from_strings(
            token_sequence, token_compression_sequence)
        self.token_sequence = self.layout.sets
        self.slice_idx = self.layout.modality_slices()
        self.tokenset_slices = self.layout.set_slices()

    def generate_attention_mask(self, repeats: int = 1,
                                layer: Optional[int] = None):
        mask = jnp.asarray(self.layout.attention_mask(layer or 0))
        return jnp.repeat(mask[None], repeats, axis=0)

    def assemble_embeddings(self, embeddings: TokenEmbeddings,
                            slice_idx=None):
        combined = jnp.concatenate(
            [embeddings.text, embeddings.images, embeddings.readouts], axis=1)
        return jnp.take(combined,
                        jnp.asarray(self.layout.assembly_permutation), axis=1)

    def get_modality_idx(self, modality: str):
        return jnp.asarray(self.layout.modality_index(modality))

    def generate_layer_token_sequence(self, layer: int):
        from .sequence.dsl import TokenSetSpec
        return tuple(
            TokenSetSpec(s.kind, s.tokens_at_layer(layer), s.timestep,
                         s.compressed_per_layer)
            for s in self.layout.sets)
