"""Text encoders.

* :class:`EmbedTextEncoder` — learned token + position embeddings
  (reference: tokenizers/text/text_tokenizer.py:49-69).
* :class:`FrozenT5TextEncoder` — frozen T5-style encoder implemented natively
  (the reference wraps a randomly-initialized HF ``FlaxT5EncoderModel`` under
  ``stop_gradient``, tokenizers/text/t5_base.py:8-15; our native stack removes
  the HF-hub dependency and runs the same architecture TPU-side).
* :class:`WordTokenizer` — vocabulary-file word->index tokenizer for text
  preprocessing outside the jitted graph
  (reference: tokenizers/text/text_tokenizer.py:26-46).
"""

from __future__ import annotations

from typing import Iterable, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import TextEncoderConfig
from .t5 import T5EncoderStack

__all__ = ["EmbedTextEncoder", "FrozenT5TextEncoder", "WordTokenizer",
           "build_text_encoder"]


class EmbedTextEncoder(nn.Module):
    """Learned token embedding + learned absolute position embedding."""

    cfg: TextEncoderConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, token_ids):  # (B, T) int32
        b, t = token_ids.shape
        tok = nn.Embed(self.cfg.vocab_size, self.cfg.embedding_dim,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="token_embedding")(token_ids)
        positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
        pos = nn.Embed(self.cfg.max_length, self.cfg.embedding_dim,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="position_embedding")(positions)
        return tok + pos


class FrozenT5TextEncoder(nn.Module):
    """T5 encoder stack with gradients stopped (frozen text tower)."""

    cfg: TextEncoderConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, token_ids):  # (B, T) int32
        out = T5EncoderStack(
            vocab_size=self.cfg.vocab_size,
            d_model=self.cfg.embedding_dim,
            num_layers=self.cfg.t5_num_layers,
            num_heads=self.cfg.t5_num_heads,
            d_kv=self.cfg.t5_d_kv,
            d_ff=self.cfg.t5_d_ff,
            rel_pos_buckets=self.cfg.t5_rel_pos_buckets,
            rel_pos_max_distance=self.cfg.t5_rel_pos_max_distance,
            scan_unroll=(self.cfg.t5_num_layers
                         if self.cfg.t5_scan_unroll == 0
                         else self.cfg.t5_scan_unroll),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="t5_encoder",
        )(token_ids)
        if self.cfg.frozen:
            out = jax.lax.stop_gradient(out)
        return out


def build_text_encoder(cfg: TextEncoderConfig, dtype, param_dtype,
                       name: str = "text_encoder") -> nn.Module:
    if cfg.kind == "embed":
        return EmbedTextEncoder(cfg, dtype=dtype, param_dtype=param_dtype,
                                name=name)
    if cfg.kind == "t5":
        return FrozenT5TextEncoder(cfg, dtype=dtype, param_dtype=param_dtype,
                                   name=name)
    raise ValueError(f"unknown text encoder kind {cfg.kind!r}")


class WordTokenizer:
    """Whitespace word tokenizer with a fixed vocabulary.

    Host-side preprocessing (never inside jit).  Index 0 is the pad token.
    """

    PAD = 0
    UNK = 1

    def __init__(self, vocab: Iterable[str], max_length: int = 16):
        words = sorted(set(w.strip() for w in vocab if w.strip()))
        self.word2idx = {w: i + 2 for i, w in enumerate(words)}
        self.idx2word = {v: k for k, v in self.word2idx.items()}
        self.idx2word[self.PAD] = "<pad>"
        self.idx2word[self.UNK] = "<unk>"
        self.vocab_size = len(self.word2idx) + 2
        self.max_length = max_length

    @classmethod
    def from_corpus(cls, texts: Sequence[str], max_length: int = 16):
        vocab = set()
        for t in texts:
            vocab.update(t.lower().split())
        return cls(vocab, max_length=max_length)

    @classmethod
    def from_vocab_file(cls, path: str, max_length: int = 16):
        """Newline-separated vocabulary file
        (reference: text_tokenizer.py:31-35)."""
        with open(path) as f:
            return cls(f.read().split("\n"), max_length=max_length)

    def encode(self, text: str) -> List[int]:
        ids = [self.word2idx.get(w, self.UNK) for w in text.lower().split()]
        ids = ids[: self.max_length]
        ids += [self.PAD] * (self.max_length - len(ids))
        return ids

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        return np.asarray([self.encode(t) for t in texts], dtype=np.int32)
