"""Transformer encoder blocks (pre-LN) with static block-causal masks.

TPU-first counterpart of the reference's attention blocks
(reference: attention_blocks/attention.py:20-150):

* attention mask is a static (S, S) bool constant baked into the jitted
  graph (the reference repeats it per-head at setup and per-batch per call);
* deterministic path uses ``jax.nn.dot_product_attention`` so XLA lowers to
  its fused attention; the dropout path computes weights explicitly;
* the layer stack is ``nn.scan`` over one compiled block body with split
  per-layer params, optionally rematerialized.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import AttentionConfig, TransformerConfig

__all__ = [
    "MLPBlock",
    "MultiHeadAttention",
    "EncoderBlock",
    "TransformerStack",
    "AddPositionEmbedding",
    "MultiHeadAttentionPooling",
]

_kernel_init = nn.initializers.he_normal()
_bias_init = nn.initializers.normal()


def select_attention_fn(cfg: TransformerConfig, mask_np, seq_len: int):
    """Pick the Pallas flash-attention kernel when it pays: TPU backend,
    no attention-weight dropout, sequence long enough that avoiding the
    materialized (B,H,S,S) weights matters.  Returns None for the XLA path.
    """
    if cfg.attention_impl == "xla":
        return None
    if cfg.attention.dropout_rate > 0.0:
        # the kernel has no attention-weight dropout (it IS differentiable:
        # custom VJP, optionally native backward); silently skipping the
        # configured regularization would change training semantics
        if cfg.attention_impl == "flash":
            raise ValueError(
                "attention_impl='flash' cannot honor "
                f"attention.dropout_rate={cfg.attention.dropout_rate}: the "
                "Pallas kernel has no attention-weight dropout. Set "
                "attention.dropout_rate=0.0 or use attention_impl='auto'/"
                "'xla'.")
        return None
    if cfg.attention_impl == "auto":
        if seq_len < cfg.flash_min_seq or jax.default_backend() != "tpu":
            return None
    from ..ops.flash_attention import make_attention_fn
    return make_attention_fn(mask_np, block_q=cfg.flash_block_q or None,
                             block_k=cfg.flash_block_k or None,
                             backward=cfg.flash_backward)


class MLPBlock(nn.Module):
    """Dense -> activation -> Dropout -> Dense -> Dropout
    (reference: attention_blocks/attention.py:20-39 — its ``norm`` slot is a
    Dropout in every committed config)."""

    mlp_dim: int
    out_dim: int
    dropout_rate: float = 0.1
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = getattr(nn, self.activation)
        x = nn.Dense(self.mlp_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, kernel_init=_kernel_init,
                     bias_init=_bias_init, name="dense_in")(x)
        x = act(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        x = nn.Dense(self.out_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, kernel_init=_kernel_init,
                     bias_init=_bias_init, name="dense_out")(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x


class MultiHeadAttention(nn.Module):
    """Self-attention with a static boolean mask.

    ``attention_fn`` may override the core attention computation (used by the
    Pallas flash-attention path); signature ``(q, k, v, mask_bool) -> out``
    with q/k/v shaped (B, T, H, D).
    """

    cfg: AttentionConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attention_fn: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None,
                 deterministic: bool = True):
        cfg = self.cfg
        features = x.shape[-1]
        head_dim = cfg.qkv_features // cfg.num_heads

        proj = lambda name: nn.DenseGeneral(
            features=(cfg.num_heads, head_dim), axis=-1, use_bias=cfg.use_bias,
            dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=_kernel_init, bias_init=_bias_init, name=name)
        q, k, v = proj("query")(x), proj("key")(x), proj("value")(x)

        # record explicit attention weights when the caller asks for them
        # (apply(..., mutable=['intermediates'])) — used for attention-map
        # probes and token-importance scores
        if self.is_mutable_collection("intermediates"):
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            logits = logits / np.sqrt(head_dim)
            if mask is not None:
                m = mask[None, None] if mask.ndim == 2 else mask
                logits = jnp.where(m, logits, jnp.finfo(jnp.float32).min)
            self.sow("intermediates", "attention_weights",
                     jax.nn.softmax(logits, axis=-1))

        if self.attention_fn is not None:
            out = self.attention_fn(q, k, v, mask)
        elif deterministic or cfg.dropout_rate == 0.0:
            # XLA's fused attention path
            attn_mask = None
            if mask is not None:
                attn_mask = mask[None, None] if mask.ndim == 2 else mask
            out = jax.nn.dot_product_attention(q, k, v, mask=attn_mask)
        else:
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            logits = logits / np.sqrt(head_dim)
            if mask is not None:
                m = mask[None, None] if mask.ndim == 2 else mask
                logits = jnp.where(m, logits, jnp.finfo(jnp.float32).min)
            weights = jax.nn.softmax(logits, axis=-1)
            drop = nn.Dropout(cfg.dropout_rate)(
                weights, deterministic=deterministic)
            out = jnp.einsum("bhqk,bkhd->bqhd", drop.astype(self.dtype), v)

        return nn.DenseGeneral(features=features, axis=(-2, -1),
                               use_bias=cfg.use_bias, dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               kernel_init=_kernel_init, bias_init=_bias_init,
                               name="out")(out)


class EncoderBlock(nn.Module):
    """Pre-LN encoder block (reference: attention.py:41-69).

    Carries ``(x,)`` for nn.scan; mask and deterministic are broadcast.
    """

    cfg: TransformerConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attention_fn: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, mask, deterministic):
        c = self.cfg
        ln_axes = (1,) if c.layer_norm_reduction == "sequence_compat" else -1
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_epsilon,
                                       reduction_axes=ln_axes,
                                       dtype=self.dtype,
                                       param_dtype=self.param_dtype,
                                       name=name)
        y = ln("ln_attention")(x)
        y = MultiHeadAttention(c.attention, dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               attention_fn=self.attention_fn,
                               name="attention")(
                                   y, mask=mask, deterministic=deterministic)
        y = nn.Dropout(c.dropout_rate)(y, deterministic=deterministic)
        x = x + y

        y = ln("ln_mlp")(x)
        y = MLPBlock(mlp_dim=c.mlp_dim, out_dim=x.shape[-1],
                     dropout_rate=c.dropout_rate, activation=c.mlp_activation,
                     dtype=self.dtype, param_dtype=self.param_dtype,
                     name="mlp")(y, deterministic=deterministic)
        return x + y, None


class TransformerStack(nn.Module):
    """Learned input position embedding + scanned encoder blocks
    (reference: attention.py:87-119)."""

    cfg: TransformerConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attention_fn: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None,
                 deterministic: bool = True):
        x = AddPositionEmbedding(name="posembed_input")(x)

        block_cls = EncoderBlock
        if self.cfg.remat:
            block_cls = nn.remat(EncoderBlock, static_argnums=(3,))
        stack = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(nn.broadcast, nn.broadcast),
            length=self.cfg.num_blocks,
        )(self.cfg, dtype=self.dtype, param_dtype=self.param_dtype,
          attention_fn=self.attention_fn, name="blocks")
        x, _ = stack(x, mask, deterministic)
        return x


class AddPositionEmbedding(nn.Module):
    """Learned positional embedding added to the sequence
    (reference: attention.py:71-85, tokenizers/readout/readout.py:8-33)."""

    init_stddev: float = 0.02
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert x.ndim == 3
        pe = self.param("pos_embedding",
                        nn.initializers.normal(stddev=self.init_stddev),
                        (1, x.shape[1], x.shape[2]), self.param_dtype)
        return x + pe.astype(x.dtype)


class MultiHeadAttentionPooling(nn.Module):
    """MAP head: learned 1-token query cross-attends over the sequence
    (reference: attention.py:122-150)."""

    num_heads: int = 3
    mlp_dim: int = 768
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, s, e = x.shape
        query = self.param("learnt_q_input", _kernel_init, (1, 1, e),
                           self.param_dtype)
        query = jnp.tile(query.astype(self.dtype), (b, 1, 1))

        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            param_dtype=self.param_dtype, kernel_init=_kernel_init,
            name="cross_attention")
        x = attn(query, x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="ln")(x)
        y = MLPBlock(mlp_dim=self.mlp_dim, out_dim=e,
                     dropout_rate=self.dropout_rate, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="mlp")(
                         y, deterministic=deterministic)
        return x + y
