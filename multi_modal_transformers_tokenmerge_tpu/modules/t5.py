"""Native T5 encoder stack (architecture of t5-base).

The reference freezes a randomly-initialized HF ``FlaxT5EncoderModel``
(reference: tokenizers/text/t5_base.py:10-15 — built from ``AutoConfig``,
i.e. *architecture only*, no pretrained weights).  This is the same
architecture implemented directly in flax so the framework has no
HF-hub/network dependency and the whole text tower compiles into the same
XLA program as the rest of the model:

* shared token embedding (no scaling, T5 style),
* relative position bias (bucketed, added to attention logits, computed
  once and shared across layers),
* pre-RMSNorm blocks: self-attention -> residual, ReLU MLP -> residual,
* final RMSNorm.

All matmuls run with ``preferred_element_type=float32`` accumulation via
flax defaults; compute dtype is configurable (bf16 on TPU).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["T5EncoderStack", "relative_position_bucket"]


def relative_position_bucket(relative_position: np.ndarray,
                             num_buckets: int = 32,
                             max_distance: int = 128) -> np.ndarray:
    """T5 bidirectional relative-position bucketing (static, numpy).

    Mirrors the standard T5 formula: half the buckets for each sign, half of
    each devoted to exact offsets, the rest log-spaced up to max_distance.
    """
    ret = np.zeros_like(relative_position)
    n = num_buckets // 2
    ret += (relative_position > 0).astype(np.int64) * n
    rp = np.abs(relative_position)

    max_exact = n // 2
    is_small = rp < max_exact
    val_if_large = max_exact + (
        np.log(np.maximum(rp, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (n - max_exact)
    ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, n - 1)
    ret += np.where(is_small, rp, val_if_large)
    return ret


class T5RMSNorm(nn.Module):
    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],),
                           self.param_dtype)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        x32 = x32 * jax.lax.rsqrt(var + self.epsilon)
        return (x32 * scale.astype(jnp.float32)).astype(self.dtype)


class T5SelfAttention(nn.Module):
    num_heads: int
    d_kv: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias):  # x: (B, T, D); bias: (1, H, T, T)
        h, d = self.num_heads, self.d_kv
        # q|k|v as ONE 768x(3*h*d) matmul: at short sequences (T=16 -> 512
        # rows at b32) the three separate projections each re-read the
        # activations without amortizing their weight loads; the fused dot
        # measured 1.09x on the tower (benchmarks/recorded/t5_qkv_r3.json).
        # T5 uses unscaled queries, so q needs no 1/sqrt(d) epilogue.
        qkv = nn.DenseGeneral(features=(3, h, d), axis=-1, use_bias=False,
                              dtype=self.dtype, param_dtype=self.param_dtype,
                              name="qkv")(x)  # (B, T, 3, H, D)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits + position_bias.astype(jnp.float32)
        weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        return nn.DenseGeneral(features=x.shape[-1], axis=(-2, -1),
                               use_bias=False, dtype=self.dtype,
                               param_dtype=self.param_dtype, name="o")(out)


class T5Block(nn.Module):
    num_heads: int
    d_kv: int
    d_ff: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias):
        y = T5RMSNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                      name="attn_norm")(x)
        y = T5SelfAttention(self.num_heads, self.d_kv, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="attn")(
                                y, position_bias)
        x = x + y

        y = T5RMSNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                      name="mlp_norm")(x)
        y = nn.Dense(self.d_ff, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="wi")(y)
        y = nn.relu(y)
        y = nn.Dense(x.shape[-1], use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="wo")(y)
        return x + y, None


class T5EncoderStack(nn.Module):
    vocab_size: int = 32128
    d_model: int = 768
    num_layers: int = 12
    num_heads: int = 12
    d_kv: int = 64
    d_ff: int = 3072
    rel_pos_buckets: int = 32
    rel_pos_max_distance: int = 128
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    # lax.scan unroll factor for the block stack: at short sequences the
    # per-iteration dispatch dominates, so partially unrolling lets XLA
    # fuse/pipeline across blocks at some compile-time cost
    scan_unroll: int = 1

    @nn.compact
    def __call__(self, token_ids):  # (B, T) int32
        t = token_ids.shape[1]
        x = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     embedding_init=nn.initializers.normal(1.0),
                     name="token_embedding")(token_ids)

        # static bucket table -> learned per-head bias, shared by all layers
        pos = np.arange(t)
        buckets = relative_position_bucket(
            pos[None, :] - pos[:, None],
            num_buckets=self.rel_pos_buckets,
            max_distance=self.rel_pos_max_distance,
        )  # (T, T)
        bias_table = nn.Embed(self.rel_pos_buckets, self.num_heads,
                              dtype=self.dtype, param_dtype=self.param_dtype,
                              name="relative_attention_bias")(
                                  jnp.asarray(buckets))
        position_bias = jnp.transpose(bias_table, (2, 0, 1))[None]  # (1,H,T,T)

        # scan over identical blocks — one compiled block body
        stack = nn.scan(
            T5Block,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=nn.broadcast,
            length=self.num_layers,
            unroll=self.scan_unroll,
        )(self.num_heads, self.d_kv, self.d_ff, dtype=self.dtype,
          param_dtype=self.param_dtype, name="blocks")
        x, _ = stack(x, position_bias)

        return T5RMSNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                         name="final_norm")(x)
