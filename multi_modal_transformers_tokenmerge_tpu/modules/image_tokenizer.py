"""Gato-style image tokenizer: patchify -> per-patch ResNetV2 conv embed ->
learned row/col position embeddings with stochastic train-time encoding.

TPU-first design vs the reference (tokenizers/images/image_tokenizer.py):

* one flat conv batch ``(B*F*P, p, p, C)`` instead of vmap-of-vmap so XLA
  sees a single large convolution (MXU-friendly);
* position-interval bounds are static constants (see ops/image_ops.py);
* eval-mode position tokens are baked-in constants — zero device compute;
* handles both single-frame (B, H, W, C) and multi-frame (B, F, H, W, C)
  inputs (reference has two near-identical classes, :216 and :313).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..core.config import ImageTokenizerConfig, ResNetEmbedderConfig
from ..ops.image_ops import (
    eval_position_tokens,
    patchify,
    sample_position_tokens,
)

__all__ = ["ResNetV2Embedder", "ImageTokenizer"]


class ResNetV2Embedder(nn.Module):
    """Per-patch conv embedder (reference: image_tokenizer.py:140-178).

    input conv (12x12/2 VALID) -> max_pool (3x3/1) ->
    num_blocks x (GroupNorm -> GELU -> conv 3x3 SAME) -> +residual ->
    flatten -> Dense(output_features).
    """

    cfg: ResNetEmbedderConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, G, p, p, C) — G = frames * patches
        conv_kw = dict(
            use_bias=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.he_normal(),
            bias_init=nn.initializers.normal(),
        )
        c = self.cfg
        # GroupNorm statistic axes: 'image' scope pools over (G, h, w,
        # group-channels) per batch element — bit-matching the reference's
        # flax-default reduction on its (B, F, P, p, p, C) tensor; 'patch'
        # pools over (h, w, group-channels) only.  flax Conv/max_pool treat
        # all leading dims as batch, so keeping (B, G, ...) costs nothing.
        if c.norm_stats_scope == "image":
            norm_axes = None
        elif c.norm_stats_scope == "patch":
            norm_axes = (2, 3, -1)
        else:
            raise ValueError(
                f"unknown norm_stats_scope {c.norm_stats_scope!r}")
        x = nn.Conv(c.features, c.input_kernel, strides=c.input_stride,
                    padding="VALID", name="input_conv", **conv_kw)(x)
        x = nn.max_pool(x, c.pool_window, strides=c.pool_stride,
                        padding="VALID")

        residual = x
        for i in range(c.num_blocks):
            x = nn.GroupNorm(num_groups=c.group_norm_groups,
                             epsilon=c.group_norm_epsilon,
                             reduction_axes=norm_axes,
                             dtype=self.dtype, param_dtype=self.param_dtype,
                             name=f"block{i}_norm")(x)
            x = nn.gelu(x)
            x = nn.Conv(c.features, c.block_kernel, strides=(1, 1),
                        padding="SAME", name=f"block{i}_conv", **conv_kw)(x)
        x = x + residual

        x = x.reshape(*x.shape[:2], -1)
        x = nn.Dense(c.output_features, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     kernel_init=nn.initializers.he_normal(),
                     bias_init=nn.initializers.normal(),
                     name="output_dense")(x)
        return x


class ImageTokenizer(nn.Module):
    """(B, [F,] H, W, C) images -> (B, F*P, E) embeddings."""

    cfg: ImageTokenizerConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        cfg = self.cfg
        squeeze_frames = images.ndim == 4
        if squeeze_frames:
            images = images[:, None]  # (B, 1, H, W, C)
        b, f, h, w, c = images.shape
        if (h, w, c) != tuple(cfg.image_size):
            raise ValueError(
                f"input image shape {(h, w, c)} != configured {cfg.image_size}"
            )
        p = cfg.patch_size
        num_patches = (h // p) * (w // p)

        # --- patchify: (B, F, P, p, p, C), normalized
        patches = patchify(images, p, cfg.normalize, dtype=self.dtype)

        # --- per-patch conv embedding, one (B, F*P) batched conv call
        flat = patches.reshape(b, f * num_patches, p, p, c)
        emb = ResNetV2Embedder(cfg.resnet, dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name="resnet")(flat)

        # --- patch position tokens
        if train:
            key = self.make_rng(cfg.rng_collection)
            rows, cols = sample_position_tokens(
                key, (b, f), h, p, cfg.position_interval)
        else:
            r_np, c_np = eval_position_tokens(h, p, cfg.position_interval)
            rows = jnp.broadcast_to(jnp.asarray(r_np), (b, f, num_patches))
            cols = jnp.broadcast_to(jnp.asarray(c_np), (b, f, num_patches))
        rows = rows.reshape(b, f * num_patches)
        cols = cols.reshape(b, f * num_patches)

        embed_init = nn.initializers.variance_scaling(
            1.0, "fan_in", "normal", out_axis=0)
        row_emb = nn.Embed(cfg.position_interval, cfg.embedding_dim,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           embedding_init=embed_init,
                           name="row_position_embedding")(rows)
        col_emb = nn.Embed(cfg.position_interval, cfg.embedding_dim,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           embedding_init=embed_init,
                           name="col_position_embedding")(cols)

        out = emb + row_emb + col_emb
        return out
