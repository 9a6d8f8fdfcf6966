"""Gato-style image tokenizer: patchify -> per-patch ResNetV2 conv embed ->
learned row/col position embeddings with stochastic train-time encoding.

TPU-first design vs the reference (tokenizers/images/image_tokenizer.py):

* one flat conv batch ``(B*F*P, p, p, C)`` instead of vmap-of-vmap so XLA
  sees a single large convolution (MXU-friendly);
* **batch-in-lanes conv layout** (``conv_layout='hwcn'``, the default):
  intermediates are kept logically ``(H, W, C, N)`` so the default
  minor-to-major layout puts the patch-batch dim in lanes — the layout
  XLA's TPU conv emitter itself chooses when free to (measured 153 TF/s
  vs ~20 TF/s channels-minor on the 3x3/64ch blocks, v5e; see
  benchmarks/recorded/embedder_profile_r3.json).  The final Dense then
  contracts without any physical transpose (TN dot);
* position-interval bounds are static constants (see ops/image_ops.py);
* eval-mode position tokens are baked-in constants — zero device compute;
* handles both single-frame (B, H, W, C) and multi-frame (B, F, H, W, C)
  inputs (reference has two near-identical classes, :216 and :313).

Parameter structure (names and shapes) is IDENTICAL across layouts and to
round-2 checkpoints: input_conv/{kernel,bias}, block{i}_norm/{scale,bias},
block{i}_conv/{kernel,bias}, output_dense/{kernel,bias} — kernels HWIO,
dense (in, out) — so compat converters and fidelity goldens are unchanged.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import ImageTokenizerConfig, ResNetEmbedderConfig
from ..ops.image_ops import (
    eval_position_tokens,
    patchify,
    sample_position_tokens,
)
from ..ops.pool import max_pool_hwcn
from ..core.hw import on_tpu

__all__ = ["ResNetV2Embedder", "ImageTokenizer"]


def _conv_hwcn_raw(x, w, strides, padding):
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("HWCN", "HWIO", "HWCN"))
    return jax.lax.conv_general_dilated(
        x, w, strides, padding, dimension_numbers=dn,
        preferred_element_type=x.dtype)


def _fold_s2d(a, sy, sx):
    """Space-to-depth fold of the two leading dims of (H, W, C, last):
    (H, W, C, L) -> (H/sy, W/sx, sy*sx*C, L), phase-major channels."""
    h, w, c, last = a.shape
    a6 = a.reshape(h // sy, sy, w // sx, sx, c, last)
    return a6.transpose(0, 2, 1, 3, 4, 5).reshape(
        h // sy, w // sx, sy * sx * c, last)


def _unfold_s2d(a, sy, sx, c):
    """Inverse of _fold_s2d on a kernel-shaped array."""
    ky, kx, _, last = a.shape
    a6 = a.reshape(ky, kx, sy, sx, c, last)
    return a6.transpose(0, 2, 1, 3, 4, 5).reshape(
        ky * sy, kx * sx, c, last)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _strided_conv_hwcn(x, w, strides):
    """VALID strided HWCN conv whose WEIGHT gradient uses the
    space-to-depth reformulation: the stride-s kernel-k conv folds exactly
    into a stride-1 k/s conv over phase-folded channels, whose wgrad XLA
    handles ~1.5x faster on v5e IN ISOLATION
    (benchmarks/exp_s2d_hwcn.py: 1.86 -> 1.26 ms at octo_base shapes).
    NOTE: currently NOT wired into _ConvHWCN — the measured end-to-end
    train step was unchanged (12.44 vs 12.46 ms/step; the op-level win
    does not survive whole-graph scheduling), and per the round-2 lesson
    we don't ship paths without a measured benefit.  Kept (with tests)
    for larger input-conv regimes where the wgrad dominates."""
    return _conv_hwcn_raw(x, w, strides, "VALID")


def _strided_conv_fwd(x, w, strides):
    return _strided_conv_hwcn(x, w, strides), (x, w)


def _strided_conv_bwd(strides, res, g):
    x, w = res
    sy, sx = strides
    c = x.shape[2]
    _, dx_fn = jax.vjp(lambda x_: _conv_hwcn_raw(x_, w, strides, "VALID"),
                       x)
    dx = dx_fn(g)[0]
    _, dw_fn = jax.vjp(
        lambda w6: _conv_hwcn_raw(_fold_s2d(x, sy, sx), w6, (1, 1),
                                  "VALID"),
        _fold_s2d(w, sy, sx))
    dw = _unfold_s2d(dw_fn(g)[0], sy, sx, c)
    return dx, dw


_strided_conv_hwcn.defvjp(_strided_conv_fwd, _strided_conv_bwd)


class _ConvHWCN(nn.Module):
    """lax conv over (H, W, C, N) operands (batch in lanes).  Parameters
    match nn.Conv exactly: kernel HWIO + bias."""

    features: int
    kernel_size: tuple
    strides: tuple
    padding: str
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):  # x: (H, W, C, N)
        kernel = self.param(
            "kernel", nn.initializers.he_normal(),
            (*self.kernel_size, x.shape[2], self.features),
            self.param_dtype)
        bias = self.param("bias", nn.initializers.normal(),
                          (self.features,), self.param_dtype)
        y = _conv_hwcn_raw(x.astype(self.dtype), kernel.astype(self.dtype),
                           self.strides, self.padding)
        return y + bias.astype(self.dtype)[:, None]


def group_norm_stats_hwcn(f, num_groups: int, epsilon: float,
                          stats_scope: str, frames_patches: int):
    """Statistics + normalization for GroupNorm on an (H, W, C, B*G)
    operand (float32 in, float32 out, NO affine) — shared by the float
    tower (``_GroupNormHWCN``) and the int8 serving mirror
    (serve/quantize.py ``image_embed_int8``) so numerical fixes apply to
    both once.

    Uses flax's fast-variance formula var = E[x^2] - mu^2, CLAMPED at zero
    exactly like flax's ``_compute_stats`` — cancellation on near-constant
    large-magnitude groups drives the raw value negative past epsilon and
    rsqrt would emit NaN.
    """
    h, w, c, bg = f.shape
    g = num_groups
    cpg = c // g
    if stats_scope == "image":
        f6 = f.reshape(h, w, g, cpg, bg // frames_patches, frames_patches)
        axes = (0, 1, 3, 5)
    elif stats_scope == "patch":
        f6 = f.reshape(h, w, g, cpg, bg)
        axes = (0, 1, 3)
    else:
        raise ValueError(f"unknown norm_stats_scope {stats_scope!r}")
    mu = f6.mean(axis=axes, keepdims=True)
    var = jnp.maximum(
        0.0, (f6 * f6).mean(axis=axes, keepdims=True) - mu * mu)
    f6 = (f6 - mu) * jax.lax.rsqrt(var + epsilon)
    return f6.reshape(h, w, c, bg)


class _GroupNormHWCN(nn.Module):
    """GroupNorm on (H, W, C, B*G) operands, float32 statistics, with the
    two stats scopes of the NHWC path:

    * ``stats_scope='image'``: stats per (batch element, group) over all G
      patches and spatial positions — bit-matching flax's default
      reduction on the reference's 6-D call;
    * ``stats_scope='patch'``: stats per (patch, group).

    Parameters match nn.GroupNorm: scale + bias, per channel.
    """

    num_groups: int
    epsilon: float
    stats_scope: str
    frames_patches: int  # G, to split the lane dim (B*G) into (B, G)
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):  # (H, W, C, B*G)
        c = x.shape[2]
        scale = self.param("scale", nn.initializers.ones, (c,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,),
                          self.param_dtype)
        f = group_norm_stats_hwcn(
            x.astype(jnp.float32), self.num_groups, self.epsilon,
            self.stats_scope, self.frames_patches)
        f = (f * scale.astype(jnp.float32)[:, None]
             + bias.astype(jnp.float32)[:, None])
        return f.astype(self.dtype)


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
        c = self.cfg
        layout = c.conv_layout
        if layout == "hwcn":
            return self._call_hwcn(x)
        if layout == "nhwc":
            return self._call_nhwc(x)
        raise ValueError(f"unknown conv_layout {layout!r}")

    def _call_hwcn(self, x):
        c = self.cfg
        b, g, p, _, ch = x.shape
        # (B, G, p, p, C) -> (p, p, C, B*G): batch lands in lanes; the
        # transpose touches only the small normalized patch tensor once
        xt = jnp.transpose(x.reshape(b * g, p, p, ch), (1, 2, 3, 0))
        xt = xt.astype(self.dtype)

        y = _ConvHWCN(c.features, tuple(c.input_kernel),
                      tuple(c.input_stride), "VALID", dtype=self.dtype,
                      param_dtype=self.param_dtype, name="input_conv")(xt)
        pool_vjp = c.pool_vjp
        if pool_vjp == "auto":
            # Measured on v5e (bench.py pool_vjp A/B): XLA's
            # select_and_scatter VJP beats the Pallas backward kernel at
            # embedder shapes (1.49 vs 2.35 ms bf16) — 'auto' = 'xla'.
            pool_vjp = "xla"
        if pool_vjp == "pallas":
            y = max_pool_hwcn(
                y, c.pool_window, c.pool_stride, vjp="pallas",
                interpret=not on_tpu())
        elif pool_vjp == "xla":
            # init must be the PYTHON -inf literal: a traced init defeats
            # the reduce-window max-pool autodiff rule (select_and_scatter)
            y = jax.lax.reduce_window(
                y, -jnp.inf, jax.lax.max, (*c.pool_window, 1, 1),
                (*c.pool_stride, 1, 1), "VALID")
        else:
            raise ValueError(f"unknown pool_vjp {c.pool_vjp!r}")

        residual = y
        for i in range(c.num_blocks):
            y = _GroupNormHWCN(
                num_groups=c.group_norm_groups,
                epsilon=c.group_norm_epsilon,
                stats_scope=c.norm_stats_scope, frames_patches=g,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"block{i}_norm")(y)
            y = nn.gelu(y)
            y = _ConvHWCN(c.features, tuple(c.block_kernel), (1, 1),
                          "SAME", dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          name=f"block{i}_conv")(y)
        y = y + residual

        # Dense without a physical transpose: flatten (h, w, c) — the
        # SAME row order as the NHWC path's reshape — and contract dim 0
        # of both operands (TN dot straight onto the MXU)
        h2, w2, c2, bg = y.shape
        flat_in = h2 * w2 * c2
        dense = _DenseTN(c.output_features, flat_in, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="output_dense")
        out = dense(y.reshape(flat_in, bg))          # (B*G, out)
        return out.reshape(b, g, c.output_features)

    def _call_nhwc(self, x):
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


class _DenseTN(nn.Module):
    """Dense layer consuming (features_in, N) operands: contracts dim 0 of
    the input against dim 0 of the (in, out) kernel — no transpose of the
    activation.  Parameters match nn.Dense exactly."""

    features: int
    features_in: int
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):  # (features_in, N) -> (N, features)
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (self.features_in, self.features),
                            self.param_dtype)
        bias = self.param("bias", nn.initializers.normal(),
                          (self.features,), self.param_dtype)
        out = jax.lax.dot_general(
            x.astype(self.dtype), kernel.astype(self.dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=self.dtype)
        return out + bias.astype(self.dtype)


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
        if h != w:
            raise ValueError(
                f"image must be square (got {h}x{w}): the patch-position "
                f"token tables are built from one spatial dim "
                f"(ops/image_ops.py), matching the reference's square-only "
                f"Gato tokenizer")
        if cfg.resnet.output_features != cfg.embedding_dim:
            raise ValueError(
                f"resnet.output_features ({cfg.resnet.output_features}) != "
                f"embedding_dim ({cfg.embedding_dim}): patch embeddings "
                f"and position embeddings must share a width to be summed")
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
