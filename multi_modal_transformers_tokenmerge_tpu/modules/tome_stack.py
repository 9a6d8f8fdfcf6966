"""Compressed transformer stack: ToMe merging or attention-score pruning
between layers, with statically shrinking per-layer sequence layouts.

This is the working realization of the reference's unfinished token
compression subsystem (reference: attention_blocks/tome_attention.py:249-256
— merge intent using key means; attention_blocks/compressed_attention.py:302-308
— pruning by mean attention weight; tokenizers/token_sequencer.py:222-238 —
per-layer layouts from the compression DSL).

Design (TPU-first, all shapes static):

* Layer ``l`` consumes ``S_l`` tokens and produces ``S_{l+1}`` tokens; the
  per-layer token counts come from the compression DSL, so every layer
  compiles with fixed shapes.
* Compression happens between attention and MLP (ToMe paper placement): the
  residual stream is merged/pruned, so the MLP also runs on the shrunk
  sequence.
* Merging is **per token set** — only sets with a nonzero compression rate
  (e.g. ``Image{2}``) are touched, so text/readout tokens are protected.
  Within-set reordering is safe because masks are set-granular.
* Merge metric is the attention-key mean over heads (reference intent,
  tome_attention.py:253); importance for pruning is the mean attention
  weight over heads and queries (compressed_attention.py:302-305).
* ``merge_wavg`` size tracking (token_compression.py:114-129) carries
  through the whole stack; optional proportional attention adds
  ``log(size)`` to the logits.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import TransformerConfig
from ..ops.pruning import prune_gather, topk_tokens_per_set
from ..ops.tome import bipartite_soft_matching, merge_wavg
from ..sequence.layout import SequenceLayout
from .attention import MLPBlock, AddPositionEmbedding, _bias_init, _kernel_init

__all__ = ["CompressedEncoderBlock", "CompressedTransformerStack"]


def _merge_sets(x, size, metric, layout: SequenceLayout, layer: int):
    """Per-set ToMe merge of the residual stream.

    x: (B, S_l, E); size: (B, S_l, 1); metric: (B, S_l, D).
    Returns (B, S_{l+1}, E), (B, S_{l+1}, 1).

    Uses 'stable' match ordering (original token order preserved, no full
    argsort) — valid because masks are set-granular, so within-set order is
    free.
    """
    slices = layout.set_slices(layer)
    next_counts = layout.set_counts_at_layer(layer + 1)
    xs, sizes = [], []
    for (start, n), n_next in zip(slices, next_counts):
        x_i = x[:, start:start + n]
        s_i = size[:, start:start + n]
        r = n - n_next
        if r > 0:
            plan = bipartite_soft_matching(metric[:, start:start + n], r,
                                           ordering="stable")
            x_i, s_i = merge_wavg(plan, x_i, s_i)
        xs.append(x_i)
        sizes.append(s_i)
    return jnp.concatenate(xs, axis=1), jnp.concatenate(sizes, axis=1)


def _prune_sets(x, size, importance, layout: SequenceLayout, layer: int):
    """Per-set top-k pruning of the residual stream."""
    keep_idx = topk_tokens_per_set(
        importance, layout.set_slices(layer),
        layout.set_counts_at_layer(layer + 1))
    return prune_gather(x, keep_idx), prune_gather(size, keep_idx)


class CompressedEncoderBlock(nn.Module):
    """Pre-LN encoder block that shrinks the sequence between attention and
    MLP.  Explicit attention weights (needed for the pruning importance
    signal and proportional attention)."""

    cfg: TransformerConfig
    layout: SequenceLayout
    layer: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, size, deterministic: bool = True):
        c = self.cfg
        a = c.attention
        head_dim = a.qkv_features // a.num_heads
        mask = jnp.asarray(self.layout.attention_mask(self.layer))

        # same LN reduction policy as EncoderBlock (attention.py) so
        # compressed and uncompressed stacks honor the same config
        ln_axes = (1,) if c.layer_norm_reduction == "sequence_compat" else -1
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_epsilon,
                                       reduction_axes=ln_axes,
                                       dtype=self.dtype,
                                       param_dtype=self.param_dtype,
                                       name=name)
        proj = lambda name: nn.DenseGeneral(
            features=(a.num_heads, head_dim), axis=-1, use_bias=a.use_bias,
            dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=_kernel_init, bias_init=_bias_init, name=name)

        y = ln("ln_attention")(x)
        q, k, v = proj("query")(y), proj("key")(y), proj("value")(y)

        # explicit attention weights are only needed for the pruning
        # importance signal, proportional attention, or weight dropout;
        # otherwise use XLA's fused attention (cheaper to run AND compile —
        # each compressed layer is a distinct-shape compilation unit)
        need_weights = (c.compression_mode == "prune"
                        or c.proportional_attention
                        or (a.dropout_rate > 0.0 and not deterministic))
        if need_weights:
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            logits = logits / np.sqrt(head_dim)
            if c.proportional_attention:
                logits = logits + jnp.log(size)[:, None, :, 0][:, :, None, :]
            logits = jnp.where(mask[None, None], logits,
                               jnp.finfo(jnp.float32).min)
            weights = jax.nn.softmax(logits, axis=-1)
            # the pruning importance reads the PRE-dropout weights: token
            # selection should follow attention content, not which entries
            # this step's dropout mask happened to zero (post-dropout
            # importance also skews train-time selection vs eval)
            clean_weights = weights
            if a.dropout_rate > 0.0 and not deterministic:
                weights = nn.Dropout(a.dropout_rate)(
                    weights, deterministic=deterministic)
            attn_out = jnp.einsum("bhqk,bkhd->bqhd",
                                  weights.astype(self.dtype), v)
        else:
            clean_weights = None
            attn_out = jax.nn.dot_product_attention(
                q, k, v, mask=mask[None, None])

        y = nn.DenseGeneral(features=x.shape[-1], axis=(-2, -1),
                            use_bias=a.use_bias, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            kernel_init=_kernel_init, bias_init=_bias_init,
                            name="out")(attn_out)
        y = nn.Dropout(c.dropout_rate)(y, deterministic=deterministic)
        x = x + y

        # ---- compression between attention and MLP ----
        if c.compression_mode == "merge":
            metric = jnp.mean(k, axis=-2)  # key mean over heads (B, S, D)
            x, size = _merge_sets(x, size, metric, self.layout, self.layer)
        elif c.compression_mode == "prune":
            importance = jnp.mean(clean_weights, axis=(1, 2))  # (B, K)
            x, size = _prune_sets(x, size, importance, self.layout, self.layer)
        else:
            raise ValueError(
                f"unknown compression mode {c.compression_mode!r}")

        y = ln("ln_mlp")(x)
        if c.mlp_type == "moe":
            from .moe import MoEMLPBlock
            y, aux = MoEMLPBlock(c.moe, mlp_dim=c.mlp_dim,
                                 out_dim=x.shape[-1],
                                 activation=c.mlp_activation,
                                 dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="moe")(y, deterministic=deterministic)
            y = nn.Dropout(c.dropout_rate)(y, deterministic=deterministic)
            # pre-weighted ready-to-add objective term, same contract as
            # TransformerStack (train/steps.py sums the 'losses' collection)
            self.sow("losses", "moe_aux",
                     aux * jnp.float32(c.moe.aux_loss_weight),
                     reduce_fn=lambda s, b: s + b,
                     init_fn=lambda: jnp.zeros((), jnp.float32))
            return x + y, size
        y = MLPBlock(mlp_dim=c.mlp_dim, out_dim=x.shape[-1],
                     dropout_rate=c.dropout_rate, activation=c.mlp_activation,
                     dtype=self.dtype, param_dtype=self.param_dtype,
                     name="mlp")(y, deterministic=deterministic)
        return x + y, size


class CompressedTransformerStack(nn.Module):
    """Compressed stack with configurable merge cadence.

    ``tome_merge_every == 1``: compression inside every block (per-layer
    shrinking shapes — Python-unrolled, one compilation unit per layer).

    ``tome_merge_every == k > 1``: blocks between merge events share shapes,
    so each group of k blocks runs as ONE nn.scan (L/k compilation units —
    the remote-compile cost of deep stacks drops k-fold) with a standalone
    per-set ToMe merge (hidden-state cosine metric) between groups.  The
    compression string's per-layer rate is applied per EVENT BOUNDARY
    (between consecutive stages), so a 12-block stack with ``Image{1}``
    and k=4 runs 3 stages and sheds 1 image token per set at each of the
    2 boundaries between them.

    ``prestack_merge``: one extra event at the tokenizer boundary (before
    block/stage 0), hidden-state metric over the pos-embedded inputs —
    the 12-block ``Image{1}`` k=4 example then sheds at 3 points and
    stage 0 already runs on the shrunk sequence.
    """

    cfg: TransformerConfig
    layout: SequenceLayout
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.cfg.compression_mode == "merge":
            from ..sequence.layout import KIND_TEXT
            causal = [f"{s.kind}{{{s.num_tokens}}}" for s in self.layout.sets
                      if s.compressed_per_layer > 0 and s.kind == KIND_TEXT]
            if causal:
                raise ValueError(
                    f"ToMe merge reorders tokens within a set, which breaks "
                    f"causal intra-attention: {causal} are causal sets with "
                    f"a nonzero compression rate.  Use compression_mode="
                    f"'prune' (order-preserving per-set top-k) for causal "
                    f"sets, or zero their rate in the compression string.")

        if self.cfg.compression_mode not in ("merge", "prune"):
            raise ValueError(
                f"unknown compression mode {self.cfg.compression_mode!r}")
        x = AddPositionEmbedding(name="posembed_input")(x)
        size = jnp.ones_like(x[..., :1])
        # tokenizer-boundary compression (cfg.prestack_merge): one event
        # BEFORE block/stage 0 over the pos-embedded inputs, so the
        # longest (uncompressed-image) sequence never reaches the stack.
        # Every later block/stage then runs one event further down the
        # DSL's schedule (the `off` index shift below).
        off = 1 if self.cfg.prestack_merge else 0
        if off:
            if self.cfg.compression_mode == "merge":
                x, size = _merge_sets(x, size, x, self.layout, 0)
            else:
                importance = jnp.linalg.norm(x.astype(jnp.float32), axis=-1)
                x, size = _prune_sets(x, size, importance, self.layout, 0)
        k = self.cfg.tome_merge_every
        if k <= 1:
            if self.cfg.attention_impl == "flash":
                raise ValueError(
                    "attention_impl='flash' is incompatible with per-layer "
                    "compressed blocks (they materialize attention weights "
                    "for the importance/metric signals); use the staged "
                    "path (tome_merge_every > 1) for flash attention, or "
                    "attention_impl='auto'")
            block_cls = CompressedEncoderBlock
            if self.cfg.remat:
                block_cls = nn.remat(CompressedEncoderBlock,
                                     static_argnums=(3,))
            for layer in range(self.cfg.num_blocks):
                x, size = block_cls(
                    self.cfg, self.layout, layer + off, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"block_{layer}")(
                        x, size, deterministic)
            return self._maybe_final_norm(x)

        if self.cfg.proportional_attention:
            raise ValueError(
                "proportional_attention requires per-layer compressed "
                "blocks (tome_merge_every=1): the staged path's scanned "
                "EncoderBlocks do not thread token sizes into the "
                "attention logits, so the option would be silently inert")
        from .attention import EncoderBlock, select_attention_fn

        num_stages = -(-self.cfg.num_blocks // k)
        layer = 0
        for stage in range(num_stages):
            blocks_here = min(k, self.cfg.num_blocks - layer)
            mask_np = self.layout.attention_mask(stage + off)
            # each stage's mask is a static numpy constant, so the stage can
            # run the Pallas flash kernel when configured — ToMe merging
            # between flash-attention blocks, per-stage shrinking layouts
            attention_fn = select_attention_fn(
                self.cfg, mask_np, self.layout.tokens_at_layer(stage + off))
            block_cls = EncoderBlock
            if self.cfg.remat:
                # honor cfg.remat here too — without this the staged path
                # (the deep-stack regime remat exists for) silently stored
                # every block's activations
                block_cls = nn.remat(EncoderBlock, static_argnums=(3,))
            stack = nn.scan(
                block_cls,
                variable_axes={"params": 0, "intermediates": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=blocks_here,
            )(self.cfg, dtype=self.dtype, param_dtype=self.param_dtype,
              attention_fn=attention_fn, name=f"stage_{stage}")
            x, aux = stack(x, jnp.asarray(mask_np), deterministic)
            if aux is not None:  # per-layer MoE balance losses of the stage
                self.sow("losses", "moe_aux",
                         jnp.sum(aux) * jnp.float32(
                             self.cfg.moe.aux_loss_weight),
                         reduce_fn=lambda s, b: s + b,
                         init_fn=lambda: jnp.zeros((), jnp.float32))
            layer += blocks_here
            if stage < num_stages - 1:
                if self.cfg.compression_mode == "merge":
                    # standalone merge event: hidden-state cosine metric
                    x, size = _merge_sets(x, size, x, self.layout,
                                          stage + off)
                else:
                    # standalone prune event: hidden-state L2-norm
                    # importance (attention weights aren't exposed by the
                    # scanned stage; norm pruning is the standard stand-in)
                    importance = jnp.linalg.norm(
                        x.astype(jnp.float32), axis=-1)
                    x, size = _prune_sets(x, size, importance, self.layout,
                                          stage + off)
        return self._maybe_final_norm(x)

    def _maybe_final_norm(self, x):
        # cfg.final_norm: see core/config.py — deep pre-LN stacks saturate
        # the tanh head without an output norm
        if not self.cfg.final_norm:
            return x
        return nn.LayerNorm(epsilon=self.cfg.layer_norm_epsilon,
                            dtype=self.dtype, param_dtype=self.param_dtype,
                            name="final_norm")(x)

    def final_layer(self) -> int:
        """Stage/layer index of the output layout (for readout slicing)."""
        off = 1 if self.cfg.prestack_merge else 0
        k = self.cfg.tome_merge_every
        if k <= 1:
            return self.cfg.num_blocks + off
        return -(-self.cfg.num_blocks // k) - 1 + off
