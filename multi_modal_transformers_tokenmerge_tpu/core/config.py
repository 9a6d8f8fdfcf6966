"""Typed, frozen model configuration.

The reference drives every module through Hydra ``DictConfig`` +
``instantiate`` at trace time (reference: models/octo/octo.py:75-87,
attention_blocks/attention.py:32-37), which re-instantiates modules per call
and makes configs unhashable (breaking jit static args).  Here configs are
frozen dataclasses: hashable, comparable, constructed once, and loadable from
the same YAML group shape (see core/yaml_loader.py).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax.numpy as jnp

__all__ = [
    "ResNetEmbedderConfig",
    "ImageTokenizerConfig",
    "TextEncoderConfig",
    "AttentionConfig",
    "TransformerConfig",
    "ContinuousHeadConfig",
    "CategoricalHeadConfig",
    "DiffusionHeadConfig",
    "HeadsConfig",
    "OctoConfig",
]

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


def resolve_dtype(name):
    if not isinstance(name, str):
        return name
    return _DTYPES[name]


class _Replaceable:
    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class ResNetEmbedderConfig(_Replaceable):
    """Gato-style per-patch ResNetV2 conv embedder
    (reference: tokenizers/images/image_tokenizer.py:140-178,
    model_configs/tokenizers/images/gato_resnet.yaml:41-104)."""

    num_blocks: int = 2
    features: int = 64
    input_kernel: Tuple[int, int] = (12, 12)
    input_stride: Tuple[int, int] = (2, 2)
    pool_window: Tuple[int, int] = (3, 3)
    pool_stride: Tuple[int, int] = (1, 1)
    block_kernel: Tuple[int, int] = (3, 3)
    group_norm_groups: int = 32
    group_norm_epsilon: float = 1e-6
    output_features: int = 768
    # GroupNorm statistics scope.  'image' reproduces the reference exactly:
    # flax GroupNorm's default reduction axes on the reference's
    # (B, F, P, p, p, C) patch tensor pool statistics over ALL patches and
    # frames of a batch element (image_tokenizer.py:165 + flax default
    # reduction_axes = every non-leading dim).  'patch' computes standard
    # per-patch stats — each patch normalized independently.
    norm_stats_scope: str = "image"  # 'image' | 'patch'
    # Conv data layout.  'hwcn' (default) keeps intermediates logically
    # (H, W, C, N) so the patch-batch dim sits in lanes — the layout XLA's
    # TPU conv emitter prefers (measured ~7x on the 3x3/64ch blocks vs the
    # channels-minor mid-graph default; benchmarks/recorded/
    # embedder_profile_r3.json).  'nhwc' is the flax-standard path kept
    # for A/B and non-TPU debugging.  Math and parameters are identical.
    conv_layout: str = "hwcn"  # 'hwcn' | 'nhwc'
    # Max-pool backward implementation (hwcn layout only).  'pallas' routes
    # the gradient through ops/pool.py's Pallas kernel instead of XLA's
    # select_and_scatter (~5x its HBM traffic bound at embedder shapes);
    # 'auto' picks pallas on TPU and xla elsewhere; 'xla' keeps the native
    # VJP.  Default pending hardware measurement (round-2 rule: no
    # unmeasured perf defaults).
    pool_vjp: str = "xla"  # 'xla' | 'pallas' | 'auto'


@dataclass(frozen=True)
class ImageTokenizerConfig(_Replaceable):
    """Patchify + stochastic patch-position encoding + conv embed
    (reference: tokenizers/images/image_tokenizer.py:216-397)."""

    image_size: Tuple[int, int, int] = (280, 280, 3)
    patch_size: int = 56
    normalize: bool = True
    position_interval: int = 128
    rng_collection: str = "patch_encoding"
    embedding_dim: int = 768
    resnet: ResNetEmbedderConfig = field(default_factory=ResNetEmbedderConfig)

    @property
    def patches_per_dim(self) -> int:
        return self.image_size[0] // self.patch_size

    @property
    def tokens_per_image(self) -> int:
        return self.patches_per_dim ** 2


@dataclass(frozen=True)
class TextEncoderConfig(_Replaceable):
    """Text encoder selection.

    ``kind='embed'`` is a learned embedding + learned positions
    (reference: tokenizers/text/text_tokenizer.py:49-69);
    ``kind='t5'`` is a frozen T5-style encoder implemented natively
    (reference wraps HF FlaxT5EncoderModel: tokenizers/text/t5_base.py:8-15).
    """

    kind: str = "embed"  # 'embed' | 't5'
    vocab_size: int = 32128
    max_length: int = 16
    embedding_dim: int = 768
    # t5-base architecture knobs (only used when kind == 't5')
    t5_num_layers: int = 12
    t5_num_heads: int = 12
    t5_d_ff: int = 3072
    t5_d_kv: int = 64
    t5_rel_pos_buckets: int = 32
    t5_rel_pos_max_distance: int = 128
    # lax.scan unroll for the block stack; 0 means fully unrolled.  At the
    # 16-token instruction length the measured win of full unroll is ~1.1x
    # on the tower (benchmarks/recorded/t5_unroll_r3.json)
    t5_scan_unroll: int = 1
    frozen: bool = True


@dataclass(frozen=True)
class AttentionConfig(_Replaceable):
    """Multi-head self-attention inside an encoder block
    (reference: model_configs/attention_blocks/vanilla_decoder.yaml:19-31)."""

    num_heads: int = 3
    qkv_features: int = 768
    dropout_rate: float = 0.1
    use_bias: bool = True


@dataclass(frozen=True)
class MoEConfig(_Replaceable):
    """Mixture-of-experts MLP (no reference counterpart — EP capability).

    Dense-dispatch GShard/Switch routing with stacked ``(E, ...)`` expert
    params; expert-parallel over the mesh 'model' axis (parallel/mesh.py).
    """

    num_experts: int = 4
    top_k: int = 1
    capacity_factor: float = 1.25
    router_noise: float = 0.0  # multiplicative jitter width at train time
    aux_loss_weight: float = 0.01


@dataclass(frozen=True)
class TransformerConfig(_Replaceable):
    """Stacked pre-LN encoder blocks
    (reference: attention_blocks/attention.py:41-119)."""

    num_blocks: int = 1
    attention: AttentionConfig = field(default_factory=AttentionConfig)
    mlp_dim: int = 768
    mlp_activation: str = "relu"
    # 'dense' is the reference MLP; 'moe' swaps in the expert-parallel
    # mixture-of-experts block (modules/moe.py) — aux loss is sown under
    # the 'losses' collection (apply with mutable=['losses'] to train it)
    mlp_type: str = "dense"  # 'dense' | 'moe'
    moe: MoEConfig = field(default_factory=MoEConfig)
    dropout_rate: float = 0.1
    layer_norm_epsilon: float = 1e-6
    # 'features' is standard transformer LN.  'sequence_compat' reproduces
    # the reference's committed (nonstandard) LayerNorm over the sequence
    # axis (vanilla_decoder.yaml:10 reduction_axes: [1]) for fidelity runs.
    layer_norm_reduction: str = "features"
    # attention implementation: 'auto' picks the Pallas flash kernel on TPU
    # for sequences >= flash_min_seq (deterministic path), otherwise XLA.
    # The honest device-time crossover on v5e is between 512 (parity) and
    # 1024 (kernel 2.4x fwd / 2x bwd) — docs/KERNELS.md.
    attention_impl: str = "auto"  # 'auto' | 'xla' | 'flash'
    flash_min_seq: int = 1024
    flash_block_q: int = 0  # 0 = measured-on-v5e auto sizing
    flash_block_k: int = 0
    # gradient path for the flash kernel: 'pallas' runs the native dq/dkv
    # kernels (no (B,H,S,S) weights in the backward; ~2x over recompute at
    # S>=1024 on v5e); 'xla' recomputes through XLA attention
    flash_backward: str = "pallas"
    # ToMe token merging: tokens merged per compressible set per layer come
    # from the sequence compression string; this picks merge vs prune.
    compression_mode: str = "none"  # 'none' | 'merge' | 'prune'
    # merge cadence: 1 = inside every block (reference intent); k > 1 groups
    # k equal-shape blocks into one nn.scan between merge events — L/k
    # compilation units instead of L, with the compression string's rate
    # applied per EVENT (hidden-state cosine metric at event boundaries)
    tome_merge_every: int = 1
    # apply ONE extra compression event at the tokenizer boundary (before
    # block/stage 0), using the hidden-state metric over the pos-embedded
    # inputs.  Sheds the same per-set rate as every other event (the
    # compression DSL string), so the longest sequence — the uncompressed
    # image tower output — never reaches the stack at full length.  This
    # closes the dilution the whole-model octo_deep number showed vs the
    # stack-only number (VERDICT r4 item 2: nothing merged where the
    # sequence was longest).
    prestack_merge: bool = False
    # use size-weighted (proportional) attention for merged tokens
    proportional_attention: bool = False
    remat: bool = False
    # final LayerNorm after the block stack.  Default OFF to mirror the
    # reference's StackedEncoder1DBlock (attention.py:87-119, no output
    # norm) — fine at its 1 block, but a deep pre-LN stack's residual
    # stream grows unnormalized with depth (measured std 7.6 at 12
    # blocks) and saturates the tanh action head: bf16 tanh rounds to
    # exactly +-1, its gradient to exactly 0, and training freezes
    # (observed on octo_deep before this flag).  Deep presets set True.
    final_norm: bool = False


@dataclass(frozen=True)
class ContinuousHeadConfig(_Replaceable):
    """Tanh-squashed MSE head (reference: action_heads/continuous.py:12-26)."""

    max_action: float = 1.0
    action_space_dim: int = 8
    pooling: str = "mean"  # 'mean' | 'map' (attention pooling)
    map_num_heads: int = 3


@dataclass(frozen=True)
class CategoricalHeadConfig(_Replaceable):
    """Binned categorical head (reference: action_heads/categorical.py:24-40)."""

    num_bins: int = 256
    max_action: float = 1.0
    action_space_dim: int = 8


@dataclass(frozen=True)
class DiffusionHeadConfig(_Replaceable):
    """DDPM action head (reference: action_heads/diffusion.py:67-209)."""

    diffusion_steps: int = 32
    action_space_dim: int = 8
    time_dim: int = 768
    mlp_dim: int = 768
    num_blocks: int = 1
    dropout_rate: float = 0.1
    clip_value: float = 5.0
    rng_collection: str = "diffusion"
    # 'folded' uses a fresh fold_in key per sampling step (correct);
    # 'reference' reuses the same keys every step, replicating the
    # reference's sampler for fidelity tests (diffusion.py:178 key reuse).
    sampler_rng_mode: str = "folded"
    # 'scan' = XLA lax.scan over steps; 'fused' = single Pallas kernel
    # with weights resident in VMEM (ops/ddpm_sampler.py); 'auto' = fused
    # on TPU when the denoiser shape allows it, scan otherwise.
    sampler_impl: str = "auto"
    # Reduced-step deterministic sampling (DDIM, eta=0) for serving: when
    # set, predict_action runs this many denoiser steps over an evenly
    # subsampled timestep schedule instead of the full diffusion_steps-long
    # DDPM reverse loop.  Training (denoise_loss) is unaffected — the model
    # is still trained on the full schedule, so one checkpoint serves both
    # samplers.  None (default) = the reference's 32-step DDPM.
    ddim_steps: Optional[int] = None
    # How the DDIM direction term treats the clamped x0 prediction:
    # 'raw' keeps the denoiser's eps alongside the clamped x0 (the
    # numerics every recorded DDIM quality table was measured with);
    # 'recompute' re-derives eps from the clamped x0 —
    # eps' = (x - sqrt(a_hat)*clip(x0)) / sqrt(1-a_hat) — the
    # clip_denoised convention of guided-diffusion/diffusers, so the
    # (x0, eps) pair stays consistent when the clamp engages at the
    # highest-noise steps.  Measured on the trained probe the two are
    # within noise of each other (benchmarks/recorded/ddim_eps_r5.json);
    # 'raw' stays default for continuity with the recorded tables.
    ddim_eps_mode: str = "raw"


@dataclass(frozen=True)
class HeadsConfig(_Replaceable):
    continuous: Optional[ContinuousHeadConfig] = None
    categorical: Optional[CategoricalHeadConfig] = None
    diffusion: Optional[DiffusionHeadConfig] = None


@dataclass(frozen=True)
class OctoConfig(_Replaceable):
    """Top-level model config (reference: model_configs/octo_base.yaml)."""

    input_sequence: str = "[TaskDescriptionPrefix{16}] [Image{25};Readout{4}]*2"
    compression_sequence: Optional[str] = None
    token_embedding_dim: int = 768
    num_observation_blocks: int = 2
    tokens_per_readout: int = 4

    text: TextEncoderConfig = field(default_factory=TextEncoderConfig)
    images: ImageTokenizerConfig = field(default_factory=ImageTokenizerConfig)
    transformer: TransformerConfig = field(default_factory=TransformerConfig)
    heads: HeadsConfig = field(
        default_factory=lambda: HeadsConfig(continuous=ContinuousHeadConfig())
    )

    dtype: str = "float32"
    param_dtype: str = "float32"

    @property
    def compute_dtype(self):
        return resolve_dtype(self.dtype)

    @property
    def params_dtype(self):
        return resolve_dtype(self.param_dtype)
