"""Tiny model configs for fast CPU tests."""

from multi_modal_transformers_tokenmerge_tpu.core.config import (
    AttentionConfig,
    CategoricalHeadConfig,
    ContinuousHeadConfig,
    DiffusionHeadConfig,
    HeadsConfig,
    ImageTokenizerConfig,
    OctoConfig,
    ResNetEmbedderConfig,
    TextEncoderConfig,
    TransformerConfig,
)


def octo_micro(**overrides) -> OctoConfig:
    """64x64 single-frame images, 32px patches (4 image tokens), 32-dim."""
    cfg = OctoConfig(
        input_sequence="[TaskDescriptionPrefix{4}] [Image{4};Readout{2}]",
        token_embedding_dim=32,
        num_observation_blocks=1,
        tokens_per_readout=2,
        text=TextEncoderConfig(kind="embed", vocab_size=64, max_length=4,
                               embedding_dim=32),
        images=ImageTokenizerConfig(
            image_size=(64, 64, 3), patch_size=32, position_interval=16,
            embedding_dim=32,
            resnet=ResNetEmbedderConfig(num_blocks=1, features=8,
                                        input_kernel=(8, 8),
                                        input_stride=(4, 4),
                                        group_norm_groups=4,
                                        output_features=32)),
        transformer=TransformerConfig(
            num_blocks=2,
            attention=AttentionConfig(num_heads=2, qkv_features=32),
            mlp_dim=64),
        heads=HeadsConfig(
            continuous=ContinuousHeadConfig(max_action=1.0,
                                            action_space_dim=4),
            categorical=CategoricalHeadConfig(num_bins=16, max_action=1.0,
                                              action_space_dim=2),
            diffusion=DiffusionHeadConfig(diffusion_steps=4,
                                          action_space_dim=4, time_dim=16,
                                          mlp_dim=32)),
    )
    return cfg.replace(**overrides)


def octo_micro_tome(**overrides) -> OctoConfig:
    """Micro config with ToMe merging: 2 frames x 8 image tokens, shed 2/layer."""
    base = octo_micro()
    cfg = base.replace(
        input_sequence="[TaskDescriptionPrefix{4}] [Image{16};Readout{2}]*2",
        compression_sequence="[TaskDescriptionPrefix{0}] [Image{2};Readout{0}]*2",
        num_observation_blocks=2,
        images=base.images.replace(patch_size=16),  # 16 tokens per frame
        transformer=base.transformer.replace(compression_mode="merge"),
    )
    return cfg.replace(**overrides)
