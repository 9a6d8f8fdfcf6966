"""multi_modal_transformers_tokenmerge_tpu: a TPU-native vision-language-
action transformer framework with token merging (ToMe) and pruning.

TPU-first re-design of maggieHao/multi_modal_transformers_TokenMerge:
JAX / XLA / Pallas / pjit compute path, static sequence layouts, fused
kernels, mesh parallelism, AOT serving.
"""

from .core.config import (
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
from .core.yaml_loader import load_config
from .models.octo import Octo, TokenEmbeddings
from .models.presets import get_preset, octo_base, octo_small, octo_tiny
from .sequence.dsl import TokenSetSpec, parse_sequence
from .sequence.layout import SequenceLayout
from .serve.policy import PolicyEngine
from .train.loop import evaluate, fit, graceful_stop
from .train.state import Metrics, OctoTrainState, create_train_state
from .train.steps import make_train_step

__version__ = "0.1.0"

__all__ = [
    "AttentionConfig", "CategoricalHeadConfig", "ContinuousHeadConfig",
    "DiffusionHeadConfig", "HeadsConfig", "ImageTokenizerConfig",
    "OctoConfig", "ResNetEmbedderConfig", "TextEncoderConfig",
    "TransformerConfig", "load_config", "Octo", "TokenEmbeddings",
    "get_preset", "octo_base", "octo_small", "octo_tiny", "TokenSetSpec",
    "parse_sequence", "SequenceLayout", "PolicyEngine", "evaluate", "fit",
    "graceful_stop", "Metrics", "OctoTrainState", "create_train_state",
    "make_train_step",
]
