"""Legacy model families rebuilt TPU-first.

Functional equivalents of the reference's deprecated models
(reference: models/deprecated/):

* :class:`GatoConceptLearner`   — ConceptLearnerV1 (concept_learner.py:106):
  GATO-style decoder over text + interleaved (image-tokens, action-token)
  observation blocks with a padding-based attention mask.
* :class:`SingleImageConceptLearner` — ConceptLearnerV2 (:177), including a
  *working* ``compute_attention_map`` (the reference's reads kernel weights
  off the class object, :249-253, which is not executable).
* :class:`ConceptLearnerMetaLoss` — (:267): text+image+action -> |scalar|.
* :class:`ConceptPlanner` — (concept_planner.py:135): next-token logits +
  state value + greedy autoregressive concept generation, with the
  generation loop as a single jitted ``lax.scan`` instead of the
  reference's Python loop (:214-255).
* :class:`VisualConceptPlanner` — (visual_concept_planner.py:8-13): a
  struct of planner/learner train states.
* :class:`PointCloudTransformer` — (pointcloud_transformer.py:21-90):
  LBR x2 -> SampleAndGroup x2 -> OffsetAttention x4 -> concat.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from ..core.config import AttentionConfig, ImageTokenizerConfig, \
    ResNetEmbedderConfig, TextEncoderConfig, TransformerConfig
from ..modules.attention import EncoderBlock
from ..modules.image_tokenizer import ImageTokenizer
from ..modules.offset_attention import OffsetAttention
from ..modules.pointcloud import SampleAndGroup
from ..modules.text import EmbedTextEncoder
from ..modules.value_tokenizer import ActionTokenizer

__all__ = [
    "ConceptLearnerConfig",
    "GatoConceptLearner",
    "SingleImageConceptLearner",
    "ConceptLearnerMetaLoss",
    "ConceptPlanner",
    "VisualConceptPlanner",
    "PointCloudTransformer",
]


@dataclass(frozen=True)
class ConceptLearnerConfig:
    text: TextEncoderConfig = field(default_factory=lambda: TextEncoderConfig(
        kind="embed", vocab_size=256, max_length=8, embedding_dim=64))
    images: ImageTokenizerConfig = field(
        default_factory=lambda: ImageTokenizerConfig(
            image_size=(64, 64, 3), patch_size=32, position_interval=16,
            embedding_dim=64,
            resnet=ResNetEmbedderConfig(
                num_blocks=1, features=8, input_kernel=(8, 8),
                input_stride=(4, 4), group_norm_groups=4,
                output_features=64)))
    transformer: TransformerConfig = field(
        default_factory=lambda: TransformerConfig(
            num_blocks=2,
            attention=AttentionConfig(num_heads=2, qkv_features=64),
            mlp_dim=128))
    num_actions: int = 32
    max_seq_len: int = 4  # observation blocks per episode
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def _padding_attention_mask(valid: jax.Array) -> jax.Array:
    """(B, S) validity -> (B, 1, S, S) boolean attention mask
    (reference: concept_learner.py:42-75 without the per-head repeat —
    heads broadcast)."""
    return (valid[:, :, None] & valid[:, None, :])[:, None]


class _EncoderStackLoop(nn.Module):
    """Unrolled encoder blocks sharing the legacy call signature."""

    cfg: TransformerConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        for i in range(self.cfg.num_blocks):
            x, _ = EncoderBlock(self.cfg, dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name=f"block_{i}")(x, mask, not train)
        return x


def make_concept_learner(version: str, cfg: "ConceptLearnerConfig"):
    """Version dispatch (reference: concept_learner.py:92-103
    ConceptLearner.initialize_from_config): 'v1' is the GATO-style
    multi-observation decoder, 'v2' the single-image variant."""
    if version == "v1":
        return GatoConceptLearner(cfg)
    if version == "v2":
        return SingleImageConceptLearner(cfg)
    raise NotImplementedError(f"ConceptLearner version {version!r}")


class GatoConceptLearner(nn.Module):
    """Decoder over [text, (image-tokens, action-token) x T] sequences,
    predicting the next action's logits at the episode's frontier."""

    cfg: ConceptLearnerConfig

    @nn.compact
    def __call__(self, text, images, actions, train: bool = False):
        c = self.cfg
        b = text.shape[0]
        text_emb = EmbedTextEncoder(c.text, dtype=c.dtype,
                                    param_dtype=c.param_dtype,
                                    name="text_encoder")(text)
        img_emb = ImageTokenizer(c.images, dtype=c.dtype,
                                 param_dtype=c.param_dtype,
                                 name="image_encoder")(images, train=train)
        # (B, T*P, E) -> (B, T, P, E)
        t = images.shape[1]
        p = img_emb.shape[1] // t
        img_emb = img_emb.reshape(b, t, p, -1)
        act_emb = ActionTokenizer(c.num_actions, c.images.embedding_dim,
                                  dtype=c.dtype, param_dtype=c.param_dtype,
                                  name="action_tokenizer")(actions)

        # interleave: each observation block = [image tokens..., action]
        obs = jnp.concatenate([img_emb, act_emb[:, :, None, :]], axis=2)
        obs_positions = jnp.arange(p + 1)
        obs_pos_emb = nn.Embed(p + 1, obs.shape[-1], dtype=c.dtype,
                               param_dtype=c.param_dtype,
                               name="observation_position_embedding")(
                                   obs_positions)
        obs = obs + obs_pos_emb[None, None]
        obs = obs.reshape(b, t * (p + 1), -1)
        x = jnp.concatenate([text_emb, obs], axis=1)

        # padding mask: action id 0 marks an unfilled observation block
        obs_valid = jnp.repeat(actions != 0, p + 1, axis=-1)
        text_valid = jnp.ones((b, text_emb.shape[1]), dtype=bool)
        mask = _padding_attention_mask(
            jnp.concatenate([text_valid, obs_valid], axis=-1))

        x = _EncoderStackLoop(c.transformer, dtype=c.dtype,
                              param_dtype=c.param_dtype,
                              name="transformer")(x, mask, train)
        logits = nn.Dense(c.num_actions, dtype=c.dtype,
                          param_dtype=c.param_dtype, name="output_dense")(x)

        # frontier: position of the action slot in the first unfilled block
        # (reference: concept_learner.py:77-89)
        target_block = jnp.argmax(actions == 0, axis=-1)
        target_idx = text_emb.shape[1] + (target_block + 1) * (p + 1) - 1
        return logits[jnp.arange(b), target_idx]


class SingleImageConceptLearner(nn.Module):
    """Text + single-image encoder with a flattened classification head."""

    cfg: ConceptLearnerConfig

    def setup(self):
        c = self.cfg
        self.text_encoder = EmbedTextEncoder(c.text, dtype=c.dtype,
                                             param_dtype=c.param_dtype)
        self.image_encoder = ImageTokenizer(c.images, dtype=c.dtype,
                                            param_dtype=c.param_dtype)
        self.transformer = _EncoderStackLoop(c.transformer, dtype=c.dtype,
                                             param_dtype=c.param_dtype)
        self.output_dense = nn.Dense(c.num_actions, dtype=c.dtype,
                                     param_dtype=c.param_dtype)

    def _embed(self, text, images, train):
        text_emb = self.text_encoder(text)
        img_emb = self.image_encoder(images, train=train)
        return jnp.concatenate([text_emb, img_emb], axis=1)

    def __call__(self, text, images, train: bool = False):
        x = self._embed(text, images, train)
        x = self.transformer(x, None, train)
        x = x.reshape(x.shape[0], -1)
        return self.output_dense(x)


def attention_importance(model, variables, text, images, layer: int = 0):
    """Per-token importance at ``layer``: mean attention weight received
    over heads and queries, renormalized to sum to 1 — the *working*
    equivalent of the reference's attention-map probe
    (reference: concept_learner.py:220-264, which reads kernel attributes
    off the class object and cannot execute).

    Works for any model whose encoder blocks use
    modules.attention.MultiHeadAttention: attention weights are sown into
    the 'intermediates' collection when requested.
    """
    _, inter = model.apply(variables, text, images,
                           mutable=["intermediates"])

    # locate the requested block's sown weights
    def find(tree, needle):
        hits = []
        def rec(node, path):
            if isinstance(node, dict):
                for k, v in node.items():
                    rec(v, path + (k,))
            else:
                hits.append((path, node))
        rec(tree, ())
        return [v for p, v in hits if needle in "/".join(map(str, p))
                and "attention_weights" in "/".join(map(str, p))]

    weights = find(inter["intermediates"], f"block_{layer}")
    w = None
    if weights:
        w = weights[0][0] if isinstance(weights[0], tuple) else weights[0]
    else:
        # scanned stacks (modules.attention.TransformerStack) record ONE
        # stacked entry of shape (num_blocks, B, H, Q, K) under 'blocks'
        # instead of per-layer 'block_<i>' names
        stacked = find(inter["intermediates"], "attention_weights")
        if stacked:
            s = stacked[0][0] if isinstance(stacked[0], tuple) else stacked[0]
            if s.ndim == 5:
                if not 0 <= layer < s.shape[0]:
                    raise ValueError(
                        f"layer {layer} out of range for a "
                        f"{s.shape[0]}-block stack")
                w = s[layer]
    if w is None:
        raise ValueError(f"no attention weights recorded for layer {layer}")
    # (B, H, Q, K) -> mean over heads and queries -> (B, K)
    importance = jnp.mean(w, axis=(1, 2))
    return importance / jnp.sum(importance, axis=-1, keepdims=True)


class ConceptLearnerMetaLoss(nn.Module):
    """text + image + action -> |scalar| meta-loss
    (reference: concept_learner.py:267-311)."""

    cfg: ConceptLearnerConfig

    @nn.compact
    def __call__(self, text, images, actions, train: bool = False):
        c = self.cfg
        text_emb = EmbedTextEncoder(c.text, dtype=c.dtype,
                                    param_dtype=c.param_dtype,
                                    name="text_encoder")(text)
        img_emb = ImageTokenizer(c.images, dtype=c.dtype,
                                 param_dtype=c.param_dtype,
                                 name="image_encoder")(images, train=train)
        act_emb = ActionTokenizer(c.num_actions, c.images.embedding_dim,
                                  dtype=c.dtype, param_dtype=c.param_dtype,
                                  name="action_tokenizer")(actions)
        x = jnp.concatenate([text_emb, img_emb, act_emb[:, None, :]], axis=1)
        x = _EncoderStackLoop(c.transformer, dtype=c.dtype,
                              param_dtype=c.param_dtype,
                              name="transformer")(x, None, train)
        x = x.reshape(x.shape[0], -1)
        loss = nn.Dense(1, dtype=c.dtype, param_dtype=c.param_dtype,
                        name="output_dense")(x)
        return jnp.abs(loss)


class ConceptPlanner(nn.Module):
    """VLM planner: [image tokens, text tokens] -> next-token logits +
    state value; greedy autoregressive concept generation as one lax.scan
    (reference: concept_planner.py:135-255)."""

    cfg: ConceptLearnerConfig

    def setup(self):
        c = self.cfg
        self.text_encoder = EmbedTextEncoder(c.text, dtype=c.dtype,
                                             param_dtype=c.param_dtype)
        self.image_encoder = ImageTokenizer(c.images, dtype=c.dtype,
                                            param_dtype=c.param_dtype)
        self.transformer = _EncoderStackLoop(c.transformer, dtype=c.dtype,
                                             param_dtype=c.param_dtype)
        self.token_logit_head = nn.Dense(c.text.vocab_size, dtype=c.dtype,
                                         param_dtype=c.param_dtype)
        self.state_value_head = nn.Dense(1, dtype=c.dtype,
                                         param_dtype=c.param_dtype)
        self.num_image_tokens = c.images.tokens_per_image

    def _contextual(self, images, text, train):
        img_emb = self.image_encoder(images, train=train)
        text_emb = self.text_encoder(text)
        x = jnp.concatenate([img_emb, text_emb], axis=1)
        img_valid = jnp.ones((x.shape[0], img_emb.shape[1]), dtype=bool)
        mask = _padding_attention_mask(
            jnp.concatenate([img_valid, text != 0], axis=-1))
        return self.transformer(x, mask, train)

    def _next_token_idx(self, text):
        # first pad position in text = next token slot
        # (reference: concept_planner.py:127-130)
        return self.num_image_tokens + jnp.argmax(text == 0, axis=-1)

    def predict_next_token_logits(self, images, text, train: bool = False):
        ctx = self._contextual(images, text, train)
        idx = self._next_token_idx(text)
        logits = self.token_logit_head(ctx)
        return logits[jnp.arange(logits.shape[0]), idx]

    def __call__(self, images, text, train: bool = False):
        ctx = self._contextual(images, text, train)
        idx = self._next_token_idx(text)
        logits = self.token_logit_head(ctx)[jnp.arange(text.shape[0]), idx]
        next_token = jnp.argmax(logits, axis=-1)
        log_prob = jax.nn.log_softmax(logits, axis=-1)[
            jnp.arange(text.shape[0]), next_token]
        value = self.state_value_head(ctx.reshape(ctx.shape[0], -1))
        return next_token, log_prob, value

    def predict_concept_and_value(self, images, max_length: int = 4,
                                  terminate_token: int = 5,
                                  train: bool = False):
        """Greedy autoregressive generation, jit-compatible: fixed
        ``max_length`` steps via lax.scan with in-place token updates."""
        b = images.shape[0]

        def step(carry, idx):
            text, log_probs, done = carry
            ctx = self._contextual(images, text, train)
            pos = self._next_token_idx(text)
            logits = self.token_logit_head(ctx)[jnp.arange(b), pos]
            token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            lp = jax.nn.log_softmax(logits, axis=-1)[jnp.arange(b), token]
            token = jnp.where(done, 0, token)
            lp = jnp.where(done, 0.0, lp)
            text = text.at[jnp.arange(b), idx].set(token)
            log_probs = log_probs + lp
            done = done | (token == terminate_token)
            return (text, log_probs, done), ()

        text0 = jnp.zeros((b, max_length), jnp.int32)
        # state value from the empty-text context
        # (reference evaluates it at idx==0, concept_planner.py:226-227)
        ctx0 = self._contextual(images, text0, train)
        value = self.state_value_head(ctx0.reshape(b, -1))

        (text, log_probs, _), _ = jax.lax.scan(
            step,
            (text0, jnp.zeros((b,), jnp.float32), jnp.zeros((b,), bool)),
            jnp.arange(max_length))
        return text, log_probs, value


@flax.struct.dataclass
class VisualConceptPlanner:
    """Pair of train states for the planner + learner
    (reference: visual_concept_planner.py:8-13)."""

    planner_state: Any
    learner_state: Any


@dataclass(frozen=True)
class PointCloudTransformerConfig:
    lbr_features: Tuple[int, int] = (64, 64)
    sample1: Tuple[int, int, int] = (512, 32, 128)   # (samples, knn, embed)
    sample2: Tuple[int, int, int] = (256, 32, 256)
    attention_heads: int = 4
    attention_layers: int = 4
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32


class PointCloudTransformer(nn.Module):
    """PCT: LBR x2 -> SampleAndGroup x2 -> OffsetAttention x4 -> concat
    (reference: pointcloud_transformer.py:21-90)."""

    cfg: PointCloudTransformerConfig = PointCloudTransformerConfig()

    @nn.compact
    def __call__(self, points, key, train: bool = False):
        c = self.cfg
        x = points  # (B, N, F); first 3 features are xyz
        for i, feats in enumerate(c.lbr_features):
            y = nn.DenseGeneral(feats, axis=-1, dtype=c.dtype,
                                param_dtype=c.param_dtype,
                                kernel_init=nn.initializers.xavier_uniform(),
                                name=f"lbr{i}_dense")(x)
            y = nn.BatchNorm(use_running_average=not train, dtype=c.dtype,
                             param_dtype=c.param_dtype,
                             name=f"lbr{i}_bn")(y)
            y = nn.relu(y)
            # keep xyz as the leading features for downstream FPS/kNN
            x = jnp.concatenate([x[..., :3], y], axis=-1)

        k1, k2 = jax.random.split(key)
        sg1 = SampleAndGroup(*c.sample1, dtype=c.dtype,
                             param_dtype=c.param_dtype, name="sample_group1")
        x = jax.vmap(lambda p: sg1(p, k1, train))(x)
        sg2 = SampleAndGroup(*c.sample2, dtype=c.dtype,
                             param_dtype=c.param_dtype, name="sample_group2")
        x = jax.vmap(lambda p: sg2(p, k2, train))(x)
        x = x[..., 3:]  # drop the carried xyz before attention

        outputs = []
        for i in range(c.attention_layers):
            x = OffsetAttention(num_heads=c.attention_heads,
                                qkv_features=x.shape[-1], dtype=c.dtype,
                                param_dtype=c.param_dtype,
                                name=f"offset_attention{i}")(x, train=train)
            outputs.append(x)
        return jnp.concatenate(outputs, axis=-1)
