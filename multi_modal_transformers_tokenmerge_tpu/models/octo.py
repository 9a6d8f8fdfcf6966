"""Octo: OCTO-style vision-language-action transformer policy.

Method-based API mirroring the reference for drop-in parity
(reference: models/octo/octo.py:55-198):

* ``generate_readouts(text_tokens, images, train)`` — the backbone;
* ``predict_continuous_action`` / ``compute_l2_loss``;
* ``predict_action_logits`` / ``compute_ce_loss``;
* ``predict_diffusion_denoise_term`` / ``compute_diffusion_denoise_loss`` /
  ``predict_diffusion_action``.

TPU-first: the sequence layout, attention mask, and assembly permutation are
static numpy constants; assembly is one concat + one gather; readout
extraction is a static gather; every predict/loss method is designed to be
wrapped in a single jit (see train/steps.py and serve/policy.py).
"""

from __future__ import annotations

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from ..core.config import OctoConfig
from ..heads.categorical import CategoricalActionHead, assign_bins
from ..heads.continuous import ContinuousActionHead
from ..heads.diffusion import DiffusionActionHead
from ..modules.attention import TransformerStack
from ..modules.image_tokenizer import ImageTokenizer
from ..modules.readout import ReadoutTokens
from ..modules.text import build_text_encoder
from ..modules.tome_stack import CompressedTransformerStack
from ..sequence.layout import SequenceLayout

__all__ = ["Octo", "TokenEmbeddings"]


def _select_attention_fn(tcfg, layout):
    from ..modules.attention import select_attention_fn
    return select_attention_fn(tcfg, layout.attention_mask(),
                               layout.total_tokens)


@flax.struct.dataclass
class TokenEmbeddings:
    """Per-modality embedding streams
    (reference: tokenizers/token_sequencer.py:342-346)."""

    text: jax.Array
    images: jax.Array
    readouts: jax.Array


class Octo(nn.Module):
    config: OctoConfig

    def setup(self):
        cfg = self.config
        self.layout = SequenceLayout.from_strings(
            cfg.input_sequence, cfg.compression_sequence)
        dtype = cfg.compute_dtype
        param_dtype = cfg.params_dtype

        self.text_encoder = build_text_encoder(
            cfg.text, dtype, param_dtype, name="text_encoder")
        self.image_encoder = ImageTokenizer(
            cfg.images, dtype=dtype, param_dtype=param_dtype,
            name="image_encoder")
        self.readout_tokens = ReadoutTokens(
            num_tokens=self.layout.modality_tokens("readouts"),
            embedding_dim=cfg.token_embedding_dim,
            dtype=dtype, param_dtype=param_dtype, name="readout_encoder")

        use_compression = (self.layout.compressible
                           and cfg.transformer.compression_mode != "none")
        if cfg.transformer.prestack_merge and not use_compression:
            raise ValueError(
                "transformer.prestack_merge requires an active compression "
                "config (a compression_sequence with nonzero rates AND "
                "compression_mode 'merge'/'prune'); with compression off "
                "the flag would be silently inert")
        if use_compression:
            self.transformer = CompressedTransformerStack(
                cfg.transformer, layout=self.layout, dtype=dtype,
                param_dtype=param_dtype, name="transformer")
        else:
            self.transformer = TransformerStack(
                cfg.transformer, dtype=dtype, param_dtype=param_dtype,
                attention_fn=_select_attention_fn(cfg.transformer,
                                                  self.layout),
                name="transformer")
        self._use_compression = use_compression

        heads = cfg.heads
        if heads.continuous is not None:
            self.continuous_action_head = ContinuousActionHead(
                heads.continuous, dtype=dtype, param_dtype=param_dtype)
        if heads.categorical is not None:
            self.categorical_action_head = CategoricalActionHead(
                heads.categorical, dtype=dtype, param_dtype=param_dtype)
        if heads.diffusion is not None:
            self.diffusion_action_head = DiffusionActionHead(
                heads.diffusion, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, text_tokens, images, time=None, noisy_actions=None,
                 train: bool = False):
        """Initialization entry point: runs the backbone plus every
        configured head so a single ``model.init`` creates all parameters
        (the reference requires separate per-method inits,
        octo.py:346-368)."""
        readouts = self.generate_readouts(text_tokens, images, train)
        heads = self.config.heads
        out = {"readouts": readouts}
        if heads.continuous is not None:
            out["continuous"] = self.continuous_action_head(readouts)
        if heads.categorical is not None:
            out["categorical"] = self.categorical_action_head(readouts)
        if heads.diffusion is not None:
            if time is None:
                time = jnp.zeros((readouts.shape[0], 1))
            if noisy_actions is None:
                noisy_actions = jnp.zeros(
                    (readouts.shape[0], heads.diffusion.action_space_dim))
            out["diffusion"] = self.diffusion_action_head.predict_denoise_term(
                readouts, time, noisy_actions, train)
        return out

    # ------------------------------------------------------------------
    # backbone
    # ------------------------------------------------------------------

    def encode_text(self, text_tokens):
        """Text tower only: (B, T) ids -> (B, T, E) embeddings.

        Split out so serving can cache instruction embeddings — the frozen
        T5 tower dominates FLOPs at OCTO sequence lengths, and a robot
        policy typically runs thousands of steps under one instruction."""
        return self.text_encoder(text_tokens)

    def generate_readouts(self, text_tokens, images, train: bool = False):
        """Encode modalities, assemble the interleaved sequence, run the
        transformer, return readout-token embeddings
        (reference: octo.py:91-126)."""
        return self.generate_readouts_with_text(
            self.encode_text(text_tokens), images, train)

    def generate_readouts_with_text(self, text_embeddings, images,
                                    train: bool = False):
        """Backbone with precomputed text embeddings (cached-text serving)."""
        image_embeddings = self.image_encoder(images, train=train)
        return self.generate_readouts_with_modalities(
            text_embeddings, image_embeddings, train)

    def generate_readouts_with_modalities(self, text_embeddings,
                                          image_embeddings,
                                          train: bool = False):
        """Backbone with BOTH modality streams precomputed — serving with
        an external (e.g. int8-quantized, serve/quantize.py) image tower
        as well as cached text."""
        batch_size = image_embeddings.shape[0]
        readout_embeddings = self.readout_tokens(batch_size)

        embeddings = self.assemble_embeddings(TokenEmbeddings(
            text=text_embeddings,
            images=image_embeddings,
            readouts=readout_embeddings,
        ))

        if self._use_compression:
            embeddings = self.transformer(embeddings, deterministic=not train)
            readout_idx = self.layout.modality_index(
                "readouts", layer=self.transformer.final_layer())
        else:
            mask = jnp.asarray(self.layout.attention_mask())
            embeddings = self.transformer(embeddings, mask=mask,
                                          deterministic=not train)
            readout_idx = self.layout.modality_index("readouts")

        return jnp.take(embeddings, jnp.asarray(readout_idx), axis=1)

    def assemble_embeddings(self, embeddings: TokenEmbeddings):
        """Interleave modality streams into the token sequence: one concat +
        one static gather (reference uses per-set dynamic slices,
        token_sequencer.py:255-269)."""
        for name, stream in (("text", embeddings.text),
                             ("images", embeddings.images),
                             ("readouts", embeddings.readouts)):
            expected = self.layout.modality_tokens(name)
            if stream.shape[1] != expected:
                raise ValueError(
                    f"{name} stream has {stream.shape[1]} tokens but the "
                    f"sequence layout {self.config.input_sequence!r} expects "
                    f"{expected} (e.g. wrong frame/camera count in the image "
                    f"input) — the assembly gather would silently fill with "
                    f"NaN otherwise")
        combined = jnp.concatenate(
            [embeddings.text, embeddings.images, embeddings.readouts], axis=1)
        perm = jnp.asarray(self.layout.assembly_permutation)
        return jnp.take(combined, perm, axis=1)

    # ------------------------------------------------------------------
    # continuous action head (reference: octo.py:158-174)
    # ------------------------------------------------------------------

    def predict_continuous_action(self, text_tokens, images,
                                  train: bool = False):
        readouts = self.generate_readouts(text_tokens, images, train)
        return self.continuous_action_head(readouts)

    def _l2_from_readouts(self, readouts, actions):
        pred = jnp.squeeze(self.continuous_action_head(readouts))
        return jnp.sum(jnp.square(pred - actions), axis=-1)

    def compute_l2_loss(self, text_tokens, images, actions,
                        train: bool = True):
        return self._l2_from_readouts(
            self.generate_readouts(text_tokens, images, train), actions)

    # ------------------------------------------------------------------
    # categorical action head (reference: octo.py:178-198)
    # ------------------------------------------------------------------

    def predict_action_logits(self, text_tokens, images, train: bool = False):
        readouts = self.generate_readouts(text_tokens, images, train)
        return self.categorical_action_head(readouts)

    def _ce_from_readouts(self, readouts, actions):
        cfg = self.config.heads.categorical
        target_bin = assign_bins(actions, (-cfg.max_action, cfg.max_action),
                                 cfg.num_bins)
        targets = jax.nn.one_hot(target_bin, num_classes=cfg.num_bins)
        logits = self.categorical_action_head(readouts)
        logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.sum(targets * logprobs, axis=-1)

    def compute_ce_loss(self, text_tokens, images, actions,
                        train: bool = True):
        return self._ce_from_readouts(
            self.generate_readouts(text_tokens, images, train), actions)

    # ------------------------------------------------------------------
    # diffusion action head (reference: octo.py:130-154)
    # ------------------------------------------------------------------

    def predict_diffusion_denoise_term(self, text_tokens, images, time,
                                       noisy_actions, train: bool = False):
        readouts = self.generate_readouts(text_tokens, images, train)
        return self.diffusion_action_head.predict_denoise_term(
            readouts, time, noisy_actions, train)

    def compute_diffusion_denoise_loss(self, text_tokens, images, actions,
                                       train: bool = True):
        readouts = self.generate_readouts(text_tokens, images, train)
        return self.diffusion_action_head.denoise_loss(readouts, actions,
                                                       train)

    def predict_diffusion_action(self, text_tokens, images,
                                 train: bool = False):
        readouts = self.generate_readouts(text_tokens, images, train)
        return self.diffusion_action_head.predict_action(readouts, train)

    # ------------------------------------------------------------------
    # cached-text serving variants (no reference equivalent: the reference
    # re-runs its frozen T5 tower every call, octo.py:98)
    # ------------------------------------------------------------------

    def predict_diffusion_action_with_text(self, text_embeddings, images,
                                           train: bool = False):
        readouts = self.generate_readouts_with_text(text_embeddings, images,
                                                    train)
        return self.diffusion_action_head.predict_action(readouts, train)

    def predict_diffusion_action_with_modalities(self, text_embeddings,
                                                 image_embeddings,
                                                 train: bool = False):
        """Serving entry with BOTH towers external: cached text + an
        int8-quantized image embedder (serve/quantize.py)."""
        readouts = self.generate_readouts_with_modalities(
            text_embeddings, image_embeddings, train)
        return self.diffusion_action_head.predict_action(readouts, train)

    def predict_continuous_action_with_text(self, text_embeddings, images,
                                            train: bool = False):
        readouts = self.generate_readouts_with_text(text_embeddings, images,
                                                    train)
        return self.continuous_action_head(readouts)

    def predict_action_logits_with_text(self, text_embeddings, images,
                                        train: bool = False):
        readouts = self.generate_readouts_with_text(text_embeddings, images,
                                                    train)
        return self.categorical_action_head(readouts)

    # ------------------------------------------------------------------
    # cached-text TRAINING variants.  The flagship text tower is frozen
    # (stop_gradient, modules/text.py:75-76 — mirroring the reference's
    # t5_base.py:14), so its output per instruction is a constant: with
    # utils.data.cache_text_embeddings these losses train the identical
    # objective while skipping the tower's forward every step.
    # ------------------------------------------------------------------

    def compute_l2_loss_with_text(self, text_embeddings, images, actions,
                                  train: bool = True):
        return self._l2_from_readouts(
            self.generate_readouts_with_text(text_embeddings, images, train),
            actions)

    def compute_ce_loss_with_text(self, text_embeddings, images, actions,
                                  train: bool = True):
        return self._ce_from_readouts(
            self.generate_readouts_with_text(text_embeddings, images, train),
            actions)

    def compute_diffusion_denoise_loss_with_text(self, text_embeddings,
                                                 images, actions,
                                                 train: bool = True):
        readouts = self.generate_readouts_with_text(text_embeddings, images,
                                                    train)
        return self.diffusion_action_head.denoise_loss(readouts, actions,
                                                       train)
