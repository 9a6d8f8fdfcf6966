"""Ahead-of-time policy export: serialize the compiled obs->action function
so serving processes load a precompiled artifact instead of recompiling
(StableHLO via jax.export; artifacts are platform-specific).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["export_policy", "export_cached_policy", "load_policy"]

_PREDICT_METHODS = {
    "continuous": "predict_continuous_action",
    "categorical": "predict_action_logits",
    "diffusion": "predict_diffusion_action",
}

# cached-instruction variants: text arrives as precomputed (B, T, E)
# tower embeddings instead of (B, T) ids
CACHED_PREDICT_METHODS = {
    "continuous": "predict_continuous_action_with_text",
    "categorical": "predict_action_logits_with_text",
    "diffusion": "predict_diffusion_action_with_text",
}


def export_policy(model, variables, head: str, batch_size: int,
                  text_shape, image_shape, path: Optional[str] = None
                  ) -> bytes:
    """Export the (variables, text, images, key) -> action function.

    Returns the serialized artifact bytes (also written to ``path`` when
    given).  Variables are call-time inputs, so one artifact serves any
    checkpoint with the same structure.
    """
    if head not in _PREDICT_METHODS:
        raise ValueError(
            f"unknown head {head!r}; one of {sorted(_PREDICT_METHODS)}")
    method = _PREDICT_METHODS[head]

    def fn(variables, text_tokens, images, key):
        rngs = {"diffusion": key} if head == "diffusion" else None
        return model.apply(variables, text_tokens, images, rngs=rngs,
                           method=method)

    var_shapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), variables)
    text = jax.ShapeDtypeStruct((batch_size, *text_shape), jnp.int32)
    images = jax.ShapeDtypeStruct((batch_size, *image_shape), jnp.float32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)

    exported = jax.export.export(jax.jit(fn))(var_shapes, text, images, key)
    blob = exported.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def export_cached_policy(model, variables, head: str, batch_size: int,
                         text_shape, image_shape,
                         path: Optional[str] = None) -> bytes:
    """Export the cached-instruction path:
    ``(variables, text_embeddings, images, key) -> action``.

    This is the HOT serving path (PolicyEngine.set_instruction skips the
    text tower after the first call) — exporting it too means a serving
    process compiles nothing at all.  ``text_embeddings`` is
    ``(batch, *text_shape, token_embedding_dim)`` in the model's compute
    dtype, exactly what ``encode_text``/``encode_instruction`` produce.
    """
    if head not in CACHED_PREDICT_METHODS:
        raise ValueError(
            f"unknown head {head!r}; one of {sorted(CACHED_PREDICT_METHODS)}")
    method = CACHED_PREDICT_METHODS[head]

    def fn(variables, text_embeddings, images, key):
        rngs = {"diffusion": key} if head == "diffusion" else None
        return model.apply(variables, text_embeddings, images, rngs=rngs,
                           method=method)

    var_shapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), variables)
    text_emb = jax.ShapeDtypeStruct(
        (batch_size, *text_shape, model.config.token_embedding_dim),
        model.config.compute_dtype)
    images = jax.ShapeDtypeStruct((batch_size, *image_shape), jnp.float32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)

    exported = jax.export.export(jax.jit(fn))(var_shapes, text_emb, images,
                                              key)
    blob = exported.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_policy(blob_or_path):
    """Load an exported policy artifact; returns
    ``fn(variables, text_tokens, images, key) -> action``."""
    if isinstance(blob_or_path, (str,)):
        with open(blob_or_path, "rb") as f:
            blob = f.read()
    else:
        blob = blob_or_path
    exported = jax.export.deserialize(blob)

    def fn(variables, text_tokens, images, key):
        return exported.call(variables, text_tokens, images, key)

    return fn
