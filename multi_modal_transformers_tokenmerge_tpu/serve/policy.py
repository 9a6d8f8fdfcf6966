"""AOT-compiled policy inference engine with instruction caching.

The reference's serving story is ``model.apply(..., method=...)`` per call —
untraced Python dispatch, re-running the frozen T5 text tower every step
(reference: models/octo/octo.py:431-443, :98).  This engine:

* AOT-compiles each predict method once (``jax.jit(...).lower().compile()``)
  for a fixed batch shape, so serving never pays trace overhead;
* caches text-tower embeddings per instruction (``set_instruction``) — the
  T5 tower dominates FLOPs at 74-token sequences, and robot policies run
  thousands of steps per instruction;
* manages the action-sampling PRNG stream on device.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["PolicyEngine"]

from .export import (  # single source of truth
    _PREDICT_METHODS,
    CACHED_PREDICT_METHODS as _CACHED_METHODS,
)


class PolicyEngine:
    """Batched obs->action serving for an Octo model."""

    def __init__(self, model, variables, head: str = "diffusion",
                 batch_size: int = 1, rng: Optional[jax.Array] = None,
                 cache_text: bool = True, tokenizer=None, mesh=None,
                 image_tower: str = "bf16", text_tower: str = "bf16",
                 ddim_steps: Optional[int] = None):
        """``tokenizer``: optional callable mapping a list of instruction
        strings to an (B, T) int32 id array — e.g.
        ``utils.spm.T5StyleTokenizer`` over a local t5 sentencepiece model,
        or ``modules.text.WordTokenizer`` (reference tokenizes outside the
        model the same way, octo.py:402-409).

        ``mesh``: optional ``jax.sharding.Mesh`` for data-parallel serving
        (BASELINE config 5): parameters are replicated across the mesh,
        every request batch is sharded along the ``data`` axis, and XLA
        runs each shard on its own chip — ``batch_size`` then means the
        GLOBAL batch and must divide by the data-axis size.

        ``image_tower``: 'bf16' (the model's own encoder), 'int8' (the
        post-training-quantized patch embedder, int8 weights AND
        activations — the MXU 2x byte path), or 'w8' (weight-only int8:
        kernels stored int8, dequantized into bf16 compute at call time —
        the batch-1 weight-read-bound regime; tracks the float tower to
        weight-rounding error only).  Both quantized modes route through
        the ``*_with_modalities`` model methods (serve/quantize.py).

        ``text_tower``: 'bf16', 'int8' or 'w8' — the quantized frozen T5
        tower for instruction encoding (set_instruction /
        encode_instruction).  Pays in the UNCACHED-instruction batch-1
        regime (int8 measured 1.29-1.40x on v5e, BASELINE.md regime
        table; 'w8' stores kernels int8 but computes in bf16 — no
        activation-quantization error); with instruction caching on (the
        default) it only changes cache-miss latency.  Requires a t5-kind
        text encoder.

        ``ddim_steps``: serve the diffusion head with S-step deterministic
        DDIM sampling instead of the full 32-step DDPM reverse loop
        (heads/diffusion.py:ddim_schedule).  Parameters are unchanged —
        the same checkpoint serves both samplers — so this is a pure
        latency/quality knob for the action-decode loop."""
        if ddim_steps is not None:
            if head != "diffusion":
                raise ValueError("ddim_steps only applies to the "
                                 f"diffusion head, got head={head!r}")
            hc = model.config.heads
            if hc.diffusion is not None:  # else the head check below raises
                # flax clone(): rebuilds the module with only `config`
                # swapped, preserving any other dataclass attributes a
                # subclass declares (a bare type(model)(cfg) would assume
                # a single-positional-config constructor)
                model = model.clone(config=model.config.replace(
                    heads=hc.replace(diffusion=hc.diffusion.replace(
                        ddim_steps=ddim_steps))))
        if head not in _PREDICT_METHODS:
            raise ValueError(
                f"unknown head {head!r}; one of {sorted(_PREDICT_METHODS)}")
        configured = getattr(model.config.heads, head, None)
        if configured is None:
            available = [h for h in _PREDICT_METHODS
                         if getattr(model.config.heads, h, None) is not None]
            raise ValueError(
                f"model has no {head!r} head configured; available: "
                f"{available}")
        self.model = model
        self.variables = variables
        self.head = head
        self.batch_size = batch_size
        self.cache_text = cache_text
        self.tokenizer = tokenizer
        self.mesh = mesh
        self._batch_sharding = None
        if mesh is not None:
            from ..parallel.mesh import batch_sharding, replicated
            data_size = mesh.shape.get("data", 1)
            if batch_size % data_size:
                raise ValueError(
                    f"global batch_size {batch_size} not divisible by the "
                    f"mesh data axis ({data_size})")
            self._batch_sharding = batch_sharding(mesh)
            self.variables = jax.device_put(variables, replicated(mesh))
        if image_tower not in ("bf16", "int8", "w8"):
            raise ValueError(
                f"unknown image_tower {image_tower!r}; 'bf16', 'int8' or "
                f"'w8'")
        self.image_tower = image_tower
        if image_tower in ("int8", "w8"):
            from .quantize import quantize_image_tower
            qp = quantize_image_tower(model, self.variables)
            if mesh is not None:
                from ..parallel.mesh import replicated
                qp = jax.device_put(qp, replicated(mesh))
            # one pytree through the compiled signature: model params +
            # quantized tower travel together (AOT args, not consts)
            self._serve_vars = {"model": self.variables, "img_q": qp}
        else:
            self._serve_vars = self.variables
        if text_tower not in ("bf16", "int8", "w8"):
            raise ValueError(
                f"unknown text_tower {text_tower!r}; 'bf16', 'int8' or "
                f"'w8'")
        self.text_tower = text_tower
        self._text_qp = None
        if text_tower in ("int8", "w8"):
            if model.config.text.kind != "t5":
                raise ValueError(
                    f"text_tower={text_tower!r} requires a t5 text "
                    f"encoder, got {model.config.text.kind!r}")
            from .quantize import quantize_t5_params
            self._text_qp = quantize_t5_params(
                self.variables["params"]["text_encoder"]["t5_encoder"])
            if mesh is not None:
                from ..parallel.mesh import replicated
                self._text_qp = jax.device_put(self._text_qp,
                                               replicated(mesh))
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)
        self._step = 0
        self._compiled = None
        self._compiled_cached = None
        self._text_embeddings = None
        self._instruction_cache = {}  # ids bytes -> (T, E); LRU order
        self._instruction_cache_max = 512
        # per-instance jit caches (an lru_cache on a method would key on
        # self and pin every engine — and its variables pytree — for the
        # life of the process)
        self._jit_cache = {}

    # -- instruction caching ----------------------------------------------

    def set_instruction(self, text) -> "PolicyEngine":
        """Encode and cache the instruction's text-tower embeddings; later
        calls skip the text tower entirely.  Accepts pre-tokenized ids, a
        raw string, or a list of strings (string input needs ``tokenizer``).

        Pre-tokenized ids are normalized the same way strings are: (T,) or
        (1, T) ids broadcast to the engine batch; (B, T) must match
        ``batch_size`` — the cached-predict executable is compiled for
        (batch_size, T, E) embeddings, so anything else would poison the
        cache and fail far from here.
        """
        import numpy as np
        ids = np.asarray(self._tokenize(text))
        if ids.ndim == 1:
            ids = ids[None]
        if ids.ndim != 2:
            raise ValueError(
                f"instruction ids must be (T,), (1, T) or (batch, T); got "
                f"shape {ids.shape}")
        if ids.shape[0] == 1 and self.batch_size > 1:
            ids = np.broadcast_to(ids, (self.batch_size, ids.shape[1]))
        if ids.shape[0] != self.batch_size:
            raise ValueError(
                f"got {ids.shape[0]} instruction rows for batch_size "
                f"{self.batch_size}; pass one row (broadcast) or exactly "
                f"batch_size rows")
        self._text_embeddings = self._encode_text_fn()(
            self.variables, self._place(jnp.asarray(ids)))
        return self

    def encode_instruction(self, text):
        """Encode ONE instruction -> (T, E) embeddings, memoized (bounded
        LRU).  Unlike :meth:`set_instruction` (one instruction for the
        whole batch), these per-instruction rows can be STACKED into a
        mixed batch and passed as ``text_embeddings=`` — different batch
        elements then follow different instructions with the text tower
        still amortized (see serve/server.py).  Accepts a raw string
        (needs ``tokenizer``) or pre-tokenized (T,) / (1, T) ids."""
        import numpy as np
        if isinstance(text, str):
            if self.tokenizer is None:
                raise ValueError(
                    "string instruction given but no tokenizer configured")
            ids = np.asarray(self.tokenizer([text]))
        else:
            ids = np.asarray(text)
            if ids.ndim == 1:
                ids = ids[None]
        if ids.shape[0] != 1:
            raise ValueError(
                f"encode_instruction takes ONE instruction, got batch "
                f"{ids.shape[0]}")
        # dtype/shape are part of the key: byte-identical buffers of
        # different dtypes (e.g. int64 [1, 2] vs int32 [1, 0, 2, 0]) are
        # DIFFERENT instructions and must not alias
        key = (ids.dtype.str, ids.shape, ids.tobytes())
        hit = self._instruction_cache.pop(key, None)
        if hit is None:
            hit = self._encode_text_fn()(self.variables,
                                         jnp.asarray(ids))[0]
        self._instruction_cache[key] = hit  # reinsert = mark recent
        while len(self._instruction_cache) > self._instruction_cache_max:
            self._instruction_cache.pop(
                next(iter(self._instruction_cache)))
        return hit

    @staticmethod
    def _warm(fn, args):
        import numpy as np
        np.asarray(jax.tree.leaves(fn(*args))[0])

    def _place(self, batch_array):
        """Shard a batch-leading array over the mesh's data axis (no-op
        without a mesh)."""
        if self._batch_sharding is None:
            return batch_array
        return jax.device_put(batch_array, self._batch_sharding)

    def _tokenize(self, text):
        if isinstance(text, str) or (
                isinstance(text, (list, tuple)) and text
                and isinstance(text[0], str)):
            if self.tokenizer is None:
                raise ValueError(
                    "string instruction given but no tokenizer configured; "
                    "pass tokenizer= (e.g. utils.spm.T5StyleTokenizer) or "
                    "pre-tokenized ids")
            if isinstance(text, str):
                text = [text] * self.batch_size
            if len(text) != self.batch_size:
                raise ValueError(
                    f"got {len(text)} instruction strings for batch_size "
                    f"{self.batch_size}; pass one string (broadcast) or "
                    f"exactly batch_size strings")
            return self.tokenizer(list(text))
        return text

    def _encode_text_fn(self):
        if "encode_text" not in self._jit_cache:
            if self.text_tower != "bf16":
                from .quantize import t5_encode_int8
                tcfg = self.model.config.text
                dtype = self.model.config.compute_dtype
                mode = self.text_tower
                # qp is a jit ARGUMENT: the 110M-param tower as a closed
                # const would blow the remote-compile request size limit
                f = jax.jit(lambda qp, t: t5_encode_int8(
                    qp, t, rel_pos_buckets=tcfg.t5_rel_pos_buckets,
                    rel_pos_max_distance=tcfg.t5_rel_pos_max_distance,
                    dtype=dtype, mode=mode))
                self._jit_cache["encode_text"] = (
                    lambda v, t: f(self._text_qp, t))
            else:
                self._jit_cache["encode_text"] = jax.jit(
                    lambda v, t: self.model.apply(v, t,
                                                  method="encode_text"))
        return self._jit_cache["encode_text"]

    # -- predict functions (shared by AOT and jit paths) ------------------

    def _head_readouts_method(self):
        head = self.head

        def method(m, text_embeddings, image_embeddings):
            readouts = m.generate_readouts_with_modalities(
                text_embeddings, image_embeddings)
            if head == "diffusion":
                return m.diffusion_action_head.predict_action(readouts,
                                                              False)
            if head == "continuous":
                return m.continuous_action_head(readouts)
            return m.categorical_action_head(readouts)

        return method

    def _rngs(self, key):
        return {"diffusion": key} if self.head == "diffusion" else None

    def _predict_full(self, serve_vars, text_tokens, images, key):
        """Tokens + images -> action, routing through the configured
        image tower."""
        rngs = self._rngs(key)
        if self.image_tower != "bf16":
            v, qp = serve_vars["model"], serve_vars["img_q"]
            emb = self._embed_images_q(qp, images)
            text_emb = self.model.apply(v, text_tokens,
                                        method="encode_text")
            return self.model.apply(v, text_emb, emb, rngs=rngs,
                                    method=self._head_readouts_method())
        return self.model.apply(serve_vars, text_tokens, images, rngs=rngs,
                                method=_PREDICT_METHODS[self.head])

    def _embed_images_q(self, qp, images):
        from .quantize import image_embed_int8, image_embed_w8
        embed = image_embed_w8 if self.image_tower == "w8" \
            else image_embed_int8
        return embed(qp, images, self.model.config.images,
                     dtype=self.model.config.compute_dtype)

    def _predict_cached(self, serve_vars, text_embeddings, images, key):
        """Cached text embeddings + images -> action."""
        rngs = self._rngs(key)
        if self.image_tower != "bf16":
            v, qp = serve_vars["model"], serve_vars["img_q"]
            emb = self._embed_images_q(qp, images)
            return self.model.apply(v, text_embeddings, emb, rngs=rngs,
                                    method=self._head_readouts_method())
        return self.model.apply(serve_vars, text_embeddings, images,
                                rngs=rngs,
                                method=_CACHED_METHODS[self.head])

    # -- compilation -----------------------------------------------------

    def load_artifact(self, blob_or_path,
                      cached_blob_or_path=None) -> "PolicyEngine":
        """Use precompiled policy artifacts (serve.export) — no model
        compilation in this process.

        ``blob_or_path`` serves the full text+images path
        (export_policy); ``cached_blob_or_path`` additionally serves the
        cached-instruction path (export_cached_policy) — without it that
        hot path still jit-compiles on first use."""
        from .export import load_policy
        if self.image_tower != "bf16":
            raise ValueError(
                "exported policy artifacts serve the model's own (bf16) "
                "image tower; build an image_tower='bf16' engine or "
                f"compile() the {self.image_tower} engine in-process")
        self._compiled = load_policy(blob_or_path)
        if cached_blob_or_path is not None:
            self._compiled_cached = load_policy(cached_blob_or_path)
        return self

    def compile(self, text_shape, image_shape,
                warmup: bool = True) -> "PolicyEngine":
        """AOT-compile the predict function(s) for fixed input shapes.

        ``warmup`` runs each compiled executable once on zeros and blocks —
        the FIRST execution of an AOT executable can cost orders of
        magnitude more than steady state on remote-device backends, and a
        serving thread must never absorb that (it blows request timeouts).
        """
        if self.mesh is not None:
            from ..parallel.mesh import replicated
            rep, bat = replicated(self.mesh), self._batch_sharding
            var_shapes = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                               sharding=rep),
                self._serve_vars)
            mk = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt,
                                                        sharding=bat)
        else:
            var_shapes = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                self._serve_vars)
            mk = jax.ShapeDtypeStruct
        images = mk((self.batch_size, *image_shape), jnp.float32)
        key = jax.ShapeDtypeStruct((2,), jnp.uint32)

        text = mk((self.batch_size, *text_shape), jnp.int32)
        self._compiled = (
            jax.jit(self._predict_full)
            .lower(var_shapes, text, images, key).compile())
        # warmup buffers are locals: keeping them on self would pin
        # batch-sized device arrays for the engine's lifetime
        if warmup:
            zero_images = self._place(
                jnp.zeros((self.batch_size, *image_shape), jnp.float32))
            zero_text = self._place(
                jnp.zeros((self.batch_size, *text_shape), jnp.int32))
            self._warm(self._compiled,
                       (self._serve_vars, zero_text, zero_images,
                        jax.random.key_data(self._rng)))

        if self.cache_text:
            emb_dim = self.model.config.token_embedding_dim
            text_emb = mk(
                (self.batch_size, *text_shape, emb_dim),
                self.model.config.compute_dtype)
            self._compiled_cached = (
                jax.jit(self._predict_cached)
                .lower(var_shapes, text_emb, images, key).compile())
            if warmup:
                # warm the cached-path executable ONCE here (zero
                # embeddings suffice) — instruction switches then never
                # pay first-execution or warm-up cost again
                zero_emb = self._place(jnp.zeros(
                    (self.batch_size, *text_shape, emb_dim),
                    self.model.config.compute_dtype))
                self._warm(self._compiled_cached,
                           (self._serve_vars, zero_emb, zero_images,
                            jax.random.key_data(self._rng)))
        return self

    # -- serving ---------------------------------------------------------

    def __call__(self, images, text_tokens=None,
                 text_embeddings=None) -> jax.Array:
        """One obs->action inference.

        With a cached instruction (``set_instruction``), only images are
        needed; ``text_tokens`` overrides the cache for this call;
        ``text_embeddings`` (B, T, E) serves a MIXED-instruction batch —
        stack rows from :meth:`encode_instruction`.
        """
        key = jax.random.fold_in(self._rng, self._step)
        self._step += 1
        key_data = jax.random.key_data(key)

        images = self._place(jnp.asarray(images))
        if text_tokens is not None and text_embeddings is not None:
            raise ValueError(
                "pass text_tokens or text_embeddings, not both")
        if text_tokens is not None:
            text_tokens = self._place(
                jnp.asarray(self._tokenize(text_tokens)))
        if text_tokens is None:
            emb = (self._text_embeddings if text_embeddings is None
                   else self._place(jnp.asarray(text_embeddings)))
            if emb is None:
                raise ValueError(
                    "no instruction set: call set_instruction(text_tokens) "
                    "or pass text_tokens / text_embeddings")
            if self._compiled_cached is not None:
                return self._compiled_cached(
                    self._serve_vars, emb, images, key_data)
            return self._jitted("cached", self._predict_cached)(
                self._serve_vars, emb, images, key_data)

        if self._compiled is not None:
            return self._compiled(self._serve_vars, text_tokens, images,
                                  key_data)
        return self._jitted("full", self._predict_full)(
            self._serve_vars, text_tokens, images, key_data)

    def _jitted(self, name, fn):
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn)
        return self._jit_cache[name]
