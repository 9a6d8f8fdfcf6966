"""Data pipeline utilities: host->device prefetching and synthetic data.

The reference has no data-loading layer (SURVEY.md §1: "no data-loading
layer").  Serving/training here overlaps host preprocessing with device
compute by keeping a small queue of batches already transferred (and, on a
mesh, already sharded) ahead of consumption.
"""

from __future__ import annotations

import collections
import itertools
from typing import Iterable, Iterator

import jax
import numpy as np

__all__ = ["prefetch_to_device", "synthetic_octo_batches",
           "cache_text_embeddings"]


def prefetch_to_device(iterator: Iterable, size: int = 2,
                       sharding=None) -> Iterator:
    """Yield batches with ``size`` batches already resident on device.

    ``sharding`` (e.g. ``batch_sharding(mesh)``) places each array; without
    it, arrays go to the default device.  Transfer of batch N+size overlaps
    the consumer's work on batch N (device transfers are async).
    """
    def place(batch):
        if sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    it = iter(iterator)
    if size <= 0:
        # no lookahead: transfer each batch on demand (still placed/sharded)
        for batch in it:
            yield place(batch)
        return
    queue = collections.deque()
    for batch in itertools.islice(it, size):
        queue.append(place(batch))
    while queue:
        if (nxt := next(it, None)) is not None:
            queue.append(place(nxt))
        yield queue.popleft()


def cache_text_embeddings(batch_iter: Iterable, model, variables,
                          max_cache_rows: int = 1024) -> Iterator:
    """Map ``(text_ids, images, actions)`` batches to
    ``(text_embeddings, images, actions)``, running the frozen text tower
    once per DISTINCT instruction row.

    Robot-policy datasets carry a handful of instructions across millions
    of steps, yet the tower re-encodes them every train step (~20% of the
    octo_base forward, BASELINE.md stage decomposition).  Because the
    tower is frozen (stop_gradient — reference t5_base.py:14), its output
    per instruction is a training-time constant, so caching is exact, not
    approximate.  Pair with ``make_train_step(..., text_input=
    'embeddings')`` / ``fit(..., text_input='embeddings')``.

    The cache is a bounded LRU over instruction rows (a (T, E) f32/bf16
    row is ~50 KB at t5-base shapes; the default bounds it at ~50 MB).
    Batches with any cache miss encode the WHOLE batch (one fixed
    compiled signature); full hits skip the tower entirely.

    ``variables`` may be just the text-tower subtree
    ``{"params": {"text_encoder": ...}}`` — pass a COPY of it when your
    train step donates the state, or the lazy encoder will read donated
    buffers (see examples/train_octo.py --cached-text).
    """
    tcfg = model.config.text
    # only the t5 tower actually honors cfg.frozen (modules/text.py);
    # the 'embed' encoder is always trainable, so caching its output
    # would silently train on stale text features
    if not (tcfg.kind == "t5" and tcfg.frozen):
        raise ValueError(
            "cache_text_embeddings requires a frozen text tower "
            "(config.text.kind='t5' with frozen=True); got "
            f"kind={tcfg.kind!r}, frozen={getattr(tcfg, 'frozen', None)!r}"
            " — a trainable tower's output changes every step")

    def gen():
        import collections as _c

        encode = jax.jit(
            lambda v, t: model.apply(v, t, method="encode_text"))
        cache: "_c.OrderedDict[bytes, np.ndarray]" = _c.OrderedDict()

        for batch in batch_iter:
            ids, *rest = batch
            ids_np = np.asarray(ids)
            keys = [row.tobytes() for row in ids_np]
            if all(k in cache for k in keys):
                rows = []
                for k in keys:
                    cache.move_to_end(k)
                    rows.append(cache[k])
                emb = np.stack(rows)
            else:
                emb = np.asarray(encode(variables, ids_np))
                for k, row in zip(keys, emb):
                    # copy: a row VIEW would pin the whole (B, T, E) batch
                    # array via .base, inflating the cache bound by ~B x
                    cache[k] = np.array(row)
                    cache.move_to_end(k)
                while len(cache) > max_cache_rows:
                    cache.popitem(last=False)
            yield (emb, *rest)

    return gen()


def synthetic_octo_batches(batch_size: int, image_shape=(2, 280, 280, 3),
                           text_length: int = 16, action_dim: int = 8,
                           vocab_size: int = 32128, seed: int = 0):
    """Endless synthetic (text_tokens, images, actions) batches (host-side
    numpy; pair with prefetch_to_device)."""
    rng = np.random.default_rng(seed)
    while True:
        yield (
            rng.integers(0, vocab_size, (batch_size, text_length),
                         dtype=np.int32),
            rng.integers(0, 256, (batch_size, *image_shape)).astype(
                np.float32),
            rng.uniform(-1, 1, (batch_size, action_dim)).astype(np.float32),
        )
