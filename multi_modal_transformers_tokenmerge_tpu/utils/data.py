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

__all__ = ["prefetch_to_device", "synthetic_octo_batches"]


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
