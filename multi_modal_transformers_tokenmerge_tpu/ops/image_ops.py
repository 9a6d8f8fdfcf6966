"""Image preprocessing ops: patchify + stochastic patch-position encoding.

TPU-first rewrites of the reference's double-vmapped per-image functions
(reference: tokenizers/images/image_tokenizer.py:35-132):

* patchify is a single einops rearrange over all batch dims — no vmap towers;
* position-interval bounds are computed **statically in numpy** (they depend
  only on image geometry, never on pixel values — the reference recomputes
  them on device per image per call);
* train-mode sampling is ONE ``jax.random.randint`` over the whole
  (batch, frames, patches) block instead of a key per patch;
* eval-mode tokens are pure constants.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "patchify",
    "position_interval_bounds",
    "eval_position_tokens",
    "sample_position_tokens",
]


def patchify(images: jax.Array, patch_size: int, normalize: bool,
             dtype=jnp.float32) -> jax.Array:
    """(..., H, W, C) uint8/float images -> (..., P, p, p, C) patches.

    ``P = (H/p)*(W/p)`` patches in raster order; optionally normalized to
    [-1, 1] (reference: image_tokenizer.py:62-69).
    Works for any number of leading batch dims.
    """
    *batch, h, w, c = images.shape
    p = patch_size
    if h % p or w % p:
        raise ValueError(f"image ({h}x{w}) not divisible by patch size {p}")
    x = images.astype(dtype)
    x = x.reshape(*batch, h // p, p, w // p, p, c)
    # (..., h/p, p, w/p, p, c) -> (..., h/p, w/p, p, p, c)
    x = jnp.moveaxis(x, -4, -3)
    x = x.reshape(*batch, (h // p) * (w // p), p, p, c)
    if normalize:
        x = 2.0 * (x / 255.0) - 1.0
    return x


@functools.lru_cache(maxsize=None)
def position_interval_bounds(
    image_dim: int, patch_size: int, position_interval: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Static quantized (start, stop) bucket bounds per patch.

    For each patch in raster order, returns int32 arrays
    ``(row_start, row_stop, col_start, col_stop)`` of shape (P,), where
    buckets are ``floor(pixel_index / image_dim * (position_interval - 1))``
    (reference: image_tokenizer.py:89-101).
    """
    p = patch_size
    n = image_dim // p
    edges = np.arange(0, image_dim + p, p, dtype=np.float64)
    q = np.floor(edges / image_dim * (position_interval - 1)).astype(np.int32)
    start, stop = q[:-1], q[1:]
    # NOTE: the reference's einops repeats put its "row" stream on the
    # fast-varying raster axis and "col" on the slow one
    # (image_tokenizer.py:91-92) — geometrically swapped, but harmless since
    # both position embeddings are learned and summed.  We match the
    # reference exactly so token streams agree bit-for-bit.
    row_start = np.tile(start, n)
    row_stop = np.tile(stop, n)
    col_start = np.repeat(start, n)
    col_stop = np.repeat(stop, n)
    return row_start, row_stop, col_start, col_stop


def eval_position_tokens(
    image_dim: int, patch_size: int, position_interval: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic (row, col) position tokens — interval midpoints
    (reference: image_tokenizer.py:110-112).  Pure constants."""
    rs, rp, cs, cp = position_interval_bounds(image_dim, patch_size,
                                              position_interval)
    return (rs + rp) // 2, (cs + cp) // 2


def sample_position_tokens(
    key: jax.Array,
    batch_shape: Tuple[int, ...],
    image_dim: int,
    patch_size: int,
    position_interval: int,
) -> Tuple[jax.Array, jax.Array]:
    """Train-mode stochastic (row, col) tokens, uniform within each patch's
    quantized interval (reference: image_tokenizer.py:103-108).

    Returns two int32 arrays of shape ``(*batch_shape, P)``.  One fused
    randint per axis for the entire batch.
    """
    rs, rp, cs, cp = position_interval_bounds(image_dim, patch_size,
                                              position_interval)
    # degenerate intervals (start == stop, possible when
    # position_interval - 1 < patches-per-dim) would make randint draw
    # bits modulo zero — platform-undefined; widen to [start, start+1) so
    # those patches deterministically emit their start bucket
    rp = np.maximum(rp, rs + 1)
    cp = np.maximum(cp, cs + 1)
    num_patches = rs.shape[0]
    shape = (*batch_shape, num_patches)
    row_key, col_key = jax.random.split(key)
    rows = jax.random.randint(row_key, shape, jnp.asarray(rs), jnp.asarray(rp))
    cols = jax.random.randint(col_key, shape, jnp.asarray(cs), jnp.asarray(cp))
    return rows, cols
