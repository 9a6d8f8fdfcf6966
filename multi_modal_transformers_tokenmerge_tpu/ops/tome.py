"""ToMe token merging: bipartite soft matching + weighted-average merge.

Reference semantics (tokenizers/token_compression.py:54-129) with a
TPU-first merge: the reference applies ``r`` scatter-adds in a Python loop
(token_compression.py:100-101 — serial on device); here the merge is ONE
one-hot matmul (``einsum('brn,brc->bnc')``), which XLA maps straight onto
the MXU.  Identical math (addition reorder only).

Shapes are fully static: ``r`` is a Python int, so outputs have static
length ``t - r`` — a requirement for jit/scan and for per-layer sequence
layouts.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["BipartiteMatching", "bipartite_soft_matching", "apply_merge",
           "merge_wavg"]


class BipartiteMatching(NamedTuple):
    """Static-shape gather/scatter plan produced by bipartite soft matching.

    ``unm_idx``: (B, t_a - r, 1) indices into the even (source) half — kept.
    ``src_idx``: (B, r, 1) indices into the even half — merged away.
    ``dst_idx``: (B, r, 1) indices into the odd (destination) half that each
    merged token joins.
    ``distill``: whether a distill token is protected at dst position 0 —
    apply_merge then interleaves it to output position 1, matching the
    reference's concat order (token_compression.py:103-105).
    """

    unm_idx: jax.Array
    src_idx: jax.Array
    dst_idx: jax.Array
    r: int
    distill: bool = False


def bipartite_soft_matching(metric: jax.Array, r: int,
                            class_token: bool = False,
                            distill_token: bool = False,
                            ordering: str = "score") -> Optional[BipartiteMatching]:
    """Compute the ToMe merge plan from a similarity metric.

    Args:
        metric: (B, T, C) per-token feature used for cosine similarity
            (typically attention-key means).
        r: number of tokens to remove (must satisfy ``r <= (T-protected)//2``;
            unlike the reference we *raise* instead of silently clamping so
            static layouts can't drift).
        ordering: 'score' reproduces the reference exactly (unmerged tokens
            sorted by descending match score — a full argsort,
            token_compression.py:84).  'stable' keeps unmerged tokens in
            their original order using top_k(r) + a cumsum compaction — much
            cheaper to compile and run, and valid wherever within-set token
            order is free (set-granular masks).

    Returns the match plan, or None when r == 0.
    """
    protected = int(class_token) + int(distill_token)
    t = metric.shape[1]
    if r <= 0:
        return None
    if r > (t - protected) // 2:
        raise ValueError(
            f"cannot merge r={r} of {t} tokens (max {(t - protected) // 2})")

    metric = metric / jnp.linalg.norm(metric, axis=-1, keepdims=True)
    a, b = metric[..., ::2, :], metric[..., 1::2, :]
    scores = jnp.einsum("bic,bjc->bij", a, b)  # (B, Ta, Tb)

    if class_token:
        scores = scores.at[..., 0, :].set(-jnp.inf)
    if distill_token:
        scores = scores.at[..., :, 0].set(-jnp.inf)

    node_max = scores.max(axis=-1)
    node_idx = scores.argmax(axis=-1)
    t_a = node_max.shape[1]

    if ordering == "score":
        edge_idx = jnp.argsort(node_max, axis=-1)[:, ::-1][..., None]
        unm_idx = edge_idx[..., r:, :]
        src_idx = edge_idx[..., :r, :]
    elif ordering == "stable":
        _, top = jax.lax.top_k(node_max, r)           # (B, r) merged sources
        src_idx = top[..., None]
        is_src = jax.nn.one_hot(top, t_a, dtype=jnp.int32).sum(axis=1)
        keep = 1 - is_src                              # (B, t_a)
        # compaction: original-order positions of kept tokens via cumsum
        pos = jnp.cumsum(keep, axis=1) - 1
        dump = t_a - r  # parked slot for merged tokens
        target = jnp.where(keep == 1, pos, dump)
        idx = jnp.broadcast_to(
            jnp.arange(t_a, dtype=jnp.int32)[None], keep.shape)
        bsz = keep.shape[0]
        buf = jnp.zeros((bsz, t_a - r + 1), jnp.int32)
        buf = buf.at[jnp.arange(bsz)[:, None], target].set(idx)
        unm_idx = buf[:, :t_a - r, None]
    else:
        raise ValueError(f"unknown ordering {ordering!r}")

    dst_idx = jnp.take_along_axis(node_idx[..., None], src_idx, axis=-2)
    return BipartiteMatching(unm_idx, src_idx, dst_idx, r, distill_token)


def apply_merge(plan: Optional[BipartiteMatching], x: jax.Array,
                mode: str = "sum") -> jax.Array:
    """Apply a merge plan to (B, T, C) tokens -> (B, T - r, C).

    Matches the reference ``merge`` closure (token_compression.py:90-109)
    with the serial scatter loop replaced by a single one-hot contraction.
    """
    if plan is None:
        return x
    src_half = x[..., ::2, :]
    dst = x[..., 1::2, :]
    n_dst = dst.shape[1]

    unm = jnp.take_along_axis(src_half, plan.unm_idx, axis=1)
    src = jnp.take_along_axis(src_half, plan.src_idx, axis=1)

    if mode == "sum":
        onehot = jax.nn.one_hot(plan.dst_idx[..., 0], n_dst, dtype=x.dtype)
        # HIGHEST precision: a 0/1 matmul is cheap, and the default bf16
        # MXU precision would inject ~1e-3 error into merged embeddings.
        dst = dst + jnp.einsum("brn,brc->bnc", onehot, src,
                               precision=jax.lax.Precision.HIGHEST)
    elif mode != "keep":
        raise ValueError(f"unknown merge mode {mode!r}")

    if plan.distill:
        # the protected distill token (dst position 0) interleaves to
        # output position 1, after the class token — reference concat
        # order (token_compression.py:103-105)
        return jnp.concatenate(
            [unm[:, :1], dst[:, :1], unm[:, 1:], dst[:, 1:]], axis=1)
    return jnp.concatenate([unm, dst], axis=1)


def merge_wavg(plan: Optional[BipartiteMatching], x: jax.Array,
               size: Optional[jax.Array] = None
               ) -> Tuple[jax.Array, jax.Array]:
    """Size-weighted average merge (reference: token_compression.py:114-129).

    ``size`` tracks how many original tokens each current token represents;
    weighted averaging keeps merged embeddings at the original scale.
    """
    if size is None:
        size = jnp.ones_like(x[..., 0, None])
    if plan is None:
        return x, size
    x = apply_merge(plan, x * size, mode="sum")
    size = apply_merge(plan, size, mode="sum")
    return x / size, size
