"""Ring attention: context parallelism for sequences sharded over a mesh.

The reference's only long-context strategy is token reduction (SURVEY.md
§5); the flash kernel (ops/flash_attention.py) covers single-chip long
sequences.  This module adds the third regime — sequences too long for one
chip's HBM/compute: shard the sequence axis over a ``seq`` mesh axis, keep
Q local, and rotate K/V shards around the ICI ring with ``ppermute``,
merging each visiting block into per-row online-softmax statistics
``(m, l, acc)`` — the same math the flash kernel uses across key tiles,
lifted across chips.  Communication fully overlaps compute from the
compiler's view (one collective per ring step inside a ``lax.scan``).

Differentiable end to end: the backward replays the scan with transposed
ppermutes — no custom VJP needed.

The static (S, S) mask is replicated and sliced per (device, ring-step)
pair, so arbitrary block-causal OCTO layouts work unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["ring_attention", "SEQ_AXIS"]

SEQ_AXIS = "seq"

_NEG_INF = -1e30


def ring_attention(q, k, v, mask: np.ndarray, mesh: Mesh,
                   axis: str = SEQ_AXIS):
    """Masked MHA with the sequence axis sharded over ``mesh[axis]``.

    Args:
      q, k, v: (B, S, H, D) — will be sharded (B, S/P, H, D) per device.
      mask: static numpy bool (S, S), queries attend where True.
      mesh: mesh containing ``axis`` of size P; S must divide by P.

    Returns (B, S, H, D), sharded like q.
    """
    if not isinstance(mask, np.ndarray):
        raise TypeError("ring_attention requires a static numpy mask")
    b, s, h, d = q.shape
    p = mesh.shape[axis]
    if s % p:
        raise ValueError(f"sequence {s} not divisible by ring size {p}")
    s_local = s // p
    scale = 1.0 / np.sqrt(d)
    mask_arr = jnp.asarray(mask, dtype=jnp.int8)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis), P(axis)),
        out_specs=P(None, axis),
        check_vma=False)
    def run(q, k, v, mask_rows):
        # mask_rows: (S/P, S) — only this device's QUERY rows of the mask
        # are ever read, so the mask shards with the queries instead of
        # replicating O(S^2) bytes onto every chip
        idx = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % p) for i in range(p)]
        q32 = q.astype(jnp.float32)

        def merge_block(carry, k_blk, v_blk, src):
            m, l, acc = carry
            mask_tile = jax.lax.dynamic_slice(
                mask_rows, (0, src * s_local), (s_local, s_local))
            st = jnp.einsum("bqhd,bkhd->bhqk", q32,
                            k_blk.astype(jnp.float32)) * scale
            st = jnp.where(mask_tile[None, None] != 0, st, _NEG_INF)
            m_blk = jnp.max(st, axis=-1)                       # (B, H, Q)
            m_new = jnp.maximum(m, m_blk)
            # fully-masked rows keep m_new at -1e30; clamping the exponent
            # reference keeps exp(st - m) at 0 for them (so l stays 0 and
            # the final guard emits zeros) instead of exp(0) = 1 everywhere
            pr = jnp.exp(st - jnp.maximum(m_new, 0.5 * _NEG_INF)[..., None])
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + jnp.sum(pr, axis=-1)
            acc_new = (acc * alpha[..., None]
                       + jnp.einsum("bhqk,bkhd->bhqd", pr,
                                    v_blk.astype(jnp.float32)))
            return m_new, l_new, acc_new

        m0 = jnp.full((b, h, s_local), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((b, h, s_local), jnp.float32)
        acc0 = jnp.zeros((b, h, s_local, d), jnp.float32)

        # local block first (no communication), then p-1 ring steps with
        # the permute BEFORE the compute — exactly p-1 collectives, no
        # discarded final hop
        carry = merge_block((m0, l0, acc0), k, v, idx)

        def ring_step(state, r):
            carry, k_blk, v_blk = state
            k_blk, v_blk = jax.lax.ppermute((k_blk, v_blk), axis, perm)
            src = jax.lax.rem(idx - r + p, p)
            carry = merge_block(carry, k_blk, v_blk, src)
            return (carry, k_blk, v_blk), None

        if p > 1:
            (carry, _, _), _ = jax.lax.scan(
                ring_step, (carry, k, v), jnp.arange(1, p))
        m, l, acc = carry
        # fully-masked (padding) rows: emit zeros, not NaN
        out = acc / jnp.maximum(l, 1e-30)[..., None]           # (B, H, Q, D)
        return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)

    return run(q, k, v, mask_arr)
