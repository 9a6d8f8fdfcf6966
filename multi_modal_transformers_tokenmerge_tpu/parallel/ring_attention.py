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

The static (S, S) mask is sharded by QUERY rows (each chip holds its
(S/P, S) slice) and sliced per (device, ring-step) pair, so arbitrary
block-causal OCTO layouts work unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.hw import on_tpu
from ..ops.flash_attention import (flash_bwd, flash_fwd_lse,
                                   tile_skip_tables)

__all__ = ["ring_attention", "SEQ_AXIS"]

SEQ_AXIS = "seq"

_NEG_INF = -1e30

# impl='auto' uses the Pallas inner op only at shard lengths where it
# measured faster than the einsum path on v5e — sweep in
# benchmarks/recorded/ring_flash_r3.json: 512 -> 0.23x (einsum wins),
# 1024 -> 2.26x, 2048 -> 3.37x, 4096 full -> 7.4x.  Explicit impl='flash'
# ignores the threshold.
_FLASH_AUTO_MIN_SHARD = 1024


def ring_attention(q, k, v, mask: np.ndarray, mesh: Mesh,
                   axis: str = SEQ_AXIS, impl: str = "auto",
                   block_q: int = None, block_k: int = None,
                   interpret: bool = False, batch_axis: str = None):
    """Masked MHA with the sequence axis sharded over ``mesh[axis]``.

    Args:
      q, k, v: (B, S, H, D) — will be sharded (B, S/P, H, D) per device.
      mask: static numpy bool (S, S), queries attend where True.
      mesh: mesh containing ``axis`` of size P; S must divide by P.
      impl: ``'xla'`` — einsum inner block (always available);
        ``'flash'`` — Pallas flash kernel inner block (never materializes
        the (B, H, S/P, S/P) score tile); ``'auto'`` — flash only when the
        shard length is tile-aligned AND >= the measured crossover
        (_FLASH_AUTO_MIN_SHARD = 1024; einsum wins below it) AND running
        on a real TPU — otherwise xla.
      block_q, block_k: flash-path tile sizes (128-multiples that must
        divide the shard length; default min(256/512, shard)).  Ignored —
        like ``interpret`` — by the xla path.
      interpret: run the Pallas kernels in interpreter mode (CPU tests).
      batch_axis: optional mesh axis to shard the BATCH dim over (CP x DP
        composition: each data slice runs its own sequence ring; the mask
        still shards by query rows over ``axis`` only).

    Returns (B, S, H, D), sharded like q.
    """
    if not isinstance(mask, np.ndarray):
        raise TypeError("ring_attention requires a static numpy mask")
    b, s, h, d = q.shape
    if mask.shape != (s, s):
        raise ValueError(
            f"mask shape {mask.shape} != sequence ({s}, {s}) — a "
            f"wrong-sized mask would shard to wrong per-device rows and "
            f"silently corrupt attention")
    p = mesh.shape[axis]
    if s % p:
        raise ValueError(f"sequence {s} not divisible by ring size {p}")
    s_local = s // p
    if impl not in ("auto", "xla", "flash"):
        raise ValueError(f"unknown impl {impl!r}")
    if impl != "xla":
        bq = block_q or min(256, s_local)
        bk = block_k or min(512, s_local)
        aligned = (s_local % bq == 0 and s_local % bk == 0
                   and bq % 128 == 0 and bk % 128 == 0)
        # measured crossover (benchmarks/recorded/ring_flash_r3.json): the
        # einsum inner op wins at small shard tiles (XLA batches B*H tiny
        # matmuls better than the kernel's per-(batch, q-tile) grid); the
        # kernel's no-materialization + tile-skipping win takes over as
        # the per-shard score tile grows.  'auto' also requires a real TPU
        # (Mosaic kernels don't lower on the CPU simulation backend);
        # explicit impl='flash' trusts the caller (tests pass interpret).
        big_enough = (s_local >= _FLASH_AUTO_MIN_SHARD
                      and (on_tpu() or interpret))
        if aligned and (impl == "flash" or big_enough):
            return _ring_flash(q, k, v, mask, mesh, axis, bq, bk,
                               interpret, batch_axis)
        if impl == "flash":
            raise ValueError(
                f"impl='flash' needs shard length {s_local} divisible by "
                f"128-multiple tiles (block_q={bq}, block_k={bk}); use "
                f"impl='auto' to fall back")
    scale = 1.0 / np.sqrt(d)
    mask_arr = jnp.asarray(mask, dtype=jnp.int8)

    ba = batch_axis
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(ba, axis), P(ba, axis), P(ba, axis), P(axis)),
        out_specs=P(ba, axis),
        check_vma=False)
    def run(q, k, v, mask_rows):
        # mask_rows: (S/P, S) — only this device's QUERY rows of the mask
        # are ever read, so the mask shards with the queries instead of
        # replicating O(S^2) bytes onto every chip
        idx = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % p) for i in range(p)]

        # checkpointed: without remat, autodiff through the ring scan saves
        # every step's (B, H, s_local, s_local) score/probability tensors —
        # O(B*H*s_local*S) f32 residuals, an OOM in exactly the
        # too-long-for-one-chip regime this module exists for.  Recompute
        # keeps backward memory at one tile.  KNOWN LIMIT of this einsum
        # path: the scan still saves each step's post-ppermute k/v blocks
        # as residuals (2*B*S*H*D per device — the full K/V, though not
        # the O(S^2) scores).  At shard lengths where that matters the
        # auto policy has already switched to the flash path, whose
        # custom VJP re-rotates K/V in a second ring instead of saving
        # them; einsum serves the small-shard regime where XLA's batched
        # matmuls win and memory is not the constraint.
        @jax.checkpoint
        def merge_block(carry, k_blk, v_blk, src):
            m, l, acc = carry
            mask_tile = jax.lax.dynamic_slice(
                mask_rows, (0, src * s_local), (s_local, s_local))
            # operands stay in their input dtype (full-rate MXU for bf16)
            # with f32 accumulation — same contract as the flash kernel
            st = jnp.einsum("bqhd,bkhd->bhqk", q, k_blk,
                            preferred_element_type=jnp.float32) * scale
            st = jnp.where(mask_tile[None, None] != 0, st, _NEG_INF)
            m_blk = jnp.max(st, axis=-1)                       # (B, H, Q)
            m_new = jnp.maximum(m, m_blk)
            # fully-masked rows keep m_new at -1e30; clamping the exponent
            # reference keeps exp(st - m) at 0 for them (so l stays 0 and
            # the final guard emits zeros) instead of exp(0) = 1 everywhere
            pr = jnp.exp(st - jnp.maximum(m_new, 0.5 * _NEG_INF)[..., None])
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + jnp.sum(pr, axis=-1)
            # probabilities cast to V's dtype for the PV matmul (flash-
            # standard: bf16 MXU rate, f32 accumulation); no-op for f32
            acc_new = (acc * alpha[..., None]
                       + jnp.einsum("bhqk,bkhd->bhqd",
                                    pr.astype(v_blk.dtype), v_blk,
                                    preferred_element_type=jnp.float32))
            return m_new, l_new, acc_new

        b_loc = q.shape[0]  # per-shard batch (b / |batch_axis| under DP)
        m0 = jnp.full((b_loc, h, s_local), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((b_loc, h, s_local), jnp.float32)
        acc0 = jnp.zeros((b_loc, h, s_local, d), jnp.float32)

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


# content-keyed cache for the P^2 per-(query-shard, key-shard) skip
# tables: the numpy scan over the O(S^2) mask is host-side work repeated
# per eager call / retrace otherwise.  Bounded FIFO like the flash mask
# registry.
_RING_TABLE_CACHE = {}
_RING_TABLE_CACHE_MAX = 64


def _ring_tables(mask_bytes, shape, p, block_q, block_k, mask):
    import hashlib
    key = (hashlib.sha1(mask_bytes).hexdigest()[:20], shape, p,
           block_q, block_k)
    hit = _RING_TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    s_local = shape[0] // p
    num_q, num_k = s_local // block_q, s_local // block_k
    khi_all = np.zeros((p, p, num_q), np.int32)
    qlo_all = np.zeros((p, p, num_k), np.int32)
    for qd in range(p):
        for kd in range(p):
            tile = mask[qd * s_local:(qd + 1) * s_local,
                        kd * s_local:(kd + 1) * s_local]
            khi_all[qd, kd], qlo_all[qd, kd] = tile_skip_tables(
                tile, block_q, block_k)
    if len(_RING_TABLE_CACHE) >= _RING_TABLE_CACHE_MAX:
        _RING_TABLE_CACHE.pop(next(iter(_RING_TABLE_CACHE)))
    _RING_TABLE_CACHE[key] = (khi_all, qlo_all)
    return khi_all, qlo_all


def _ring_flash(q, k, v, mask: np.ndarray, mesh: Mesh, axis: str,
                block_q: int, block_k: int, interpret: bool,
                batch_axis: str = None):
    """Ring attention with the Pallas flash kernel as the inner block op
    (VERDICT r2 item 3).

    Forward: each ring step runs ``flash_fwd_lse`` on the local Q rows vs
    the visiting K/V shard — the (s_local, s_local) score tile never
    leaves VMEM — and the per-step ``(out, lse)`` pairs merge with the
    standard logsumexp reweighting.  Per-(query-shard, key-shard) skip
    tables are precomputed in numpy, stacked, and *gathered per ring step*
    as scalar-prefetch data, so arbitrary block-causal layouts keep their
    tile-skip sparsity across the ring.

    Backward: a second ring pass.  Because the saved ``lse``/``delta`` are
    the statistics of the FULL (already merged) softmax, each step's
    ``flash_bwd`` reconstructs the exact global attention weights for its
    tile: dq accumulates locally; dk/dv accumulate on buffers that travel
    WITH the rotating K/V blocks and arrive home after a final shift.
    """
    b, s, h, d = q.shape
    p = mesh.shape[axis]
    s_local = s // p
    khi_all, qlo_all = _ring_tables(
        mask.tobytes(), mask.shape, p, block_q, block_k, mask)
    mask_i8 = jnp.asarray(mask, jnp.int8)
    khi_arr = jnp.asarray(khi_all)
    qlo_arr = jnp.asarray(qlo_all)
    perm = [(i, (i + 1) % p) for i in range(p)]

    def tile_of(mask_rows, src):
        return jax.lax.dynamic_slice(mask_rows, (0, src * s_local),
                                     (s_local, s_local))

    ba = batch_axis
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(ba, axis), P(ba, axis), P(ba, axis), P(axis),
                  P()),
        out_specs=(P(ba, axis), P(ba, None, axis)),
        check_vma=False)
    def fwd_shards(q, k, v, mask_rows, khi):
        idx = jax.lax.axis_index(axis)

        def block(src, k_blk, v_blk):
            # per-step partials in f32: quantizing each step to the input
            # dtype before the logsumexp reweighting would accumulate
            # ~sqrt(p) rounding error with ring size
            return flash_fwd_lse(
                q, k_blk, v_blk, tile_of(mask_rows, src), khi[idx, src],
                block_q=block_q, block_k=block_k, interpret=interpret,
                out_dtype=jnp.float32)

        out0, lse0 = block(idx, k, v)

        def ring_step(state, r):
            out_acc, lse_acc, k_blk, v_blk = state
            k_blk, v_blk = jax.lax.ppermute((k_blk, v_blk), axis, perm)
            src = jax.lax.rem(idx - r + p, p)
            out_j, lse_j = block(src, k_blk, v_blk)
            lse_new = jnp.logaddexp(lse_acc, lse_j)
            w_acc = jnp.moveaxis(jnp.exp(lse_acc - lse_new), 1, 2)[..., None]
            w_j = jnp.moveaxis(jnp.exp(lse_j - lse_new), 1, 2)[..., None]
            out_new = out_acc * w_acc + out_j * w_j
            return (out_new, lse_new, k_blk, v_blk), None

        if p > 1:
            (out_f, lse_f, _, _), _ = jax.lax.scan(
                ring_step, (out0, lse0, k, v), jnp.arange(1, p))
        else:
            out_f, lse_f = out0, lse0
        return out_f.astype(q.dtype), lse_f

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(ba, axis), P(ba, axis), P(ba, axis),
                  P(ba, axis), P(ba, axis), P(ba, None, axis),
                  P(axis), P(), P()),
        out_specs=(P(ba, axis), P(ba, axis), P(ba, axis)),
        check_vma=False)
    def bwd_shards(q, k, v, do, out, lse, mask_rows, khi, qlo):
        idx = jax.lax.axis_index(axis)
        # delta_i = rowsum(dO * O) of the merged output: (B, H, s_local)
        delta = jnp.moveaxis(
            jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1), 1, 2)

        def block(src, k_blk, v_blk):
            # per-step partials in f32 (same contract as the forward's
            # out_dtype): letting the kernel quantize each dq/dk/dv partial
            # to the input dtype before the ring accumulation would grow
            # ~sqrt(p) rounding error with ring size
            return flash_bwd(
                q, k_blk, v_blk, do, lse, delta, tile_of(mask_rows, src),
                khi[idx, src], qlo[idx, src], block_q=block_q,
                block_k=block_k, interpret=interpret,
                out_dtype=jnp.float32)

        dq0, dk0, dv0 = block(idx, k, v)

        def ring_step(state, r):
            dq_acc, k_blk, v_blk, dk_acc, dv_acc = state
            k_blk, v_blk, dk_acc, dv_acc = jax.lax.ppermute(
                (k_blk, v_blk, dk_acc, dv_acc), axis, perm)
            src = jax.lax.rem(idx - r + p, p)
            dq_j, dk_j, dv_j = block(src, k_blk, v_blk)
            return (dq_acc + dq_j, k_blk, v_blk,
                    dk_acc + dk_j, dv_acc + dv_j), None

        if p > 1:
            (dq_f, _, _, dk_t, dv_t), _ = jax.lax.scan(
                ring_step, (dq0, k, v, dk0, dv0), jnp.arange(1, p))
            # traveling accumulators sit one hop short of home: final shift
            dk_f, dv_f = jax.lax.ppermute((dk_t, dv_t), axis, perm)
        else:
            dq_f, dk_f, dv_f = dq0, dk0, dv0
        return (dq_f.astype(q.dtype), dk_f.astype(k.dtype),
                dv_f.astype(v.dtype))

    @functools.partial(jax.custom_vjp, nondiff_argnums=())
    def rfa(q, k, v, mask_i8, khi, qlo):
        out, _ = fwd_shards(q, k, v, mask_i8, khi)
        return out

    def rfa_fwd(q, k, v, mask_i8, khi, qlo):
        out, lse = fwd_shards(q, k, v, mask_i8, khi)
        return out, (q, k, v, out, lse, mask_i8, khi, qlo)

    def rfa_bwd(res, g):
        q, k, v, out, lse, mask_i8, khi, qlo = res
        dq, dk, dv = bwd_shards(q, k, v, g, out, lse, mask_i8, khi, qlo)
        f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
        return dq, dk, dv, f0(mask_i8), f0(khi), f0(qlo)

    rfa.defvjp(rfa_fwd, rfa_bwd)
    return rfa(q, k, v, mask_i8, khi_arr, qlo_arr)
