"""Max-pool over the leading two dims of (H, W, C, N) operands, with a
Pallas TPU kernel for the BACKWARD pass.

Why this exists (reference: the embedder's ``max_pool`` at
tokenizers/images/image_tokenizer.py:163): at octo_base embedder shapes
XLA's ``select_and_scatter`` backward is ~1.45 ms of the ~7.8 ms train
backward (~19%, benchmarks/recorded/train_profile_r3.json) — about 5x its
HBM-traffic lower bound.  Three XLA-level bit-exact replacement VJPs were
measured in round 3 and ALL lost to ``select_and_scatter`` (stacked
argmax 6.0 ms, iterative winner 4.57 ms, prefix-or first-claim 4.91 ms vs
1.64 ms fwd+bwd; benchmarks/exp_pool_argmax{,2}.py, docs/KERNELS.md): each
of their 9 shifted full-size slices materializes in HBM.  Inside a Pallas
kernel the 9 window shifts are VMEM reads, so the HBM traffic is exactly
``read x + read g + write dx`` (~0.37 ms at octo_base shapes on v5e).

MEASURED OUTCOME (v5e, grad of sum at (23,23,64,1600)): the kernel is
bit-exact vs select_and_scatter but SLOWER — 2.35 vs 1.49 ms bf16, 2.02
vs 1.98 ms f32 — ~6x off its traffic bound.  The per-(C,N)-block grid
gathers 529 non-contiguous (sublane,lane) tiles per block from the
(H,W,C,N) HBM layout, and Pass B's 9 dependent read-modify-writes
serialize; neither cost shows in interpret mode.  ``pool_vjp`` therefore
DEFAULTS TO 'xla' (core/config.py) and 'auto' resolves to 'xla'; the
kernel is kept as a measured negative result and for the bench A/B
(bench.py records it each round).

Semantics: gradient routes to the FIRST max position in raster order
within each window — identical to XLA's select_and_scatter tie handling
on TPU (verified on tie-heavy bf16 data: tests/test_pool_vjp.py compares
against ``jax.vjp`` of ``reduce_window`` elementwise).

Forward stays ``lax.reduce_window`` — it is already at its traffic bound
(0.217 ms measured vs ~0.24 ms bound).  Only VALID padding and stride 1
windows are supported by the kernel; anything else falls back to XLA's
VJP (the embedder default is window 3x3, stride 1, VALID).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


__all__ = ["max_pool_hwcn"]


def _reduce_window_max(x, window):
    wh, ww = window
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (wh, ww, 1, 1), (1, 1, 1, 1), "VALID")


def _pool_bwd_kernel(x_ref, g_ref, dx_ref, *, wh: int, ww: int):
    """One (C-tile, N-tile) block: recompute per-window first-match argmax
    from x, then scatter g along the 9 static shifts into dx.

    All shifts index the two LEADING dims, which Mosaic keeps un-tiled —
    slices are address offsets of whole (sublane, lane) tiles.
    """
    x = x_ref[...]                       # (H, W, Cb, Nb)
    h, w = x.shape[0], x.shape[1]
    oh, ow = h - wh + 1, w - ww + 1
    out_shape = (oh, ow) + x.shape[2:]

    # Pass A: running max + first-match argmax (strict > keeps the FIRST
    # raster-order winner).  Comparisons run in f32 — Mosaic rejects cmpf
    # on packed bf16 vectors ("Target does not support this comparison"
    # on v5e) — with the cast done per window slice so only the running
    # max/argmax are f32-materialized, not a full f32 copy of x.
    m = jnp.full(out_shape, -jnp.inf, jnp.float32)
    amax = jnp.zeros(out_shape, jnp.float32)
    k = 0
    for di in range(wh):
        for dj in range(ww):
            xs = jax.lax.slice(x, (di, dj, 0, 0),
                               (di + oh, dj + ow) + x.shape[2:]
                               ).astype(jnp.float32)
            gt = xs > m
            amax = jnp.where(gt, jnp.full_like(amax, float(k)), amax)
            m = jnp.where(gt, xs, m)
            k += 1

    # Pass B: route g to the winning input position.  Accumulate directly
    # in the output block (read-modify-write on static slices); a given
    # input position receives at most wh*ww contributions.
    g = g_ref[...].astype(dx_ref.dtype)  # (oh, ow, Cb, Nb)
    zero = jnp.zeros_like(g)
    dx_ref[...] = jnp.zeros(x.shape, dx_ref.dtype)
    k = 0
    for di in range(wh):
        for dj in range(ww):
            contrib = jnp.where(amax == float(k), g, zero)
            sl = (slice(di, di + oh), slice(dj, dj + ow))
            dx_ref[sl] = dx_ref[sl] + contrib
            k += 1


def _pick_blocks(c: int, n: int, dtype) -> tuple:
    """(C, N) block sizes: one native sublane tile of C, a lane tile of
    N.  The last block dim must be 128-divisible (or the full array
    dim), so VMEM is managed via the C (sublane) block only; the
    pallas_call sets vmem_limit_bytes to cover the double-buffered
    blocks plus the kernel's f32 running max/argmax temporaries."""
    sub = 16 if dtype == jnp.bfloat16 else 8
    return min(c, sub), min(n, 128)


def _pool_bwd_pallas(x, g, window, interpret):
    wh, ww = window
    h, w, c, n = x.shape
    bc, bn = _pick_blocks(c, n, x.dtype)
    grid = (pl.cdiv(c, bc), pl.cdiv(n, bn))
    kernel = functools.partial(_pool_bwd_kernel, wh=wh, ww=ww)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((h, w, bc, bn), lambda i, j: (0, 0, i, j)),
            pl.BlockSpec((h - wh + 1, w - ww + 1, bc, bn),
                         lambda i, j: (0, 0, i, j)),
        ],
        out_specs=pl.BlockSpec((h, w, bc, bn), lambda i, j: (0, 0, i, j)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        # f32 blocks at C=8 plus the double-buffered pipeline sit just
        # over the default 16 MB scoped-vmem budget; size the limit to
        # the actual working set instead (x/g/dx blocks double-buffered
        # + f32 running max/argmax), capped well under the 128 MB VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _max_pool_hwcn_pallas_vjp(x, window, interpret):
    return _reduce_window_max(x, window)


def _fwd(x, window, interpret):
    return _reduce_window_max(x, window), x


def _bwd(window, interpret, x, g):
    return (_pool_bwd_pallas(x, g, window, interpret),)


_max_pool_hwcn_pallas_vjp.defvjp(_fwd, _bwd)


def max_pool_hwcn(x, window=(3, 3), strides=(1, 1), *, vjp="pallas",
                  interpret=False):
    """VALID max-pool over dims (0, 1) of a 4-D (H, W, C, N) array.

    vjp='pallas' uses the Pallas backward kernel (stride-1 windows only);
    vjp='xla' or unsupported configs use XLA's select_and_scatter VJP.
    """
    if x.ndim != 4:
        raise ValueError(f"max_pool_hwcn expects a 4-D (H, W, C, N) "
                         f"array, got shape {x.shape}")
    window = tuple(int(v) for v in window)
    strides = tuple(int(v) for v in strides)
    if vjp == "pallas" and strides == (1, 1):
        return _max_pool_hwcn_pallas_vjp(x, window, interpret)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (*window, 1, 1), (*strides, 1, 1),
        "VALID")
