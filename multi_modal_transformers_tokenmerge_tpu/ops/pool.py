"""Max-pool over the leading two dims of (H, W, C, N) operands, with a
Pallas TPU kernel for the BACKWARD pass.

Why this exists (reference: the embedder's ``max_pool`` at
tokenizers/images/image_tokenizer.py:163): at octo_base embedder shapes
XLA's ``select_and_scatter`` backward is ~1.3-1.5 ms of the ~7.8 ms train
backward (~19%, benchmarks/recorded/train_profile_r3.json) — about 4x its
HBM-traffic lower bound.  Three XLA-level bit-exact replacement VJPs were
measured in round 3 and ALL lost to ``select_and_scatter`` (stacked
argmax 6.0 ms, iterative winner 4.57 ms, prefix-or first-claim 4.91 ms vs
1.64 ms fwd+bwd; benchmarks/exp_pool_argmax{,2}.py, docs/KERNELS.md): each
of their 9 shifted full-size slices materializes in HBM.

KERNEL HISTORY — both Pallas kernels are MEASURED NEGATIVE RESULTS and
``pool_vjp`` defaults to 'xla'.  The round-3 kernel blocked over (C, N)
and kept (H, W) as the un-tiled leading dims of each block — so every
window shift gathered 529 separate (sublane, lane) tiles from HBM and it
LOST to select_and_scatter (2.35 vs 1.49 ms bf16).  This round-4 kernel
fixes exactly that: the wrapper reshapes (H, W, C, N) -> (H, W*C, N) — a
layout-preserving view, W and C are adjacent — so a window shift
(di, dj) becomes a slice at row di (un-tiled leading dim) and sublane
offset dj*C (tile-aligned whenever C is a multiple of the sublane
count, e.g. C=64); first-match claims are tracked by poisoning claimed
positions of the running max with NaN (x == NaN is false for every later
window), eliminating the argmax and found-mask temporaries.  MEASURED
(v5e, octo_base shapes, benchmarks/recorded/pool_pallas_r4.json): STILL
loses — 2.59 vs 1.52 ms backward, 0.955x e2e train — the 9 dependent
read-modify-write passes over the dx block serialize against a
near-VMEM-limit working set.  XLA's single-pass fused select_and_scatter
remains the measured optimum; the kernel stays for the bench A/B and as
the recorded upper bound on what this formulation buys.

Semantics: gradient routes to the FIRST max position in raster order
within each window — identical to XLA's select_and_scatter tie handling
on TPU (verified on tie-heavy bf16 data: tests/test_pool_vjp.py compares
against ``jax.vjp`` of ``reduce_window`` elementwise).  (On NaN inputs
the two differ — SAS routes to the first NaN, this kernel drops the
gradient — matching XLA is meaningless for NaN losses.)

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


def _pool_bwd_kernel(x_ref, g_ref, dx_ref, *, wh: int, ww: int, c: int):
    """One N-block on the folded (H, W*C, Nb) layout: route g to the
    first raster-order max of each window.

    x_ref (H, W*C, Nb); g_ref (OH, OW*C, Nb); dx_ref like x_ref.  All
    shifts are a leading-dim row offset (di) plus a sublane offset
    (dj*c) — whole-tile address arithmetic, no gathers.

    Pass A recomputes the per-window max in f32 (cheaper than streaming
    the forward output from HBM: 90 MB saved at octo_base shapes, and it
    keeps the VMEM working set inside the scoped budget).  Pass B claims
    winners in raster order, poisoning claimed positions with NaN so no
    later window slot can re-match them — first match wins, matching
    XLA's select_and_scatter tie rule.
    """
    oh, owc = g_ref.shape[0], g_ref.shape[1]
    slices = [(slice(di, di + oh), slice(dj * c, dj * c + owc))
              for di in range(wh) for dj in range(ww)]

    y_w = jnp.full((oh, owc, g_ref.shape[2]), -jnp.inf, jnp.float32)
    for sl in slices:
        y_w = jnp.maximum(y_w, x_ref[sl].astype(jnp.float32))

    g = g_ref[...]
    dx_ref[...] = jnp.zeros(x_ref.shape, dx_ref.dtype)
    for sl in slices:
        sel = x_ref[sl].astype(jnp.float32) == y_w
        dx_ref[sl] = dx_ref[sl] + jnp.where(
            sel, g, jnp.zeros((), g.dtype))
        y_w = jnp.where(sel, jnp.full((), jnp.nan, jnp.float32), y_w)


def _pool_bwd_pallas(x, g, window, c, interpret):
    wh, ww = window
    h, wc, n = x.shape
    oh, owc = h - wh + 1, wc - (ww - 1) * c
    bn = min(n, 128)
    grid = (pl.cdiv(n, bn),)
    kernel = functools.partial(_pool_bwd_kernel, wh=wh, ww=ww, c=c)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((h, wc, bn), lambda j: (0, 0, j)),
            pl.BlockSpec((oh, owc, bn), lambda j: (0, 0, j)),
        ],
        out_specs=pl.BlockSpec((h, wc, bn), lambda j: (0, 0, j)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        # working set at octo_base shapes: x/g blocks double-buffered
        # (~31 MB) + dx out (~17 MB) + the f32 running max (~14 MB) +
        # transient f32 compare slices; cap under the 128 MB VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _max_pool_hwcn_pallas_vjp(x, window, interpret):
    return _reduce_window_max(x, window)


def _fwd(x, window, interpret):
    return _reduce_window_max(x, window), x


def _bwd(window, interpret, x, g):
    h, w, c, n = x.shape
    wh, ww = window
    oh, ow = h - wh + 1, w - ww + 1
    # (H, W, C, N) -> (H, W*C, N): W and C are adjacent dims, so this is
    # a layout-preserving view (free), and window column shifts become
    # sublane offsets of dj*C
    x2 = x.reshape(h, w * c, n)
    g2 = g.reshape(oh, ow * c, n)
    dx2 = _pool_bwd_pallas(x2, g2, window, c, interpret)
    return (dx2.reshape(h, w, c, n),)


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
