"""Experiments for the 3x3 block-conv bottleneck (embedder profile r3:
block_conv = 2.4 ms/call at MFU 0.10, called twice -> 66% of the embedder).

The conv runs per-patch on (BG, 21, 21, 64) bf16 (SAME padding, BG=1600
independent patches).  Key structural fact exploited by the Pallas
variants: in a FLAT (BG*441, 64) row layout, the 3x3 tap with offset
(dy, dx) maps output row m to input row m + (dy-1)*21 + (dx-1), and every
out-of-patch source row is exactly a masked (zero-padding) position — so
an aproned VMEM copy + 9 constant row-shifts + border masks give implicit
im2col with NO reshapes (Mosaic cannot split sublane dims in-kernel).

Variants:
  xla          — baseline lax conv (what the module runs today)
  xla_strip    — one long (1, BG*23, 23, 64) VALID conv, slice rows out
  xla_c128     — same conv at C=128 (ceiling probe, not equivalent math)
  pallas_tap64   — 9 masked row-shift GEMMs, K=64
  pallas_im2col  — 9 shifted slabs stored into a (R, 576) scratch, 1 GEMM

Correctness asserted on-device (max|diff| scalar) before timing.
"""

import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_loop, sec_per_call, device_peak_flops, log  # noqa: E402

BG = 1600
DT = jnp.bfloat16
T = int(os.environ.get("EXP_T", "8"))   # patches per program
HW = 21                                  # patch spatial side
PP = HW * HW                             # 441 rows per patch
R = T * PP                               # rows per program
APRON = HW + 1                           # max |row shift| = 22


def xla_conv(x, w, b):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                     dimension_numbers=dn,
                                     preferred_element_type=DT)
    return y + b


def xla_strip(x, w, b):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))      # (BG,23,23,64)
    strip = xp.reshape(1, BG * 23, 23, 64)
    dn = jax.lax.conv_dimension_numbers(strip.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(strip, w, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     preferred_element_type=DT)
    y = jnp.pad(y, ((0, 0), (0, 2), (0, 0), (0, 0))).reshape(BG, 23, 21, 64)
    return y[:, :21] + b


def _row_masks():
    """Static per-tap keep conditions on (r, c) within a patch."""
    m = np.arange(PP, dtype=np.int32)
    r, c = m // HW, m % HW
    masks = {}
    for dy in range(3):
        for dx in range(3):
            keep = ((r + dy - 1 >= 0) & (r + dy - 1 < HW)
                    & (c + dx - 1 >= 0) & (c + dx - 1 < HW))
            masks[(dy, dx)] = np.tile(keep, T)[:, None]  # (R, 1)
    return masks


def _tap64_kernel(x_ref, w_ref, b_ref, masks_ref, o_ref, scratch):
    scratch[0:APRON, :] = jnp.zeros((APRON, 64), x_ref.dtype)
    scratch[APRON + R:, :] = jnp.zeros((APRON, 64), x_ref.dtype)
    scratch[APRON:APRON + R, :] = x_ref[:]
    acc = jnp.zeros((R, 64), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = dy * 3 + dx
            shift = (dy - 1) * HW + (dx - 1)
            p = scratch[APRON + shift:APRON + shift + R, :]
            keep = masks_ref[tap, :, :]  # (R, 1) int8
            p = jnp.where(keep != 0, p, jnp.zeros_like(p))
            acc = acc + jax.lax.dot_general(
                p, w_ref[tap], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[:] = (acc + b_ref[:]).astype(o_ref.dtype)


def _im2col_kernel(x_ref, w_ref, b_ref, masks_ref, o_ref, scratch, cols):
    scratch[0:APRON, :] = jnp.zeros((APRON, 64), x_ref.dtype)
    scratch[APRON + R:, :] = jnp.zeros((APRON, 64), x_ref.dtype)
    scratch[APRON:APRON + R, :] = x_ref[:]
    for dy in range(3):
        for dx in range(3):
            tap = dy * 3 + dx
            shift = (dy - 1) * HW + (dx - 1)
            p = scratch[APRON + shift:APRON + shift + R, :]
            keep = masks_ref[tap, :, :]
            cols[:, tap * 64:(tap + 1) * 64] = jnp.where(
                keep != 0, p, jnp.zeros_like(p))
    out = jax.lax.dot_general(
        cols[:], w_ref[:].reshape(576, 64), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = (out + b_ref[:]).astype(o_ref.dtype)


def _pallas_conv(x2d, w9, b2, masks, kernel, extra_scratch):
    return pl.pallas_call(
        kernel,
        grid=(BG // T,),
        in_specs=[
            pl.BlockSpec((R, 64), lambda i: (i, 0)),
            pl.BlockSpec((9, 64, 64), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, 64), lambda i: (0, 0)),
            pl.BlockSpec((9, R, 1), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((R, 64), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((BG * PP, 64), x2d.dtype),
        scratch_shapes=[pltpu.VMEM((R + 2 * APRON, 64), x2d.dtype)]
        + extra_scratch,
    )(x2d, w9, b2, masks)


def pallas_tap64(x2d, w9, b2, masks):
    return _pallas_conv(x2d, w9, b2, masks, _tap64_kernel, [])


def pallas_im2col(x2d, w9, b2, masks):
    return _pallas_conv(x2d, w9, b2, masks, _im2col_kernel,
                        [pltpu.VMEM((R, 576), x2d.dtype)])


def main():
    peak, kind = device_peak_flops()
    log(f"[exp] device={kind} T={T}")
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x2 = jax.random.normal(ks[0], (2, BG, HW, HW, 64), DT)
    w = jax.random.normal(ks[1], (3, 3, 64, 64), DT) * 0.05
    b = jax.random.normal(ks[2], (64,), DT) * 0.1
    # tap-major weights (9, cin, cout); rows of the (576, 64) matrix are
    # ordered (dy, dx, cin) which matches HWIO reshape
    w9 = w.reshape(9, 64, 64)
    b2 = b.reshape(1, 64)
    masks = jnp.asarray(
        np.stack([m for m in _row_masks().values()]), jnp.int8)
    x2d_2 = x2.reshape(2, BG * PP, 64)

    @jax.jit
    def _diffs(x, x2d):
        ref = xla_conv(x, w, b).astype(jnp.float32).reshape(BG * PP, 64)
        d = {}
        d["strip"] = jnp.max(jnp.abs(
            xla_strip(x, w, b).astype(jnp.float32).reshape(BG * PP, 64)
            - ref))
        d["tap64"] = jnp.max(jnp.abs(
            pallas_tap64(x2d, w9, b2, masks).astype(jnp.float32) - ref))
        d["im2col"] = jnp.max(jnp.abs(
            pallas_im2col(x2d, w9, b2, masks).astype(jnp.float32) - ref))
        return d, jnp.max(jnp.abs(ref))

    d, scale = _diffs(x2[0], x2d_2[0])
    scale = float(scale)
    d = {k: float(v) for k, v in d.items()}
    log(f"[exp] max|diff| {d} (ref scale {scale:.1f})")
    for k, v in d.items():
        assert v < 0.02 * scale, f"{k} mismatch: {v}"
    log("[exp] correctness OK")

    def timed(name, fn, stack, *rest):
        def step(i, stk, *args):
            x = jax.lax.dynamic_index_in_dim(stk, i % stk.shape[0],
                                             keepdims=False)
            return jnp.sum(fn(x, *args).astype(jnp.float32))
        sec = sec_per_call(build_loop(step), (stack, *rest), label=name)
        gf = 2 * BG * PP * 576 * 64 / 1e9
        log(f"[exp] {name}: {sec*1e3:.3f} ms  "
            f"({gf/sec/1e3:.1f} TF/s, mfu {gf/sec/1e9/(peak/1e12):.3f})")
        return sec

    timed("xla", xla_conv, x2, w, b)
    timed("xla_strip", xla_strip, x2, w, b)
    x128 = jax.random.normal(ks[5], (2, BG, HW, HW, 128), DT)
    w128 = jax.random.normal(ks[6], (3, 3, 128, 128), DT) * 0.05
    b128 = jnp.zeros((128,), DT)
    timed("xla_c128(2x flops)", xla_conv, x128, w128, b128)
    timed("pallas_tap64", pallas_tap64, x2d_2, w9, b2, masks)
    timed("pallas_im2col", pallas_im2col, x2d_2, w9, b2, masks)


if __name__ == "__main__":
    main()
