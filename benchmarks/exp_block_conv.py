"""Experiments for the 3x3 block-conv bottleneck (embedder profile r3:
block_conv = 2.4 ms/call at MFU 0.10, called twice -> 66% of the embedder).

Variants (all mathematically the 3x3 SAME conv on (BG, 21, 21, 64) bf16):
  xla          — baseline lax conv (what the module runs today)
  xla_strip    — one long (1, BG*23, 23, 64) VALID conv, slice out rows
  xla_c128     — same conv at C=128 (ceiling probe, not equivalent math)
  pallas       — implicit-im2col VMEM kernel (T patches/program)
  pallas_fused — GN-affine + GELU + conv in one kernel

Correctness is asserted vs the XLA conv before timing.
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
T = int(os.environ.get("EXP_T", "8"))  # patches per program


def xla_conv(x, w, b):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                     dimension_numbers=dn,
                                     preferred_element_type=DT)
    return y + b


def xla_strip(x, w, b):
    # fold BG into H: pad each patch to 23 rows, one long VALID conv, then
    # slice the 21 valid rows back out
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))      # (BG,23,23,64)
    strip = xp.reshape(1, BG * 23, 23, 64)
    dn = jax.lax.conv_dimension_numbers(strip.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(strip, w, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     preferred_element_type=DT)
    # y: (1, BG*23-2, 21, 64); rows k*23..k*23+20 are patch k's outputs
    y = jnp.pad(y, ((0, 0), (0, 2), (0, 0), (0, 0))).reshape(BG, 23, 21, 64)
    return y[:, :21] + b


# --- pallas implicit-im2col ------------------------------------------------

def _conv_kernel(x_ref, w_ref, b_ref, o_ref):
    t = x_ref.shape[0]
    z = x_ref[:].reshape(t, 21, 21, 64)
    z = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [z[:, dy:dy + 21, dx:dx + 21, :].reshape(t, 441, 64)
            for dy in range(3) for dx in range(3)]
    p = jnp.concatenate(cols, axis=-1).reshape(t * 441, 576)
    out = jax.lax.dot_general(p, w_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[:] = (out + b_ref[:]).astype(o_ref.dtype).reshape(t, 441, 64)


def pallas_conv(x, wmat, b, interpret=False):
    # x: (BG, 441, 64); wmat: (576, 64) with tap-major rows; b: (1, 64)
    return pl.pallas_call(
        _conv_kernel,
        grid=(BG // T,),
        in_specs=[
            pl.BlockSpec((T, 441, 64), lambda i: (i, 0, 0)),
            pl.BlockSpec((576, 64), lambda i: (0, 0)),
            pl.BlockSpec((1, 64), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((T, 441, 64), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((BG, 441, 64), x.dtype),
        interpret=interpret,
    )(x, wmat, b)


def _fused_kernel(x_ref, a_ref, s_ref, w_ref, b_ref, o_ref):
    t = x_ref.shape[0]
    xf = x_ref[:].astype(jnp.float32)
    z = jax.nn.gelu(xf * a_ref[:][:, None, :] + s_ref[:][:, None, :])
    z = z.astype(x_ref.dtype).reshape(t, 21, 21, 64)
    z = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [z[:, dy:dy + 21, dx:dx + 21, :].reshape(t, 441, 64)
            for dy in range(3) for dx in range(3)]
    p = jnp.concatenate(cols, axis=-1).reshape(t * 441, 576)
    out = jax.lax.dot_general(p, w_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[:] = (out + b_ref[:]).astype(o_ref.dtype).reshape(t, 441, 64)


def pallas_fused(x, a, s, wmat, b, interpret=False):
    # GN affine (a, s per (patch, channel), f32) + GELU + 3x3 conv
    return pl.pallas_call(
        _fused_kernel,
        grid=(BG // T,),
        in_specs=[
            pl.BlockSpec((T, 441, 64), lambda i: (i, 0, 0)),
            pl.BlockSpec((T, 64), lambda i: (i, 0)),
            pl.BlockSpec((T, 64), lambda i: (i, 0)),
            pl.BlockSpec((576, 64), lambda i: (0, 0)),
            pl.BlockSpec((1, 64), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((T, 441, 64), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((BG, 441, 64), x.dtype),
        interpret=interpret,
    )(x, a, s, wmat, b)


def w_to_mat(w):
    # (3, 3, 64, 64) HWIO -> (576, 64) rows ordered (dy, dx, cin)
    return w.reshape(576, 64)


def main():
    peak, kind = device_peak_flops()
    log(f"[exp] device={kind} T={T}")
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x2 = jax.random.normal(ks[0], (2, BG, 21, 21, 64), DT)
    w = (jax.random.normal(ks[1], (3, 3, 64, 64), DT) * 0.05)
    b = jax.random.normal(ks[2], (64,), DT) * 0.1
    a_aff = 1.0 + 0.1 * jax.random.normal(ks[3], (BG, 64), jnp.float32)
    s_aff = 0.1 * jax.random.normal(ks[4], (BG, 64), jnp.float32)
    wmat, b2 = w_to_mat(w), b.reshape(1, 64)
    x_flat2 = x2.reshape(2, BG, 441, 64)

    # --- correctness: device-side max-abs-diff only (98MB transfers over
    # the axon tunnel are prohibitively slow)
    @jax.jit
    def _diffs(x, xf):
        ref = xla_conv(x, w, b).astype(jnp.float32)
        d_strip = jnp.max(jnp.abs(xla_strip(x, w, b).astype(jnp.float32)
                                  - ref))
        d_pal = jnp.max(jnp.abs(
            pallas_conv(xf, wmat, b2).reshape(BG, 21, 21, 64)
            .astype(jnp.float32) - ref))
        zf = jax.nn.gelu(x.astype(jnp.float32) * a_aff[:, None, None, :]
                         + s_aff[:, None, None, :])
        ref_f = xla_conv(zf.astype(DT), w, b).astype(jnp.float32)
        d_fused = jnp.max(jnp.abs(
            pallas_fused(xf, a_aff, s_aff, wmat, b2)
            .reshape(BG, 21, 21, 64).astype(jnp.float32) - ref_f))
        scale = jnp.max(jnp.abs(ref))
        return d_strip, d_pal, d_fused, scale

    d_strip, d_pal, d_fused, scale = map(float, _diffs(x2[0], x_flat2[0]))
    log(f"[exp] max|diff| strip={d_strip:.4f} pallas={d_pal:.4f} "
        f"fused={d_fused:.4f} (ref scale {scale:.1f})")
    tol = 0.02 * scale
    assert d_strip < tol and d_pal < tol and d_fused < tol, "mismatch"
    log("[exp] correctness OK")

    def timed(name, fn, stack):
        def step(i, stk, *rest):
            x = jax.lax.dynamic_index_in_dim(stk, i % stk.shape[0],
                                             keepdims=False)
            return jnp.sum(fn(x, *rest).astype(jnp.float32))
        sec = sec_per_call(build_loop(step), stack, label=name)
        gf = 2 * BG * 441 * 576 * 64 / 1e9
        log(f"[exp] {name}: {sec*1e3:.3f} ms  "
            f"({gf/sec/1e3:.1f} TF/s, mfu {gf/sec/1e9/(peak/1e12):.3f})")
        return sec

    timed("xla", xla_conv, (x2, w, b))
    timed("xla_strip", xla_strip, (x2, w, b))
    x128 = jax.random.normal(ks[5], (2, BG, 21, 21, 128), DT)
    w128 = jax.random.normal(ks[6], (3, 3, 128, 128), DT) * 0.05
    b128 = jnp.zeros((128,), DT)
    timed("xla_c128(2x flops)", xla_conv, (x128, w128, b128))
    timed("pallas", pallas_conv, (x_flat2, wmat, b2))
    timed("pallas_fused", pallas_fused, (x_flat2, a_aff, s_aff, wmat, b2))


if __name__ == "__main__":
    main()
