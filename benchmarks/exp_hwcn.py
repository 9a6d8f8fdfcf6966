"""Batch-in-lanes (HWCN) conv layout experiment.

Finding (exp_block_conv r3): XLA's TPU conv on (1600, 21, 21, 64) runs at
153 TF/s when the operand is a jit parameter — whose layout XLA chooses as
{0,3,2,1}, i.e. BATCH minor (in lanes), channels in sublanes — but at ~20
TF/s mid-graph where intermediates keep the default channels-minor layout
and layout assignment refuses the transpose.

The fix candidate: make the *logical* last dim the patch-batch dim
(H, W, C, N) so the default minor-to-major layout IS batch-in-lanes, and
give the convs dim_labels "01fb".  This script validates numerics and
measures the layout end to end on a full embedder-shaped composition.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_loop, sec_per_call, device_peak_flops, log  # noqa: E402

B, G = 32, 50
BG = B * G
DT = jnp.bfloat16
DN_NHWC = ("NHWC", "HWIO", "NHWC")
DN_HWCN = ("HWCN", "HWIO", "HWCN")


def conv(x, w, dn, strides=(1, 1), padding="SAME"):
    nums = jax.lax.conv_dimension_numbers(x.shape, w.shape, dn)
    return jax.lax.conv_general_dilated(x, w, strides, padding,
                                        dimension_numbers=nums,
                                        preferred_element_type=DT)


def embed_nhwc(x, params):
    """Current module structure: (B, G, 56, 56, 3) flax-style."""
    w_in, b_in, w0, b0, w1, b1, wd, bd, gam, bet = params
    y = conv(x.reshape(BG, 56, 56, 3), w_in, DN_NHWC, (2, 2), "VALID") + b_in
    y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 1, 1, 1), "VALID")
    res = y
    for (wb, bb, g_, b_) in ((w0, b0, gam[0], bet[0]), (w1, b1, gam[1],
                                                        bet[1])):
        f = y.astype(jnp.float32).reshape(B, G, 21, 21, 32, 2)
        mu = f.mean(axis=(1, 2, 3, 5), keepdims=True)
        var = ((f - mu) ** 2).mean(axis=(1, 2, 3, 5), keepdims=True)
        f = (f - mu) * jax.lax.rsqrt(var + 1e-6)
        y = (f.reshape(BG, 21, 21, 64) * g_ + b_).astype(DT)
        y = jax.nn.gelu(y)
        y = conv(y, wb, DN_NHWC) + bb
    y = y + res
    y = y.reshape(BG, 21 * 21 * 64)
    return (jnp.dot(y, wd, preferred_element_type=DT) + bd).reshape(B, G, 768)


def embed_hwcn(x, params):
    """Batch-in-lanes: same math, logical layout (H, W, C, BG)."""
    w_in, b_in, w0, b0, w1, b1, wd, bd, gam, bet = params
    # (B, G, 56, 56, 3) -> (56, 56, 3, B*G): one transpose of the (small)
    # normalized patch tensor
    xt = x.reshape(BG, 56, 56, 3).transpose(1, 2, 3, 0)
    y = conv(xt, w_in, DN_HWCN, (2, 2), "VALID") + b_in[:, None]
    y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (3, 3, 1, 1),
                              (1, 1, 1, 1), "VALID")   # (21, 21, 64, BG)
    res = y
    for (wb, bb, g_, b_) in ((w0, b0, gam[0], bet[0]), (w1, b1, gam[1],
                                                        bet[1])):
        f = y.astype(jnp.float32).reshape(21, 21, 32, 2, B, G)
        mu = f.mean(axis=(0, 1, 3, 5), keepdims=True)
        var = ((f - mu) ** 2).mean(axis=(0, 1, 3, 5), keepdims=True)
        f = (f - mu) * jax.lax.rsqrt(var + 1e-6)
        y = (f.reshape(21, 21, 64, BG) * g_[:, None] + b_[:, None]).astype(DT)
        y = jax.nn.gelu(y)
        y = conv(y, wb, DN_HWCN) + bb[:, None]
    y = y + res
    # dense without a physical transpose: contract (h, w, c) of (21,21,64,
    # BG) against (28224, 768) via a TN dot
    y2 = y.reshape(21 * 21 * 64, BG)
    out = jax.lax.dot_general(y2, wd, (((0,), (0,)), ((), ())),
                              preferred_element_type=DT)  # (BG, 768)
    return (out + bd).reshape(B, G, 768)


def main():
    peak, kind = device_peak_flops()
    log(f"[hwcn] device={kind}")
    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    x2 = jax.random.normal(ks[0], (2, B, G, 56, 56, 3), DT)
    params = (
        jax.random.normal(ks[1], (12, 12, 3, 64), DT) * 0.05,   # w_in
        jax.random.normal(ks[2], (64,), DT) * 0.1,              # b_in
        jax.random.normal(ks[3], (3, 3, 64, 64), DT) * 0.05,    # w0
        jnp.zeros((64,), DT),                                   # b0
        jax.random.normal(ks[4], (3, 3, 64, 64), DT) * 0.05,    # w1
        jnp.zeros((64,), DT),                                   # b1
        jax.random.normal(ks[5], (21 * 21 * 64, 768), DT) * 0.01,  # wd
        jnp.zeros((768,), DT),                                  # bd
        1.0 + 0.1 * jax.random.normal(ks[6], (2, 64), jnp.float32),  # gamma
        0.1 * jax.random.normal(ks[7], (2, 64), jnp.float32),   # beta
    )

    @jax.jit
    def _diff(x):
        a = embed_nhwc(x, params).astype(jnp.float32)
        b = embed_hwcn(x, params).astype(jnp.float32)
        return jnp.max(jnp.abs(a - b)), jnp.max(jnp.abs(a))

    d, scale = map(float, _diff(x2[0]))
    log(f"[hwcn] max|diff|={d:.5f} scale={scale:.1f}")
    assert d < 0.02 * scale, "layout variant diverges"
    log("[hwcn] correctness OK")

    def timed(name, fn):
        def step(i, stk):
            x = jax.lax.dynamic_index_in_dim(stk, i % stk.shape[0],
                                             keepdims=False)
            return jnp.sum(fn(x, params).astype(jnp.float32))
        sec = sec_per_call(build_loop(step), (x2,), label=name)
        log(f"[hwcn] {name}: {sec*1e3:.3f} ms")
        return sec

    t_a = timed("embed_nhwc", embed_nhwc)
    t_b = timed("embed_hwcn", embed_hwcn)
    log(f"[hwcn] speedup {t_a/t_b:.2f}x")


if __name__ == "__main__":
    main()
