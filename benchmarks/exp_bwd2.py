"""Round 2 of the backward hunt (see exp_hwcn_bwd.py).

In the real train step the input conv's dx is NOT computed (its input is
the patchified image, a leaf), so what matters is wgrad-only.  Probes:

  in_wgrad_hwcn    — input conv grad wrt w only, HWCN
  in_wgrad_nhwc    — same in NHWC (incl. the transposes to get there)
  in_wgrad_s2d     — space-to-depth 6x6/1 reformulation, wgrad-only
  blk_wgrad / blk_dgrad — block conv split costs
  pool_bwd_sas     — select_and_scatter (autodiff default)
  pool_bwd_mask    — custom equality-mask backward (9 shifted fused adds)
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


def conv_hwcn(x, w, strides, padding):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("HWCN", "HWIO", "HWCN"))
    return jax.lax.conv_general_dilated(
        x, w, strides, padding, dimension_numbers=dn,
        preferred_element_type=DT)


def conv_nhwc(x, w, strides, padding):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, strides, padding, dimension_numbers=dn,
        preferred_element_type=DT)


def main():
    peak, kind = device_peak_flops()
    log(f"[bwd2] device={kind}")
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x_in2 = jax.random.normal(ks[0], (2, 56, 56, 3, BG), DT)
    x_p2 = jax.random.normal(ks[1], (2, 21, 21, 64, BG), DT)
    x_c2 = jax.random.normal(ks[2], (2, 23, 23, 64, BG), DT)
    w_in = jax.random.normal(ks[3], (12, 12, 3, 64), DT) * 0.05
    w_s2d = jax.random.normal(ks[4], (6, 6, 12, 64), DT) * 0.05
    w_blk = jax.random.normal(ks[5], (3, 3, 64, 64), DT) * 0.05

    def timed(name, step, args):
        s = sec_per_call(build_loop(step), args, name)
        log(f"[bwd2] {name}: {s*1e3:.3f} ms")
        return s

    def checksum(v):
        return jnp.sum(v.astype(jnp.float32)) * 1e-9

    # --- input conv wgrad-only, HWCN
    def in_wgrad_hwcn(i, xs, w):
        x = jax.lax.dynamic_index_in_dim(xs, i % 2, keepdims=False)
        def f(w):
            return jnp.sum(conv_hwcn(x, w, (2, 2), "VALID")
                           .astype(jnp.float32) ** 2)
        l, g = jax.value_and_grad(f)(w)
        return l + checksum(g)

    # --- input conv wgrad-only, NHWC (with layout transposes counted)
    def in_wgrad_nhwc(i, xs, w):
        xt = jax.lax.dynamic_index_in_dim(xs, i % 2, keepdims=False)
        x = jnp.transpose(xt, (3, 0, 1, 2))  # (BG, 56, 56, 3)
        def f(w):
            return jnp.sum(conv_nhwc(x, w, (2, 2), "VALID")
                           .astype(jnp.float32) ** 2)
        l, g = jax.value_and_grad(f)(w)
        return l + checksum(g)

    # --- space-to-depth 6x6/1, wgrad-only, HWCN
    def in_wgrad_s2d(i, xs, w):
        xt = jax.lax.dynamic_index_in_dim(xs, i % 2, keepdims=False)
        # (56,56,3,N) -> (28,28,12,N): fold the stride-2 phase into C
        x = xt.reshape(28, 2, 28, 2, 3, BG).transpose(0, 2, 1, 3, 4, 5)
        x = x.reshape(28, 28, 12, BG)
        def f(w):
            return jnp.sum(conv_hwcn(x, w, (1, 1), "VALID")
                           .astype(jnp.float32) ** 2)
        l, g = jax.value_and_grad(f)(w)
        return l + checksum(g)

    # --- block conv: wgrad-only and dgrad-only
    def blk_wgrad(i, xs, w):
        x = jax.lax.dynamic_index_in_dim(xs, i % 2, keepdims=False)
        def f(w):
            return jnp.sum(conv_hwcn(x, w, (1, 1), "SAME")
                           .astype(jnp.float32) ** 2)
        l, g = jax.value_and_grad(f)(w)
        return l + checksum(g)

    def blk_dgrad(i, xs, w):
        x = jax.lax.dynamic_index_in_dim(xs, i % 2, keepdims=False)
        def f(x):
            return jnp.sum(conv_hwcn(x, w, (1, 1), "SAME")
                           .astype(jnp.float32) ** 2)
        l, g = jax.value_and_grad(f)(x)
        return l + checksum(g)

    # --- max pool backwards
    def pool(x):
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                     (3, 3, 1, 1), (1, 1, 1, 1), "VALID")

    def pool_sas(i, xs):
        x = jax.lax.dynamic_index_in_dim(xs, i % 2, keepdims=False)
        def f(x):
            return jnp.sum(pool(x).astype(jnp.float32) ** 2)
        l, g = jax.value_and_grad(f)(x)
        return l + checksum(g)

    def pool_mask_bwd(x, y, g):
        # dx[i] = sum over the <=9 windows containing i of g * [x == y]
        # (ties receive gradient in every tying window — differs from
        # XLA's single-winner rule only on exact float ties)
        h, w = y.shape[0], y.shape[1]
        dx = jnp.zeros_like(x, jnp.float32)
        for dy in range(3):
            for dx_ in range(3):
                win_x = jax.lax.slice(
                    x, (dy, dx_, 0, 0),
                    (dy + h, dx_ + w, x.shape[2], x.shape[3]))
                contrib = jnp.where(win_x == y, g, 0.0)
                dx = jax.lax.dynamic_update_slice(
                    dx, jax.lax.dynamic_slice(
                        dx, (dy, dx_, 0, 0),
                        (h, w, x.shape[2], x.shape[3])) + contrib,
                    (dy, dx_, 0, 0))
        return dx.astype(x.dtype)

    def pool_mask(i, xs):
        x = jax.lax.dynamic_index_in_dim(xs, i % 2, keepdims=False)
        y = pool(x)
        g = (2.0 * y).astype(jnp.float32)  # d/dy of sum(y^2)
        dx = pool_mask_bwd(x, y, g)
        return jnp.sum(y.astype(jnp.float32) ** 2) + checksum(dx)

    timed("in_wgrad_hwcn", in_wgrad_hwcn, (x_in2, w_in))
    timed("in_wgrad_nhwc", in_wgrad_nhwc, (x_in2, w_in))
    timed("in_wgrad_s2d", in_wgrad_s2d, (x_in2, w_s2d))
    timed("blk_wgrad", blk_wgrad, (x_p2, w_blk))
    timed("blk_dgrad", blk_dgrad, (x_p2, w_blk))
    timed("pool_sas", pool_sas, (x_c2,))
    timed("pool_mask", pool_mask, (x_c2,))


if __name__ == "__main__":
    main()
