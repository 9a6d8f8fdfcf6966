"""Space-to-depth reformulation of the 12x12/2 input conv in HWCN layout.

The stride-2 kernel-12 conv folds exactly into a 6x6/1 conv over a
(28, 28, 12, N) space-to-depth input (kernel reindexed from the canonical
(12, 12, 3, 64) param — w_s2d[ky',kx',(py*2+px)*3+c,o] = w[2ky'+py,
2kx'+px,c,o]).  C=12 uses sublanes better than C=3.  Measures fwd and
wgrad-only for both forms; checks numerics.
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


def w_to_s2d(w):
    # (12, 12, 3, 64) -> (6, 6, 12, 64): tap (2ky'+py, 2kx'+px, c) goes to
    # (ky', kx', (py*2+px)*3 + c)
    w6 = w.reshape(6, 2, 6, 2, 3, 64)            # ky', py, kx', px, c, o
    w6 = w6.transpose(0, 2, 1, 3, 4, 5)          # ky', kx', py, px, c, o
    return w6.reshape(6, 6, 12, 64)


def x_to_s2d(x):
    # (56, 56, 3, N) -> (28, 28, 12, N) matching the kernel phase order
    h, w, c, n = x.shape
    x6 = x.reshape(28, 2, 28, 2, 3, n)           # h', py, w', px, c, n
    x6 = x6.transpose(0, 2, 1, 3, 4, 5)          # h', w', py, px, c, n
    return x6.reshape(28, 28, 12, n)


def main():
    peak, kind = device_peak_flops()
    log(f"[s2d] device={kind}")
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x2 = jax.random.normal(ks[0], (2, 56, 56, 3, BG), DT)
    w = jax.random.normal(ks[1], (12, 12, 3, 64), DT) * 0.05

    @jax.jit
    def _diff(x):
        a = conv_hwcn(x, w, (2, 2), "VALID").astype(jnp.float32)
        b = conv_hwcn(x_to_s2d(x), w_to_s2d(w), (1, 1),
                      "VALID").astype(jnp.float32)
        return jnp.max(jnp.abs(a - b)), jnp.max(jnp.abs(a))

    d, s = map(float, _diff(x2[0]))
    log(f"[s2d] max|diff|={d:.5f} scale={s:.2f}")
    assert d < 0.02 * s
    log("[s2d] correctness OK")

    def direct_fwd(i, xs):
        x = jax.lax.dynamic_index_in_dim(xs, i % 2, keepdims=False)
        return jnp.sum(conv_hwcn(x, w, (2, 2), "VALID")
                       .astype(jnp.float32))

    def s2d_fwd(i, xs):
        x = jax.lax.dynamic_index_in_dim(xs, i % 2, keepdims=False)
        return jnp.sum(conv_hwcn(x_to_s2d(x), w_to_s2d(w), (1, 1),
                                 "VALID").astype(jnp.float32))

    def direct_wgrad(i, xs):
        x = jax.lax.dynamic_index_in_dim(xs, i % 2, keepdims=False)

        def f(w):
            return jnp.sum(conv_hwcn(x, w, (2, 2), "VALID")
                           .astype(jnp.float32) ** 2)

        l, g = jax.value_and_grad(f)(w)
        return l + jnp.sum(g.astype(jnp.float32)) * 1e-9

    def s2d_wgrad(i, xs):
        x = jax.lax.dynamic_index_in_dim(xs, i % 2, keepdims=False)

        def f(w):
            return jnp.sum(conv_hwcn(x_to_s2d(x), w_to_s2d(w), (1, 1),
                                     "VALID").astype(jnp.float32) ** 2)

        l, g = jax.value_and_grad(f)(w)
        return l + jnp.sum(g.astype(jnp.float32)) * 1e-9

    for name, fn in (("direct_fwd", direct_fwd), ("s2d_fwd", s2d_fwd),
                     ("direct_wgrad", direct_wgrad),
                     ("s2d_wgrad", s2d_wgrad)):
        sec = sec_per_call(build_loop(fn), (x2,), name)
        log(f"[s2d] {name}: {sec*1e3:.3f} ms")


if __name__ == "__main__":
    main()
