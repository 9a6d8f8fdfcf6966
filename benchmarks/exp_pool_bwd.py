"""Max-pool backward alternatives at embedder shapes (HWCN).

select_and_scatter (XLA's reduce_window-max VJP) measured 1.48 ms bwd at
(23, 23, 64, 1600).  Candidate: equality-mask backward — dx[p] = sum over
the <=9 windows w containing p of g[w] * [x[p] == y[w]] — expressed as 9
shifted slices of zero-padded (y, g), all fused elementwise.

CONCLUSION (r3, measured): REJECTED on correctness, not speed.  In bf16
the 8-bit mantissa makes exact ties inside a 3x3 window COMMON, not
measure-zero — the equality mask double-counts gradient at tying
positions and the deviation from the select-one-winner semantics reaches
the magnitude of the gradient itself (max|diff| 40 at scale 45 on random
normal bf16 data).  select_and_scatter stays.  Kept as the negative
result so the idea isn't retried blind.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_loop, sec_per_call, device_peak_flops, log  # noqa: E402

BG = 1600
DT = jnp.bfloat16


def pool(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (3, 3, 1, 1),
                                 (1, 1, 1, 1), "VALID")


def pool_mask_bwd(x, y, g):
    # pad y/g by the window radius so every shift is a static slice
    h_in, w_in = x.shape[0], x.shape[1]
    yp = jnp.pad(y, ((2, 2), (2, 2), (0, 0), (0, 0)),
                 constant_values=jnp.inf)   # +inf: never equals x
    gp = jnp.pad(g, ((2, 2), (2, 2), (0, 0), (0, 0)))
    dx = jnp.zeros(x.shape, jnp.float32)
    xf = x.astype(jnp.float32)
    for dy in range(3):
        for dx_ in range(3):
            ys = jax.lax.slice(
                yp, (2 - dy, 2 - dx_, 0, 0),
                (2 - dy + h_in, 2 - dx_ + w_in, y.shape[2], y.shape[3]))
            gs = jax.lax.slice(
                gp, (2 - dy, 2 - dx_, 0, 0),
                (2 - dy + h_in, 2 - dx_ + w_in, y.shape[2], y.shape[3]))
            dx = dx + jnp.where(xf == ys.astype(jnp.float32),
                                gs.astype(jnp.float32), 0.0)
    return dx.astype(x.dtype)


def main():
    peak, kind = device_peak_flops()
    log(f"[pool] device={kind}")
    x2 = jax.random.normal(jax.random.PRNGKey(0), (2, 23, 23, 64, BG), DT)

    # correctness vs autodiff on tie-free data
    @jax.jit
    def _check(x):
        y = pool(x)
        g = (2.0 * y).astype(jnp.float32)
        def f(x):
            return jnp.sum(pool(x).astype(jnp.float32) ** 2)
        dx_ref = jax.grad(f)(x).astype(jnp.float32)
        dx_new = pool_mask_bwd(x, y, g).astype(jnp.float32)
        return jnp.max(jnp.abs(dx_new - dx_ref)), jnp.max(jnp.abs(dx_ref))

    d, s = map(float, _check(x2[0]))
    log(f"[pool] max|diff|={d} scale={s:.1f}")
    assert d < 1e-2 * s, d
    log("[pool] correctness OK (tie-free data)")

    def sas_step(i, xs):
        x = jax.lax.dynamic_index_in_dim(xs, i % 2, keepdims=False)
        def f(x):
            return jnp.sum(pool(x).astype(jnp.float32) ** 2)
        l, g = jax.value_and_grad(f)(x)
        return l + jnp.sum(g.astype(jnp.float32)) * 1e-9

    def mask_step(i, xs):
        x = jax.lax.dynamic_index_in_dim(xs, i % 2, keepdims=False)
        y = pool(x)
        g = (2.0 * y).astype(jnp.float32)
        dx = pool_mask_bwd(x, y, g)
        return (jnp.sum(y.astype(jnp.float32) ** 2)
                + jnp.sum(dx.astype(jnp.float32)) * 1e-9)

    s_sas = sec_per_call(build_loop(sas_step), (x2,), "pool_sas")
    s_mask = sec_per_call(build_loop(mask_step), (x2,), "pool_mask_v2")
    log(f"[pool] select_and_scatter {s_sas*1e3:.3f} ms vs equality-mask "
        f"{s_mask*1e3:.3f} ms ({s_sas/s_mask:.2f}x)")


if __name__ == "__main__":
    main()
