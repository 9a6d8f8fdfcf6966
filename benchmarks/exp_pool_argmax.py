"""Argmax-routed max-pool backward (round 3, follow-up to exp_pool_bwd.py).

exp_pool_bwd.py rejected the equality-mask backward because bf16 ties
inside a 3x3 window are common and every tying position received the
window's gradient (double-counting).  This experiment routes each
window's gradient to exactly ONE winner: the first max in row-major
window order — the same tie-break XLA's select_and_scatter uses (its
`ge` select keeps the earlier element on ties), so the result should be
BIT-IDENTICAL to the autodiff backward even on tie-heavy bf16 data.

  win[w]  = argmax_k x[w + off_k]           (first max wins, like XLA)
  dx[p]   = sum_k [win[p - off_k] == k] * g[p - off_k]

Both passes are 9 static slices + elementwise ops (fusable), no
select_and_scatter.  Measures at embedder shapes (23, 23, 64, 1600).
"""

import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_loop, sec_per_call, device_peak_flops, log  # noqa: E402

BG = 1600
DT = jnp.bfloat16
WH = WW = 3


def pool(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (WH, WW, 1, 1),
                                 (1, 1, 1, 1), "VALID")


def pool_argmax_bwd(x, g):
    h, w = x.shape[0], x.shape[1]
    ho, wo = h - WH + 1, w - WW + 1
    # winner index per window, row-major over (a, b); argmax -> first max
    shifts = jnp.stack(
        [jax.lax.slice(x, (a, b, 0, 0), (a + ho, b + wo, *x.shape[2:]))
         for a in range(WH) for b in range(WW)], axis=0)
    win = jnp.argmax(shifts, axis=0).astype(jnp.int32)
    # route g[w] to position w + off_{win[w]}
    winp = jnp.pad(win, ((WH - 1, WH - 1), (WW - 1, WW - 1), (0, 0), (0, 0)),
                   constant_values=-1)
    gp = jnp.pad(g, ((WH - 1, WH - 1), (WW - 1, WW - 1), (0, 0), (0, 0)))
    dx = jnp.zeros(x.shape, g.dtype)
    for k, (a, b) in enumerate((a, b) for a in range(WH) for b in range(WW)):
        ws = jax.lax.slice(winp, (WH - 1 - a, WW - 1 - b, 0, 0),
                           (WH - 1 - a + h, WW - 1 - b + w, *x.shape[2:]))
        gs = jax.lax.slice(gp, (WH - 1 - a, WW - 1 - b, 0, 0),
                           (WH - 1 - a + h, WW - 1 - b + w, *x.shape[2:]))
        dx = dx + jnp.where(ws == k, gs, jnp.zeros((), g.dtype))
    return dx


def main():
    peak, kind = device_peak_flops()
    log(f"[poolam] device={kind}")

    # tie-heavy bf16 data in ONE jit (remote eager-op compiles are slow).
    # Bit-exactness vs the select_and_scatter VJP is asserted on the CPU
    # backend in tests/test_image_ops.py::TestMaxPoolArgmaxBackward (same
    # XLA semantics); this script only measures device time.
    @jax.jit
    def gen(key):
        return jnp.round(
            jax.random.normal(key, (2, 23, 23, 64, BG)) * 2).astype(DT)

    x2 = gen(jax.random.PRNGKey(0))
    log("[poolam] data ready")

    def sas_step(i, xs):
        x = jax.lax.dynamic_index_in_dim(xs, i % 2, keepdims=False)
        def f(x):
            return jnp.sum(pool(x).astype(jnp.float32) ** 2)
        l, g = jax.value_and_grad(f)(x)
        return l + jnp.sum(g.astype(jnp.float32)) * 1e-9

    def am_step(i, xs):
        x = jax.lax.dynamic_index_in_dim(xs, i % 2, keepdims=False)
        y = pool(x)
        g = (2.0 * y.astype(jnp.float32)).astype(DT)
        dx = pool_argmax_bwd(x, g)
        return (jnp.sum(y.astype(jnp.float32) ** 2)
                + jnp.sum(dx.astype(jnp.float32)) * 1e-9)

    s_sas = sec_per_call(build_loop(sas_step), (x2,), "pool_sas")
    s_am = sec_per_call(build_loop(am_step), (x2,), "pool_argmax")
    log(f"[poolam] select_and_scatter {s_sas*1e3:.3f} ms vs argmax-routed "
        f"{s_am*1e3:.3f} ms ({s_sas/s_am:.2f}x)")


if __name__ == "__main__":
    main()
