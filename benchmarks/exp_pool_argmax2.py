"""Round 2 of the argmax-routed pool backward (see exp_pool_argmax.py).

The stacked-argmax formulation measured 6.0 ms vs select_and_scatter's
1.65 ms (fwd+bwd) at embedder shapes — the (9, ...) stack materializes
775 MB and int8 compares don't fuse well.  Two cheaper first-match
formulations, both still bit-identical to the select_and_scatter VJP:

  v_iter : winner index by 9 iterative compare-updates (no stack),
           int32 win, then 9 shifted (win == k) * g adds.
  v_claim: no index at all — claim_k = (x_k == y) & ~prefix_or_{j<k},
           dx = sum_k shift(claim_k * g); pure bool/bf16 elementwise.
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


def _shifts(x, ho, wo):
    for a in range(WH):
        for b in range(WW):
            yield (a, b), jax.lax.slice(
                x, (a, b, 0, 0), (a + ho, b + wo, *x.shape[2:]))


def bwd_iter(x, y, g):
    h, w = x.shape[0], x.shape[1]
    ho, wo = y.shape[0], y.shape[1]
    win = None
    best = None
    for k, ((a, b), xs) in enumerate(_shifts(x, ho, wo)):
        if k == 0:
            best, win = xs, jnp.zeros(xs.shape, jnp.int32)
        else:
            upd = xs > best
            best = jnp.where(upd, xs, best)
            win = jnp.where(upd, k, win)
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


def bwd_claim(x, y, g):
    h, w = x.shape[0], x.shape[1]
    ho, wo = y.shape[0], y.shape[1]
    claimed = jnp.zeros(y.shape, jnp.bool_)
    contribs = []
    for (a, b), xs in _shifts(x, ho, wo):
        eq = xs == y
        claim = eq & ~claimed
        claimed = claimed | eq
        contribs.append(((a, b), jnp.where(claim, g, jnp.zeros((), g.dtype))))
    dx = jnp.zeros(x.shape, g.dtype)
    for (a, b), cg in contribs:
        cgp = jnp.pad(cg, ((a, h - ho - a), (b, w - wo - b), (0, 0), (0, 0)))
        dx = dx + cgp
    return dx


def main():
    peak, kind = device_peak_flops()
    log(f"[poolam2] device={kind}")

    @jax.jit
    def gen(key):
        return jnp.round(
            jax.random.normal(key, (2, 23, 23, 64, BG)) * 2).astype(DT)

    x2 = gen(jax.random.PRNGKey(0))
    log("[poolam2] data ready")

    def sas_step(i, xs):
        x = jax.lax.dynamic_index_in_dim(xs, i % 2, keepdims=False)
        def f(x):
            return jnp.sum(pool(x).astype(jnp.float32) ** 2)
        l, g = jax.value_and_grad(f)(x)
        return l + jnp.sum(g.astype(jnp.float32)) * 1e-9

    def make_step(bwd):
        def step(i, xs):
            x = jax.lax.dynamic_index_in_dim(xs, i % 2, keepdims=False)
            y = pool(x)
            g = (2.0 * y.astype(jnp.float32)).astype(DT)
            dx = bwd(x, y, g)
            return (jnp.sum(y.astype(jnp.float32) ** 2)
                    + jnp.sum(dx.astype(jnp.float32)) * 1e-9)
        return step

    s_sas = sec_per_call(build_loop(sas_step), (x2,), "pool_sas")
    s_it = sec_per_call(build_loop(make_step(bwd_iter)), (x2,), "pool_iter")
    s_cl = sec_per_call(build_loop(make_step(bwd_claim)), (x2,), "pool_claim")
    log(f"[poolam2] sas {s_sas*1e3:.3f} ms | iter {s_it*1e3:.3f} ms "
        f"({s_sas/s_it:.2f}x) | claim {s_cl*1e3:.3f} ms ({s_sas/s_cl:.2f}x)")


if __name__ == "__main__":
    main()
