"""Separable max-pool VJP experiment.

The embedder's 3x3/1 max pool costs ~1.5 ms in the backward via XLA's
select_and_scatter (traffic bound ~0.37 ms); every replacement VJP built
so far lost (docs/KERNELS.md).  Untried idea: max is associative, so
``maxpool_3x3 == maxpool_3x1 ∘ maxpool_1x3`` EXACTLY for the forward
values.  Autodiff of the composition gives two 1D select_and_scatters
with 3-element windows instead of one with a 9-element window — less
routing work and a (21,23) intermediate instead of repeated 2D window
scans.

Tie semantics differ from the fused 2D scatter (routing composes
per-stage first-match instead of raster-order first-match over the 3x3
window), so the composition is a *valid* subgradient that is not
bit-identical on ties — the experiment reports the grad agreement rate
on tie-heavy bf16 data alongside the timings.

Shapes: embedder hot path, HWCN (23,23,64,1600) bf16 at octo_base b32.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_loop, sec_per_call, device_peak_flops, log  # noqa: E402

BG = 32 * 50
DT = jnp.bfloat16


def pool2d(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (3, 3, 1, 1), (1, 1, 1, 1), "VALID")


def pool_sep(x):
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                              (1, 3, 1, 1), (1, 1, 1, 1), "VALID")
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (3, 1, 1, 1), (1, 1, 1, 1), "VALID")


def checksum(v):
    return jnp.sum(v.astype(jnp.float32)) * 1e-9


def main():
    peak, kind = device_peak_flops()
    log(f"[pool-sep] device={kind}")
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    # tie-heavy data: bf16 quantization of a small-range normal
    xs = jax.random.normal(ks[0], (2, 23, 23, 64, BG)).astype(DT)

    # --- correctness: forward exact, grad agreement on ties
    x1 = xs[0]
    f2d = pool2d(x1)
    fsep = pool_sep(x1)
    fwd_exact = bool(jnp.array_equal(f2d, fsep))
    g2d = jax.grad(lambda x: jnp.sum(pool2d(x).astype(jnp.float32) ** 2))(x1)
    gsep = jax.grad(lambda x: jnp.sum(pool_sep(x).astype(jnp.float32) ** 2))(x1)
    agree = float(jnp.mean((g2d == gsep).astype(jnp.float32)))
    # both must be valid subgradients: same total mass per window sum
    mass_close = bool(jnp.allclose(jnp.sum(g2d.astype(jnp.float32)),
                                   jnp.sum(gsep.astype(jnp.float32)),
                                   rtol=1e-3))
    log(f"[pool-sep] fwd_exact={fwd_exact} grad_agree={agree:.4f} "
        f"grad_mass_close={mass_close}")

    def timed(name, step, args):
        s = sec_per_call(build_loop(step), args, name)
        log(f"[pool-sep] {name}: {s*1e3:.3f} ms")
        return s * 1e3

    def mk_fwd(pool):
        def step(i, xs):
            x = jax.lax.dynamic_index_in_dim(xs, i % 2, keepdims=False)
            return checksum(pool(x))
        return step

    def mk_grad(pool):
        def step(i, xs):
            x = jax.lax.dynamic_index_in_dim(xs, i % 2, keepdims=False)
            def f(x):
                return jnp.sum(pool(x).astype(jnp.float32) ** 2)
            l, g = jax.value_and_grad(f)(x)
            return l * 1e-9 + checksum(g)
        return step

    out = {
        "fwd2d_ms": timed("fwd2d", mk_fwd(pool2d), (xs,)),
        "fwdsep_ms": timed("fwdsep", mk_fwd(pool_sep), (xs,)),
        "grad2d_ms": timed("grad2d", mk_grad(pool2d), (xs,)),
        "gradsep_ms": timed("gradsep", mk_grad(pool_sep), (xs,)),
    }
    out.update(fwd_exact=fwd_exact, grad_agree_frac=agree,
               grad_mass_close=mass_close)
    out["grad_speedup"] = round(out["grad2d_ms"] / out["gradsep_ms"], 3)
    print(json.dumps({
        "metric": "pool_separable_vjp_ms",
        "value": out["gradsep_ms"],
        "unit": "ms (fwd+grad at embedder shapes)",
        "vs_baseline": out["grad_speedup"],
        "detail": {"device": kind, **out},
    }))


if __name__ == "__main__":
    main()
