"""Dense-TN (28224 -> 768) backward formulations at embedder shapes.

The r4 chain bisect (bwd_chain_r4.json) shows the output dense adding
1.65 ms in-context (fwd 0.37) while the isolated r3 probe measured
bwd-only 0.78 — either co-scheduling or a layout choice inside XLA's
transpose of the TN dot.  Probes (x (28224, N) bf16, w (28224, 768)):

  autodiff      — jax.grad of the shipped TN dot (XLA's own choice)
  wgrad_only    — d/dw alone
  dgrad_only    — d/dx alone
  explicit      — custom formulations: wgrad = x @ g (NN orientation,
                  contraction over N), dgrad = w @ g^T (TN with g
                  transposed: 2.4 MB transpose instead of 90 MB)

Writes benchmarks/recorded/dense_tn_bwd_r4.json.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_loop, sec_per_call, device_peak_flops, log  # noqa: E402

N = 1600
FLAT = 28224
OUT = 768
DT = jnp.bfloat16


def main():
    peak, kind = device_peak_flops()
    log(f"[densebwd] device={kind}")
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x2 = jax.random.normal(ks[0], (2, FLAT, N), DT)
    w = jax.random.normal(ks[1], (FLAT, OUT), DT) * 0.01
    g2 = jax.random.normal(ks[2], (2, N, OUT), DT)

    def pick(i, stk):
        return jax.lax.dynamic_index_in_dim(stk, i % 2, keepdims=False)

    def tn(x, w):
        return jax.lax.dot_general(x, w, (((0,), (0,)), ((), ())),
                                   preferred_element_type=DT)

    results = {}

    def run(tag, step, args):
        s = sec_per_call(build_loop(step), args, tag)
        results[tag + "_ms"] = round(s * 1e3, 3)
        log(f"[densebwd] {tag}: {s*1e3:.3f} ms")

    def fwd(i, x2, w):
        y = tn(pick(i, x2), w)
        return jnp.sum(y.astype(jnp.float32)) * 1e-6

    def autodiff(i, x2, w):
        x = pick(i, x2)
        def f(x, w):
            return jnp.sum(tn(x, w).astype(jnp.float32) ** 2)
        l, (dx, dw) = jax.value_and_grad(f, argnums=(0, 1))(x, w)
        return l + (jnp.sum(dx.astype(jnp.float32))
                    + jnp.sum(dw.astype(jnp.float32))) * 1e-9

    def wgrad_only(i, x2, w):
        x = pick(i, x2)
        def f(w):
            return jnp.sum(tn(x, w).astype(jnp.float32) ** 2)
        l, dw = jax.value_and_grad(f)(w)
        return l + jnp.sum(dw.astype(jnp.float32)) * 1e-9

    def dgrad_only(i, x2, w):
        x = pick(i, x2)
        def f(x):
            return jnp.sum(tn(x, w).astype(jnp.float32) ** 2)
        l, dx = jax.value_and_grad(f)(x)
        return l + jnp.sum(dx.astype(jnp.float32)) * 1e-9

    def explicit(i, x2, w, g2):
        x, g = pick(i, x2), pick(i, g2)
        # wgrad: (FLAT, N) @ (N, OUT) — standard NN dot, contraction N
        dw = jax.lax.dot_general(x, g, (((1,), (0,)), ((), ())),
                                 preferred_element_type=DT)
        # dgrad: (FLAT, OUT) @ (OUT, N) via transposing g (2.4 MB)
        dx = jax.lax.dot_general(w, g.T, (((1,), (0,)), ((), ())),
                                 preferred_element_type=DT)
        return (jnp.sum(dw.astype(jnp.float32))
                + jnp.sum(dx.astype(jnp.float32))) * 1e-9

    def explicit_wgrad(i, x2, w, g2):
        x, g = pick(i, x2), pick(i, g2)
        dw = jax.lax.dot_general(x, g, (((1,), (0,)), ((), ())),
                                 preferred_element_type=DT)
        return jnp.sum(dw.astype(jnp.float32)) * 1e-9

    run("fwd", fwd, (x2, w))
    run("autodiff_full", autodiff, (x2, w))
    run("wgrad_only", wgrad_only, (x2, w))
    run("dgrad_only", dgrad_only, (x2, w))
    run("explicit_both", explicit, (x2, w, g2))
    run("explicit_wgrad", explicit_wgrad, (x2, w, g2))

    out = {"metric": "dense_tn_bwd_formulations_ms",
           "detail": {"device": kind, "shape": f"({FLAT},{N})x({FLAT},{OUT})",
                      **results}}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "recorded", "dense_tn_bwd_r4.json")
    with open(path, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
