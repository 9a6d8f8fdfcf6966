"""Bisect the input chain: where do 0.55 ms of in-context overhead live?

Parts in isolation: patchify+normalize ~0.09 (BW bound), transpose
0.055 (exp_transpose_patterns), conv 0.38, pool 0.17 — sum 0.70 ms.
The real chain costs 1.25 ms (exp_transpose_fold).  Each sub-chain below
ends in the conv or pool (non-cancellable consumers), so XLA cannot
delete the upstream permutations the way a plain checksum lets it.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_loop, sec_per_call, device_peak_flops, log  # noqa: E402

B = 32
F, H, P = 2, 280, 56
HP = H // P
N = B * F * HP * HP
DT = jnp.bfloat16


def conv_in(x, w):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("HWCN", "HWIO", "HWCN"))
    return jax.lax.conv_general_dilated(
        x, w, (2, 2), "VALID", dimension_numbers=dn,
        preferred_element_type=DT)


def pool(y):
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (3, 3, 1, 1), (1, 1, 1, 1), "VALID")


def main():
    _, kind = device_peak_flops()
    log(f"[bisect] device={kind}")
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    images = jax.random.uniform(ks[0], (2, B, F, H, H, 3), jnp.float32,
                                0, 255)
    x_nhwc = jax.random.normal(ks[1], (2, N, P, P, 3), DT)
    x_hwcn = jax.random.normal(ks[2], (2, P, P, 3, N), DT)
    w = jax.random.normal(ks[3], (12, 12, 3, 64), DT) * 0.05

    def patchify(im):
        x = im.reshape(B, F, HP, P, HP, P, 3)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6)
        return (x.reshape(N, P, P, 3) / 127.5 - 1.0).astype(DT)

    cases = {
        "conv": (x_hwcn, lambda x: conv_in(x, w)),
        "conv_pool": (x_hwcn, lambda x: pool(conv_in(x, w))),
        "transpose_conv": (
            x_nhwc, lambda x: conv_in(jnp.transpose(x, (1, 2, 3, 0)), w)),
        "transpose_conv_pool": (
            x_nhwc,
            lambda x: pool(conv_in(jnp.transpose(x, (1, 2, 3, 0)), w))),
        "patchify_transpose_conv": (
            images,
            lambda im: conv_in(jnp.transpose(patchify(im), (1, 2, 3, 0)),
                               w)),
        "full_chain": (
            images,
            lambda im: pool(conv_in(
                jnp.transpose(patchify(im), (1, 2, 3, 0)), w))),
    }
    results = {}
    for name, (stack, fn) in cases.items():
        def step(i, stk, _fn=fn):
            a = jax.lax.dynamic_index_in_dim(stk, i % 2, keepdims=False)
            return jnp.sum(_fn(a).astype(jnp.float32))
        sec = sec_per_call(build_loop(step), (stack,), label=name)
        results[name] = round(sec * 1e3, 4)
        log(f"[bisect] {name}: {results[name]} ms")

    print(json.dumps({"metric": "input_chain_bisect_ms",
                      "detail": {"device": kind, "cases": results}}))


if __name__ == "__main__":
    main()
