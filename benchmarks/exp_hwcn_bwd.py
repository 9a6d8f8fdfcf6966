"""Per-op BACKWARD decomposition of the HWCN embedder (train MFU item).

profile_train.py r3 showed the image tokenizer is ~7.0 of the 7.8 ms
backward at batch 32.  This times value_and_grad of each stage in the
HWCN layout to find which backward op misbehaves:

  input_conv  (56x56x3 -> 23x23x64, 12x12/2)     dgrad+wgrad
  max_pool    (3x3/1, select_and_scatter bwd)
  group_norm  (image scope, f32 stats)
  gelu
  block_conv  (3x3 SAME, 64ch)                   dgrad+wgrad
  dense       (28224 -> 768 TN dot)

Each entry reports fwd ms, fwd+grad ms, and the implied bwd-only ms.
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


def main():
    peak, kind = device_peak_flops()
    log(f"[bwd] device={kind}")
    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    x_in2 = jax.random.normal(ks[0], (2, 56, 56, 3, BG), DT)
    x_c2 = jax.random.normal(ks[1], (2, 23, 23, 64, BG), DT)
    x_p2 = jax.random.normal(ks[2], (2, 21, 21, 64, BG), DT)
    x_d2 = jax.random.normal(ks[3], (2, 21 * 21 * 64, BG), DT)
    w_in = jax.random.normal(ks[4], (12, 12, 3, 64), DT) * 0.05
    w_blk = jax.random.normal(ks[5], (3, 3, 64, 64), DT) * 0.05
    w_d = jax.random.normal(ks[6], (21 * 21 * 64, 768), DT) * 0.01
    gam = 1.0 + 0.1 * jax.random.normal(ks[7], (64,), jnp.float32)
    bet = 0.1 * jax.random.normal(ks[8], (64,), jnp.float32)

    def conv(x, w, strides, padding):
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("HWCN", "HWIO", "HWCN"))
        return jax.lax.conv_general_dilated(
            x, w, strides, padding, dimension_numbers=dn,
            preferred_element_type=DT)

    stages = {
        "input_conv": (x_in2, (w_in,),
                       lambda x, w: conv(x, w, (2, 2), "VALID")),
        "max_pool": (x_c2, (),
                     lambda x: jax.lax.reduce_window(
                         x, -jnp.inf, jax.lax.max, (3, 3, 1, 1),
                         (1, 1, 1, 1), "VALID")),
        "group_norm": (x_p2, (gam, bet), None),  # filled below
        "gelu": (x_p2, (), jax.nn.gelu),
        "block_conv": (x_p2, (w_blk,),
                       lambda x, w: conv(x, w, (1, 1), "SAME")),
        "dense_tn": (x_d2, (w_d,),
                     lambda x, w: jax.lax.dot_general(
                         x, w, (((0,), (0,)), ((), ())),
                         preferred_element_type=DT)),
    }

    def gn(x, gam, bet):
        f = x.astype(jnp.float32).reshape(21, 21, 32, 2, B, G)
        mu = f.mean(axis=(0, 1, 3, 5), keepdims=True)
        var = (f * f).mean(axis=(0, 1, 3, 5), keepdims=True) - mu * mu
        f = (f - mu) * jax.lax.rsqrt(var + 1e-6)
        f = f.reshape(21, 21, 64, BG)
        return (f * gam[:, None] + bet[:, None]).astype(DT)

    stages["group_norm"] = (x_p2, (gam, bet), gn)

    results = {}
    for name, (stack, params, fn) in stages.items():
        def fwd_step(i, stk, *ps, fn=fn):
            x = jax.lax.dynamic_index_in_dim(stk, i % 2, keepdims=False)
            return jnp.sum(fn(x, *ps).astype(jnp.float32) ** 2)

        def grad_step(i, stk, *ps, fn=fn):
            x = jax.lax.dynamic_index_in_dim(stk, i % 2, keepdims=False)

            def f(x, *ps):
                return jnp.sum(fn(x, *ps).astype(jnp.float32) ** 2)

            l, grads = jax.value_and_grad(
                f, argnums=tuple(range(1 + len(ps))))(x, *ps)
            return l + sum(jnp.sum(g.astype(jnp.float32)) * 1e-9
                           for g in grads)

        s_f = sec_per_call(build_loop(fwd_step), (stack, *params),
                           f"{name}_fwd")
        s_g = sec_per_call(build_loop(grad_step), (stack, *params),
                           f"{name}_fwdgrad")
        results[name] = {"fwd_ms": round(s_f * 1e3, 3),
                         "fwdgrad_ms": round(s_g * 1e3, 3),
                         "bwd_only_ms": round((s_g - s_f) * 1e3, 3)}
        log(f"[bwd] {name}: fwd {s_f*1e3:.3f}  fwd+grad {s_g*1e3:.3f}  "
            f"bwd {1e3*(s_g-s_f):.3f} ms")

    import json
    print(json.dumps({"metric": "hwcn_embedder_bwd_decomp",
                      "detail": {"device": kind, "batch": B, **results}}))


if __name__ == "__main__":
    main()
