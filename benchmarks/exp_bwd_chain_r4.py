"""Backward CHAIN bisect of the hwcn embedder (round 4).

The r3 per-op probes account for ~5.4 ms of the measured 7.0 ms
image-tower backward (embedder_bwd_decomp_r3.json + the r4 pos-embed
probe at 0.13 ms).  This rebuilds the embedder as an explicit op chain
at real octo_base shapes — patchify/transpose -> input conv (+bias) ->
max pool -> GN -> GELU -> block conv (+bias) -> +residual -> dense TN
(+bias) — and measures value_and_grad of progressively longer prefixes.
Successive differences give each stage's IN-CONTEXT fwd+bwd cost,
including the pieces the isolated probes omitted (bias wgrads = full
108 MB reductions, f32 GN stats, residual gradient fan-in).

Writes benchmarks/recorded/bwd_chain_r4.json.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_loop, sec_per_call, device_peak_flops, log  # noqa: E402

from multi_modal_transformers_tokenmerge_tpu.modules.image_tokenizer import (  # noqa: E402,E501
    group_norm_stats_hwcn)

B = 32
F, H, P = 2, 280, 56
HP = H // P
N = B * F * HP * HP  # 1600
DT = jnp.bfloat16


def conv_hwcn(x, w, strides, padding):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("HWCN", "HWIO", "HWCN"))
    return jax.lax.conv_general_dilated(
        x, w, strides, padding, dimension_numbers=dn,
        preferred_element_type=DT)


def main():
    peak, kind = device_peak_flops()
    log(f"[bwdchain] device={kind} N={N}")
    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    imgs2 = jax.random.uniform(ks[0], (2, B, F, H, H, 3), jnp.float32,
                               0.0, 255.0)
    w_in = jax.random.normal(ks[1], (12, 12, 3, 64), DT) * 0.05
    b_in = jnp.zeros((64,), DT)
    gn_scale = jnp.ones((64,), DT)
    gn_bias = jnp.zeros((64,), DT)
    w_blk = jax.random.normal(ks[2], (3, 3, 64, 64), DT) * 0.05
    b_blk = jnp.zeros((64,), DT)
    w_d = jax.random.normal(ks[3], (21 * 21 * 64, 768), DT) * 0.01
    b_d = jnp.zeros((768,), DT)

    def patchify_t(img):  # (B,F,H,H,3) f32 -> (56,56,3,N) bf16 normalized
        x = (img / 127.5 - 1.0).astype(DT)
        x = x.reshape(B, F, HP, P, HP, P, 3).transpose(0, 1, 2, 4, 3, 5, 6)
        x = x.reshape(B * F * HP * HP, P, P, 3)
        return jnp.transpose(x, (1, 2, 3, 0))

    def stage_in(params, xt):
        y = conv_hwcn(xt, params["w_in"], (2, 2), "VALID")
        return y + params["b_in"][:, None]

    def stage_pool(y):
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (3, 3, 1, 1), (1, 1, 1, 1), "VALID")

    def stage_gn(params, y):
        f = group_norm_stats_hwcn(y.astype(jnp.float32), 32, 1e-6,
                                  "image", F * HP * HP)
        f = (f * params["gn_scale"].astype(jnp.float32)[:, None]
             + params["gn_bias"].astype(jnp.float32)[:, None])
        return f.astype(DT)

    def stage_blk(params, y):
        c = conv_hwcn(y, params["w_blk"], (1, 1), "SAME")
        return c + params["b_blk"][:, None]

    def stage_dense(params, y):
        h2, w2, c2, bg = y.shape
        flat = y.reshape(h2 * w2 * c2, bg)
        out = jax.lax.dot_general(flat, params["w_d"], (((0,), (0,)), ((), ())),
                                  preferred_element_type=DT)
        return out + params["b_d"]

    params = dict(w_in=w_in, b_in=b_in, gn_scale=gn_scale, gn_bias=gn_bias,
                  w_blk=w_blk, b_blk=b_blk, w_d=w_d, b_d=b_d)

    def chain(upto):
        def f(params, img):
            xt = patchify_t(img)
            y = stage_in(params, xt)
            if upto == "conv":
                return y
            y = stage_pool(y)
            if upto == "pool":
                return y
            r = y
            y = stage_gn(params, y)
            if upto == "gn":
                return y
            y = jax.nn.gelu(y)
            if upto == "gelu":
                return y
            y = stage_blk(params, y)
            if upto == "blk":
                return y
            y = y + r
            if upto == "res":
                return y
            return stage_dense(params, y)
        return f

    results = {}
    for upto in ("conv", "pool", "gn", "gelu", "blk", "res", "dense"):
        f = chain(upto)

        def step(i, imgs2, params, f=f):
            img = jax.lax.dynamic_index_in_dim(imgs2, i % 2, keepdims=False)
            def loss(p):
                return jnp.mean(jnp.square(f(p, img).astype(jnp.float32)))
            l, g = jax.value_and_grad(loss)(params)
            return l + jax.tree.reduce(
                lambda a, b: a + b,
                jax.tree.map(lambda x: jnp.sum(jnp.abs(
                    x.astype(jnp.float32))) * 1e-12, g))
        s = sec_per_call(build_loop(step), (imgs2, params), f"grad_{upto}")
        results[f"grad_upto_{upto}_ms"] = round(s * 1e3, 3)
        log(f"[bwdchain] grad upto {upto}: {s*1e3:.3f} ms")

    # bias-less input conv for comparison (the r3 isolated probe's shape)
    def step_nobias(i, imgs2, params):
        img = jax.lax.dynamic_index_in_dim(imgs2, i % 2, keepdims=False)
        def loss(p):
            xt = patchify_t(img)
            y = conv_hwcn(xt, p["w_in"], (2, 2), "VALID")
            return jnp.mean(jnp.square(y.astype(jnp.float32)))
        l, g = jax.value_and_grad(loss)(params)
        return l + jnp.sum(g["w_in"].astype(jnp.float32)) * 1e-12
    s = sec_per_call(build_loop(step_nobias), (imgs2, params),
                     "grad_conv_nobias")
    results["grad_upto_conv_nobias_ms"] = round(s * 1e3, 3)

    out = {"metric": "embedder_bwd_chain_r4_ms",
           "detail": {"device": kind, "batch": B, **results}}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "recorded", "bwd_chain_r4.json")
    with open(path, "w") as fo:
        fo.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
