"""Per-op device profile of the Gato patch embedder (VERDICT r2 item 1).

The round-2 stage decomposition showed image_and_transformer = 88% of the
octo_base forward.  This script breaks the ResNetV2Embedder into its
constituent ops and times each with the same fori_loop-slope protocol as
bench.py, so we know exactly which op to attack (im2col GEMM, channel
packing, fused Pallas) and which are already at their hardware bound.

Shapes at octo_base (reference: tokenizers/images/image_tokenizer.py:140-178,
model_configs/tokenizers/images/gato_resnet.yaml:41-104):
  patches   (B, 50, 56, 56, 3)   B*50 patches of 56x56x3
  input conv 12x12/2 VALID  -> (B, 50, 23, 23, 64)
  max_pool   3x3/1   VALID  -> (B, 50, 21, 21, 64)
  2 x [GroupNorm(32) -> GELU -> conv 3x3 SAME 64] + residual
  flatten -> Dense(28224 -> 768)

Writes benchmarks/recorded/embedder_profile_r3.json.
"""

import functools
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import (build_loop, sec_per_call, flops_of, device_peak_flops,
                   log)  # noqa: E402

B = int(os.environ.get("BENCH_BATCH", "32"))
G = 50          # frames * patches per image at octo_base
P = 56          # patch size
DT = jnp.bfloat16


def timed(name, fn, stack, results, peak):
    """Time fn(x) where x is selected per-iteration from a 2-stack."""
    def step(i, stk):
        x = jax.lax.dynamic_index_in_dim(stk, i % stk.shape[0],
                                         keepdims=False)
        return jnp.sum(fn(x).astype(jnp.float32))
    loop = build_loop(step)
    sec = sec_per_call(loop, (stack,), label=name)
    entry = {"ms": round(sec * 1e3, 4)}
    try:
        comp = jax.jit(fn).lower(stack[0]).compile()
        f = flops_of(comp)
        if f:
            entry["gflops"] = round(f / 1e9, 2)
            if peak:
                entry["mfu"] = round(f / sec / peak, 4)
    except Exception as e:  # pragma: no cover
        log(f"[profile] cost analysis failed for {name}: {e}")
    results[name] = entry
    return entry


def main():
    peak, kind = device_peak_flops()
    log(f"[profile] device={kind} B={B}")
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)

    def stack2(shape, k):
        return jax.random.normal(k, (2, *shape), DT)

    # --- stage inputs
    x_img = stack2((B, 2, 280, 280, 3), ks[0])          # raw images
    x_patch = stack2((B, G, P, P, 3), ks[1])            # patchified
    x_conv = stack2((B, G, 23, 23, 64), ks[2])          # post input conv
    x_pool = stack2((B, G, 21, 21, 64), ks[3])          # post pool
    x_flat = stack2((B, G, 21 * 21 * 64), ks[4])        # pre-dense

    # --- weights (bf16, static consts inside jit via closure is fine at
    # these sizes; conv kernels are tiny, dense is 43MB)
    w_in = jax.random.normal(ks[5], (12, 12, 3, 64), DT) * 0.05
    b_in = jnp.zeros((64,), DT)
    w_blk = jax.random.normal(ks[6], (3, 3, 64, 64), DT) * 0.05
    b_blk = jnp.zeros((64,), DT)
    w_d = jax.random.normal(ks[7], (21 * 21 * 64, 768), DT) * 0.01
    b_d = jnp.zeros((768,), DT)
    gn_scale = jnp.ones((64,), DT)
    gn_bias = jnp.zeros((64,), DT)

    dn = jax.lax.conv_dimension_numbers((B * G, P, P, 3), (12, 12, 3, 64),
                                        ("NHWC", "HWIO", "NHWC"))

    def input_conv(x):
        y = jax.lax.conv_general_dilated(
            x.reshape(B * G, P, P, 3), w_in, (2, 2), "VALID",
            dimension_numbers=dn, preferred_element_type=DT)
        return (y + b_in).reshape(B, G, 23, 23, 64)

    def max_pool(x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 1, 3, 3, 1), (1, 1, 1, 1, 1),
            "VALID")

    def group_norm_image(x):
        # stats over (G, h, w, channels-in-group) per batch element
        xs = x.astype(jnp.float32).reshape(B, G, 21, 21, 32, 2)
        mean = xs.mean(axis=(1, 2, 3, 5), keepdims=True)
        var = ((xs - mean) ** 2).mean(axis=(1, 2, 3, 5), keepdims=True)
        y = (xs - mean) * jax.lax.rsqrt(var + 1e-6)
        return (y.reshape(x.shape) * gn_scale + gn_bias).astype(DT)

    def gelu(x):
        return jax.nn.gelu(x)

    dn3 = jax.lax.conv_dimension_numbers((B * G, 21, 21, 64),
                                         (3, 3, 64, 64),
                                         ("NHWC", "HWIO", "NHWC"))

    def block_conv(x):
        y = jax.lax.conv_general_dilated(
            x.reshape(B * G, 21, 21, 64), w_blk, (1, 1), "SAME",
            dimension_numbers=dn3, preferred_element_type=DT)
        return (y + b_blk).reshape(B, G, 21, 21, 64)

    def dense(x):
        return jnp.dot(x, w_d, preferred_element_type=DT) + b_d

    def full(x):
        y = input_conv(x)
        y = max_pool(y)
        res = y
        for _ in range(2):
            y = group_norm_image(y)
            y = gelu(y)
            y = block_conv(y)
        y = y + res
        return dense(y.reshape(B, G, 21 * 21 * 64))

    # --- alternatives ---------------------------------------------------
    # A. input conv via im2col GEMM: windows as one big (M, 432) x (432, 64)
    def input_conv_im2col(x):
        x = x.reshape(B * G, P, P, 3)
        pat = jax.lax.conv_general_dilated_patches(
            x, (12, 12), (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # pat: (BG, 23, 23, 432) with feature order C, kh, kw (channel
        # first) — weight must be permuted to match; for timing we just use
        # a reshaped weight.
        w = w_in.transpose(2, 0, 1, 3).reshape(432, 64)
        y = jnp.dot(pat.reshape(-1, 432), w, preferred_element_type=DT)
        return (y + b_in).reshape(B, G, 23, 23, 64)

    # B. space-to-depth then 6x6/1 conv (stride folded into channels)
    w_s2d = jax.random.normal(ks[5], (6, 6, 12, 64), DT) * 0.05

    def input_conv_s2d(x):
        x = x.reshape(B * G, 28, 2, 28, 2, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B * G, 28, 28, 12)
        dns = jax.lax.conv_dimension_numbers((B * G, 28, 28, 12),
                                             (6, 6, 12, 64),
                                             ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x, w_s2d, (1, 1), "VALID", dimension_numbers=dns,
            preferred_element_type=DT)
        return (y + b_in).reshape(B, G, 23, 23, 64)

    # C. block conv via im2col GEMM (K=576)
    def block_conv_im2col(x):
        x = x.reshape(B * G, 21, 21, 64)
        pat = jax.lax.conv_general_dilated_patches(
            x, (3, 3), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        w = w_blk.transpose(2, 0, 1, 3).reshape(576, 64)
        y = jnp.dot(pat.reshape(-1, 576), w, preferred_element_type=DT)
        return (y + b_blk).reshape(B, G, 21, 21, 64)

    results = {}
    timed("patchify", lambda im: im.reshape(B, 2, 5, P, 5, P, 3)
          .transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, G, P, P, 3) / 127.5 - 1,
          x_img, results, peak)
    timed("input_conv", input_conv, x_patch, results, peak)
    timed("input_conv_im2col", input_conv_im2col, x_patch, results, peak)
    timed("input_conv_s2d", input_conv_s2d, x_patch, results, peak)
    timed("max_pool", max_pool, x_conv, results, peak)
    timed("group_norm_image", group_norm_image, x_pool, results, peak)
    timed("gelu", gelu, x_pool, results, peak)
    timed("block_conv", block_conv, x_pool, results, peak)
    timed("block_conv_im2col", block_conv_im2col, x_pool, results, peak)
    timed("dense_28224_768", dense, x_flat, results, peak)
    timed("full_embedder", full, x_patch, results, peak)

    total = sum(v["ms"] for k, v in results.items()
                if k in ("patchify", "input_conv", "max_pool", "dense_28224_768")) \
        + 2 * (results["group_norm_image"]["ms"] + results["gelu"]["ms"]
               + results["block_conv"]["ms"])
    out = {
        "metric": "embedder_per_op_profile_ms",
        "value": results["full_embedder"]["ms"],
        "unit": "ms/call",
        "vs_baseline": 1.0,
        "detail": {"batch": B, "device": kind, "ops": results,
                   "sum_of_parts_ms": round(total, 3)},
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "recorded", "embedder_profile_r3.json")
    with open(path, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
