"""Per-op device profile of the HWCN (batch-in-lanes) patch embedder.

Round-3 follow-up to benchmarks/profile_embedder.py (which profiled the
old NHWC layout and found the 3x3 block convs at MFU 0.10).  The layout
fix moved the model to (H, W, C, N) operands; this script measures what
NOW dominates the 2.70 ms image+transformer stage
(stage_decomp_r3_hwcn.json): each embedder op in its shipped layout, the
whole embedder, and the transformer trunk on the 74-token sequence —
so the next optimization target is chosen from data, not the stale
NHWC profile.

Shapes at octo_base (reference: tokenizers/images/image_tokenizer.py:140-178):
  operands (H, W, C, N) with N = B * 50 patches in lanes
  input conv 12x12/2 VALID:  (56, 56, 3, N) -> (23, 23, 64, N)
  max_pool 3x3/1 VALID:      -> (21, 21, 64, N)
  2 x [GroupNorm(32, f32 stats, image scope) -> GELU -> conv 3x3 SAME]
  dense TN: (28224, N) x (28224, 768) -> (N, 768)

Writes benchmarks/recorded/embedder_profile_hwcn_r3.json.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import (build_loop, sec_per_call, flops_of, device_peak_flops,
                   log)  # noqa: E402

from multi_modal_transformers_tokenmerge_tpu.core.yaml_loader import (  # noqa: E402
    load_config)
from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo  # noqa: E402

B = int(os.environ.get("BENCH_BATCH", "32"))
G = 50
P = 56
N = B * G
DT = jnp.bfloat16


def timed(name, fn, stack, results, peak):
    def step(i, stk):
        x = jax.lax.dynamic_index_in_dim(stk, i % stk.shape[0],
                                         keepdims=False)
        return jnp.sum(fn(x).astype(jnp.float32))
    sec = sec_per_call(build_loop(step), (stack,), label=name)
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


def conv_hwcn(x, w, strides, padding):
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("HWCN", "HWIO", "HWCN"))
    return jax.lax.conv_general_dilated(
        x, w, strides, padding, dimension_numbers=dn,
        preferred_element_type=x.dtype)


def main():
    peak, kind = device_peak_flops()
    log(f"[profile] device={kind} B={B} N={N} layout=HWCN")
    ks = jax.random.split(jax.random.PRNGKey(0), 8)

    def stack2(shape, k):
        return jax.random.normal(k, (2, *shape), DT)

    x_patch = stack2((P, P, 3, N), ks[0])
    x_conv = stack2((23, 23, 64, N), ks[1])
    x_pool = stack2((21, 21, 64, N), ks[2])
    x_flat = stack2((21 * 21 * 64, N), ks[3])

    w_in = jax.random.normal(ks[4], (12, 12, 3, 64), DT) * 0.05
    w_blk = jax.random.normal(ks[5], (3, 3, 64, 64), DT) * 0.05
    w_d = jax.random.normal(ks[6], (21 * 21 * 64, 768), DT) * 0.01
    gn_scale = jnp.ones((64,), jnp.float32)
    gn_bias = jnp.zeros((64,), jnp.float32)

    def input_conv(x):
        return conv_hwcn(x, w_in, (2, 2), "VALID")

    def max_pool(x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (3, 3, 1, 1), (1, 1, 1, 1), "VALID")

    def group_norm_image(x):  # image scope: stats over (h, w, cpg, G)
        h, w, c, n = x.shape
        f6 = x.astype(jnp.float32).reshape(h, w, 32, 2, n // G, G)
        mu = f6.mean(axis=(0, 1, 3, 5), keepdims=True)
        var = jnp.maximum(
            0.0, (f6 * f6).mean(axis=(0, 1, 3, 5), keepdims=True) - mu * mu)
        f6 = (f6 - mu) * jax.lax.rsqrt(var + 1e-6)
        f = f6.reshape(h, w, c, n)
        return (f * gn_scale[:, None] + gn_bias[:, None]).astype(DT)

    def gelu(x):
        return jax.nn.gelu(x)

    def block_conv(x):
        return conv_hwcn(x, w_blk, (1, 1), "SAME")

    def dense_tn(x):
        return jax.lax.dot_general(
            x, w_d, (((0,), (0,)), ((), ())), preferred_element_type=DT)

    def norm_gelu_conv(x):
        return block_conv(gelu(group_norm_image(x)))

    results = {}
    timed("input_conv", input_conv, x_patch, results, peak)
    timed("max_pool", max_pool, x_conv, results, peak)
    timed("group_norm_image", group_norm_image, x_pool, results, peak)
    timed("gelu", gelu, x_pool, results, peak)
    timed("block_conv", block_conv, x_pool, results, peak)
    timed("norm_gelu_conv_fusedxla", norm_gelu_conv, x_pool, results, peak)
    timed("dense_28224_768_tn", dense_tn, x_flat, results, peak)

    # --- full shipped embedder module + the transformer trunk, from the
    # real model, so module overhead and XLA whole-graph fusion are included
    cfg = load_config("octo_base", ["dtype=bfloat16"])
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    text = jnp.ones((B, 16), dtype=jnp.int32)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, (2, B, 2, 280, 280, 3)), dtype=jnp.float32)
    variables = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]}, text, images[0])

    def tokenize_images(im):
        return model.apply(variables, im,
                           method=lambda m, x: m.image_encoder(x))

    timed("image_tokenizer_module", tokenize_images, images, results, peak)

    text_emb = jax.jit(
        lambda v, t: model.apply(v, t, method="encode_text"))(variables, text)
    img_tok = jax.jit(tokenize_images)(images[0])
    img_stack = jnp.stack([img_tok, img_tok + 0.01])

    def trunk_method(m, img_emb):
        from multi_modal_transformers_tokenmerge_tpu.models.octo import (
            TokenEmbeddings)
        emb = m.assemble_embeddings(TokenEmbeddings(
            text=text_emb, images=img_emb,
            readouts=m.readout_tokens(img_emb.shape[0])))
        mask = jnp.asarray(m.layout.attention_mask())
        out = m.transformer(emb, mask=mask, deterministic=True)
        idx = m.layout.modality_index("readouts")
        return jnp.take(out, jnp.asarray(idx), axis=1)

    def trunk(it):
        return model.apply(variables, it, method=trunk_method)

    timed("transformer_trunk", trunk, img_stack, results, peak)
    has_trunk = True

    out = {
        "metric": "embedder_per_op_profile_hwcn_ms",
        "value": results["image_tokenizer_module"]["ms"],
        "unit": "ms/call",
        "vs_baseline": 1.0,
        "detail": {"batch": B, "device": kind, "layout": "hwcn",
                   "ops": results, "trunk_measured": has_trunk},
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "recorded", "embedder_profile_hwcn_r3.json")
    with open(path, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
