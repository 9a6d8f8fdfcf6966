"""Cumulative truncation timing of the shipped HWCN image tokenizer.

profile_embedder_hwcn.py measured isolated ops: matmuls healthy
(dense 0.94 / block conv 0.73 / input conv 0.62 MFU) but the module total
(2.41 ms) exceeds the sum of its measured stages by ~0.4 ms.  This script
times the REAL module truncated after each stage — so every number includes
whatever fusion XLA actually performs in context — and reports deltas.
That locates the unexplained time (patchify? transpose? pos-embeds?
fusion breaks between stages?) before any kernel work is attempted.
"""

import json
import os
import sys

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_loop, sec_per_call, device_peak_flops, log  # noqa: E402

from multi_modal_transformers_tokenmerge_tpu.core.yaml_loader import (  # noqa: E402
    load_config)
from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo  # noqa: E402
from multi_modal_transformers_tokenmerge_tpu.modules import (  # noqa: E402
    image_tokenizer as it)
from multi_modal_transformers_tokenmerge_tpu.ops.image_ops import (  # noqa: E402
    patchify)

B = int(os.environ.get("BENCH_BATCH", "32"))


def main():
    _, kind = device_peak_flops()
    log(f"[cum] device={kind} B={B}")
    cfg = load_config("octo_base", ["dtype=bfloat16"])
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = jnp.ones((B, 16), dtype=jnp.int32)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, (2, B, 2, 280, 280, 3)), dtype=jnp.float32)
    variables = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]}, text, images[0])

    icfg = cfg.images
    rcfg = icfg.resnet
    p = icfg.patch_size

    def staged(m, imgs, upto):
        """Re-run the image path, stopping after stage `upto`."""
        enc = m.image_encoder
        b, f, h, w, c = imgs.shape
        num_patches = (h // p) * (w // p)
        x = patchify(imgs, p, icfg.normalize, dtype=enc.dtype)
        if upto == "patchify":
            return x
        b_, g = b, f * num_patches
        xt = jnp.transpose(
            x.reshape(b_ * g, p, p, c), (1, 2, 3, 0)).astype(enc.dtype)
        if upto == "transpose":
            return xt
        res = enc.cfg.resnet
        scope = {"params": variables["params"]["image_encoder"]["resnet"]}
        y = it._ConvHWCN(res.features, tuple(res.input_kernel),
                         tuple(res.input_stride), "VALID", dtype=enc.dtype,
                         param_dtype=enc.param_dtype,
                         name="input_conv").apply(
            {"params": scope["params"]["input_conv"]}, xt)
        if upto == "input_conv":
            return y
        y = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (*res.pool_window, 1, 1),
            (*res.pool_stride, 1, 1), "VALID")
        if upto == "pool":
            return y
        residual = y
        for i in range(res.num_blocks):
            y = it._GroupNormHWCN(
                num_groups=res.group_norm_groups,
                epsilon=res.group_norm_epsilon,
                stats_scope=res.norm_stats_scope, frames_patches=g,
                dtype=enc.dtype, param_dtype=enc.param_dtype,
                name=f"block{i}_norm").apply(
                {"params": scope["params"][f"block{i}_norm"]}, y)
            if upto == f"norm{i}":
                return y
            y = nn.gelu(y)
            if upto == f"gelu{i}":
                return y
            y = it._ConvHWCN(res.features, tuple(res.block_kernel), (1, 1),
                             "SAME", dtype=enc.dtype,
                             param_dtype=enc.param_dtype,
                             name=f"block{i}_conv").apply(
                {"params": scope["params"][f"block{i}_conv"]}, y)
            if upto == f"conv{i}":
                return y
        y = y + residual
        h2, w2, c2, bg = y.shape
        flat_in = h2 * w2 * c2
        out = it._DenseTN(res.output_features, flat_in, dtype=enc.dtype,
                          param_dtype=enc.param_dtype,
                          name="output_dense").apply(
            {"params": scope["params"]["output_dense"]},
            y.reshape(flat_in, bg))
        if upto == "dense":
            return out
        emb = out.reshape(b_, g, res.output_features)
        return m.image_encoder(imgs)  # full module incl. pos embeds

    stages = ["patchify", "transpose", "input_conv", "pool",
              "norm0", "gelu0", "conv0", "norm1", "gelu1", "conv1",
              "dense", "full"]
    results = {}
    prev = 0.0
    for st in stages:
        def step(i, stk, _st=st):
            x = jax.lax.dynamic_index_in_dim(stk, i % 2, keepdims=False)
            return jnp.sum(
                model.apply(variables, x,
                            method=lambda m, im: staged(m, im, _st))
                .astype(jnp.float32))
        sec = sec_per_call(build_loop(step), (images,), label=f"upto_{st}")
        ms = sec * 1e3
        results[st] = {"cum_ms": round(ms, 4),
                       "delta_ms": round(ms - prev, 4)}
        prev = ms
        log(f"[cum] {st}: cum {ms:.3f} ms (delta {ms - prev + (ms - results[st]['delta_ms']) and results[st]['delta_ms']:.3f})")

    out = {"metric": "embedder_cumulative_decomp_ms", "detail":
           {"batch": B, "device": kind, "stages": results}}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "recorded", "embed_cumulative_r3.json")
    with open(path, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
