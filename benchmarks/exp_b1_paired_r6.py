"""Paired ABBA batch-1 A/Bs: drift-resistant ratios for the two open
b1 comparisons.

Single-arm slope timings (sec_per_call) are stable within a measurement
but arms measured minutes apart ride the tunnel's slow drift — observed
2x swings between adjacent b1 arms in one bench run (TODO.md session
notes), which swamps any sub-2x A/B.  bench.paired_ab interleaves the
two compiled loops in ABBA blocks and medians per-block ratios, so the
drift cancels to first order.

Pairs measured (octo_base, b1):
  1. cached-text serving: DDPM-32 vs DDIM-8  (expect ~1.0 — the fused
     sampler is 6-11 us total, ddim_op_r6.json)
  2. uncached-instruction serving: bf16 text tower vs w8 text tower
     (regime-table claim: w8 wins at b1)
  3. cached-text serving: bf16 image tower vs w8 image tower
     (regime-table claim: 1.086x, measured once in w8_b1_r5.json)

Writes benchmarks/recorded/b1_paired_r6.json.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from bench import (  # noqa: E402
    build_loop, device_peak_flops, log, paired_ab, serve_step)


def main():
    from multi_modal_transformers_tokenmerge_tpu import Octo, load_config
    from multi_modal_transformers_tokenmerge_tpu.serve.quantize import (
        quantize_t5_params, t5_encode_int8)

    _, kind = device_peak_flops()
    log(f"[paired] device={kind}")
    cfg = load_config("octo_base", ["dtype=bfloat16"])
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = jnp.ones((1, 16), dtype=jnp.int32)
    rng = np.random.default_rng(1)
    images = jnp.asarray(
        rng.integers(0, 256, (2, 1, 2, 280, 280, 3)), dtype=jnp.float32)
    variables = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]}, text, images[0])
    emb = model.apply(variables, text, method="encode_text")

    # -- pair 1: cached-text serving, DDPM-32 vs DDIM-8 -------------------
    ddim_model = Octo(cfg.replace(heads=cfg.heads.replace(
        diffusion=cfg.heads.diffusion.replace(ddim_steps=8))))
    loop_a = build_loop(
        serve_step(model, "predict_diffusion_action_with_text"))
    loop_b = build_loop(
        serve_step(ddim_model, "predict_diffusion_action_with_text"))
    args = (variables, emb, images, keys[3])
    ddim_ratio, ddim_blocks = paired_ab(
        loop_a, args, loop_b, args, "b1 cached ddim8/ddpm32")

    # -- pair 2: uncached-instruction serving, bf16 vs w8 text tower ------
    tcfg = cfg.text
    text_qp = quantize_t5_params(
        variables["params"]["text_encoder"]["t5_encoder"])

    def pick(i, stk):
        return jax.lax.dynamic_index_in_dim(stk, i % 2, keepdims=False)

    def bf16_step(i, variables, text, images, key):
        e = model.apply(variables, text + (i % 2), method="encode_text")
        out = model.apply(variables, e, pick(i, images),
                          rngs={"diffusion": jax.random.fold_in(key, i)},
                          method="predict_diffusion_action_with_text")
        return jnp.sum(out.astype(jnp.float32))

    def w8_step(i, variables, qp, text, images, key):
        e = t5_encode_int8(qp, text + (i % 2),
                           rel_pos_buckets=tcfg.t5_rel_pos_buckets,
                           rel_pos_max_distance=tcfg.t5_rel_pos_max_distance,
                           dtype=jnp.bfloat16, mode="w8")
        out = model.apply(variables, e, pick(i, images),
                          rngs={"diffusion": jax.random.fold_in(key, i)},
                          method="predict_diffusion_action_with_text")
        return jnp.sum(out.astype(jnp.float32))

    w8_ratio, w8_blocks = paired_ab(
        build_loop(bf16_step), (variables, text, images, keys[3]),
        build_loop(w8_step), (variables, text_qp, text, images, keys[3]),
        "b1 uncached w8/bf16")

    # -- pair 3: cached-text serving, bf16 vs w8 IMAGE tower --------------
    from multi_modal_transformers_tokenmerge_tpu.serve.quantize import (
        image_embed_w8, quantize_image_tower)
    img_qp = quantize_image_tower(model, variables)
    icfg, cdtype = cfg.images, cfg.compute_dtype

    def w8img_step(i, sv, text_emb, images, key):
        img = pick(i, images)
        e = image_embed_w8(sv["img_q"], img, icfg, dtype=cdtype)
        out = model.apply(sv["model"], text_emb, e,
                          rngs={"diffusion": jax.random.fold_in(key, i)},
                          method="predict_diffusion_action_with_modalities")
        return jnp.sum(out.astype(jnp.float32))

    w8img_ratio, w8img_blocks = paired_ab(
        loop_a, args,
        build_loop(w8img_step),
        ({"model": variables, "img_q": img_qp}, emb, images, keys[3]),
        "b1 cached w8img/bf16")

    out = {
        "metric": "b1_paired_ab_r6",
        "value": round(1.0 / w8_ratio, 3),
        "unit": "w8 text-tower speedup at b1 uncached (paired ABBA)",
        "vs_baseline": round(1.0 / ddim_ratio, 3),
        "detail": {
            "device": kind,
            "ddim8_over_ddpm32_cached": {
                "ratio_median": round(ddim_ratio, 3),
                "blocks": [round(r, 3) for r in ddim_blocks]},
            "w8_over_bf16_uncached": {
                "ratio_median": round(w8_ratio, 3),
                "speedup": round(1.0 / w8_ratio, 3),
                "blocks": [round(r, 3) for r in w8_blocks]},
            "w8_image_over_bf16_cached": {
                "ratio_median": round(w8img_ratio, 3),
                "speedup": round(1.0 / w8img_ratio, 3),
                "blocks": [round(r, 3) for r in w8img_blocks]},
            "note": ("ratio > 1 means the B arm is slower; ABBA blocking "
                     "cancels linear tunnel drift (bench.paired_ab)"),
        },
    }
    path = os.path.join(ROOT, "benchmarks", "recorded", "b1_paired_r6.json")
    with open(path, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
