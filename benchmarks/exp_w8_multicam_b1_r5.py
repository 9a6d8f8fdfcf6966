"""Round-5 probe: weight-only-int8 (w8) image tower at 4 cameras, b1.

octo_multicam (BASELINE config 4) runs the patch embedder over 4 camera
frames per observation — 4x the image-tower weight traffic per request
of the headline preset, so the b1 cached-instruction serving path leans
harder on the tower the w8 mode accelerates.  Arms: image_tower in
{bf16, w8} on the full obs->action path with cached text.

Protocol: identical to bench.bench_serving_b1 (fori_loop, two-point
slope, device time; slope timing is the tunnel-async guard).  Writes
benchmarks/recorded/w8_multicam_b1_r5.json.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import (  # noqa: E402
    build_loop, device_peak_flops, log, sec_per_call, serve_step)

N_INPUTS = 2


def main():
    from multi_modal_transformers_tokenmerge_tpu import Octo
    from multi_modal_transformers_tokenmerge_tpu.models.presets import (
        octo_multicam)
    from multi_modal_transformers_tokenmerge_tpu.serve.quantize import (
        image_embed_w8, quantize_image_tower)

    _, kind = device_peak_flops()
    log(f"[w8mc] device={kind}")
    cfg = octo_multicam(dtype="bfloat16")  # bench.py's serving config
    frames = 4  # BASELINE config 4: four camera frames per observation
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = jnp.ones((1, cfg.text.max_length), dtype=jnp.int32)
    rng = np.random.default_rng(1)
    images = jnp.asarray(
        rng.integers(0, 256, (N_INPUTS, 1, frames, 280, 280, 3)),
        dtype=jnp.float32)
    variables = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]}, text, images[0])
    qp = quantize_image_tower(model, variables)
    # jitted: eager apply dispatches per-op over the axon tunnel
    text_emb = jax.jit(
        lambda v, t: model.apply(v, t, method="encode_text"))(
            variables, text)
    key = jax.random.PRNGKey(7)
    icfg = cfg.images
    dtype = cfg.compute_dtype

    s_bf = sec_per_call(
        build_loop(serve_step(model, "predict_diffusion_action_with_text")),
        (variables, text_emb, images, key), "multicam b1 bf16")

    def w8_step(i, sv, text_emb, images_stack, key):
        img = jax.lax.dynamic_index_in_dim(
            images_stack, i % images_stack.shape[0], keepdims=False)
        emb = image_embed_w8(sv["img_q"], img, icfg, dtype=dtype)
        rngs = {"diffusion": jax.random.fold_in(key, i)}
        out = model.apply(sv["model"], text_emb, emb, rngs=rngs,
                          method="predict_diffusion_action_with_modalities")
        return jnp.sum(out.astype(jnp.float32))

    sv = {"model": variables, "img_q": qp}
    s_w8 = sec_per_call(build_loop(w8_step), (sv, text_emb, images, key),
                        "multicam b1 w8")

    out = {
        "metric": "w8_multicam_b1_serving_r5",
        "value": round(s_w8 * 1e3, 3),
        "unit": "p50 ms, b1 cached text, 4 cameras (w8 image tower)",
        "vs_baseline": round(s_bf / s_w8, 3),
        "detail": {
            "device": kind, "frames": frames,
            "bf16_ms": round(s_bf * 1e3, 3),
            "w8_ms": round(s_w8 * 1e3, 3),
            "note": ("4-camera preset: 4x the image-tower weight traffic "
                     "per request of octo_base — the regime the w8 mode "
                     "targets"),
        },
    }
    log(f"[w8mc] bf16 {s_bf*1e3:.3f} ms, w8 {s_w8*1e3:.3f} ms "
        f"({s_bf/s_w8:.3f}x)")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "recorded", "w8_multicam_b1_r5.json")
    with open(path, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
