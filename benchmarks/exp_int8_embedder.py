"""int8 image tower (serve/quantize.py) vs the bf16 hwcn embedder on TPU.

The embedder's convs + output dense are MXU-bound in bf16 (0.62-0.94 MFU,
embedder_profile_hwcn_r3.json) — the regime where the v5e MXU's 2x int8
byte path can pay, unlike the latency-bound text tower.  Measures:

  * tower-only: float ImageTokenizer.apply (bf16, eval) vs
    image_embed_int8, batch 32 and batch 1;
  * whole serving forward: predict_diffusion_action_with_text (bf16 tower)
    vs predict_diffusion_action_with_modalities (int8 tower outside the
    jit? NO — both fully jitted end-to-end, tower inside).

Gates whether the int8 tower is advertised as a serving win.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_loop, sec_per_call, log  # noqa: E402

from multi_modal_transformers_tokenmerge_tpu import Octo, load_config  # noqa: E402
from multi_modal_transformers_tokenmerge_tpu.serve.quantize import (  # noqa: E402
    image_embed_int8,
    quantize_image_tower,
)

B = int(os.environ.get("BENCH_BATCH", "32"))


def main():
    cfg = load_config("octo_base", ["dtype=bfloat16"])
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = jnp.ones((B, 16), jnp.int32)
    img_shape = (B, cfg.num_observation_blocks, *cfg.images.image_size)
    images = jax.random.uniform(keys[3], img_shape) * 255.0
    variables = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]}, text, images)
    qp = quantize_image_tower(model, variables)
    text_emb = model.apply(variables, text, method="encode_text")

    # stack of 2 inputs so the loop body can't be hoisted
    images2 = jnp.stack([images, images + 1.0])

    def tower_bf16(i, imgs2, variables):
        im = jax.lax.dynamic_index_in_dim(imgs2, i % 2, keepdims=False)
        out = model.apply(variables, im, train=False,
                          method=lambda m, x, train:
                          m.image_encoder(x, train))
        return jnp.sum(out.astype(jnp.float32))

    def tower_int8(i, imgs2, qp):
        im = jax.lax.dynamic_index_in_dim(imgs2, i % 2, keepdims=False)
        out = image_embed_int8(qp, im, cfg.images)
        return jnp.sum(out.astype(jnp.float32))

    def e2e_bf16(i, imgs2, variables, text_emb, key):
        im = jax.lax.dynamic_index_in_dim(imgs2, i % 2, keepdims=False)
        act = model.apply(variables, text_emb, im,
                          rngs={"diffusion": jax.random.fold_in(key, i)},
                          method="predict_diffusion_action_with_text")
        return jnp.sum(act.astype(jnp.float32))

    def e2e_int8(i, imgs2, variables, text_emb, key, qp):
        im = jax.lax.dynamic_index_in_dim(imgs2, i % 2, keepdims=False)
        emb = image_embed_int8(qp, im, cfg.images)
        act = model.apply(variables, text_emb, emb,
                          rngs={"diffusion": jax.random.fold_in(key, i)},
                          method="predict_diffusion_action_with_modalities")
        return jnp.sum(act.astype(jnp.float32))

    key = jax.random.PRNGKey(1)
    res = {}
    for name, fn, args in [
        ("tower_bf16", tower_bf16, (images2, variables)),
        ("tower_int8", tower_int8, (images2, qp)),
        ("e2e_bf16", e2e_bf16, (images2, variables, text_emb, key)),
        ("e2e_int8", e2e_int8, (images2, variables, text_emb, key, qp)),
    ]:
        s = sec_per_call(build_loop(fn), args, name)
        res[name] = round(s * 1e3, 3)
        log(f"[int8emb] {name}: {s*1e3:.3f} ms  (batch {B})")

    print(json.dumps({
        "metric": "int8_image_tower_ms",
        "value": res["e2e_int8"],
        "unit": "ms/call",
        "vs_baseline": round(res["e2e_bf16"] / max(res["e2e_int8"], 1e-9),
                             3),
        "detail": {"batch": B, **res,
                   "tower_speedup": round(
                       res["tower_bf16"] / max(res["tower_int8"], 1e-9),
                       3)},
    }))


if __name__ == "__main__":
    main()
