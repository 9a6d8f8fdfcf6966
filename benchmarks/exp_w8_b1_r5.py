"""Round-5 probe: weight-only-int8 (w8) image tower in the batch-1
cached-instruction serving path.

The b1 trunk is weight-read-bound and the embedder's 28224x768 dense
(43 MB bf16) is its single largest weight fetch; `int8_gemm_r4.json`
measured the dequant (weight-only) formulation of that GEMM 1.51x at b1
op-level.  This probe measures the claim END-TO-END: p50 obs->action
latency with cached text for image_tower in {bf16, int8, w8}, plus the
b32 throughput point for the regime table (w8 is expected to LOSE at
b32, where the dense is compute-bound and bf16's MXU path wins).

Protocol: identical to bench.bench_serving_b1 (fori_loop, two-point
slope, device time).  Writes benchmarks/recorded/w8_b1_r5.json.
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


def q_serve_step(model, embed_fn):
    """serve_step twin routing images through a quantized embedder;
    args = ({"model": v, "img_q": qp}, text_emb, images_stack, key)."""
    icfg = model.config.images
    dtype = model.config.compute_dtype

    def step(i, sv, text_emb, images_stack, key):
        img = jax.lax.dynamic_index_in_dim(
            images_stack, i % images_stack.shape[0], keepdims=False)
        emb = embed_fn(sv["img_q"], img, icfg, dtype=dtype)
        rngs = {"diffusion": jax.random.fold_in(key, i)}
        out = model.apply(sv["model"], text_emb, emb, rngs=rngs,
                          method="predict_diffusion_action_with_modalities")
        return jnp.sum(out.astype(jnp.float32))

    return step


def measure(model, variables, qp, batch):
    from multi_modal_transformers_tokenmerge_tpu.serve.quantize import (
        image_embed_int8, image_embed_w8)

    rng = np.random.default_rng(1)
    images = jnp.asarray(
        rng.integers(0, 256, (N_INPUTS, batch, 2, 280, 280, 3)),
        dtype=jnp.float32)
    text = jnp.ones((batch, 16), dtype=jnp.int32)
    # MUST be jitted: eager apply dispatches per-op over the axon tunnel
    # (minutes for the unrolled T5 tower)
    text_emb = jax.jit(
        lambda v, t: model.apply(v, t, method="encode_text"))(
            variables, text)
    key = jax.random.PRNGKey(7)
    sv = {"model": variables, "img_q": qp}

    entry = {}
    loop = build_loop(serve_step(model, "predict_diffusion_action_with_text"))
    sec_f = sec_per_call(loop, (variables, text_emb, images, key),
                         f"bf16 b{batch}")
    entry["bf16"] = {"ms_per_call": round(sec_f * 1e3, 3)}
    del loop

    for name, fn in (("w8", image_embed_w8), ("int8", image_embed_int8)):
        loop = build_loop(q_serve_step(model, fn))
        sec = sec_per_call(loop, (sv, text_emb, images, key),
                           f"{name} b{batch}")
        entry[name] = {"ms_per_call": round(sec * 1e3, 3),
                       "vs_bf16": round(sec_f / sec, 3)}
        log(f"[w8] b{batch} {name}: {sec*1e3:.3f} ms "
            f"({sec_f/sec:.3f}x vs bf16)")
        del loop
    return entry


def main():
    from multi_modal_transformers_tokenmerge_tpu.core.yaml_loader import (
        load_config)
    from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo
    from multi_modal_transformers_tokenmerge_tpu.serve.quantize import (
        quantize_image_tower)

    # slope-protocol timing (sec_per_call) is the tunnel-async guard here;
    # no FLOP count is computed for these mixed arms, so no peak check
    _, kind = device_peak_flops()
    log(f"[w8] device={kind}")
    cfg = load_config("octo_base", ["dtype=bfloat16"])
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = jnp.ones((1, 16), dtype=jnp.int32)
    img0 = jnp.zeros((1, 2, 280, 280, 3), jnp.float32)
    variables = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]}, text, img0)
    qp = quantize_image_tower(model, variables)

    out = {"metric": "w8_image_tower_serving_r5",
           "unit": "p50 ms, b1 cached text",
           "detail": {"device": kind, "batches": {}}}
    for batch in (1, 32):
        out["detail"]["batches"][f"b{batch}"] = measure(
            model, variables, qp, batch)
    b1 = out["detail"]["batches"]["b1"]
    out["value"] = b1["w8"]["ms_per_call"]
    out["vs_baseline"] = b1["w8"]["vs_bf16"]

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "recorded", "w8_b1_r5.json")
    with open(path, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
