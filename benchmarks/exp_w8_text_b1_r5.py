"""Round-5 probe: weight-only-int8 (w8) towers in batch-1 UNCACHED-
instruction serving.

Four arms, each the full text-ids -> action path at b1 with a new
instruction per request (the instruction-cache miss regime,
exp_b1_uncached_int8.py's protocol):

  bf16        — both towers bf16 (the shipped default)
  int8_text   — r4's int8 text tower (activations quantized too)
  w8_text     — weight-only text tower (kernels int8, bf16 compute)
  w8_both     — w8 text + w8 image tower (full weight-only serving)

At b1 every tower GEMM is weight-read-bound, so w8's halved kernel
fetch should match or beat int8 (which pays per-call activation
quant/dequant VPU work on top) while tracking the float model an order
of magnitude closer (tests/test_quantize.py).

Writes benchmarks/recorded/w8_text_b1_r5.json.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_loop, sec_per_call, device_peak_flops, log  # noqa: E402


def main():
    from multi_modal_transformers_tokenmerge_tpu import Octo, load_config
    from multi_modal_transformers_tokenmerge_tpu.serve.quantize import (
        image_embed_w8, quantize_image_tower, quantize_t5_params,
        t5_encode_int8)

    # slope-protocol timing (sec_per_call) is the tunnel-async guard here;
    # no FLOP count is computed for these mixed arms, so no peak check
    _, kind = device_peak_flops()
    log(f"[w8t] device={kind}")
    cfg = load_config("octo_base", ["dtype=bfloat16"])
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = jnp.ones((1, 16), dtype=jnp.int32)
    rng = np.random.default_rng(0)
    images_stack = jnp.asarray(
        rng.integers(0, 256, (2, 1, 2, 280, 280, 3)), dtype=jnp.float32)
    variables = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]},
        text, images_stack[0])
    text_qp = quantize_t5_params(
        variables["params"]["text_encoder"]["t5_encoder"])
    img_qp = quantize_image_tower(model, variables)
    tcfg = cfg.text

    def pick(i, stk):
        return jax.lax.dynamic_index_in_dim(stk, i % 2, keepdims=False)

    def encode_q(qp, text, mode):
        return t5_encode_int8(
            qp, text, rel_pos_buckets=tcfg.t5_rel_pos_buckets,
            rel_pos_max_distance=tcfg.t5_rel_pos_max_distance,
            dtype=jnp.bfloat16, mode=mode)

    def bf16_step(i, variables, text, images_stack, key):
        emb = model.apply(variables, text + (i % 2), method="encode_text")
        out = model.apply(variables, emb, pick(i, images_stack),
                          rngs={"diffusion": jax.random.fold_in(key, i)},
                          method="predict_diffusion_action_with_text")
        return jnp.sum(out.astype(jnp.float32))

    def text_q_step(mode):
        def step(i, variables, qp, text, images_stack, key):
            emb = encode_q(qp, text + (i % 2), mode)
            out = model.apply(variables, emb, pick(i, images_stack),
                              rngs={"diffusion": jax.random.fold_in(key, i)},
                              method="predict_diffusion_action_with_text")
            return jnp.sum(out.astype(jnp.float32))
        return step

    def w8_both_step(i, variables, tqp, iqp, text, images_stack, key):
        temb = encode_q(tqp, text + (i % 2), "w8")
        iemb = image_embed_w8(iqp, pick(i, images_stack), cfg.images,
                              dtype=cfg.compute_dtype)
        out = model.apply(variables, temb, iemb,
                          rngs={"diffusion": jax.random.fold_in(key, i)},
                          method="predict_diffusion_action_with_modalities")
        return jnp.sum(out.astype(jnp.float32))

    s_bf = sec_per_call(build_loop(bf16_step),
                        (variables, text, images_stack, keys[3]),
                        "b1_uncached bf16")
    arms = {"bf16": s_bf}
    for mode in ("int8", "w8"):
        arms[f"{mode}_text"] = sec_per_call(
            build_loop(text_q_step(mode)),
            (variables, text_qp, text, images_stack, keys[3]),
            f"b1_uncached {mode}_text")
    arms["w8_both"] = sec_per_call(
        build_loop(w8_both_step),
        (variables, text_qp, img_qp, text, images_stack, keys[3]),
        "b1_uncached w8_both")

    detail = {name: {"ms": round(s * 1e3, 3),
                     "vs_bf16": round(s_bf / s, 3)}
              for name, s in arms.items()}
    for name, row in detail.items():
        log(f"[w8t] {name}: {row['ms']} ms ({row['vs_bf16']}x)")
    best = min((n for n in arms if n != "bf16"), key=lambda n: arms[n])
    out = {
        "metric": "serving_b1_uncached_w8_r5",
        "value": detail[best]["ms"],
        "unit": f"ms/request ({best})",
        "vs_baseline": detail[best]["vs_bf16"],
        "detail": {"device": kind, "arms": detail,
                   "note": ("batch-1, new instruction per request (cache "
                            "miss path); protocol of "
                            "exp_b1_uncached_int8.py")},
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "recorded", "w8_text_b1_r5.json")
    with open(path, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
