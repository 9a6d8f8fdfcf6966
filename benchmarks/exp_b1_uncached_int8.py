"""Batch-1 UNCACHED-instruction serving: bf16 vs int8 text tower, e2e.

The instruction cache removes the text tower from steady-state serving
(bench.py serving_b1); this measures the other regime — every request
carries a NEW instruction, so the full path runs text tower -> encoder
-> fused DDPM sampler at batch 1.  This is exactly where the round-4
int8 tower (fused qkv + unrolled scan) measured 1.29-1.40x tower-only;
here is what that buys end-to-end.

Writes benchmarks/recorded/b1_uncached_int8_r4.json.
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
        quantize_t5_params, t5_encode_int8)

    peak, kind = device_peak_flops()
    log(f"[b1u] device={kind}")
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
    qp = quantize_t5_params(
        variables["params"]["text_encoder"]["t5_encoder"])
    tcfg = cfg.text

    def pick(i, stk):
        return jax.lax.dynamic_index_in_dim(stk, i % 2, keepdims=False)

    def bf16_step(i, variables, text, images_stack, key):
        # new instruction every request: ids vary with i
        emb = model.apply(variables, text + (i % 2), method="encode_text")
        out = model.apply(variables, emb, pick(i, images_stack),
                          rngs={"diffusion": jax.random.fold_in(key, i)},
                          method="predict_diffusion_action_with_text")
        return jnp.sum(out.astype(jnp.float32))

    def int8_step(i, variables, qp, text, images_stack, key):
        emb = t5_encode_int8(
            qp, text + (i % 2), rel_pos_buckets=tcfg.t5_rel_pos_buckets,
            rel_pos_max_distance=tcfg.t5_rel_pos_max_distance,
            dtype=jnp.bfloat16)
        out = model.apply(variables, emb, pick(i, images_stack),
                          rngs={"diffusion": jax.random.fold_in(key, i)},
                          method="predict_diffusion_action_with_text")
        return jnp.sum(out.astype(jnp.float32))

    s_bf = sec_per_call(build_loop(bf16_step),
                        (variables, text, images_stack, keys[3]),
                        "b1_uncached_bf16")
    s_i8 = sec_per_call(build_loop(int8_step),
                        (variables, qp, text, images_stack, keys[3]),
                        "b1_uncached_int8")
    out = {
        "metric": "serving_b1_uncached_instruction_p50_ms",
        "value": round(s_i8 * 1e3, 3),
        "unit": "ms/request (int8 text tower)",
        "vs_baseline": round(s_bf / s_i8, 3),
        "detail": {"device": kind,
                   "bf16_ms": round(s_bf * 1e3, 3),
                   "int8_text_ms": round(s_i8 * 1e3, 3),
                   "note": ("batch-1, new instruction per request (cache "
                            "miss path); cached-instruction steady state "
                            "is bench.py serving_b1")},
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "recorded", "b1_uncached_int8_r4.json")
    with open(path, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
