"""Paired ABBA head-to-head: w8 vs int8 text tower at b1 uncached.

Settles the regime table's b1 recommendation with a drift-free direct
comparison (see bench.paired_ab): w8 measured 1.066x FASTER than int8
with every block < 1.0 (b1_paired_w8_int8_r6.json) — w8 strictly
dominates int8 at b1 (faster AND ~10x lower tower error), so int8's
remaining value is the b32-footprint-with-MXU-byte-path case.
"""
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
import jax, jax.numpy as jnp, numpy as np
from bench import build_loop, paired_ab, log, device_peak_flops

def main():
    from multi_modal_transformers_tokenmerge_tpu import Octo, load_config
    from multi_modal_transformers_tokenmerge_tpu.serve.quantize import (
        quantize_t5_params, t5_encode_int8)
    _, kind = device_peak_flops()
    cfg = load_config("octo_base", ["dtype=bfloat16"])
    model = Octo(cfg); tcfg = cfg.text
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = jnp.ones((1, 16), dtype=jnp.int32)
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.integers(0, 256, (2, 1, 2, 280, 280, 3)), dtype=jnp.float32)
    variables = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]}, text, images[0])
    qp = quantize_t5_params(variables["params"]["text_encoder"]["t5_encoder"])
    def pick(i, stk):
        return jax.lax.dynamic_index_in_dim(stk, i % 2, keepdims=False)
    def q_step(mode):
        def step(i, variables, qp, text, images, key):
            e = t5_encode_int8(qp, text + (i % 2),
                rel_pos_buckets=tcfg.t5_rel_pos_buckets,
                rel_pos_max_distance=tcfg.t5_rel_pos_max_distance,
                dtype=jnp.bfloat16, mode=mode)
            out = model.apply(variables, e, pick(i, images),
                rngs={"diffusion": jax.random.fold_in(key, i)},
                method="predict_diffusion_action_with_text")
            return jnp.sum(out.astype(jnp.float32))
        return step
    args = (variables, qp, text, images, keys[3])
    ratio, blocks = paired_ab(build_loop(q_step("int8")), args,
                              build_loop(q_step("w8")), args,
                              "b1 uncached w8/int8")
    out = {"metric": "b1_paired_w8_vs_int8_r6",
           "value": round(1.0/ratio, 3),
           "unit": "w8 speedup over int8, b1 uncached text (paired ABBA)",
           "vs_baseline": round(ratio, 3),
           "detail": {"device": kind, "ratio_w8_over_int8": round(ratio, 3),
                      "blocks": [round(r, 3) for r in blocks]}}
    with open(os.path.join(ROOT, "benchmarks", "recorded", "b1_paired_w8_int8_r6.json"), "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))

if __name__ == "__main__":
    main()
