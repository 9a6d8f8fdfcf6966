"""Batch-1 serving latency decomposition (round-3 TODO #5 scoping).

serving_b1 p50 is 0.414 ms (cached text).  Where does it go?

  trunk   : generate_readouts_with_text (embedder + transformer) @ b1
  full    : predict_diffusion_action_with_text @ b1
  sampler : standalone DiffusionActionHead.predict_action on fixed
            readouts — 32 sequential denoiser steps inside one lax.scan

If sampler ~= full - trunk dominates, a Pallas kernel running all 32
steps with the (tiny) denoiser weights resident in VMEM is the lever;
the per-step weights are ~25 KB so the cost today is 32x serial
dispatch of sub-lane matmuls, not FLOPs.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_loop, sec_per_call, device_peak_flops, log  # noqa: E402

from multi_modal_transformers_tokenmerge_tpu.core.yaml_loader import (  # noqa: E402
    load_config)
from multi_modal_transformers_tokenmerge_tpu.heads.diffusion import (  # noqa: E402
    DiffusionActionHead)
from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo  # noqa: E402

N_INPUTS = 2


def main():
    _, kind = device_peak_flops()
    log(f"[b1] device={kind}")
    cfg = load_config("octo_base", ["dtype=bfloat16"])
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = jnp.ones((1, 16), dtype=jnp.int32)
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.integers(0, 256, (N_INPUTS, 1, 2, 280, 280, 3)),
                         dtype=jnp.float32)
    variables = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]}, text, images[0])
    text_emb = model.apply(variables, text, method="encode_text")
    readouts = model.apply(variables, text_emb, images[0],
                           method="generate_readouts_with_text")
    log(f"[b1] readouts {readouts.shape} {readouts.dtype}")

    head = DiffusionActionHead(cfg.heads.diffusion,
                               dtype=cfg.compute_dtype,
                               param_dtype=cfg.params_dtype)
    head_vars = {"params": variables["params"]["diffusion_action_head"]}
    readouts2 = jnp.stack([readouts, readouts + 0.01])

    def full_step(i, v, te, ims, key):
        img = jax.lax.dynamic_index_in_dim(ims, i % N_INPUTS, keepdims=False)
        rngs = {"diffusion": jax.random.fold_in(key, i)}
        out = model.apply(v, te, img, rngs=rngs,
                          method="predict_diffusion_action_with_text")
        return jnp.sum(out.astype(jnp.float32))

    def trunk_step(i, v, te, ims):
        img = jax.lax.dynamic_index_in_dim(ims, i % N_INPUTS, keepdims=False)
        out = model.apply(v, te, img,
                          method="generate_readouts_with_text")
        return jnp.sum(out.astype(jnp.float32))

    def sampler_step(i, v, ro, key):
        r = jax.lax.dynamic_index_in_dim(ro, i % N_INPUTS, keepdims=False)
        rngs = {"diffusion": jax.random.fold_in(key, i)}
        out = head.apply(v, r, method="predict_action", rngs=rngs)
        return jnp.sum(out.astype(jnp.float32))

    res = {
        "full": sec_per_call(build_loop(full_step),
                             (variables, text_emb, images, keys[3]),
                             "b1_full"),
        "trunk": sec_per_call(build_loop(trunk_step),
                              (variables, text_emb, images), "b1_trunk"),
        "sampler": sec_per_call(build_loop(sampler_step),
                                (head_vars, readouts2, keys[3]),
                                "b1_sampler"),
    }
    out = {
        "metric": "serving_b1_latency_decomposition_ms",
        "detail": {
            "device": kind, "batch": 1, "cached_text": True,
            "ms": {k: round(v * 1e3, 3) for k, v in res.items()},
            "sampler_share_of_full": round(res["sampler"] / res["full"], 3),
            "full_minus_trunk_ms":
                round((res["full"] - res["trunk"]) * 1e3, 3),
            "diffusion_steps": cfg.heads.diffusion.diffusion_steps,
            "us_per_denoise_step":
                round(res["sampler"] * 1e6
                      / cfg.heads.diffusion.diffusion_steps, 2),
        },
    }
    log(f"[b1] full {res['full']*1e3:.3f} | trunk {res['trunk']*1e3:.3f} | "
        f"sampler {res['sampler']*1e3:.3f} ms "
        f"({res['sampler']/res['full']:.0%} of full)")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
