"""Fused Pallas DDPM sampler vs lax.scan sampler on the real chip.

Round-3 TODO #5: at batch 1 (cached-text serving) the 32-step scan sampler
is 50% of end-to-end latency (serving_b1_decomp_r3.json, 6.2 us/step) —
pure serial-dispatch overhead, the per-step FLOPs are ~12 K MACs.  The
fused kernel (ops/ddpm_sampler.py) runs all 32 steps inside one Pallas
program with the denoiser weights resident in VMEM.

Measures the standalone sampler and the full cached-text predict path at
batch 1 and batch 32 for both sampler_impl values.
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


def measure(batch):
    res = {}
    for impl in ("scan", "fused"):
        cfg = load_config(
            "octo_base",
            ["dtype=bfloat16", f"heads.diffusion.sampler_impl={impl}"])
        model = Octo(cfg)
        keys = jax.random.split(jax.random.PRNGKey(0), 4)
        text = jnp.ones((batch, 16), dtype=jnp.int32)
        rng = np.random.default_rng(1)
        images = jnp.asarray(
            rng.integers(0, 256, (N_INPUTS, batch, 2, 280, 280, 3)),
            dtype=jnp.float32)
        variables = jax.jit(model.init)(
            {"params": keys[0], "patch_encoding": keys[1],
             "dropout": keys[2], "diffusion": keys[3]}, text, images[0])
        text_emb = model.apply(variables, text, method="encode_text")
        readouts = model.apply(variables, text_emb, images[0],
                               method="generate_readouts_with_text")
        head = DiffusionActionHead(cfg.heads.diffusion,
                                   dtype=cfg.compute_dtype,
                                   param_dtype=cfg.params_dtype)
        head_vars = {"params": variables["params"]["diffusion_action_head"]}
        readouts2 = jnp.stack([readouts, readouts + 0.01])

        def sampler_step(i, v, ro, key):
            r = jax.lax.dynamic_index_in_dim(ro, i % N_INPUTS, keepdims=False)
            rngs = {"diffusion": jax.random.fold_in(key, i)}
            out = head.apply(v, r, method="predict_action", rngs=rngs)
            return jnp.sum(out.astype(jnp.float32))

        def full_step(i, v, te, ims, key):
            img = jax.lax.dynamic_index_in_dim(ims, i % N_INPUTS,
                                               keepdims=False)
            rngs = {"diffusion": jax.random.fold_in(key, i)}
            out = model.apply(v, te, img, rngs=rngs,
                              method="predict_diffusion_action_with_text")
            return jnp.sum(out.astype(jnp.float32))

        res[impl] = {
            "sampler_ms": sec_per_call(
                build_loop(sampler_step), (head_vars, readouts2, keys[3]),
                f"sampler_{impl}_b{batch}") * 1e3,
            "full_ms": sec_per_call(
                build_loop(full_step),
                (variables, text_emb, images, keys[3]),
                f"full_{impl}_b{batch}") * 1e3,
        }
        log(f"[ddpm b{batch}] {impl}: sampler {res[impl]['sampler_ms']:.3f} "
            f"ms, full {res[impl]['full_ms']:.3f} ms")
    return res


def main():
    _, kind = device_peak_flops()
    log(f"[ddpm] device={kind}")
    detail = {"device": kind, "batches": {}}
    for batch in (1, 32):
        r = measure(batch)
        r["sampler_speedup"] = round(
            r["scan"]["sampler_ms"] / r["fused"]["sampler_ms"], 3)
        r["full_speedup"] = round(
            r["scan"]["full_ms"] / r["fused"]["full_ms"], 3)
        for impl in ("scan", "fused"):
            r[impl] = {k: round(v, 3) for k, v in r[impl].items()}
        detail["batches"][str(batch)] = r
    out = {"metric": "ddpm_fused_sampler", "detail": detail}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
