"""Does native uint8 image ingestion pay end-to-end?

Cameras and recordio produce uint8; the bench (and typical callers) upcast
to f32 on host, so the device-side patchify reads 60 MB f32 instead of
15 MB uint8 per b32x2-frame call.  patchify already casts whatever it gets
(ops/image_ops.py:44), and uint8 -> bf16 is exact for 0..255, so the
forward is bit-identical for integral pixels.  This measures the full
octo_base bf16 forward (predict_diffusion_action) with f32 vs uint8 device
inputs, plus the isolated patchify chain.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import (build_loop, sec_per_call, device_peak_flops, log,  # noqa: E402
                   serve_step)

from multi_modal_transformers_tokenmerge_tpu.core.yaml_loader import (  # noqa: E402
    load_config)
from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo  # noqa: E402

B = int(os.environ.get("BENCH_BATCH", "32"))


def main():
    _, kind = device_peak_flops()
    log(f"[u8] device={kind} B={B}")
    cfg = load_config("octo_base", ["dtype=bfloat16"])
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = jnp.ones((B, 16), dtype=jnp.int32)
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (2, B, 2, 280, 280, 3))
    imgs_f32 = jnp.asarray(raw, dtype=jnp.float32)
    imgs_u8 = jnp.asarray(raw, dtype=jnp.uint8)
    variables = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]}, text, imgs_f32[0])

    # numerics: identical outputs for integral pixels
    apply = jax.jit(lambda v, t, im, k: model.apply(
        v, t, im, rngs={"diffusion": k}, method="predict_diffusion_action"))
    a32 = apply(variables, text, imgs_f32[0], keys[3])
    au8 = apply(variables, text, imgs_u8[0], keys[3])
    err = float(jnp.max(jnp.abs(a32 - au8)))
    log(f"[u8] max|action diff| f32-vs-uint8 = {err:.2e}")

    results = {}
    step = serve_step(model, "predict_diffusion_action")
    for name, stack in (("f32_input", imgs_f32), ("uint8_input", imgs_u8)):
        sec = sec_per_call(build_loop(step),
                           (variables, text, stack, keys[3]), name)
        results[name] = round(sec * 1e3, 3)
        log(f"[u8] {name}: {results[name]} ms/call ({B/sec:.0f} inf/s)")

    print(json.dumps({
        "metric": "uint8_ingest_forward_ms",
        "detail": {"batch": B, "device": kind, "max_action_diff": err,
                   "cases": results,
                   "speedup": round(results["f32_input"]
                                    / results["uint8_input"], 4)}}))


if __name__ == "__main__":
    main()
