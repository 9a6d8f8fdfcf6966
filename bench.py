"""Benchmark: obs->action inferences/sec/chip at OCTO-Base (diffusion head).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference architecture executed the reference way — float32,
vanilla attention, whole-method jit (the reference itself cannot run in this
image: its Hydra config stack is not installed and its committed configs are
inconsistent, see SURVEY.md §2.9 — so the baseline is our architecture-
faithful re-implementation executed with the reference's numerics and no
TPU-specific optimizations).

Ours: the TPU-native serving path — bfloat16 compute, AOT-compiled
(jit.lower().compile()), same params.

Protocol (BASELINE.md): block_until_ready, discard compile, median of >=30.
"""

import json
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
ITERS = int(os.environ.get("BENCH_ITERS", "30"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(fn, *args, iters=ITERS, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        samples.append(time.perf_counter() - t0)
    return float(np.percentile(samples, 50))


def main():
    from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo
    from multi_modal_transformers_tokenmerge_tpu.models.presets import octo_base

    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = jnp.ones((BATCH, 16), dtype=jnp.int32)
    images = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (BATCH, 2, 280, 280, 3)),
        dtype=jnp.float32)

    log(f"[bench] batch={BATCH} device={jax.devices()[0]}")

    # ---- init once (f32 params shared by both paths)
    cfg_base = octo_base()
    model_base = Octo(cfg_base)
    t0 = time.time()
    variables = jax.jit(partial(model_base.init))(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]},
        text, images)
    log(f"[bench] init {time.time() - t0:.1f}s")

    # ---- baseline: reference numerics (f32), plain jit
    def baseline(variables, text_tokens, images, key):
        return model_base.apply(variables, text_tokens, images,
                                rngs={"diffusion": key},
                                method="predict_diffusion_action")

    baseline_fn = jax.jit(baseline)
    t0 = time.time()
    p50_base = measure(baseline_fn, variables, text, images, keys[3])
    log(f"[bench] baseline p50={p50_base * 1e3:.2f}ms "
        f"({BATCH / p50_base:.1f} inf/s) [{time.time() - t0:.0f}s total]")

    # ---- ours: bf16 compute, AOT-compiled serving path
    cfg_fast = cfg_base.replace(dtype="bfloat16")
    model_fast = Octo(cfg_fast)

    def serve(variables, text_tokens, images, key):
        return model_fast.apply(variables, text_tokens, images,
                                rngs={"diffusion": key},
                                method="predict_diffusion_action")

    t0 = time.time()
    compiled = jax.jit(serve).lower(variables, text, images,
                                    keys[3]).compile()
    log(f"[bench] AOT compile {time.time() - t0:.1f}s")
    p50_fast = measure(compiled, variables, text, images, keys[3])
    log(f"[bench] ours p50={p50_fast * 1e3:.2f}ms "
        f"({BATCH / p50_fast:.1f} inf/s)")

    value = BATCH / p50_fast
    result = {
        "metric": "obs_to_action_inferences_per_sec_per_chip_octo_base_diffusion",
        "value": round(value, 2),
        "unit": "inferences/sec/chip",
        "vs_baseline": round(p50_base / p50_fast, 3),
        "detail": {
            "batch": BATCH,
            "p50_ms_ours": round(p50_fast * 1e3, 3),
            "p50_ms_baseline_f32_jit": round(p50_base * 1e3, 3),
            "baseline_inferences_per_sec": round(BATCH / p50_base, 2),
        },
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
