"""Benchmark: obs->action inferences/sec/chip at OCTO-Base (diffusion head).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference architecture executed the reference way — float32,
vanilla attention, whole-method jit.  (The reference itself cannot run in
this image: its Hydra config stack is not installed and its committed
configs are inconsistent — SURVEY.md §2.9 — so the baseline is our
architecture-faithful re-implementation with the reference's numerics and
no TPU-specific optimizations.)

Ours: the TPU-native serving path — bfloat16 compute, AOT-compiled, with a
ToMe token-merging variant reported alongside.

Measurement protocol: this rig's device sync falls into a ~25ms poll
interval for ops slower than ~1ms, so per-call block_until_ready inflates
latencies.  Throughput is therefore measured PIPELINED: enqueue K calls over
cycling input batches, block once, divide.  Per-call p50 with full sync is
reported in detail (upper bound).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
CALLS = int(os.environ.get("BENCH_CALLS", "30"))
N_INPUTS = 8
# BENCH_DEEP=1 benchmarks the isolated production-scale encoder stack
# (224 tokens, 12 blocks, 4x MLP) with/without grouped ToMe instead of the
# full OCTO-Base model — the regime where token merging pays (BASELINE.md).
DEEP = os.environ.get("BENCH_DEEP") == "1"
# BENCH_MULTICAM=1 benchmarks BASELINE config 4 (base+wrist views, 2-frame
# history, 124-token sequence) instead of octo_base.
MULTICAM = os.environ.get("BENCH_MULTICAM") == "1"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_round(fn, args_list, calls):
    """Pipelined: enqueue `calls` invocations, sync once.  Returns sec/call."""
    outs = []
    t0 = time.perf_counter()
    for i in range(calls):
        outs.append(fn(*args_list[i % len(args_list)]))
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / calls


def measure_variants(variants, rounds=5, calls=10):
    """Alternate variants across rounds so tunnel-latency drift (30x swings
    observed on this rig) spreads evenly; report per-variant medians."""
    samples = {name: [] for name in variants}
    # warmup all
    for name, (fn, args_list) in variants.items():
        jax.block_until_ready(fn(*args_list[0]))
    for _ in range(rounds):
        for name, (fn, args_list) in variants.items():
            samples[name].append(measure_round(fn, args_list, calls))
    return {name: float(np.median(s)) for name, s in samples.items()}


def measure_latency_p50(fn, args_list, iters=10):
    samples = []
    for i in range(iters):
        a = args_list[i % len(args_list)]
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        samples.append(time.perf_counter() - t0)
    return float(np.percentile(samples, 50))


def main_deep():
    """Isolated encoder-stack benchmark: vanilla vs grouped ToMe."""
    from multi_modal_transformers_tokenmerge_tpu.core.config import (
        AttentionConfig, TransformerConfig)
    from multi_modal_transformers_tokenmerge_tpu.modules.attention import (
        TransformerStack)
    from multi_modal_transformers_tokenmerge_tpu.modules.tome_stack import (
        CompressedTransformerStack)
    from multi_modal_transformers_tokenmerge_tpu.sequence.layout import (
        SequenceLayout)

    layout = SequenceLayout.from_strings(
        "[TaskDescriptionPrefix{16}] [Image{100};Readout{4}]*2",
        "[TaskDescriptionPrefix{0}] [Image{32};Readout{0}]*2")
    s, e = layout.total_tokens, 768
    base = TransformerConfig(
        num_blocks=12,
        attention=AttentionConfig(num_heads=12, qkv_features=768,
                                  dropout_rate=0.0),
        mlp_dim=3072, dropout_rate=0.0)
    xs = [jax.random.normal(jax.random.PRNGKey(i), (BATCH, s, e),
                            dtype=jnp.bfloat16) for i in range(N_INPUTS)]
    mask = jnp.asarray(layout.attention_mask())

    vanilla = TransformerStack(base, dtype=jnp.bfloat16)
    vv = jax.jit(lambda key, x: vanilla.init(key, x, mask=mask))(
        jax.random.PRNGKey(1), xs[0])
    tome = CompressedTransformerStack(
        base.replace(compression_mode="merge", tome_merge_every=4),
        layout=layout, dtype=jnp.bfloat16)
    tv = jax.jit(tome.init)(jax.random.PRNGKey(1), xs[0])
    built = {
        "vanilla": (jax.jit(lambda v, x: vanilla.apply(v, x, mask=mask)),
                    [(vv, x) for x in xs]),
        "tome": (jax.jit(tome.apply), [(tv, x) for x in xs]),
    }
    medians = measure_variants(built, rounds=5, calls=10)
    value = BATCH / medians["tome"]
    print(json.dumps({
        "metric": "deep_stack_sequences_per_sec_tome_224tok_12blk",
        "value": round(value, 2),
        "unit": "sequences/sec/chip",
        "vs_baseline": round(medians["vanilla"] / medians["tome"], 3),
        "detail": {"batch": BATCH, "ms_per_call": {
            k: round(v * 1e3, 3) for k, v in medians.items()}},
    }), flush=True)


def main():
    from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo
    from multi_modal_transformers_tokenmerge_tpu.core.yaml_loader import (
        load_config)

    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = jnp.ones((BATCH, 16), dtype=jnp.int32)
    rng = np.random.default_rng(0)
    frames = 4 if MULTICAM else 2  # multicam: base+wrist views x 2 frames
    # a distinct image batch per enqueued call defeats any request caching
    image_batches = [
        jnp.asarray(rng.integers(0, 256, (BATCH, frames, 280, 280, 3)),
                    dtype=jnp.float32)
        for _ in range(max(N_INPUTS, 10))
    ]
    log(f"[bench] batch={BATCH} frames={frames} device={jax.devices()[0]}")

    def build(cfg):
        model = Octo(cfg)
        variables = jax.jit(model.init)(
            {"params": keys[0], "patch_encoding": keys[1],
             "dropout": keys[2], "diffusion": keys[3]},
            text, image_batches[0])
        def serve(variables, text_tokens, images, key):
            return model.apply(variables, text_tokens, images,
                               rngs={"diffusion": key},
                               method="predict_diffusion_action")
        compiled = jax.jit(serve).lower(
            variables, text, image_batches[0], keys[3]).compile()
        return variables, compiled

    if MULTICAM:
        from multi_modal_transformers_tokenmerge_tpu.models.presets import (
            octo_multicam)
        base_mc = octo_multicam()
        tome_mc = base_mc.replace(
            compression_sequence=(
                "[TaskDescriptionPrefix{0}] "
                "[Image{2};Image{2};Readout{0}]*2"),
            transformer=base_mc.transformer.replace(
                compression_mode="merge"))
        configs = {
            "baseline_f32": base_mc,
            "ours_bf16": octo_multicam(dtype="bfloat16"),
            "ours_bf16_tome": tome_mc.replace(dtype="bfloat16"),
        }
    else:
        configs = {
            "baseline_f32": load_config("octo_base"),
            "ours_bf16": load_config("octo_base", ["dtype=bfloat16"]),
            "ours_bf16_tome": load_config("octo_base_tome",
                                          ["dtype=bfloat16"]),
        }
    built = {}
    for name, cfg in configs.items():
        t0 = time.time()
        variables, compiled = build(cfg)
        args_list = [(variables, text, img, keys[3]) for img in image_batches]
        built[name] = (compiled, args_list)
        log(f"[bench] built {name} in {time.time() - t0:.0f}s")

    medians = measure_variants(built, rounds=5, calls=10)
    results = {}
    for name, sec in medians.items():
        p50 = measure_latency_p50(*built[name])
        results[name] = {"sec_per_call": sec, "p50_sync": p50}
        log(f"[bench] {name}: {BATCH / sec:.0f} inf/s "
            f"({sec * 1e3:.2f}ms/call pipelined, p50 sync "
            f"{p50 * 1e3:.2f}ms)")

    ours = results["ours_bf16_tome"]["sec_per_call"]
    base = results["baseline_f32"]["sec_per_call"]
    value = BATCH / ours
    print(json.dumps({
        "metric": ("obs_to_action_inferences_per_sec_per_chip_"
                   + ("octo_multicam" if MULTICAM else "octo_base")
                   + "_diffusion_tome"),
        "value": round(value, 2),
        "unit": "inferences/sec/chip",
        "vs_baseline": round(base / ours, 3),
        "detail": {
            "batch": BATCH,
            "pipelined_ms_per_call": {
                k: round(v["sec_per_call"] * 1e3, 3)
                for k, v in results.items()},
            "p50_sync_ms": {
                k: round(v["p50_sync"] * 1e3, 3) for k, v in results.items()},
            "baseline_inferences_per_sec": round(BATCH / base, 2),
            "vanilla_bf16_inferences_per_sec": round(
                BATCH / results["ours_bf16"]["sec_per_call"], 2),
        },
    }), flush=True)


if __name__ == "__main__":
    main_deep() if DEEP else main()
