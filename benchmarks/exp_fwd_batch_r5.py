"""Round-5 probe: forward throughput vs batch size.

The headline inferences/sec/chip is measured at the b32 protocol point.
The round-5 train sweep (train_batch_sweep_r5.json) showed step MFU
rising 0.311 -> 0.347 from b32 to b128 as fixed per-call overheads
amortize; the forward path has the same overhead structure (dispatch,
the DDPM sampler's fixed 32-step scan tail, small-GEMM text tower), so
the peak per-chip serving throughput may sit above the b32 number.

Sweeps baseline_f32 / ours_bf16 / ours_bf16_tome at b32/b64/b128 under
the exact headline protocol (bench.serve_step fori_loop, two-point
slope, MFU cross-check), so vs_baseline stays apples-to-apples at every
batch.  Writes benchmarks/recorded/fwd_batch_sweep_r5.json.

MEASURED CONCLUSION (fwd_batch_sweep_r5.json, v5e): the hypothesis is
REFUTED for the forward — throughput PEAKS at b32 (9,942 inf/s bf16,
MFU 0.506) and drops ~10% at b64/b128 (MFU 0.448/0.458); the baseline
shows the same shape (0.142 -> 0.132/0.135).  Unlike the train step,
the forward has no fixed cost big enough to amortize; past b32 the
embedder's conv intermediates outgrow what fits close to the compute
units and every variant loses.  The b32 headline protocol is therefore
already AT the per-chip serving sweet spot, and the right way to serve
more load on one chip is more engine replicas at b32, not bigger
batches.
"""

import json
import os
import sys

import jax
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import (  # noqa: E402
    build_loop, check_mfu, device_peak_flops, flops_of, log, sec_per_call,
    serve_step)

BATCHES = [int(b) for b in
           os.environ.get("BENCH_BATCHES", "32,64,128").split(",")]
N_INPUTS = 2


def main():
    from multi_modal_transformers_tokenmerge_tpu.core.yaml_loader import (
        load_config)
    from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo

    peak, kind = device_peak_flops()
    log(f"[fbatch] device={kind} batches={BATCHES}")
    configs = {
        "baseline_f32": load_config(
            "octo_base", ["images.resnet.conv_layout=nhwc"]),
        "ours_bf16": load_config("octo_base", ["dtype=bfloat16"]),
        "ours_bf16_tome": load_config("octo_base_tome", ["dtype=bfloat16"]),
    }
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    rng = np.random.default_rng(0)

    sweep = {}
    for batch in BATCHES:
        text = jnp.ones((batch, 16), dtype=jnp.int32)
        images_stack = jnp.asarray(
            rng.integers(0, 256, (N_INPUTS, batch, 2, 280, 280, 3)),
            dtype=jnp.float32)
        entry = {}
        for name, cfg in configs.items():
            model = Octo(cfg)
            variables = jax.jit(model.init)(
                {"params": keys[0], "patch_encoding": keys[1],
                 "dropout": keys[2], "diffusion": keys[3]},
                text, images_stack[0])
            single = jax.jit(
                lambda v, t, im, k, model=model: model.apply(
                    v, t, im, rngs={"diffusion": k},
                    method="predict_diffusion_action")
            ).lower(variables, text, images_stack[0], keys[3]).compile()
            flops = flops_of(single)
            loop = build_loop(serve_step(model, "predict_diffusion_action"))
            sec = sec_per_call(loop, (variables, text, images_stack, keys[3]),
                               f"{name} b{batch}")
            row = {"ms_per_call": round(sec * 1e3, 3),
                   "inf_per_sec": round(batch / sec, 1)}
            check_mfu(name, sec, flops, peak, row)
            entry[name] = row
            log(f"[fbatch] b{batch} {name}: {batch/sec:.0f} inf/s, "
                f"MFU {row.get('mfu', '?')}")
            del variables, single, loop, model
        entry["vs_baseline_tome"] = round(
            entry["baseline_f32"]["ms_per_call"]
            / entry["ours_bf16_tome"]["ms_per_call"], 3)
        sweep[f"b{batch}"] = entry

    best = max(sweep.values(),
               key=lambda e: e["ours_bf16_tome"]["inf_per_sec"])
    out = {
        "metric": "octo_base_fwd_batch_sweep_r5",
        "value": best["ours_bf16_tome"]["inf_per_sec"],
        "unit": "inferences/sec/chip at best batch",
        "vs_baseline": best["vs_baseline_tome"],
        "detail": {"device": kind, "sweep": sweep},
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "recorded", "fwd_batch_sweep_r5.json")
    with open(path, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
