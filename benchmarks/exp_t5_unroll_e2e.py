"""End-to-end effect of fully unrolling the T5 text-tower scan.

Isolated-tower numbers (t5_unroll_r3.json) show full unroll ~1.1x at
T=16; the tower is ~21% of the octo_base forward, so the predicted e2e
win is ~2%.  This measures the whole predict_diffusion_action forward
with t5_scan_unroll=1 (scan) vs 0 (fully unrolled).
"""

import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import (build_loop, sec_per_call, device_peak_flops, log,  # noqa: E402
                   serve_step)

from multi_modal_transformers_tokenmerge_tpu.core.yaml_loader import (  # noqa: E402
    load_config)
from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo  # noqa: E402

B = int(os.environ.get("BENCH_BATCH", "32"))


def main():
    _, kind = device_peak_flops()
    log(f"[t5e2e] device={kind} B={B}")
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = jnp.ones((B, 16), dtype=jnp.int32)
    stack = jnp.ones((2, B, 2, 280, 280, 3), dtype=jnp.float32)
    results = {}
    for name, unroll in (("scan", 1), ("unrolled", 0)):
        cfg = load_config("octo_base",
                          ["dtype=bfloat16", f"text.t5_scan_unroll={unroll}"])
        model = Octo(cfg)
        variables = jax.jit(model.init)(
            {"params": keys[0], "patch_encoding": keys[1],
             "dropout": keys[2], "diffusion": keys[3]}, text, stack[0])
        step = serve_step(model, "predict_diffusion_action")
        sec = sec_per_call(build_loop(step),
                           (variables, text, stack, keys[3]), label=name)
        results[name] = round(sec * 1e3, 3)
        log(f"[t5e2e] {name}: {results[name]} ms/call ({B/sec:.0f} inf/s)")

    print(json.dumps({
        "metric": "t5_unroll_e2e_forward_ms",
        "detail": {"batch": B, "device": kind, "cases": results,
                   "speedup": round(results["scan"] / results["unrolled"],
                                    4)}}))


if __name__ == "__main__":
    main()
