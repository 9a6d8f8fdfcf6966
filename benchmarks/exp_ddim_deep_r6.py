"""Deep-denoiser DDIM latency: where reduced steps actually pay.

At octo_base the denoiser is a single block and the whole fused 32-step
kernel is 6-11 us (ddim_op_r6.json) — step reduction has nothing to
save.  Deeper denoisers (num_blocks > 1) have no fused realization and
sample through the step-proportional lax.scan path, so S steps should
cost ~S/T of the DDPM loop.  This probe times the HEAD-level
predict_action (b1, octo_base-width readouts) for a 3-block denoiser:
DDPM-32 scan vs DDIM-16/8/4 scan.

Writes benchmarks/recorded/ddim_deep_r6.json.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from bench import build_loop, device_peak_flops, log, sec_per_call  # noqa: E402

from multi_modal_transformers_tokenmerge_tpu.core.config import (  # noqa: E402
    DiffusionHeadConfig)
from multi_modal_transformers_tokenmerge_tpu.heads.diffusion import (  # noqa: E402
    DiffusionActionHead)

ARMS = {"ddpm32": None, "ddim16": 16, "ddim8": 8, "ddim4": 4}


def main():
    _, kind = device_peak_flops()
    log(f"[ddim-deep] device={kind}")
    base = DiffusionHeadConfig(diffusion_steps=32, action_space_dim=8,
                               time_dim=768, mlp_dim=768, num_blocks=3,
                               sampler_impl="scan")
    readouts = jax.random.normal(jax.random.PRNGKey(7), (2, 1, 8, 768),
                                 jnp.float32)
    key = jax.random.PRNGKey(3)

    head0 = DiffusionActionHead(base, dtype=jnp.bfloat16)
    v = head0.init({"params": jax.random.PRNGKey(1),
                    "diffusion": jax.random.PRNGKey(2)},
                   readouts[0], method="predict_action")

    rows = {}
    for name, steps in ARMS.items():
        cfg = base if steps is None else base.replace(ddim_steps=steps)
        head = DiffusionActionHead(cfg, dtype=jnp.bfloat16)

        def step(i, v, readouts, key, _head=head):
            r = jax.lax.dynamic_index_in_dim(readouts, i % 2,
                                             keepdims=False)
            out = _head.apply(v, r, method="predict_action",
                              rngs={"diffusion": jax.random.fold_in(key, i)})
            return jnp.sum(out.astype(jnp.float32))

        sec = sec_per_call(build_loop(step), (v, readouts, key),
                           f"deep-denoiser b1 {name}")
        rows[name] = {"us_per_call": round(sec * 1e6, 1)}
    for name, row in rows.items():
        row["speedup_vs_ddpm32"] = round(
            rows["ddpm32"]["us_per_call"] / row["us_per_call"], 3)
        log(f"[ddim-deep] {name}: {row['us_per_call']} us "
            f"({row['speedup_vs_ddpm32']}x)")

    out = {"metric": "ddim_deep_denoiser_b1_r6",
           "value": rows["ddim8"]["us_per_call"],
           "unit": "us/call b1 (3-block denoiser, DDIM-8 scan)",
           "vs_baseline": rows["ddim8"]["speedup_vs_ddpm32"],
           "detail": {"device": kind, "num_blocks": 3,
                      "sampler_impl": "scan", "arms": rows}}
    path = os.path.join(ROOT, "benchmarks", "recorded", "ddim_deep_r6.json")
    with open(path, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
