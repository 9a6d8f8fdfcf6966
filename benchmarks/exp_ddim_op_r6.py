"""Op-level fused-sampler A/B: DDPM-32 vs DDIM-16/8/4 kernel time.

The model-level DDIM arms (exp_ddim_r6.py) sit inside inter-arm tunnel
drift because the FUSED 32-step sampler is already a small slice of the
b1 path (the 0.199 ms / 6.2 us-per-step decomposition in
serving_b1_decomp_r3.json measured the pre-fusion SCAN sampler).  This
probe times ops/ddpm_sampler.py:fused_ddpm_sample alone, back-to-back,
at octo_base shapes (A=8, H=768) for b1 and b32 — the honest
step-count scaling of the kernel itself.

Writes benchmarks/recorded/ddim_op_r6.json.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from bench import build_loop, device_peak_flops, log, sec_per_call  # noqa: E402

from multi_modal_transformers_tokenmerge_tpu.ops.ddpm_sampler import (  # noqa: E402
    fused_ddpm_sample)

A, H = 8, 768
ARMS = {"ddpm32": (32, False), "ddim16": (16, True),
        "ddim8": (8, True), "ddim4": (4, True)}


def arm_step(T, ddim, B, ks):
    wn = jax.random.normal(ks[0], (A, H)) * 0.05
    bn = jax.random.normal(ks[1], (H,)) * 0.05
    wo = jax.random.normal(ks[2], (H, A)) * 0.05
    bo = jax.random.normal(ks[3], (A,)) * 0.05
    ctx = jax.random.normal(ks[4], (2, T, B, H), jnp.bfloat16)
    noise = (jnp.zeros((T, B, A)) if ddim
             else jax.random.normal(ks[5], (T, B, A)))
    width = 4 if ddim else 3
    coeffs = jnp.abs(jax.random.normal(ks[6], (T, width))) * 0.1 + 0.5
    noisy = jax.random.normal(ks[7], (2, B, A))

    def step(i, noisy, ctx, noise, coeffs, wn, bn, wo, bo):
        out = fused_ddpm_sample(
            jax.lax.dynamic_index_in_dim(noisy, i % 2, keepdims=False),
            jax.lax.dynamic_index_in_dim(ctx, i % 2, keepdims=False),
            noise, coeffs, wn, bn, wo, bo,
            clip_value=5.0, compute_dtype=jnp.bfloat16, ddim_x0clip=ddim)
        return jnp.sum(out)

    return step, (noisy, ctx, noise, coeffs, wn, bn, wo, bo)


def main():
    _, kind = device_peak_flops()
    log(f"[ddim-op] device={kind}")
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    detail = {"device": kind, "shapes": {"A": A, "H": H}}
    for B in (1, 32):
        rows = {}
        for name, (T, ddim) in ARMS.items():
            step, args = arm_step(T, ddim, B, ks)
            sec = sec_per_call(build_loop(step), args, f"b{B} {name}")
            rows[name] = {"us_per_call": round(sec * 1e6, 2)}
        base = rows["ddpm32"]["us_per_call"]
        for name, row in rows.items():
            row["speedup_vs_ddpm32"] = round(base / row["us_per_call"], 3)
        detail[f"b{B}"] = rows
        log(f"[ddim-op] b{B}: " + ", ".join(
            f"{n} {r['us_per_call']}us" for n, r in rows.items()))

    out = {"metric": "ddim_fused_sampler_op_r6",
           "value": detail["b1"]["ddim8"]["us_per_call"],
           "unit": "us/call b1 (DDIM-8 kernel)",
           "vs_baseline": detail["b1"]["ddim8"]["speedup_vs_ddpm32"],
           "detail": detail}
    path = os.path.join(ROOT, "benchmarks", "recorded", "ddim_op_r6.json")
    with open(path, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
