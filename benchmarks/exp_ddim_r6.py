"""DDIM reduced-step action decoding: latency + quality evidence on TPU.

The reference serves actions through a fixed 32-step DDPM reverse loop
(reference action_heads/diffusion.py:146-209).  ``DiffusionHeadConfig.
ddim_steps`` serves the SAME trained model with S deterministic DDIM
(eta=0) steps (heads/diffusion.py:ddim_schedule) — the per-step update is
the same linear form the fused Pallas sampler computes, so every sampler
arm below runs as one kernel.

Two measurements:

* latency — batch-1 cached-instruction p50 (the BASELINE.json north star;
  the sampler is ~50% of that path, serving_b1_decomp_r3.json) and b32
  cached-text throughput, for DDPM-32 vs DDIM-16/8/4;
* quality — train octo_base's diffusion head on the memorization pool
  (train_convergence.py protocol, 640 steps), then decode the pool with
  each sampler and compare per-arm action error against the memorized
  targets, plus each DDIM arm's agreement with the DDPM-32 decode.

Writes benchmarks/recorded/ddim_r6.json (suffix _seed{S} when
DDIM_SEED != 0).
Env: DDIM_TRAIN_STEPS (default 640), DDIM_SEGMENTS (16), BENCH_REPS,
DDIM_SEED (model init + data seed, default 0), DDIM_SKIP_LATENCY=1
(quality-only replication runs).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from bench import (  # noqa: E402
    build_loop, device_peak_flops, log, sec_per_call, serve_step)

STEPS = int(os.environ.get("DDIM_TRAIN_STEPS", "640"))
SEGMENTS = int(os.environ.get("DDIM_SEGMENTS", "16"))
SEED = int(os.environ.get("DDIM_SEED", "0"))
SKIP_LATENCY = os.environ.get("DDIM_SKIP_LATENCY") == "1"
BATCH = 32
POOL = 4
ACTION_DIM = 8
ARMS = {"ddpm32": None, "ddim16": 16, "ddim8": 8, "ddim4": 4}


def with_ddim(cfg, steps):
    if steps is None:
        return cfg
    return cfg.replace(heads=cfg.heads.replace(
        diffusion=cfg.heads.diffusion.replace(ddim_steps=steps)))


def main():
    from multi_modal_transformers_tokenmerge_tpu import Octo, load_config
    from multi_modal_transformers_tokenmerge_tpu.train.optim import (
        make_optimizer)
    from multi_modal_transformers_tokenmerge_tpu.train.state import (
        create_train_state)
    from multi_modal_transformers_tokenmerge_tpu.train.steps import (
        make_train_step)

    _, kind = device_peak_flops()
    log(f"[ddim] device={kind}")
    cfg = load_config("octo_base", ["dtype=bfloat16"])
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(SEED), 4)

    # ---------------- latency arms (random init params are fine) ----------
    rng = np.random.default_rng(1)
    text1 = jnp.ones((1, 16), dtype=jnp.int32)
    text32 = jnp.ones((BATCH, 16), dtype=jnp.int32)
    images_b1 = jnp.asarray(
        rng.integers(0, 256, (2, 1, 2, 280, 280, 3)), dtype=jnp.float32)
    images_b32 = jnp.asarray(
        rng.integers(0, 256, (2, BATCH, 2, 280, 280, 3)), dtype=jnp.float32)
    variables = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]}, text32, images_b32[0])
    emb1 = model.apply(variables, text1, method="encode_text")
    emb32 = model.apply(variables, text32, method="encode_text")

    latency = {}
    for name, steps in ([] if SKIP_LATENCY else list(ARMS.items())):
        m = Octo(with_ddim(cfg, steps))
        stp = serve_step(m, "predict_diffusion_action_with_text")
        s_b1 = sec_per_call(build_loop(stp),
                            (variables, emb1, images_b1, keys[3]),
                            f"b1_cached {name}")
        s_b32 = sec_per_call(build_loop(stp),
                             (variables, emb32, images_b32, keys[3]),
                             f"b32_cached {name}")
        latency[name] = {"b1_p50_ms": round(s_b1 * 1e3, 3),
                         "b32_ms_per_call": round(s_b32 * 1e3, 3),
                         "b32_inf_per_sec": round(BATCH / s_b32, 1)}
    for name, row in latency.items():
        row["b1_speedup_vs_ddpm32"] = round(
            latency["ddpm32"]["b1_p50_ms"] / row["b1_p50_ms"], 3)
        log(f"[ddim] {name}: b1 {row['b1_p50_ms']} ms "
            f"({row['b1_speedup_vs_ddpm32']}x), "
            f"b32 {row['b32_ms_per_call']} ms")

    # ---------------- quality: train then decode --------------------------
    rng = np.random.default_rng(5 + SEED)
    pool_images = jnp.asarray(
        rng.integers(0, 256, (POOL, BATCH, 2, 280, 280, 3)),
        dtype=jnp.float32)
    actions_pool = jnp.asarray(
        rng.uniform(-0.9, 0.9, (POOL, BATCH, ACTION_DIM)),
        dtype=jnp.float32)

    tx = make_optimizer(peak_lr=3e-4, warmup_steps=50, total_steps=STEPS,
                        params=variables["params"],
                        frozen_prefixes=("text_encoder",))
    state = create_train_state(
        model, variables, tx,
        rngs={"dropout": keys[2], "patch_encoding": keys[1],
              "diffusion": keys[3]})
    raw_step = make_train_step("diffusion", donate=False, jit=False)
    steps_per_seg = STEPS // SEGMENTS

    @jax.jit
    def segment(state, text, pool_images, actions_pool):
        def body(i, carry):
            state, acc = carry
            j = i % pool_images.shape[0]
            img = jax.lax.dynamic_index_in_dim(pool_images, j,
                                               keepdims=False)
            act = jax.lax.dynamic_index_in_dim(actions_pool, j,
                                               keepdims=False)
            state, loss = raw_step(state, text, img, act)
            return state, acc + loss
        state, acc = jax.lax.fori_loop(
            0, steps_per_seg, body, (state, jnp.float32(0.0)),
            unroll=False)
        return state, acc / steps_per_seg

    curve = []
    t0 = time.time()
    for s in range(SEGMENTS):
        state, mean_loss = segment(state, text32, pool_images, actions_pool)
        curve.append(float(mean_loss))
        log(f"[ddim] train seg {s + 1}/{SEGMENTS}: loss {curve[-1]:.5f} "
            f"[{time.time() - t0:.0f}s]")
        assert np.isfinite(curve[-1])
    trained = {"params": jax.device_get(state.params)}
    trained = jax.tree.map(jnp.asarray, trained)

    decode_key = jax.random.PRNGKey(123)
    quality = {}
    ddpm_acts = None
    for name, steps in ARMS.items():
        m = Octo(with_ddim(cfg, steps))
        fn = jax.jit(lambda v, t, im, k, _m=m: _m.apply(
            v, t, im, rngs={"diffusion": k},
            method="predict_diffusion_action"))
        acts = np.concatenate([
            np.asarray(fn(trained, text32, pool_images[j],
                          jax.random.fold_in(decode_key, j)))
            for j in range(POOL)])
        tgt = np.asarray(actions_pool).reshape(-1, ACTION_DIM)
        row = {"mae_vs_target": round(float(np.abs(acts - tgt).mean()), 4),
               "rmse_vs_target": round(
                   float(np.sqrt(((acts - tgt) ** 2).mean())), 4)}
        if name == "ddpm32":
            ddpm_acts = acts
        else:
            row["mae_vs_ddpm32"] = round(
                float(np.abs(acts - ddpm_acts).mean()), 4)
        quality[name] = row
        log(f"[ddim] quality {name}: {row}")

    if SKIP_LATENCY:
        head_val = quality["ddim8"]["mae_vs_target"]
        head_unit = "DDIM-8 decode MAE vs target (quality-only run)"
        head_vs = round(quality["ddpm32"]["mae_vs_target"]
                        / max(head_val, 1e-9), 3)
    else:
        head_val = latency["ddim8"]["b1_p50_ms"]
        head_unit = "ms b1 cached-text p50 (DDIM-8)"
        head_vs = latency["ddim8"]["b1_speedup_vs_ddpm32"]
    out = {
        "metric": "ddim_reduced_step_serving_r6",
        "value": head_val,
        "unit": head_unit,
        "vs_baseline": head_vs,
        "detail": {
            "device": kind,
            "seed": SEED,
            "train_steps": STEPS,
            "train_loss_first_final": [round(curve[0], 4),
                                       round(curve[-1], 4)],
            "latency": latency,
            "quality": quality,
            "note": ("same checkpoint in every arm; DDIM arms are "
                     "deterministic given the init-noise key; quality is "
                     "decode error on the memorization pool after "
                     f"{STEPS} diffusion train steps"),
        },
    }
    suffix = f"_seed{SEED}" if SEED else ""
    path = os.path.join(ROOT, "benchmarks", "recorded",
                        f"ddim_r6{suffix}.json")
    with open(path, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
