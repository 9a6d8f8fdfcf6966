"""DDIM eps-mode quality A/B: 'raw' vs 'recompute' (ADVICE r4 item 1).

When the DDIM x0 clamp engages, ``ddim_eps_mode='recompute'`` re-derives
eps from the clamped x0 (guided-diffusion's clip_denoised convention)
instead of keeping the denoiser's raw eps in the direction term.  This
probe trains octo_base's diffusion head on the memorization pool
(exp_ddim_r6.py protocol) and decodes it with DDIM-{16,8,4} under both
eps modes, recording MAE against the memorized targets — the measured
basis for the config default ('raw', continuity with the recorded
quality tables; flip only on a measured win).

Writes benchmarks/recorded/ddim_eps_r5.json.
Env: DDIM_TRAIN_STEPS (default 640), DDIM_SEGMENTS (16), DDIM_SEED (0).
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

from bench import device_peak_flops, log  # noqa: E402

STEPS = int(os.environ.get("DDIM_TRAIN_STEPS", "640"))
SEGMENTS = int(os.environ.get("DDIM_SEGMENTS", "16"))
SEED = int(os.environ.get("DDIM_SEED", "0"))
BATCH = 32
POOL = 4
ACTION_DIM = 8


def main():
    from multi_modal_transformers_tokenmerge_tpu import Octo, load_config
    from multi_modal_transformers_tokenmerge_tpu.train.optim import (
        make_optimizer)
    from multi_modal_transformers_tokenmerge_tpu.train.state import (
        create_train_state)
    from multi_modal_transformers_tokenmerge_tpu.train.steps import (
        make_train_step)

    _, kind = device_peak_flops()
    cfg = load_config("octo_base", ["dtype=bfloat16"])
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(SEED), 4)
    text32 = jnp.ones((BATCH, 16), dtype=jnp.int32)
    rng = np.random.default_rng(5 + SEED)
    pool_images = jnp.asarray(
        rng.integers(0, 256, (POOL, BATCH, 2, 280, 280, 3)),
        dtype=jnp.float32)
    actions_pool = jnp.asarray(
        rng.uniform(-0.9, 0.9, (POOL, BATCH, ACTION_DIM)),
        dtype=jnp.float32)
    variables = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]}, text32, pool_images[0])

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
            img = jax.lax.dynamic_index_in_dim(
                pool_images, i % pool_images.shape[0], keepdims=False)
            act = jax.lax.dynamic_index_in_dim(
                actions_pool, i % actions_pool.shape[0], keepdims=False)
            state, loss = raw_step(state, text, img, act)
            return state, acc + loss
        state, acc = jax.lax.fori_loop(
            0, steps_per_seg, body, (state, jnp.float32(0.0)),
            unroll=False)
        return state, acc / steps_per_seg

    t0 = time.time()
    for s in range(SEGMENTS):
        state, mean_loss = segment(state, text32, pool_images, actions_pool)
        log(f"[ddim-eps] train seg {s + 1}/{SEGMENTS}: "
            f"loss {float(mean_loss):.5f} [{time.time() - t0:.0f}s]")
        assert np.isfinite(float(mean_loss))
    trained = jax.tree.map(jnp.asarray,
                           {"params": jax.device_get(state.params)})

    decode_key = jax.random.PRNGKey(123)
    tgt = np.asarray(actions_pool).reshape(-1, ACTION_DIM)

    def decode(ddim_steps, eps_mode):
        hc = cfg.heads
        c = cfg if ddim_steps is None else cfg.replace(
            heads=hc.replace(diffusion=hc.diffusion.replace(
                ddim_steps=ddim_steps, ddim_eps_mode=eps_mode)))
        m = Octo(c)
        fn = jax.jit(lambda v, t, im, k, _m=m: _m.apply(
            v, t, im, rngs={"diffusion": k},
            method="predict_diffusion_action"))
        acts = np.concatenate([
            np.asarray(fn(trained, text32, pool_images[j],
                          jax.random.fold_in(decode_key, j)))
            for j in range(POOL)])
        return round(float(np.abs(acts - tgt).mean()), 4)

    out = {"ddpm32_mae": decode(None, "raw")}
    for s in (16, 8, 4):
        for mode in ("raw", "recompute"):
            out[f"ddim{s}_{mode}_mae"] = decode(s, mode)
            log(f"[ddim-eps] ddim{s} {mode}: MAE {out[f'ddim{s}_{mode}_mae']}")

    payload = {
        "metric": "ddim_eps_mode_quality_mae",
        "value": out["ddim8_recompute_mae"],
        "unit": "MAE vs memorized targets (ddim8, recompute)",
        "vs_baseline": round(out["ddim8_raw_mae"]
                             / max(out["ddim8_recompute_mae"], 1e-9), 3),
        "detail": {"device": kind, "train_steps": STEPS, "seed": SEED,
                   "mae": out},
    }
    with open(os.path.join(ROOT, "benchmarks", "recorded",
                           "ddim_eps_r5.json"), "w") as f:
        f.write(json.dumps(payload) + "\n")
    print(json.dumps(payload), flush=True)


if __name__ == "__main__":
    main()
