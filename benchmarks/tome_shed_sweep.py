"""ToMe shed-rate tradeoff sweep on octo_deep (quality vs speed).

The deep preset sheds 32 image tokens per set per merge event
(224 -> 96 by block 8).  This sweeps the shed rate at matched training
schedule (continuous head, 480 steps, same data/init) and records final
memorization loss + wall steps/s per point, against the vanilla
(uncompressed) arm recorded by train_convergence
(`train_convergence_deep_r4.json`: final 6.22 at 11.5 steps/s).
The artifact is the curve a production user needs to pick a rate.

Env: SHED_POINTS (comma list, default "16,32,44"), CONV_STEPS (480),
CONV_SEGMENTS (12), CONV_ROUND (4).
Writes benchmarks/recorded/tome_shed_sweep_r{N}.json.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from benchmarks.train_convergence import (  # noqa: E402
    ACTION_DIM, BATCH, POOL, ROUND, run_head)
from multi_modal_transformers_tokenmerge_tpu.models.presets import (  # noqa: E402,E501
    octo_deep)

POINTS = [int(s) for s in os.environ.get("SHED_POINTS",
                                         "16,32,44").split(",")]


def main():
    rng = np.random.default_rng(5)
    pool_images = jnp.asarray(
        rng.integers(0, 256, (POOL, BATCH, 2, 280, 280, 3)),
        dtype=jnp.float32)
    text = jnp.ones((BATCH, 16), dtype=jnp.int32)
    actions_pool = jnp.asarray(
        rng.uniform(-0.9, 0.9, (POOL, BATCH, ACTION_DIM)),
        dtype=jnp.float32)

    points = {}
    for shed in POINTS:
        cfg = octo_deep(
            dtype="bfloat16",
            compression_sequence=(
                f"[TaskDescriptionPrefix{{0}}] "
                f"[Image{{{shed}}};Readout{{0}}]*2"))
        events = (cfg.transformer.num_blocks
                  // cfg.transformer.tome_merge_every)
        final_tokens = 224 - (events - 1) * 2 * shed
        try:
            r = run_head("continuous", pool_images, text, actions_pool,
                         cfg=cfg)
        except ValueError as e:
            # bipartite matching caps r at half the (already-shrunk) set:
            # shed > ~set/3 is structurally invalid at 2 events — record
            # the bound instead of dying
            points[f"shed_{shed}"] = {"invalid": str(e)}
            print(f"[shed] {shed}: invalid ({e})", file=sys.stderr,
                  flush=True)
            continue
        points[f"shed_{shed}"] = {
            "tokens_after_merges": final_tokens,
            "final_loss": r["final_segment_loss"],
            "steps_per_sec_wall": r["steady_steps_per_sec_wall"],
            "curve": r["segment_mean_loss"],
        }
        print(f"[shed] {shed}: final {r['final_segment_loss']} @ "
              f"{r['steady_steps_per_sec_wall']} steps/s", file=sys.stderr,
              flush=True)

    valid = {k: v for k, v in points.items() if "final_loss" in v}
    if not valid:
        raise SystemExit(f"no valid shed points among {POINTS}: {points}")
    mid_key = (f"shed_{POINTS[len(POINTS)//2]}"
               if f"shed_{POINTS[len(POINTS)//2]}" in valid
               else next(iter(valid)))
    out = {"metric": "tome_shed_rate_tradeoff_octo_deep",
           "value": valid[mid_key]["final_loss"],
           "unit": "final memorization loss at the default shed rate",
           "vs_baseline": 1.0,
           "detail": {"batch": BATCH, "steps_schedule": "train_convergence",
                      "vanilla_reference":
                          "train_convergence_deep_r4.json (6.22 @ 11.5)",
                      "points": points}}
    path = os.path.join(ROOT, "benchmarks", "recorded",
                        f"tome_shed_sweep_r{ROUND}.json")
    with open(path, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
