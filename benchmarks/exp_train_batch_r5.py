"""Round-5 probe: does train-step MFU rise with batch size?

The round-4 plateau (MFU 0.31-0.34 at b32) was measured at one batch.
The two structurally-open backward ops (input-conv wgrad, pool backward)
are bandwidth-bound and scale with batch, but fixed per-op overheads
(kernel launches, small wgrads, the optimizer update over fixed-size
params, the diffusion head) amortize — so the train MFU curve vs batch
is the cheapest unexplored lever on the headline train number.

Sweeps the donated jitted diffusion train step at b32/b64/b128 on
octo_base bf16 (same protocol as bench.bench_train: fori_loop device
timing, two-point slope, XLA cost-analysis MFU), with and without
cached-text training (the frozen tower's 1.05x lever, measured at b32
in round 4) — the two levers compose.

Writes benchmarks/recorded/train_batch_sweep_r5.json.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import device_peak_flops, flops_of, log  # noqa: E402

BATCHES = [int(b) for b in
           os.environ.get("BENCH_BATCHES", "32,64,128").split(",")]
REPS = int(os.environ.get("BENCH_REPS", "3"))


def measure_train(cfg, batch, peak):
    import optax
    from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo
    from multi_modal_transformers_tokenmerge_tpu.train.optim import (
        mask_frozen)
    from multi_modal_transformers_tokenmerge_tpu.train.state import (
        create_train_state)
    from multi_modal_transformers_tokenmerge_tpu.train.steps import (
        make_train_step)

    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    text = jnp.ones((batch, 16), dtype=jnp.int32)
    rng = np.random.default_rng(0)
    images2 = jnp.asarray(rng.integers(0, 256, (2, batch, 2, 280, 280, 3)),
                          dtype=jnp.float32)
    variables = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]},
        text, images2[0])
    tx = optax.adamw(1e-4)
    if cfg.text.kind == "t5":
        tx = mask_frozen(tx, variables["params"])
    state0 = create_train_state(
        model, variables, tx,
        rngs={"dropout": keys[2], "patch_encoding": keys[1],
              "diffusion": keys[3]})
    actions = jnp.full((batch, 8), 0.3, dtype=jnp.float32)

    def measure_step(step_fn, text_arg, label):
        @jax.jit
        def loop(k, state0, text_arg, images_stack, actions):
            def body(i, carry):
                state, acc = carry
                img = jax.lax.dynamic_index_in_dim(
                    images_stack, i % images_stack.shape[0], keepdims=False)
                state, loss = step_fn(state, text_arg, img, actions)
                return state, acc + loss
            _, acc = jax.lax.fori_loop(0, k, body,
                                       (state0, jnp.float32(0.0)),
                                       unroll=False)
            return acc

        args = (state0, text_arg, images2, actions)

        def run(k):
            t0 = time.perf_counter()
            out = float(loop(jnp.int32(k), *args))
            dt = time.perf_counter() - t0
            assert np.isfinite(out), out
            return dt

        run(2)
        k1, k2 = 4, 24
        ts1 = [run(k1) for _ in range(REPS)]
        ts2 = [run(k2) for _ in range(REPS)]
        sec = (float(np.median(ts2)) - float(np.median(ts1))) / (k2 - k1)
        if sec <= 0:
            sec = float(np.median(ts2)) / k2
        single = jax.jit(step_fn, donate_argnums=0).lower(
            state0, text_arg, images2[0], actions).compile()
        flops = flops_of(single)
        entry = {"ms_per_step": round(sec * 1e3, 3),
                 "steps_per_sec": round(1.0 / sec, 2),
                 "examples_per_sec": round(batch / sec, 1)}
        if flops and peak:
            mfu = flops / sec / peak
            entry["mfu"] = round(mfu, 4)
            if mfu > 1.0:
                log(f"[tbatch] FATAL: {label} exceeds peak FLOP/s")
                raise SystemExit(1)
        log(f"[tbatch] {label}: {sec*1e3:.2f} ms/step, "
            f"{batch/sec:.0f} ex/s, MFU {entry.get('mfu', '?')}")
        return entry

    entry = measure_step(
        make_train_step("diffusion", donate=False, jit=False), text,
        f"b{batch}")
    if cfg.text.kind == "t5":
        emb = jax.jit(lambda v, t: model.apply(v, t, method="encode_text"))(
            variables, text)
        ct = measure_step(
            make_train_step("diffusion", donate=False, jit=False,
                            text_input="embeddings"), emb,
            f"b{batch} cached-text")
        ct["speedup_vs_ids"] = round(
            entry["ms_per_step"] / ct["ms_per_step"], 3)
        entry["cached_text"] = ct
    return entry


def main():
    from multi_modal_transformers_tokenmerge_tpu.core.yaml_loader import (
        load_config)

    peak, kind = device_peak_flops()
    log(f"[tbatch] device={kind} batches={BATCHES}")
    cfg = load_config("octo_base", ["dtype=bfloat16"])
    sweep = {}
    for b in BATCHES:
        sweep[f"b{b}"] = measure_train(cfg, b, peak)

    best = max(sweep.values(), key=lambda e: e.get("mfu") or 0.0)
    out = {
        "metric": "octo_base_train_batch_sweep_r5",
        "value": best["examples_per_sec"],
        "unit": "examples/sec at best batch",
        "vs_baseline": 1.0,
        "detail": {"device": kind, "sweep": sweep},
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "recorded", "train_batch_sweep_r5.json")
    with open(path, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
