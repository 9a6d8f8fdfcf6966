"""Pallas max-pool backward (ops/pool.py) vs XLA select_and_scatter at
embedder shapes — the measurement gating `pool_vjp`'s default.

Context: round-3 measured the pool backward at ~1.45 ms of the octo_base
train backward (train_profile_r3.json); three XLA-level replacement VJPs
all lost (docs/KERNELS.md).  The Pallas kernel's HBM traffic bound is
read x (108 MB) + read g (90 MB) + write dx (108 MB) ~ 0.37 ms on v5e.

Also times the wired end-to-end train step with pool_vjp='pallas' vs
'xla' (the number that decides the default).
"""

import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_loop, sec_per_call, log  # noqa: E402

from multi_modal_transformers_tokenmerge_tpu.ops.pool import (  # noqa: E402
    max_pool_hwcn,
)

B, G = 32, 50
BG = B * G
DT = jnp.bfloat16


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    # stack of 2 so the loop input can't be hoisted
    x2 = jax.random.normal(ks[0], (2, 23, 23, 64, BG), DT)
    g2 = jax.random.normal(ks[1], (2, 21, 21, 64, BG), DT)

    def pool_xla(x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (3, 3, 1, 1), (1, 1, 1, 1), "VALID")

    def pool_pal(x):
        return max_pool_hwcn(x, (3, 3), (1, 1), vjp="pallas")

    results = {}
    for name, fn in [("xla", pool_xla), ("pallas", pool_pal)]:
        def fwd_step(i, stk, fn=fn):
            x = jax.lax.dynamic_index_in_dim(stk, i % 2, keepdims=False)
            return jnp.sum(fn(x).astype(jnp.float32) ** 2)

        def grad_step(i, stk, gstk, fn=fn):
            x = jax.lax.dynamic_index_in_dim(stk, i % 2, keepdims=False)
            g = jax.lax.dynamic_index_in_dim(gstk, i % 2, keepdims=False)
            _, vjp = jax.vjp(fn, x)
            return jnp.sum(vjp(g)[0].astype(jnp.float32))

        s_f = sec_per_call(build_loop(fwd_step), (x2,), f"pool_{name}_fwd")
        s_g = sec_per_call(build_loop(grad_step), (x2, g2),
                           f"pool_{name}_bwd")
        results[name] = {"fwd_ms": round(s_f * 1e3, 3),
                         "bwd_ms": round(s_g * 1e3, 3)}
        log(f"[pool] {name}: fwd {s_f*1e3:.3f}  bwd {s_g*1e3:.3f} ms")

    e2e = bench_e2e_train()

    sp = results["xla"]["bwd_ms"] / max(results["pallas"]["bwd_ms"], 1e-9)
    print(json.dumps({
        "metric": "pool_bwd_pallas_vs_xla_ms",
        "value": results["pallas"]["bwd_ms"],
        "unit": "ms/call",
        "vs_baseline": round(sp, 3),
        "detail": {"batch": B, "shapes": "x(23,23,64,1600) bf16",
                   **results, "train_step_e2e": e2e},
    }))


def bench_e2e_train():
    """The number that decides the config default: full octo_base diffusion
    train step, pool_vjp='xla' vs 'pallas' (everything else identical)."""
    import optax

    from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo
    from multi_modal_transformers_tokenmerge_tpu.models.presets import (
        octo_base)
    from multi_modal_transformers_tokenmerge_tpu.train.optim import (
        mask_frozen)
    from multi_modal_transformers_tokenmerge_tpu.train.state import (
        create_train_state)
    from multi_modal_transformers_tokenmerge_tpu.train.steps import (
        make_train_step)

    keys = jax.random.split(jax.random.PRNGKey(1), 5)
    text = jnp.ones((B, 16), jnp.int32)
    imgs2 = jax.random.uniform(keys[4], (2, B, 2, 280, 280, 3),
                               jnp.float32) * 255
    actions = jnp.full((B, 8), 0.3, jnp.float32)
    out = {}
    for vjp in ("xla", "pallas"):
        cfg = octo_base(dtype="bfloat16")
        cfg = cfg.replace(images=cfg.images.replace(
            resnet=cfg.images.resnet.replace(pool_vjp=vjp)))
        model = Octo(cfg)
        variables = jax.jit(model.init)(
            {"params": keys[0], "patch_encoding": keys[1],
             "dropout": keys[2], "diffusion": keys[3]}, text, imgs2[0])
        state0 = create_train_state(
            model, variables,
            mask_frozen(optax.adamw(1e-4), variables["params"]),
            rngs={"dropout": keys[2], "patch_encoding": keys[1],
                  "diffusion": keys[3]})
        step = make_train_step("diffusion", donate=False, jit=False)

        def train_tick(i, state_and_acc, step=step):
            state, acc = state_and_acc
            img = jax.lax.dynamic_index_in_dim(imgs2, i % 2, keepdims=False)
            state, loss = step(state, text, img, actions)
            return state, acc + loss

        @jax.jit
        def loop(k, state0):
            _, acc = jax.lax.fori_loop(
                0, k, lambda i, c: train_tick(i, c),
                (state0, jnp.float32(0.0)), unroll=False)
            return acc

        s = sec_per_call(loop, (state0,), f"pool_e2e_{vjp}")
        out[vjp] = round(s * 1e3, 3)
        log(f"[pool] e2e train {vjp}: {s*1e3:.3f} ms/step")
    out["pallas_speedup"] = round(out["xla"] / max(out["pallas"], 1e-9), 4)
    return out


if __name__ == "__main__":
    main()
