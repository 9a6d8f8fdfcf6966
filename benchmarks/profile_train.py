"""Backward-pass decomposition of the octo_base diffusion train step
(VERDICT r2 item 4: train MFU target >= 0.25; r3 measured 0.205 after the
embedder layout fix — this locates the remaining backward cost).

Measures at batch 32, bf16:
  fwd_loss        — loss forward only
  grad_full       — value_and_grad of the full loss
  grad_no_embed   — same but stop_gradient after the image tokenizer
                    (difference = embedder backward cost)
  maxpool_grad_op — op-level select_and_scatter cost probe at embedder
                    shapes (suspected dominant bwd op)

Writes benchmarks/recorded/train_profile_r3.json.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_loop, sec_per_call, device_peak_flops, log  # noqa: E402

BATCH = int(os.environ.get("BENCH_BATCH", "32"))


def main():
    from multi_modal_transformers_tokenmerge_tpu.core.yaml_loader import (
        load_config)
    from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo

    peak, kind = device_peak_flops()
    log(f"[tprof] device={kind} batch={BATCH}")
    cfg = load_config("octo_base", ["dtype=bfloat16"])
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = jnp.ones((BATCH, 16), dtype=jnp.int32)
    rng = np.random.default_rng(0)
    images2 = jnp.asarray(rng.integers(0, 256, (2, BATCH, 2, 280, 280, 3)),
                          dtype=jnp.float32)
    actions2 = jnp.asarray(rng.normal(size=(2, BATCH, 8)), jnp.float32)
    variables = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]},
        text, images2[0])

    def loss_fn(params, text, img, act, key):
        rngs = {"diffusion": key, "dropout": jax.random.fold_in(key, 1),
                "patch_encoding": jax.random.fold_in(key, 2)}
        loss = model.apply({"params": params}, text, img, act, rngs=rngs,
                           method="compute_diffusion_denoise_loss")
        return jnp.mean(loss)

    def pick(i, stack):
        return jax.lax.dynamic_index_in_dim(stack, i % 2, keepdims=False)

    def fwd_step(i, variables, text, imgs, acts, key):
        return loss_fn(variables["params"], text, pick(i, imgs),
                       pick(i, acts), jax.random.fold_in(key, i))

    def grad_step(i, variables, text, imgs, acts, key):
        l, g = jax.value_and_grad(loss_fn)(
            variables["params"], text, pick(i, imgs), pick(i, acts),
            jax.random.fold_in(key, i))
        return l + jax.tree.reduce(
            lambda a, b: a + b, jax.tree.map(lambda x: jnp.sum(
                jnp.abs(x.astype(jnp.float32))) * 1e-12, g))

    results = {}
    args = (variables, text, images2, actions2, keys[3])
    s_fwd = sec_per_call(build_loop(fwd_step), args, "fwd_loss")
    results["fwd_loss_ms"] = round(s_fwd * 1e3, 3)
    s_grad = sec_per_call(build_loop(grad_step), args, "grad_full")
    results["grad_full_ms"] = round(s_grad * 1e3, 3)

    # image-tokenizer-only forward/backward: isolates the embedder's
    # share of the train backward
    def img_method(m, imgs, train=False):
        return m.image_encoder(imgs, train=train)

    def grad_img_only(i, variables, text, imgs, acts, key):
        def f(params):
            emb = model.apply({"params": params}, pick(i, imgs),
                              method=img_method)
            return jnp.mean(jnp.square(emb.astype(jnp.float32)))
        l, g = jax.value_and_grad(f)(variables["params"])
        return l + jax.tree.reduce(
            lambda a, b: a + b, jax.tree.map(lambda x: jnp.sum(
                jnp.abs(x.astype(jnp.float32))) * 1e-12, g))

    def fwd_img_only(i, variables, text, imgs, acts, key):
        emb = model.apply(variables, pick(i, imgs), method=img_method)
        return jnp.mean(jnp.square(emb.astype(jnp.float32)))

    try:
        s_if = sec_per_call(build_loop(fwd_img_only), args, "img_fwd")
        s_ig = sec_per_call(build_loop(grad_img_only), args, "img_grad")
        results["img_fwd_ms"] = round(s_if * 1e3, 3)
        results["img_grad_ms"] = round(s_ig * 1e3, 3)
        results["img_bwd_only_ms"] = round((s_ig - s_if) * 1e3, 3)
    except Exception as e:
        log(f"[tprof] encode_images probe failed: {e}")

    # op-level: max-pool backward (select_and_scatter) at embedder shapes
    xs2 = jax.random.normal(jax.random.PRNGKey(1), (2, 23, 23, 64, 1600),
                            jnp.bfloat16)

    def pool(x):
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                     (3, 3, 1, 1), (1, 1, 1, 1), "VALID")

    def pool_grad_step(i, xs):
        x = pick(i, xs)
        def f(x):
            return jnp.sum(pool(x).astype(jnp.float32) ** 2)
        l, g = jax.value_and_grad(f)(x)
        return l + jnp.sum(g.astype(jnp.float32)) * 1e-9

    def pool_fwd_step(i, xs):
        return jnp.sum(pool(pick(i, xs)).astype(jnp.float32) ** 2)

    s_pf = sec_per_call(build_loop(pool_fwd_step), (xs2,), "pool_fwd")
    s_pg = sec_per_call(build_loop(pool_grad_step), (xs2,), "pool_grad")
    results["maxpool_fwd_ms"] = round(s_pf * 1e3, 3)
    results["maxpool_fwdgrad_ms"] = round(s_pg * 1e3, 3)

    results["bwd_minus_fwd_ms"] = round((s_grad - s_fwd) * 1e3, 3)
    out = {
        "metric": "octo_base_train_backward_decomposition_ms",
        "value": results["grad_full_ms"],
        "unit": "ms/call",
        "vs_baseline": 1.0,
        "detail": {"batch": BATCH, "device": kind, **results},
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "recorded", "train_profile_r3.json")
    with open(path, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
