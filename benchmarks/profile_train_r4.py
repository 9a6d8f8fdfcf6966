"""Round-4 train-backward decomposition (VERDICT r3 item 1).

The r3 decomposition (embedder_bwd_decomp_r3.json) accounts for ~5.3 ms
of the measured ~7.0 ms image-tower backward; this locates the remaining
~1.7 ms.  Prime suspect: the row/col patch-position embedding wgrads —
two scatter-adds of (B*F*P, 768) into the (128, 768) tables, which TPU
scatter serializes.  Probes:

  fwd_loss / grad_full      — whole diffusion train step (as r3)
  grad_img_only             — image tower only (as r3)
  grad_img_resnet_only      — image tower with position embeddings
                              stop_gradient'd: difference vs grad_img_only
                              is the pos-embed wgrad cost in context
  embed_wgrad_scatter_op    — op-level nn.Embed-style wgrad (scatter-add)
  embed_wgrad_onehot_op     — same wgrad as one-hot matmul
                              (128,1600)@(1600,768) on the MXU

Writes benchmarks/recorded/train_profile_r4.json.
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
    log(f"[tprof4] device={kind} batch={BATCH}")
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

    def gsum(g):
        return jax.tree.reduce(
            lambda a, b: a + b, jax.tree.map(lambda x: jnp.sum(
                jnp.abs(x.astype(jnp.float32))) * 1e-12, g))

    def fwd_step(i, variables, text, imgs, acts, key):
        return loss_fn(variables["params"], text, pick(i, imgs),
                       pick(i, acts), jax.random.fold_in(key, i))

    def grad_step(i, variables, text, imgs, acts, key):
        l, g = jax.value_and_grad(loss_fn)(
            variables["params"], text, pick(i, imgs), pick(i, acts),
            jax.random.fold_in(key, i))
        return l + gsum(g)

    results = {}
    args = (variables, text, images2, actions2, keys[3])
    s_fwd = sec_per_call(build_loop(fwd_step), args, "fwd_loss")
    results["fwd_loss_ms"] = round(s_fwd * 1e3, 3)
    s_grad = sec_per_call(build_loop(grad_step), args, "grad_full")
    results["grad_full_ms"] = round(s_grad * 1e3, 3)
    results["bwd_minus_fwd_ms"] = round((s_grad - s_fwd) * 1e3, 3)

    # --- image tower in isolation, with and without pos-embed grads
    def img_method(m, imgs, train=False):
        return m.image_encoder(imgs, train=train)

    def make_img_grad(stop_pos_embed):
        def step(i, variables, text, imgs, acts, key):
            def f(params):
                if stop_pos_embed:
                    params = dict(params)
                    enc = dict(params["image_encoder"])
                    for k in ("row_position_embedding",
                              "col_position_embedding"):
                        enc[k] = jax.tree.map(jax.lax.stop_gradient, enc[k])
                    params["image_encoder"] = enc
                emb = model.apply({"params": params}, pick(i, imgs),
                                  method=img_method)
                return jnp.mean(jnp.square(emb.astype(jnp.float32)))
            l, g = jax.value_and_grad(f)(variables["params"])
            return l + gsum(g)
        return step

    s_if = sec_per_call(build_loop(
        lambda i, v, t, imgs, a, k: jnp.mean(jnp.square(model.apply(
            v, pick(i, imgs), method=img_method).astype(jnp.float32)))),
        args, "img_fwd")
    s_ig = sec_per_call(build_loop(make_img_grad(False)), args, "img_grad")
    results["img_fwd_ms"] = round(s_if * 1e3, 3)
    results["img_grad_ms"] = round(s_ig * 1e3, 3)
    results["img_bwd_only_ms"] = round((s_ig - s_if) * 1e3, 3)

    # NOTE: stop_gradient on the table PARAMS does not remove the scatter
    # (JAX still transposes the gather; the zeros are DCE'd only if XLA
    # proves them unused — measure to find out)
    s_ig_np = sec_per_call(build_loop(make_img_grad(True)), args,
                           "img_grad_stop_posembed")
    results["img_grad_stop_posembed_ms"] = round(s_ig_np * 1e3, 3)
    results["posembed_wgrad_in_context_ms"] = round((s_ig - s_ig_np) * 1e3, 3)

    # --- op-level: embedding wgrad, scatter vs one-hot matmul
    n_idx, table_n, emb_d = BATCH * 50, 128, 768
    idx2 = jax.random.randint(jax.random.PRNGKey(2), (2, n_idx), 0, table_n)
    table = jax.random.normal(jax.random.PRNGKey(3), (table_n, emb_d),
                              jnp.bfloat16)

    def scatter_wgrad(i, idx2, table):
        idx = pick(i, idx2)
        def f(tbl):
            out = jnp.take(tbl, idx, axis=0)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        l, g = jax.value_and_grad(f)(table)
        return l + jnp.sum(g.astype(jnp.float32)) * 1e-9

    def onehot_wgrad(i, idx2, table):
        idx = pick(i, idx2)
        def f(tbl):
            oh = jax.nn.one_hot(idx, table_n, dtype=tbl.dtype)
            out = jax.lax.dot_general(
                oh, tbl, (((1,), (0,)), ((), ())),
                preferred_element_type=tbl.dtype)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        l, g = jax.value_and_grad(f)(table)
        return l + jnp.sum(g.astype(jnp.float32)) * 1e-9

    s_sc = sec_per_call(build_loop(scatter_wgrad), (idx2, table),
                        "embed_wgrad_scatter")
    s_oh = sec_per_call(build_loop(onehot_wgrad), (idx2, table),
                        "embed_wgrad_onehot")
    results["embed_wgrad_scatter_op_ms"] = round(s_sc * 1e3, 3)
    results["embed_wgrad_onehot_op_ms"] = round(s_oh * 1e3, 3)

    out = {
        "metric": "octo_base_train_backward_decomposition_r4_ms",
        "value": results["grad_full_ms"],
        "unit": "ms/call",
        "vs_baseline": 1.0,
        "detail": {"batch": BATCH, "device": kind, **results},
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "recorded", "train_profile_r4.json")
    with open(path, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
