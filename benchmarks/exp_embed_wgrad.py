"""Position-embedding wgrad probe (train backward, round 3).

The per-op embedder backward rows (embedder_bwd_decomp_r3.json) sum to
~5.3 ms of the measured ~7.0 ms image backward; part of the rest is the
two patch-position `nn.Embed` wgrads (scatter-add of a (B, 50, 768)
cotangent into a (128, 768) table).  XLA lowers embedding wgrads to
`scatter-add`, which TPUs can serialize; with only 128 rows a one-hot
matmul formulation is 0.63 GFLOP — MXU change.

Probes (grad wrt the two tables against a fixed cotangent, i%2-rotated
inputs):

  take       — jnp.take(table, idx) (nn.Embed's lowering)
  onehot     — one_hot(idx, V) @ table (bwd = one_hot^T @ g matmul)
"""

import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_loop, sec_per_call, log  # noqa: E402

B, G, V, E = 32, 50, 128, 768
DT = jnp.bfloat16


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    tables = jax.random.normal(ks[0], (2, V, E), jnp.float32)
    idx2 = jax.random.randint(ks[1], (2, B, G), 0, V)
    cot2 = jax.random.normal(ks[2], (2, B, G, E), DT)

    def lookup_take(t, idx):
        return jnp.take(t.astype(DT), idx, axis=0)

    def lookup_onehot(t, idx):
        oh = jax.nn.one_hot(idx, V, dtype=DT)
        return jax.lax.dot_general(
            oh, t.astype(DT), (((2,), (0,)), ((), ())),
            preferred_element_type=DT)

    results = {}
    for name, fn in [("take", lookup_take), ("onehot", lookup_onehot)]:
        def step(i, tabs, idxs, cots, fn=fn):
            t = jax.lax.dynamic_index_in_dim(tabs, i % 2, keepdims=False)
            idx = jax.lax.dynamic_index_in_dim(idxs, i % 2, keepdims=False)
            cot = jax.lax.dynamic_index_in_dim(cots, i % 2, keepdims=False)

            def loss(t):
                # two tables (rows + cols) like the real tokenizer
                return (jnp.sum(fn(t, idx) * cot)
                        + jnp.sum(fn(t + 1.0, idx) * cot)
                        ).astype(jnp.float32)

            g = jax.grad(loss)(t)
            return jnp.sum(g) * 1e-9

        s = sec_per_call(build_loop(step), (tables, idx2, cot2), name)
        results[name] = round(s * 1e3, 4)
        log(f"[embed-wgrad] {name}: {s*1e3:.4f} ms")

    t0, i0, c0 = tables[0], idx2[0], cot2[0]
    g_take = jax.jit(jax.grad(lambda t: jnp.sum(lookup_take(t, i0) * c0)
                              .astype(jnp.float32)))(t0)
    g_oh = jax.jit(jax.grad(lambda t: jnp.sum(lookup_onehot(t, i0) * c0)
                            .astype(jnp.float32)))(t0)
    diff = float(jnp.max(jnp.abs(g_take - g_oh)))
    log(f"[embed-wgrad] max |take-onehot| grad diff = {diff:.3e}")

    out = {"metric": "embed_wgrad_ms", "value": results.get("onehot"),
           "unit": "ms (2 tables, b32)", "vs_baseline":
           round(results["take"] / max(results["onehot"], 1e-9), 3),
           "detail": {"device": jax.devices()[0].device_kind,
                      "cases_ms": results, "max_grad_diff": diff}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
