"""int8 GEMM decision experiment (VERDICT r3 item 6): win or retire.

Op-level A/B on the two weight-heavy GEMM families, at served batch
sizes b1 and b32:

* embedder output dense 28224 -> 768 (the single heaviest weight in the
  model, 21.7 MB int8 / 43.4 MB bf16), operands in the shipped TN layout
  (features, N);
* T5 FF pair 768 -> 3072 -> 768 at T=16 (M = B*T rows).

Variants per GEMM:
  bf16           — shipped path
  int8_dequant   — int8 weights, dequantized to bf16 before the dot
                   (the weight-FOOTPRINT mode serve/quantize.py ships)
  int8_dot       — true int8 x int8 ``dot_general`` with
                   preferred_element_type=int32, per-call activation
                   quantization + rescale (the MXU byte path)

The decision rule (VERDICT): if int8 cannot beat bf16 at ANY served
batch here, the e2e serving-speed claim leaves BASELINE.md and int8
stays a weight-footprint feature only.

Writes benchmarks/recorded/int8_gemm_r4.json.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_loop, sec_per_call, device_peak_flops, log  # noqa: E402


def quant_rows(w):
    """Symmetric per-output-channel int8 quantization of (in, out) w."""
    s = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def main():
    peak, kind = device_peak_flops()
    log(f"[int8gemm] device={kind}")
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    results = {}

    def run_case(tag, make_step, args):
        s = sec_per_call(build_loop(make_step), args, tag)
        log(f"[int8gemm] {tag}: {s*1e3:.4f} ms")
        return round(s * 1e3, 4)

    # --- embedder dense (TN layout: x (28224, N), w (28224, 768))
    for bname, n in (("b1", 50), ("b32", 1600)):
        x2 = jax.random.normal(ks[0], (2, 28224, n), jnp.bfloat16)
        w = jax.random.normal(ks[1], (28224, 768), jnp.bfloat16) * 0.02
        wq, wscale = quant_rows(w.astype(jnp.float32))

        def pick(i, stk):
            return jax.lax.dynamic_index_in_dim(stk, i % 2, keepdims=False)

        def bf16_step(i, x2, w):
            x = pick(i, x2)
            y = jax.lax.dot_general(x, w, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.bfloat16)
            return jnp.sum(y.astype(jnp.float32)) * 1e-6

        def deq_step(i, x2, wq, wscale):
            x = pick(i, x2)
            wd = (wq.astype(jnp.bfloat16)
                  * wscale.astype(jnp.bfloat16))
            y = jax.lax.dot_general(x, wd, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.bfloat16)
            return jnp.sum(y.astype(jnp.float32)) * 1e-6

        def int8_step(i, x2, wq, wscale):
            x = pick(i, x2)
            # per-column (per-example) activation scale over the feature
            # axis, then a pure int8 x int8 -> int32 MXU dot
            xs = jnp.max(jnp.abs(x), axis=0, keepdims=True)
            xscale = (xs.astype(jnp.float32) / 127.0)
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xscale),
                          -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(xq, wq, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * xscale.T * wscale
            return jnp.sum(y) * 1e-6

        results[f"embed_dense_{bname}"] = {
            "bf16_ms": run_case(f"ed_{bname}_bf16", bf16_step, (x2, w)),
            "int8_dequant_ms": run_case(f"ed_{bname}_deq", deq_step,
                                        (x2, wq, wscale)),
            "int8_dot_ms": run_case(f"ed_{bname}_int8", int8_step,
                                    (x2, wq, wscale)),
        }

    # --- T5 FF pair (standard layout: x (M, 768), w1 (768, 3072),
    #     w2 (3072, 768))
    for bname, m in (("b1", 16), ("b32", 512)):
        x2 = jax.random.normal(ks[2], (2, m, 768), jnp.bfloat16)
        w1 = jax.random.normal(ks[3], (768, 3072), jnp.bfloat16) * 0.02
        w2 = jax.random.normal(ks[4], (3072, 768), jnp.bfloat16) * 0.02
        w1q, w1s = quant_rows(w1.astype(jnp.float32))
        w2q, w2s = quant_rows(w2.astype(jnp.float32))

        def pick(i, stk):
            return jax.lax.dynamic_index_in_dim(stk, i % 2, keepdims=False)

        def ff_bf16(i, x2, w1, w2):
            x = pick(i, x2)
            h = jax.nn.relu(x @ w1)
            y = h @ w2
            return jnp.sum(y.astype(jnp.float32)) * 1e-6

        def ff_deq(i, x2, w1q, w1s, w2q, w2s):
            x = pick(i, x2)
            w1d = w1q.astype(jnp.bfloat16) * w1s.astype(jnp.bfloat16)
            w2d = w2q.astype(jnp.bfloat16) * w2s.astype(jnp.bfloat16)
            h = jax.nn.relu(x @ w1d)
            y = h @ w2d
            return jnp.sum(y.astype(jnp.float32)) * 1e-6

        def ff_int8(i, x2, w1q, w1s, w2q, w2s):
            x = pick(i, x2)

            def q8(v):
                s = (jnp.max(jnp.abs(v), axis=-1, keepdims=True)
                     .astype(jnp.float32) / 127.0)
                q = jnp.clip(jnp.round(v.astype(jnp.float32) / s),
                             -127, 127).astype(jnp.int8)
                return q, s

            xq, xs = q8(x)
            acc = jax.lax.dot_general(xq, w1q, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            h = jax.nn.relu(acc.astype(jnp.float32) * xs * w1s)
            hq, hs = q8(h)
            acc2 = jax.lax.dot_general(hq, w2q, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.int32)
            y = acc2.astype(jnp.float32) * hs * w2s
            return jnp.sum(y) * 1e-6

        results[f"t5_ff_{bname}"] = {
            "bf16_ms": run_case(f"ff_{bname}_bf16", ff_bf16, (x2, w1, w2)),
            "int8_dequant_ms": run_case(f"ff_{bname}_deq", ff_deq,
                                        (x2, w1q, w1s, w2q, w2s)),
            "int8_dot_ms": run_case(f"ff_{bname}_int8", ff_int8,
                                    (x2, w1q, w1s, w2q, w2s)),
        }

    wins = {k: round(v["bf16_ms"] / v["int8_dot_ms"], 3)
            for k, v in results.items()}
    out = {"metric": "int8_gemm_decision_r4",
           "value": max(wins.values()),
           "unit": "best int8_dot speedup over bf16 across regimes",
           "vs_baseline": 1.0,
           "detail": {"device": kind, "cases": results,
                      "int8_dot_speedup_vs_bf16": wins}}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "recorded", "int8_gemm_r4.json")
    with open(path, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
