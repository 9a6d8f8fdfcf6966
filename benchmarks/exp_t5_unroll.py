"""Text tower (21% of forward): does unrolling the nn.scan stack pay?

At T=16 each T5 block is ~7 GFLOP of small matmuls; with scan the 12
blocks execute as one compiled body iterated 12 times, which blocks
cross-layer fusion and pipelining.  nn.scan(unroll=N) trades compile time
for a flatter XLA graph.  Also probes f32-softmax cost by trying a bf16
bias add (numerics measured, not shipped unless exact enough).
"""

import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_loop, sec_per_call, device_peak_flops, log  # noqa: E402

from multi_modal_transformers_tokenmerge_tpu.modules.t5 import (  # noqa: E402
    T5EncoderStack)

B = int(os.environ.get("BENCH_BATCH", "32"))
T = 16


def main():
    peak, kind = device_peak_flops()
    log(f"[t5] device={kind} B={B} T={T}")
    ids = jnp.ones((B, T), dtype=jnp.int32)
    results = {}
    ref = None
    for unroll in (1, 4, 12):
        model = T5EncoderStack(dtype=jnp.bfloat16, scan_unroll=unroll)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), ids)
        out = jax.jit(model.apply)(variables, ids)
        if ref is None:
            ref = out
        else:
            # unroll changes XLA fusion order -> bf16 rounding differs; the
            # math is identical, so only bound the drift at ~1 ulp of the
            # activations' scale
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
            log(f"[t5] unroll={unroll}: max|diff|={err:.3g} scale={scale:.3g}")
            assert err <= 0.02 * scale, (unroll, err, scale)

        def step(i, v, tok):
            return jnp.sum(model.apply(v, tok + (i % 2)).astype(jnp.float32))
        sec = sec_per_call(build_loop(step), (variables, ids),
                           label=f"unroll{unroll}")
        flops = 12 * (2 * B * T * 768 * 768 * 4 + 2 * B * T * 768 * 3072 * 2)
        mfu = flops / sec / peak if peak else None
        results[f"unroll{unroll}"] = {
            "ms": round(sec * 1e3, 4),
            "mfu": round(mfu, 3) if mfu else None}
        log(f"[t5] unroll={unroll}: {sec*1e3:.3f} ms  MFU~{mfu:.3f}")

    print(json.dumps({"metric": "t5_tower_unroll_ms",
                      "detail": {"batch": B, "seq": T, "device": kind,
                                 "cases": results}}))


if __name__ == "__main__":
    main()
