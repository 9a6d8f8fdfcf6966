"""Isolated cost of candidate transpose patterns for the patch relayout.

The relayout (N, 56, 56, 3) -> (56, 56, 3, N) costs ~0.45 ms in context
(exp_transpose_fold.py: identical whether done by an explicit transpose
or inside the conv).  HBM bound is ~0.075 ms for 60 MB bf16 r+w, so XLA
is 6x off.  Is that intrinsic to the access pattern or to XLA's choice?

Measures (all bf16, same total bytes):
  t_4d      (1600, 56, 56, 3) -> (56, 56, 3, 1600)   the real pattern
  t_2d      (1600, 9408) -> (9408, 1600)             same bytes, clean 2-D
  t_2d_pad  (1600, 9472) -> pad C 3->4: (56,56,4) = 12544... use
            (1600, 12544) -> (12544, 1600)           C padded to 4 lanes
  t_3d_mid  (1600, 168, 56) -> (56, 168, 1600)       q,C fused minor
  two_stage (N,p,q,C) -> (p, N, qC) -> (p, qC, N)    2-D transpose per p
"""

import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_loop, sec_per_call, device_peak_flops, log  # noqa: E402

N, P, C = 1600, 56, 3
DT = jnp.bfloat16


def main():
    _, kind = device_peak_flops()
    log(f"[tp] device={kind}")
    k = jax.random.PRNGKey(0)
    x4 = jax.random.normal(k, (2, N, P, P, C), DT)
    x2 = x4.reshape(2, N, P * P * C)

    cases = {
        "t_4d": (x4, lambda a: jnp.transpose(a, (1, 2, 3, 0))),
        "t_2d": (x2, lambda a: a.T),
        "t_3d_mid": (x4, lambda a: jnp.transpose(
            a.reshape(N, P, P * C), (1, 2, 0))),
        "two_stage": (x4, lambda a: jnp.transpose(
            jnp.transpose(a.reshape(N, P, P * C), (1, 0, 2)), (0, 2, 1))),
        "t_2d_pad128": (x2, lambda a: jnp.pad(
            a, ((0, 0), (0, 128 * ((P * P * C + 127) // 128) - P * P * C))
        ).T),
    }
    results = {}
    for name, (stack, fn) in cases.items():
        def step(i, stk, _fn=fn):
            a = jax.lax.dynamic_index_in_dim(stk, i % 2, keepdims=False)
            return jnp.sum(_fn(a)[..., :8].astype(jnp.float32))
        sec = sec_per_call(build_loop(step), (stack,), label=name)
        results[name] = round(sec * 1e3, 4)
        log(f"[tp] {name}: {results[name]} ms")

    out = {"metric": "transpose_pattern_ms",
           "detail": {"device": kind, "bytes_mb": 60.2, "cases": results}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
