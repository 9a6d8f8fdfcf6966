"""Kill the patchify->HWCN transpose (0.465 ms, exp_embed_cumulative).

The HWCN embedder starts by transposing the patchified tensor
(B*G, 56, 56, 3) -> (56, 56, 3, B*G) so the patch-batch lands in lanes.
The cumulative decomposition shows this transpose costs 0.465 ms in
context — 4x its HBM-traffic bound, because scattering a size-3 minor
dim into a 1600-wide lane dim is a worst-case relayout.

Candidates, timed as full chains (patchify -> ... -> input conv -> pool
shape), all numerically identical:

  A. shipped: patchify -> reshape -> transpose -> conv HWCN/HWIO/HWCN
  B. conv does the relayout: patchify -> reshape -> conv with
     dimension_numbers NHWC in, HWCN out (XLA's conv emitter picks its
     own internal layout; no explicit transpose op)
  C. one fused transpose straight from the raw image: permute
     (B,F,hp,p,wp,q,C) -> (p,q,C,B*F*hp*wp) in a single lax.transpose
     (folds patchify's own permutation and the lane transpose)
  D. B + s2d: fold the stride-2 into channels first (28,28,12 input,
     6x6/1 kernel) with NHWC->HWCN conv
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_loop, sec_per_call, device_peak_flops, log  # noqa: E402

B = int(os.environ.get("BENCH_BATCH", "32"))
F, H, P = 2, 280, 56
HP = H // P                   # 5 patches per side
G = F * HP * HP               # 50
N = B * G
DT = jnp.bfloat16


def conv(x, w, strides, io):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, io)
    return jax.lax.conv_general_dilated(
        x, w, strides, "VALID", dimension_numbers=dn,
        preferred_element_type=DT)


def main():
    _, kind = device_peak_flops()
    log(f"[tfold] device={kind} B={B} N={N}")
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    images = jax.random.uniform(ks[0], (2, B, F, H, H, 3), jnp.float32,
                                0, 255)
    w_in = jax.random.normal(ks[1], (12, 12, 3, 64), DT) * 0.05

    def patchify_nhwc(im):  # (B,F,H,H,3) -> (B*G, P, P, 3) bf16, normalized
        x = im.reshape(B, F, HP, P, HP, P, 3)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6)
        return (x.reshape(N, P, P, 3) / 127.5 - 1.0).astype(DT)

    def chain_a(im):  # shipped
        x = patchify_nhwc(im)
        xt = jnp.transpose(x, (1, 2, 3, 0))
        y = conv(xt, w_in, (2, 2), ("HWCN", "HWIO", "HWCN"))
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (3, 3, 1, 1), (1, 1, 1, 1), "VALID")

    def chain_b(im):  # conv relayouts
        x = patchify_nhwc(im)
        y = conv(x, w_in, (2, 2), ("NHWC", "HWIO", "HWCN"))
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (3, 3, 1, 1), (1, 1, 1, 1), "VALID")

    def chain_c(im):  # single fused transpose from raw image
        x = im.reshape(B, F, HP, P, HP, P, 3)
        x = x.transpose(3, 5, 6, 0, 1, 2, 4)          # (P, P, 3, B,F,hp,wp)
        xt = (x.reshape(P, P, 3, N) / 127.5 - 1.0).astype(DT)
        y = conv(xt, w_in, (2, 2), ("HWCN", "HWIO", "HWCN"))
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (3, 3, 1, 1), (1, 1, 1, 1), "VALID")

    w_s2d = jnp.transpose(
        w_in.reshape(6, 2, 6, 2, 3, 64), (0, 2, 1, 3, 4, 5)
    ).reshape(6, 6, 12, 64)

    def chain_d(im):  # s2d fold + NHWC->HWCN conv
        x = patchify_nhwc(im)
        x = x.reshape(N, 28, 2, 28, 2, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(N, 28, 28, 12)
        y = conv(x, w_s2d, (1, 1), ("NHWC", "HWIO", "HWCN"))
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (3, 3, 1, 1), (1, 1, 1, 1), "VALID")

    # numeric check (on small slice to keep compile cheap)
    a = jax.jit(chain_a)(images[0])
    for name, fn in (("b", chain_b), ("c", chain_c), ("d", chain_d)):
        v = jax.jit(fn)(images[0])
        err = float(jnp.max(jnp.abs(v.astype(jnp.float32)
                                    - a.astype(jnp.float32))))
        log(f"[tfold] chain_{name} max |diff| vs A: {err:.5f}")
        assert err < 0.15, (name, err)

    results = {}
    for name, fn in (("a_shipped", chain_a), ("b_conv_relayout", chain_b),
                     ("c_fused_transpose", chain_c), ("d_s2d", chain_d)):
        def step(i, stk, _fn=fn):
            x = jax.lax.dynamic_index_in_dim(stk, i % 2, keepdims=False)
            return jnp.sum(_fn(x).astype(jnp.float32))
        sec = sec_per_call(build_loop(step), (images,), label=name)
        results[name] = round(sec * 1e3, 4)
        log(f"[tfold] {name}: {results[name]} ms")

    out = {"metric": "patchify_transpose_fold_ms",
           "detail": {"batch": B, "device": kind, "chains_ms": results}}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "recorded", "transpose_fold_r3.json")
    with open(path, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
