"""Make patchify cheap: it costs 0.53 ms in context, 5x its HBM bound.

exp_chain_bisect.py isolated the cost to materializing the patch tensor
(B,F,280,280,3) f32 -> (N,56,56,3) bf16 (middle-dim swap + normalize +
cast); the downstream lane transpose is free (the conv fuses it).

Candidates (each chain ends in the input conv so nothing cancels):
  a_shipped      one fused permute+normalize+cast
  b_2pass_bar    pass 1: normalize+cast contiguous (60->30 MB);
                 pass 2: bf16 permute (30->30 MB); optimization_barrier
                 keeps XLA from refusing them into the slow form
  c_2pass_nobar  same without the barrier (does XLA refuse?)
  d_rowmajor     permute via (B,F,hp,P,wp,Q*3) reshape-first (fused minor)
  e_pallas       Pallas copy kernel: grid (B*F, hp), per-program
                 (P, 280, 3) f32 read -> (wp, P, Q, 3) shuffle -> write
"""

import functools
import json
import os
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_loop, sec_per_call, device_peak_flops, log  # noqa: E402

B = 32
F, H, P = 2, 280, 56
HP = H // P                    # 5
N = B * F * HP * HP
DT = jnp.bfloat16


def conv_in(x, w):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, (2, 2), "VALID", dimension_numbers=dn,
        preferred_element_type=DT)


def patchify_a(im):
    x = im.reshape(B, F, HP, P, HP, P, 3)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return (x.reshape(N, P, P, 3) / 127.5 - 1.0).astype(DT)


def patchify_b(im, barrier=True):
    y = (im / 127.5 - 1.0).astype(DT)
    if barrier:
        y = jax.lax.optimization_barrier(y)
    x = y.reshape(B, F, HP, P, HP, P, 3)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(N, P, P, 3)


def patchify_d(im):
    x = im.reshape(B * F * HP, P, HP, P * 3)
    x = x.transpose(0, 2, 1, 3)
    return (x.reshape(N, P, P, 3) / 127.5 - 1.0).astype(DT)


def _patch_kernel(x_ref, o_ref):
    # x_ref: (1, P, 840) f32 — one strip, rows with w*3 flattened;
    # o_ref: (1, HP, P, 168) bf16 — 5 patches, minor dims q*3 flattened.
    # Mosaic can't shape-cast (56,840)->(56,5,168) (lane split not a
    # multiple of 128), so slice the lane dim statically per patch.
    x = x_ref[0]
    y = (x * (1.0 / 127.5) - 1.0).astype(DT)
    for j in range(HP):
        o_ref[0, j] = y[:, j * P * 3:(j + 1) * P * 3]


@jax.jit
def patchify_e(im):
    flat = im.reshape(B * F, H, H * 3)
    out = pl.pallas_call(
        _patch_kernel,
        grid=(B * F, HP),
        in_specs=[pl.BlockSpec((1, P, H * 3), lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((1, HP, P, P * 3),
                               lambda i, j: (i * HP + j, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * F * HP, HP, P, P * 3), DT),
    )(flat)
    return out.reshape(N, P, P, 3)


def main():
    _, kind = device_peak_flops()
    log(f"[pf] device={kind}")
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    images = jax.random.uniform(ks[0], (2, B, F, H, H, 3), jnp.float32,
                                0, 255)
    w = jax.random.normal(ks[1], (12, 12, 3, 64), DT) * 0.05

    ref = jax.jit(patchify_a)(images[0])
    for name, fn in (("b", patchify_b), ("d", patchify_d),
                     ("e", patchify_e)):
        v = jax.jit(fn)(images[0])
        err = float(jnp.max(jnp.abs(v.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        log(f"[pf] {name} max|diff| = {err:.5f}")
        assert err < 0.02, (name, err)

    cases = {
        "a_shipped": patchify_a,
        "b_2pass_bar": patchify_b,
        "c_2pass_nobar": functools.partial(patchify_b, barrier=False),
        "d_rowmajor": patchify_d,
        "e_pallas": patchify_e,
    }
    results = {}
    for name, pf in cases.items():
        def step(i, stk, _pf=pf):
            im = jax.lax.dynamic_index_in_dim(stk, i % 2, keepdims=False)
            return jnp.sum(conv_in(_pf(im), w).astype(jnp.float32))
        sec = sec_per_call(build_loop(step), (images,), label=name)
        results[name] = round(sec * 1e3, 4)
        log(f"[pf] {name}: {results[name]} ms (chain with conv)")

    print(json.dumps({"metric": "patchify_fast_ms",
                      "detail": {"device": kind, "cases_chain_ms": results}}))


if __name__ == "__main__":
    main()
