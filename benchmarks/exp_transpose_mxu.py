"""MXU-based alternatives for the patch relayout transpose.

Context (exp_transpose_fold.py / exp_transpose_patterns.py): the embedder's
(1600, 56, 56, 3) -> (56, 56, 3, 1600) relayout costs ~0.45 ms in the
octo_base forward — ~6x its 60 MB HBM bound — and XLA emits the same slow
pattern whether the transpose is explicit or folded into the conv.

Idea: a transpose IS a matmul against an identity —
``dot_general(x, eye(K), contract dim0 x dim0) == x.T`` — and it is EXACT
in bf16 (each output element is one x*1.0 product plus zeros).  The MXU
has idle FLOPs to burn while HBM streams, so a transpose expressed as a
skinny matmul can run at the traffic bound where XLA's vector-relayout
emitter cannot.

Cases (all bf16, checked for bit-exactness against jnp.transpose):
  t_xla_4d       (1600,56,56,3) -> (56,56,3,1600)      shipped pattern
  t_dot_pad128   pad N 1600->1664, batched eye(128) dot, fix-up transpose
  t_dot_b64      (25,64,9408) batched eye(64) dot + (25,9408,64) relayout
  chain_shipped  patchify(NHWC) -> transpose -> like the real chain
  chain_imgdot   full-image dot-transpose (64 x 235200) + 25 lane-slice
                 patch copies (patch-major token order; the (b,f,hp,wp)
                 row reorder happens later on the tiny (1600,768) output)

The chain cases measure what the embedder would actually pay end-to-end
for its input relayout (conv consumers excluded — bisect showed the conv
cost is layout-invariant once the input is HWCN).
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_loop, sec_per_call, device_peak_flops, log  # noqa: E402

B, F, H, P, C = 32, 2, 280, 56, 3
N = B * F * (H // P) ** 2  # 1600 patches
DT = jnp.bfloat16


def dot_t(x):
    """Exact transpose of a 2-D array via the MXU: x.T = eye^T-contract."""
    k = x.shape[0]
    return jax.lax.dot_general(
        x, jnp.eye(k, dtype=x.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=x.dtype)


def t_xla_4d(x):  # x: (N, P, P, C)
    return jnp.transpose(x, (1, 2, 3, 0))


def t_dot_pad128(x):
    flat = x.reshape(N, P * P * C)
    pad = 128 * ((N + 127) // 128) - N
    xp = jnp.pad(flat, ((0, pad), (0, 0))).reshape(-1, 128, P * P * C)
    eye = jnp.eye(128, dtype=x.dtype)
    # (G, 128, M) x (128, 128) -> (G, M, 128)
    out = jax.lax.dot_general(xp, eye, (((1,), (0,)), ((), ())),
                              preferred_element_type=x.dtype)
    out = jnp.transpose(out, (1, 0, 2)).reshape(P * P * C, -1)[:, :N]
    return out.reshape(P, P, C, N)


def t_dot_b64(x):
    xp = x.reshape(-1, 64, P * P * C)  # (25, 64, M)
    eye = jnp.eye(64, dtype=x.dtype)
    out = jax.lax.dot_general(xp, eye, (((1,), (0,)), ((), ())),
                              preferred_element_type=x.dtype)
    out = jnp.transpose(out, (1, 0, 2)).reshape(P * P * C, N)
    return out.reshape(P, P, C, N)


def patchify_nhwc(img):  # (B, F, H, H, C) -> (N, P, P, C)
    g = H // P
    x = img.reshape(B, F, g, P, g, P, C)
    x = jnp.transpose(x, (0, 1, 2, 4, 3, 5, 6))
    return x.reshape(N, P, P, C)


def chain_shipped(img):
    return t_xla_4d(patchify_nhwc(img))


def chain_imgdot(img):
    """Full-image MXU transpose, then patch extraction as 25 static
    lane-slice copies.  Token order on the lane dim is (hp, wp, b, f) —
    patch-major — row-reordered later at the (N, 768) embedding."""
    g = H // P
    flat = img.reshape(B * F, H * H * C)          # (64, 235200)
    xt = dot_t(flat)                              # (235200, 64) exact
    xt = xt.reshape(H, H * C, B * F)              # (280, 840, 64)
    cols = []
    for hp in range(g):
        row = jax.lax.slice(xt, (hp * P, 0, 0), ((hp + 1) * P, H * C, B * F))
        for wp in range(g):
            blk = jax.lax.slice(row, (0, wp * P * C, 0),
                                (P, (wp + 1) * P * C, B * F))
            cols.append(blk.reshape(P, P, C, B * F))
    out = jnp.concatenate(cols, axis=3)           # (P, P, C, 1600)
    return out


def main():
    peak, kind = device_peak_flops()
    log(f"[mxu-t] device={kind}")
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    x2 = jax.random.normal(ks[0], (2, N, P, P, C), DT)
    img2 = jax.random.normal(ks[1], (2, B, F, H, H, C), DT)

    # --- correctness (bit-exact) ---
    x = x2[0]
    ref = np.asarray(t_xla_4d(x))
    for name, fn in (("t_dot_pad128", t_dot_pad128), ("t_dot_b64", t_dot_b64)):
        got = np.asarray(jax.jit(fn)(x))
        assert got.shape == ref.shape and (got == ref).all(), name
    # chain_imgdot: same multiset of values, patch-major order
    img = img2[0]
    want = np.asarray(jax.jit(chain_shipped)(img))   # (P,P,C, (b f hp wp))
    got = np.asarray(jax.jit(chain_imgdot)(img))     # (P,P,C, (hp wp b f))
    want_r = want.reshape(P, P, C, B * F, (H // P) ** 2)
    got_r = got.reshape(P, P, C, (H // P) ** 2, B * F)
    assert (np.moveaxis(got_r, 4, 3) == want_r).all(), "imgdot order"
    log("[mxu-t] correctness: all bit-exact")

    cases = {
        "t_xla_4d": (x2, t_xla_4d),
        "t_dot_pad128": (x2, t_dot_pad128),
        "t_dot_b64": (x2, t_dot_b64),
        "chain_shipped": (img2, chain_shipped),
        "chain_imgdot": (img2, chain_imgdot),
    }
    results = {}
    for name, (stack, fn) in cases.items():
        def step(i, stk, _fn=fn):
            a = jax.lax.dynamic_index_in_dim(stk, i % 2, keepdims=False)
            return jnp.sum(_fn(a)[..., ::97].astype(jnp.float32))
        sec = sec_per_call(build_loop(step), (stack,), label=name)
        results[name] = round(sec * 1e3, 4)
        log(f"[mxu-t] {name}: {results[name]} ms")

    print(json.dumps({
        "metric": "mxu_transpose_ms",
        "value": results["chain_imgdot"],
        "unit": "ms/call",
        "vs_baseline": round(results["chain_shipped"]
                             / max(results["chain_imgdot"], 1e-9), 3),
        "detail": {"device": kind, "bytes_mb": 60.2, "cases": results},
    }))


if __name__ == "__main__":
    main()
