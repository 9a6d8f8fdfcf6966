"""HISTORICAL RECORD (round 3) — the fused-qkv change this script
motivated has SHIPPED in modules/t5.py (T5SelfAttention now computes one
fused qkv projection), so ``fuse_params`` below no longer matches the
module's param tree and the script exits early rather than measuring the
fused module against itself.  The recorded decision artifact is
benchmarks/recorded/t5_qkv_r3.json (1.09x tower-only).  Checkpoints from
before the change are upgraded by ``compat.upgrade_fused_qkv_params``.

Original question: does fusing the q/k/v projections into one matmul pay?

At T=16 the tower's matmuls are short (M = B*T = 512 rows); each of the
three 768x768 projections is a separate dot whose weight load (1.2 MB)
is not amortized over many rows.  Fusing q/k/v into a single 768x2304
DenseGeneral issues one MXU op with 3x the N dimension — same FLOPs,
one pass over the activations instead of three.  This experiment A/Bs
the shipped T5EncoderStack against a fused-qkv variant (same math; the
fused kernel is the q|k|v kernels concatenated, so outputs match to
bf16 rounding).

TPU-dispatch hygiene (the axon tunnel can be slow): params are built
under jit ON CPU and device_put to the TPU, the numerical-equivalence
check runs on CPU at unroll=1 (unroll is an execution knob, not math),
and only the two measurement loops compile on the TPU.

Ship criterion: >= 4% tower-only win (>= ~0.03 ms at b32), since the
change costs a converter + param-tree migration.
"""

import json
import os
import sys

import flax.linen as nn
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_loop, sec_per_call, device_peak_flops, log  # noqa: E402

from multi_modal_transformers_tokenmerge_tpu.modules import t5  # noqa: E402

B = int(os.environ.get("BENCH_BATCH", "32"))
T = 16
UNROLL = int(os.environ.get("BENCH_T5_UNROLL", "12"))


class FusedQKVSelfAttention(nn.Module):
    num_heads: int
    d_kv: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias):
        h, d = self.num_heads, self.d_kv
        qkv = nn.DenseGeneral(features=(3, h, d), axis=-1, use_bias=False,
                              dtype=self.dtype, param_dtype=self.param_dtype,
                              name="qkv")(x)  # (B, T, 3, H, D)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits + position_bias.astype(jnp.float32)
        weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        return nn.DenseGeneral(features=x.shape[-1], axis=(-2, -1),
                               use_bias=False, dtype=self.dtype,
                               param_dtype=self.param_dtype, name="o")(out)


def fuse_params(pa):
    """Stack the shipped q/k/v kernels into the fused layout (L,768,3,H,D)."""
    attn_a = pa["blocks"]["attn"]
    fused = jnp.stack([attn_a["q"]["kernel"], attn_a["k"]["kernel"],
                       attn_a["v"]["kernel"]], axis=2)
    pb = dict(pa)
    blocks = dict(pa["blocks"])
    blocks["attn"] = {"qkv": {"kernel": fused}, "o": attn_a["o"]}
    pb["blocks"] = blocks
    return pb


def main():
    print("[t5-qkv] HISTORICAL: the fused-qkv projection shipped in "
          "modules/t5.py (round 3); this A/B would now measure the fused "
          "module against itself.  See "
          "benchmarks/recorded/t5_qkv_r3.json for the recorded decision.")
    return


def _main_historical():
    peak, kind = device_peak_flops()
    log(f"[t5-qkv] device={kind} B={B} T={T} unroll={UNROLL}")
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    ids_host = jnp.ones((B, T), dtype=jnp.int32)
    flops = 12 * (2 * B * T * 768 * 768 * 4 + 2 * B * T * 768 * 3072 * 2)
    results = {}

    # init at unroll=1: the param tree is identical for every unroll and
    # the unrolled graph is 12x the compile work
    init_model = t5.T5EncoderStack(dtype=jnp.bfloat16, scan_unroll=1)
    with jax.default_device(cpu):
        vars_a = jax.jit(init_model.init)(jax.random.PRNGKey(0), ids_host)
    pa = vars_a["params"]
    pb = fuse_params(pa)

    # numerical equivalence on CPU at unroll=1 (cheap compile)
    orig = t5.T5SelfAttention
    try:
        with jax.default_device(cpu):
            check_a = t5.T5EncoderStack(dtype=jnp.bfloat16, scan_unroll=1)
            out_a = jax.jit(check_a.apply)({"params": pa}, ids_host[:2])
            t5.T5SelfAttention = FusedQKVSelfAttention
            check_b = t5.T5EncoderStack(dtype=jnp.bfloat16, scan_unroll=1)
            out_b = jax.jit(check_b.apply)({"params": pb}, ids_host[:2])
        err = float(jnp.max(jnp.abs(out_b.astype(jnp.float32)
                                    - out_a.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(out_a.astype(jnp.float32))))
        log(f"[t5-qkv] fused-vs-shipped max|diff|={err:.3g} scale={scale:.3g}")
        assert err <= 0.02 * max(scale, 1e-6), (err, scale)

        # --- TPU measurement ---
        ids = jax.device_put(ids_host, tpu)
        va = jax.device_put({"params": pa}, tpu)
        vb = jax.device_put({"params": pb}, tpu)

        t5.T5SelfAttention = orig
        model_a = t5.T5EncoderStack(dtype=jnp.bfloat16, scan_unroll=UNROLL)

        def step_a(i, v, tok):
            return jnp.sum(model_a.apply(v, tok + (i % 2)).astype(jnp.float32))

        sec = sec_per_call(build_loop(step_a), (va, ids), label="shipped")
        results["shipped"] = {
            "ms": round(sec * 1e3, 4),
            "mfu": round(flops / sec / peak, 3) if peak else None}
        log(f"[t5-qkv] shipped: {sec*1e3:.3f} ms")

        t5.T5SelfAttention = FusedQKVSelfAttention
        model_b = t5.T5EncoderStack(dtype=jnp.bfloat16, scan_unroll=UNROLL)

        def step_b(i, v, tok):
            return jnp.sum(model_b.apply(v, tok + (i % 2)).astype(jnp.float32))

        sec_b = sec_per_call(build_loop(step_b), (vb, ids), label="fused")
        results["fused_qkv"] = {
            "ms": round(sec_b * 1e3, 4),
            "mfu": round(flops / sec_b / peak, 3) if peak else None}
        log(f"[t5-qkv] fused_qkv: {sec_b*1e3:.3f} ms")
    finally:
        t5.T5SelfAttention = orig

    results["speedup"] = round(results["shipped"]["ms"]
                               / results["fused_qkv"]["ms"], 4)
    print(json.dumps({"metric": "t5_tower_fused_qkv_ms",
                      "detail": {"batch": B, "device": kind,
                                 "unroll": UNROLL, "cases": results}}))


if __name__ == "__main__":
    main()
