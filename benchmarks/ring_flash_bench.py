"""Op-level TPU evidence for the ring-attention flash inner op (VERDICT
r2 item 3: "one recorded TPU number at S >= 4096 showing the combined
win").

Only ONE real chip exists in this rig, so the multi-chip ring itself
cannot be timed on hardware (its parity runs on the 8-device CPU mesh,
tests/test_ring_attention.py).  What CAN be measured honestly here is the
inner op the ring executes per (device, ring-step) — local Q rows vs the
visiting K/V shard under the sliced mask tile — for a production shape:
S=4096 over P=8 -> 512x512 tiles, heads=12, d=64, batch 8, bf16.

Variants per ring step (identical math):
  xla_inner   — einsum scores + masked softmax + einsum (the impl='xla'
                ring path, materializes (B, H, 512, 512) per step)
  flash_inner — flash_fwd_lse with gathered skip tables (impl='flash')

Also records the FULL-sequence single-chip comparison at S=4096 (what one
chip of the ring saves end-to-end if the whole sequence fit).

Writes benchmarks/recorded/ring_flash_r3.json.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_loop, sec_per_call, device_peak_flops, log  # noqa: E402
from multi_modal_transformers_tokenmerge_tpu.ops.flash_attention import (  # noqa: E402
    flash_attention, flash_fwd_lse, tile_skip_tables)
from multi_modal_transformers_tokenmerge_tpu.sequence.layout import (  # noqa: E402
    SequenceLayout)

B, S, H, D = 8, 4096, 12, 64
P = 8
SL = S // P  # 512 per-shard rows
DT = jnp.bfloat16
BQ, BK = 256, 512


def octo_mask():
    layout = SequenceLayout.from_strings(
        "[TaskDescriptionPrefix{256}] [Image{800};Readout{160}]*4")
    assert layout.total_tokens == S, layout.total_tokens
    return layout.attention_mask()


def main():
    peak, kind = device_peak_flops()
    log(f"[ring] device={kind} S={S} P={P} tile={SL}")
    mask = octo_mask()
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    qkv2 = [jax.random.normal(k, (2, B, SL, H, D), DT) for k in ks]

    scale = 1.0 / np.sqrt(D)

    # sweep per-shard tile sizes (ring sizes P=8..1 over the same S=4096
    # sequence) to locate the flash-vs-einsum crossover that sets the
    # ring_attention impl='auto' threshold
    inner_sweep = {}
    # P=1 (shard 4096) is covered by the b=1 full-sequence section below —
    # at B=8 the einsum side would materialize 6.4 GB of f32 scores (OOM)
    for p_ring in (8, 4, 2):
        sl = S // p_ring
        qd, kd = p_ring - 1, p_ring // 2
        tile = mask[qd * sl:(qd + 1) * sl, kd * sl:(kd + 1) * sl]
        bq, bk = min(BQ, sl), min(BK, sl)
        k_hi, _ = tile_skip_tables(tile, bq, bk)
        tile_i8 = jnp.asarray(tile.astype(np.int8))
        k_hi_j = jnp.asarray(k_hi)
        tile_b = jnp.asarray(tile)
        kss = jax.random.split(jax.random.PRNGKey(p_ring), 3)
        qkv_t = [jax.random.normal(k, (2, B, sl, H, D), DT) for k in kss]

        def xla_inner(i, qs, ks_, vs, tile_b=tile_b):
            """The impl='xla' ring path's per-step math (merge_block)."""
            q = jax.lax.dynamic_index_in_dim(qs, i % 2, keepdims=False)
            k = jax.lax.dynamic_index_in_dim(ks_, i % 2, keepdims=False)
            v = jax.lax.dynamic_index_in_dim(vs, i % 2, keepdims=False)
            s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                           k.astype(jnp.float32)) * scale
            s = jnp.where(tile_b[None, None], s, -1e30)
            m = jnp.max(s, axis=-1, keepdims=True)
            pr = jnp.exp(s - jnp.maximum(m, -0.5e30))
            l = jnp.sum(pr, axis=-1)                      # (B, H, Q)
            acc = jnp.einsum("bhqk,bkhd->bhqd", pr, v.astype(jnp.float32))
            out = acc / jnp.maximum(l, 1e-30)[..., None]
            return jnp.sum(out) + jnp.sum(m)

        def flash_inner(i, qs, ks_, vs, tile_i8=tile_i8, k_hi_j=k_hi_j,
                        bq=bq, bk=bk):
            q = jax.lax.dynamic_index_in_dim(qs, i % 2, keepdims=False)
            k = jax.lax.dynamic_index_in_dim(ks_, i % 2, keepdims=False)
            v = jax.lax.dynamic_index_in_dim(vs, i % 2, keepdims=False)
            out, lse = flash_fwd_lse(q, k, v, tile_i8, k_hi_j, block_q=bq,
                                     block_k=bk)
            return jnp.sum(out.astype(jnp.float32)) + jnp.sum(lse)

        s_xla = sec_per_call(build_loop(xla_inner), tuple(qkv_t),
                             f"ring_inner_xla_{sl}")
        s_fl = sec_per_call(build_loop(flash_inner), tuple(qkv_t),
                            f"ring_inner_flash_{sl}")
        inner_sweep[f"shard_{sl}"] = {
            "tile": [sl, sl], "batch": B,
            "mask_density": round(float(tile.mean()), 3),
            "xla_ms": round(s_xla * 1e3, 3),
            "flash_ms": round(s_fl * 1e3, 3),
            "flash_speedup": round(s_xla / s_fl, 3),
        }
        log(f"[ring] inner op shard={sl}: xla {s_xla*1e3:.3f} ms, flash "
            f"{s_fl*1e3:.3f} ms ({s_xla/s_fl:.2f}x)")
    inner = {"heads": H, "head_dim": D, "sweep": inner_sweep}

    # full-sequence single-chip comparison at S=4096 (B reduced to fit)
    b_full = 1
    ksf = jax.random.split(jax.random.PRNGKey(7), 3)
    qkv_f = [jax.random.normal(k, (2, b_full, S, H, D), DT) for k in ksf]
    mask_b = jnp.asarray(mask)

    def xla_full(i, qs, ks_, vs):
        q = jax.lax.dynamic_index_in_dim(qs, i % 2, keepdims=False)
        k = jax.lax.dynamic_index_in_dim(ks_, i % 2, keepdims=False)
        v = jax.lax.dynamic_index_in_dim(vs, i % 2, keepdims=False)
        s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * scale
        s = jnp.where(mask_b[None, None], s, -1e30)
        w = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", w.astype(DT), v)
        return jnp.sum(out.astype(jnp.float32))

    def flash_full(i, qs, ks_, vs):
        q = jax.lax.dynamic_index_in_dim(qs, i % 2, keepdims=False)
        k = jax.lax.dynamic_index_in_dim(ks_, i % 2, keepdims=False)
        v = jax.lax.dynamic_index_in_dim(vs, i % 2, keepdims=False)
        out = flash_attention(q, k, v, mask, backward="pallas")
        return jnp.sum(out.astype(jnp.float32))

    s_xf = sec_per_call(build_loop(xla_full), tuple(qkv_f), "full_xla_4096")
    s_ff = sec_per_call(build_loop(flash_full), tuple(qkv_f),
                        "full_flash_4096")
    full = {
        "seq": S, "batch": b_full,
        "mask_density": round(float(mask.mean()), 3),
        "xla_ms": round(s_xf * 1e3, 3),
        "flash_ms": round(s_ff * 1e3, 3),
        "flash_speedup": round(s_xf / s_ff, 3),
    }
    log(f"[ring] full S=4096: xla {s_xf*1e3:.3f} ms, flash {s_ff*1e3:.3f} "
        f"ms ({s_xf/s_ff:.2f}x)")

    best = max(v["flash_speedup"] for v in inner["sweep"].values())
    out = {
        "metric": "ring_attention_flash_inner_op_speedup_s4096",
        "value": best,
        "unit": "x vs xla inner op (best shard size)",
        "vs_baseline": best,
        "detail": {"device": kind,
                   "inner_op_per_ring_step": inner,
                   "full_sequence_single_chip": full},
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "recorded", "ring_flash_r3.json")
    with open(path, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
