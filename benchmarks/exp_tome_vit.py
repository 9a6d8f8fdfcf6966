"""ViT-scale ToMe measurement (round-3 TODO #4 / VERDICT r2 item 10).

The standing question: at >= 576-token image sets (24x24 ViT grid) do the
ToMe match+merge intermediates matter enough for a fused Pallas kernel?
At 25-100 token sets the answer was no (one-hot matmul is already
MXU-shaped).  This measures, at B=32, E=768, 12 blocks, 4x MLP,
[Image{576};Readout{4}] with two merge events shedding 144 tokens each
(576 -> 432 -> 288):

  vanilla      : 12-block stack at 580 tokens
  tome         : grouped ToMe (merge_every=4), same params per block
  merge_op     : ONE isolated merge event (metric norm + scores + top_k +
                 cumsum compaction + one-hot matmul) at the 580-token layout
  merge_op_score: same with the reference 'score' ordering (full argsort)

If merge_op is a small share of (vanilla - tome) the fused kernel has no
headroom and the negative stands at ViT scale too.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_loop, sec_per_call, device_peak_flops, log  # noqa: E402

from multi_modal_transformers_tokenmerge_tpu.core.config import (  # noqa: E402
    AttentionConfig, TransformerConfig)
from multi_modal_transformers_tokenmerge_tpu.modules.attention import (  # noqa: E402
    TransformerStack)
from multi_modal_transformers_tokenmerge_tpu.modules.tome_stack import (  # noqa: E402
    CompressedTransformerStack, _merge_sets)
from multi_modal_transformers_tokenmerge_tpu.ops.tome import (  # noqa: E402
    bipartite_soft_matching, merge_wavg)
from multi_modal_transformers_tokenmerge_tpu.sequence.layout import (  # noqa: E402
    SequenceLayout)

BATCH = 32
N_INPUTS = 2
E = 768


def main():
    _, kind = device_peak_flops()
    log(f"[tomevit] device={kind}")

    layout = SequenceLayout.from_strings(
        "[Image{576};Readout{4}]", "[Image{144};Readout{0}]")
    s = layout.total_tokens
    base = TransformerConfig(
        num_blocks=12,
        attention=AttentionConfig(num_heads=12, qkv_features=768,
                                  dropout_rate=0.0),
        mlp_dim=3072, dropout_rate=0.0)

    @jax.jit
    def gen(key):
        return jax.random.normal(key, (N_INPUTS, BATCH, s, E),
                                 dtype=jnp.bfloat16)

    xs = gen(jax.random.PRNGKey(0))
    mask = jnp.asarray(layout.attention_mask())

    vanilla = TransformerStack(base, dtype=jnp.bfloat16)
    vv = jax.jit(lambda key, x: vanilla.init(key, x, mask=mask))(
        jax.random.PRNGKey(1), xs[0])
    tome = CompressedTransformerStack(
        base.replace(compression_mode="merge", tome_merge_every=4),
        layout=layout, dtype=jnp.bfloat16)
    tv = jax.jit(tome.init)(jax.random.PRNGKey(1), xs[0])
    log("[tomevit] params ready")

    def vanilla_step(i, v, xs, mask):
        x = jax.lax.dynamic_index_in_dim(xs, i % N_INPUTS, keepdims=False)
        return jnp.sum(vanilla.apply(v, x, mask=mask).astype(jnp.float32))

    def tome_step(i, v, xs):
        x = jax.lax.dynamic_index_in_dim(xs, i % N_INPUTS, keepdims=False)
        return jnp.sum(tome.apply(v, x).astype(jnp.float32))

    def merge_step(i, xs):
        x = jax.lax.dynamic_index_in_dim(xs, i % N_INPUTS, keepdims=False)
        size = jnp.ones_like(x[..., :1])
        y, sz = _merge_sets(x, size, x, layout, 0)
        return jnp.sum(y.astype(jnp.float32)) + jnp.sum(sz)

    def merge_score_step(i, xs):
        x = jax.lax.dynamic_index_in_dim(xs, i % N_INPUTS, keepdims=False)
        size = jnp.ones_like(x[..., :1])
        xi, si = x[:, :576], size[:, :576]
        plan = bipartite_soft_matching(xi, 144, ordering="score")
        y, sz = merge_wavg(plan, xi, si)
        return jnp.sum(y.astype(jnp.float32)) + jnp.sum(sz)

    res = {
        "vanilla": sec_per_call(build_loop(vanilla_step), (vv, xs, mask),
                                "vit_vanilla"),
        "tome": sec_per_call(build_loop(tome_step), (tv, xs), "vit_tome"),
        "merge_op": sec_per_call(build_loop(merge_step), (xs,),
                                 "vit_merge_op"),
        "merge_op_score": sec_per_call(build_loop(merge_score_step), (xs,),
                                       "vit_merge_score"),
    }
    saved = res["vanilla"] - res["tome"]
    out = {
        "metric": "tome_vit_scale_576tok_12blk",
        "detail": {
            "device": kind, "batch": BATCH, "tokens": s, "blocks": 12,
            "mlp_dim": 3072, "merge_events": 2, "shed_per_event": 144,
            "ms_per_call": {k: round(v * 1e3, 3) for k, v in res.items()},
            "tome_speedup_vs_vanilla": round(res["vanilla"] / res["tome"], 3),
            "sequences_per_sec_tome": round(BATCH / res["tome"], 2),
            "merge_overhead_share_of_tome":
                round(2 * res["merge_op"] / res["tome"], 4),
            "stable_vs_score_ordering":
                round(res["merge_op_score"] / res["merge_op"], 3),
        },
    }
    log(f"[tomevit] vanilla {res['vanilla']*1e3:.3f} ms | tome "
        f"{res['tome']*1e3:.3f} ms ({res['vanilla']/res['tome']:.3f}x) | "
        f"merge_op {res['merge_op']*1e3:.3f} ms | saved {saved*1e3:.3f} ms")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
