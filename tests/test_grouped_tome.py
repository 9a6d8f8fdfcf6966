"""Grouped ToMe stack (tome_merge_every > 1): shapes, grads, and stage
layout consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_transformers_tokenmerge_tpu.core.config import (
    AttentionConfig,
    TransformerConfig,
)
from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo
from multi_modal_transformers_tokenmerge_tpu.modules.tome_stack import (
    CompressedTransformerStack,
)
from multi_modal_transformers_tokenmerge_tpu.sequence.layout import (
    SequenceLayout,
)

from micro_configs import octo_micro_tome


pytestmark = pytest.mark.slow

def _stack_cfg(num_blocks, k):
    return TransformerConfig(
        num_blocks=num_blocks,
        attention=AttentionConfig(num_heads=2, qkv_features=16,
                                  dropout_rate=0.0),
        mlp_dim=32, dropout_rate=0.0,
        compression_mode="merge", tome_merge_every=k)


def test_grouped_stack_output_shape():
    layout = SequenceLayout.from_strings(
        "[Text{4}] [Image{16};Readout{2}]",
        "[Text{0}] [Image{4};Readout{0}]")
    m = CompressedTransformerStack(_stack_cfg(4, 2), layout=layout)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 22, 16))
    v = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(v, x)
    # 2 stages -> 1 merge event -> image set sheds 4 tokens
    assert out.shape == (2, 18, 16)


def test_grouped_stack_stage_params_are_scanned():
    layout = SequenceLayout.from_strings(
        "[Text{4}] [Image{16};Readout{2}]",
        "[Text{0}] [Image{4};Readout{0}]")
    m = CompressedTransformerStack(_stack_cfg(4, 2), layout=layout)
    x = jnp.zeros((1, 22, 16))
    v = m.init(jax.random.PRNGKey(0), x)
    # each stage is ONE scanned module with a leading length-2 param dim
    q = v["params"]["stage_0"]["attention"]["query"]["kernel"]
    assert q.shape[0] == 2


def test_grouped_stack_remat_matches_plain():
    """cfg.remat was silently inert on the staged path (review finding);
    now it must both run AND be numerically identical to the plain path."""
    layout = SequenceLayout.from_strings(
        "[Text{4}] [Image{16};Readout{2}]",
        "[Text{0}] [Image{4};Readout{0}]")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 22, 16))

    plain = CompressedTransformerStack(_stack_cfg(4, 2), layout=layout)
    v = plain.init(jax.random.PRNGKey(1), x)
    remat = CompressedTransformerStack(
        _stack_cfg(4, 2).replace(remat=True), layout=layout)

    np.testing.assert_allclose(np.asarray(plain.apply(v, x)),
                               np.asarray(remat.apply(v, x)),
                               rtol=1e-6, atol=1e-6)
    g_plain = jax.grad(lambda p: plain.apply({"params": p}, x).sum())(
        v["params"])
    g_remat = jax.grad(lambda p: remat.apply({"params": p}, x).sum())(
        v["params"])
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_grouped_prune_mode():
    """Grouped cadence with norm-based pruning at event boundaries."""
    layout = SequenceLayout.from_strings(
        "[Text{4}] [Image{16};Readout{2}]",
        "[Text{0}] [Image{4};Readout{0}]")
    cfg = _stack_cfg(4, 2).replace(compression_mode="prune")
    m = CompressedTransformerStack(cfg, layout=layout)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 22, 16))
    v = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(v, x)
    assert out.shape == (2, 18, 16)


def test_grouped_bad_mode_rejected():
    layout = SequenceLayout.from_strings(
        "[Text{4}] [Image{16};Readout{2}]",
        "[Text{0}] [Image{4};Readout{0}]")
    cfg = _stack_cfg(4, 2).replace(compression_mode="banana")
    m = CompressedTransformerStack(cfg, layout=layout)
    with pytest.raises(ValueError):
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 22, 16)))


def test_grouped_model_end_to_end():
    cfg = octo_micro_tome()
    cfg = cfg.replace(transformer=cfg.transformer.replace(
        num_blocks=4, tome_merge_every=2))
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = jnp.ones((2, 4), dtype=jnp.int32)
    images = jnp.ones((2, 2, 64, 64, 3))
    v = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]}, text, images)
    act = model.apply(v, text, images, method="predict_continuous_action")
    assert act.shape == (2, 1, 4)

    def loss(p):
        return jnp.mean(model.apply(
            {"params": p}, text, images, jnp.full((2, 4), 0.2),
            rngs={"dropout": keys[2], "patch_encoding": keys[1]},
            method="compute_l2_loss"))

    g = jax.grad(loss)(v["params"])
    assert sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g)) > 0


def test_merge_of_causal_text_set_rejected():
    """ToMe merge reorders tokens within a set; a causal (Text) set with a
    nonzero compression rate must be rejected loudly, not silently break
    the tril mask at the next layer."""
    layout = SequenceLayout.from_strings(
        "[Text{8}] [Image{16};Readout{2}]",
        "[Text{2}] [Image{4};Readout{0}]")
    m = CompressedTransformerStack(_stack_cfg(4, 2), layout=layout)
    x = jnp.zeros((1, 26, 16))
    with pytest.raises(ValueError, match="causal"):
        m.init(jax.random.PRNGKey(0), x)
    # prune mode is order-preserving and accepts the same layout
    mp = CompressedTransformerStack(
        _stack_cfg(4, 2).replace(compression_mode="prune"), layout=layout)
    mp.init(jax.random.PRNGKey(0), x)


def test_proportional_attention_rejected_in_staged_path():
    layout = SequenceLayout.from_strings(
        "[Text{4}] [Image{16};Readout{2}]",
        "[Text{0}] [Image{4};Readout{0}]")
    m = CompressedTransformerStack(
        _stack_cfg(4, 2).replace(proportional_attention=True), layout=layout)
    x = jnp.zeros((1, 22, 16))
    with pytest.raises(ValueError, match="proportional_attention"):
        m.init(jax.random.PRNGKey(0), x)


def test_flash_rejected_in_per_layer_path():
    layout = SequenceLayout.from_strings(
        "[Text{4}] [Image{16};Readout{2}]",
        "[Text{0}] [Image{1};Readout{0}]")
    m = CompressedTransformerStack(
        _stack_cfg(2, 1).replace(attention_impl="flash"), layout=layout)
    x = jnp.zeros((1, 22, 16))
    with pytest.raises(ValueError, match="flash"):
        m.init(jax.random.PRNGKey(0), x)


@pytest.mark.parametrize("k", [1, 2])
def test_compressed_stack_moe_sows_weighted_aux(k):
    """Both compressed paths (per-layer blocks and staged scan) support
    mlp_type='moe' and sow the pre-weighted balance loss into 'losses' —
    the same contract the train step consumes (train/steps.py)."""
    from multi_modal_transformers_tokenmerge_tpu.core.config import MoEConfig
    from multi_modal_transformers_tokenmerge_tpu.modules.moe import (
        moe_aux_loss)

    layout = SequenceLayout.from_strings(
        "[Text{4}] [Image{16};Readout{2}]",
        "[Text{0}] [Image{4};Readout{0}]")
    cfg = _stack_cfg(4 if k == 2 else 2, k).replace(
        mlp_type="moe",
        moe=MoEConfig(num_experts=2, top_k=1, capacity_factor=2.0,
                      aux_loss_weight=0.05))
    m = CompressedTransformerStack(cfg, layout=layout)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 22, 16))
    v = m.init(jax.random.PRNGKey(1), x)
    out, mut = m.apply(v, x, mutable=["losses"])
    assert out.shape[0] == 2
    assert float(moe_aux_loss(mut)) > 0
