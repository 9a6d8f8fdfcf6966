"""Block-level numerical fidelity: the reference's own Encoder1DBlock
(executed via the hydra shim, with the committed vanilla_decoder.yaml
hyperparameters) vs our EncoderBlock, with parameters mapped across.
Outputs must agree to float tolerance — the strongest end-to-end evidence
available given the reference cannot otherwise run in this image."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_transformers_tokenmerge_tpu.core.config import (
    AttentionConfig,
    TransformerConfig,
)
from multi_modal_transformers_tokenmerge_tpu.modules.attention import (
    EncoderBlock,
    MLPBlock,
)

from ref_loader import load_ref_attention

# golden/fidelity/parallel suite: nightly lane (VERDICT r4 item 7)
pytestmark = pytest.mark.slow

EMBED, HEADS, SEQ, B = 48, 3, 10, 2


def _ref_block_config():
    """Mirror of model_configs/attention_blocks/vanilla_decoder.yaml with
    test-size dims (dropout rate kept; runs deterministic)."""
    dense = lambda features: {
        "_target_": "flax.linen.Dense", "features": features,
        "kernel_init": {"_target_": "flax.linen.initializers.he_normal"},
        "use_bias": True,
        "bias_init": {"_target_": "flax.linen.initializers.normal"},
    }
    return {
        "layer_norm": {
            "_target_": "flax.linen.LayerNorm", "epsilon": 1e-6,
            "reduction_axes": [1], "feature_axes": [-1],
        },
        "dropout": {"_target_": "flax.linen.Dropout", "rate": 0.1},
        # the committed yaml names flax.linen.SelfAttention; the reference
        # calls it as (x, x, mask=...) (attention.py:59), a signature only
        # MultiHeadDotProductAttention accepts in current flax — identical
        # params and math for self-attention
        "self_attention": {
            "_target_": "flax.linen.MultiHeadDotProductAttention",
            "num_heads": HEADS,
            "qkv_features": EMBED, "dropout_rate": 0.1, "decode": False,
            "kernel_init": {"_target_": "flax.linen.initializers.he_normal"},
            "use_bias": True,
            "bias_init": {"_target_": "flax.linen.initializers.normal"},
        },
        "mlp_block": {
            "_target_": "_ref_attention.MLPBlock",
            "dense": dense(EMBED),
            "activation": {"_partial_": True,
                           "_target_": "flax.linen.relu"},
            "norm": {"_target_": "flax.linen.Dropout", "rate": 0.1},
            "dense_out": dense(EMBED),
        },
    }


def _map_params(ref_params):
    """Reference Encoder1DBlock param tree -> our EncoderBlock tree."""
    p = ref_params
    attn = p.get("SelfAttention_0",
                 p.get("MultiHeadDotProductAttention_0"))
    return {
        "ln_attention": p["LayerNorm_0"],
        "ln_mlp": p["LayerNorm_1"],
        "attention": {
            "query": attn["query"], "key": attn["key"],
            "value": attn["value"], "out": attn["out"],
        },
        "mlp": {
            # the reference's MLPBlock denses land flat in the block scope
            "dense_in": p.get("MLPBlock_0", p)["Dense_0"],
            "dense_out": p.get("MLPBlock_0", p)["Dense_1"],
        },
    }


@pytest.fixture(scope="module")
def ref_mod():
    return load_ref_attention()


def test_encoder_block_matches_reference(ref_mod):
    cfg = _ref_block_config()
    ref_block = ref_mod.Encoder1DBlock(
        layer_norm=cfg["layer_norm"], dropout=cfg["dropout"],
        self_attention=cfg["self_attention"], mlp_block=cfg["mlp_block"])

    x = jax.random.normal(jax.random.PRNGKey(0), (B, SEQ, EMBED))
    mask = np.tril(np.ones((SEQ, SEQ), dtype=bool))
    mask_ref = jnp.broadcast_to(jnp.asarray(mask), (B, HEADS, SEQ, SEQ))

    ref_vars = ref_block.init(jax.random.PRNGKey(1), x, mask=mask_ref,
                              train=False)
    ref_out, _ = ref_block.apply(ref_vars, x, mask=mask_ref, train=False)

    ours = EncoderBlock(TransformerConfig(
        num_blocks=1,
        attention=AttentionConfig(num_heads=HEADS, qkv_features=EMBED,
                                  dropout_rate=0.1),
        mlp_dim=EMBED, dropout_rate=0.1,
        layer_norm_reduction="sequence_compat"))
    mapped = _map_params(ref_vars["params"])
    our_out, _ = ours.apply({"params": mapped}, x, jnp.asarray(mask), True)

    np.testing.assert_allclose(np.asarray(our_out), np.asarray(ref_out),
                               rtol=2e-5, atol=2e-5)


def test_mlp_block_matches_reference(ref_mod):
    cfg = _ref_block_config()["mlp_block"]
    ref_mlp = ref_mod.MLPBlock(dense=cfg["dense"],
                               activation=cfg["activation"],
                               norm=cfg["norm"], dense_out=cfg["dense_out"])
    x = jax.random.normal(jax.random.PRNGKey(2), (B, SEQ, EMBED))
    # reference: train=False -> Dropout(deterministic=not train)... which is
    # Dropout(x, True)? NOTE: reference passes `not train` POSITIONALLY as
    # Dropout's deterministic arg (attention.py:34) — train=False means
    # deterministic=True.
    ref_vars = ref_mlp.init(jax.random.PRNGKey(3), x, False)
    ref_out = ref_mlp.apply(ref_vars, x, False)

    ours = MLPBlock(mlp_dim=EMBED, out_dim=EMBED, dropout_rate=0.1)
    mapped = {"dense_in": ref_vars["params"]["Dense_0"],
              "dense_out": ref_vars["params"]["Dense_1"]}
    our_out = ours.apply({"params": mapped}, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(our_out), np.asarray(ref_out),
                               rtol=2e-5, atol=2e-5)


def test_reference_stacked_encoder_runs_via_shim(ref_mod):
    """The reference's StackedEncoder1DBlock (nn.scan) executes under the
    shim — shows the harness can drive the reference's whole attention
    stack, not just one block."""
    cfg = _ref_block_config()
    stacked = ref_mod.StackedEncoder1DBlock(num_blocks=2, encoder_1d_block=cfg)
    x = jax.random.normal(jax.random.PRNGKey(4), (B, SEQ, EMBED))
    mask = jnp.broadcast_to(
        jnp.tril(jnp.ones((SEQ, SEQ), bool)), (B, HEADS, SEQ, SEQ))
    variables = stacked.init(
        {"params": jax.random.PRNGKey(5), "dropout": jax.random.PRNGKey(6)},
        x, train=False, mask=mask)
    out = stacked.apply(variables, x, train=False, mask=mask)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
