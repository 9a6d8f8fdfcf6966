"""Compat layer: reference-style API over the TPU-native implementation,
golden-checked against the reference where it executes."""

import jax
import jax.numpy as jnp
import numpy as np

from multi_modal_transformers_tokenmerge_tpu import compat

from ref_loader import load_ref_token_compression, load_ref_token_sequencer


def test_compat_token_sequence_matches_reference():
    ref = load_ref_token_sequencer()
    seq_str = "[TaskDescriptionPrefix{16}] [Image{25};Readout{4}]*2"
    ref_seq = ref.TokenSequence(seq_str)
    ours = compat.TokenSequence(seq_str)

    np.testing.assert_array_equal(
        np.asarray(ours.generate_attention_mask(repeats=3)),
        np.asarray(ref_seq.generate_attention_mask(repeats=3)).astype(bool))
    np.testing.assert_array_equal(
        np.asarray(ours.get_modality_idx("readouts")),
        np.asarray(ref_seq.get_modality_idx("readouts")))
    assert list(ours.slice_idx) == list(ref_seq.slice_idx)


def test_compat_assemble_embeddings():
    seq = compat.TokenSequence(
        "[TaskDescriptionPrefix{4}] [Image{3};Readout{2}]")
    emb = compat.TokenEmbeddings(
        text=jnp.ones((2, 4, 8)) * 1,
        images=jnp.ones((2, 3, 8)) * 2,
        readouts=jnp.ones((2, 2, 8)) * 3)
    out = seq.assemble_embeddings(emb)
    assert out.shape == (2, 9, 8)
    np.testing.assert_array_equal(np.asarray(out[0, :, 0]),
                                  [1, 1, 1, 1, 2, 2, 2, 3, 3])


def test_compat_merge_closure_matches_reference():
    ref = load_ref_token_compression()
    key = jax.random.PRNGKey(0)
    metric = jax.random.normal(key, (2, 10, 8))
    x = jax.random.normal(jax.random.fold_in(key, 1), (2, 10, 8))

    ref_merge = ref.bipartite_soft_matching(metric, 3)
    merge = compat.bipartite_soft_matching(metric, 3)
    np.testing.assert_allclose(np.asarray(merge(x)),
                               np.asarray(ref_merge(x, mode="sum")),
                               rtol=1e-5, atol=1e-5)

    ours_x, ours_s = compat.merge_wavg(merge, x)
    ref_x, ref_s = ref.merge_wavg(ref_merge, x)
    np.testing.assert_allclose(np.asarray(ours_x), np.asarray(ref_x),
                               rtol=1e-5, atol=1e-5)


def test_compat_compute_top_k_tokens():
    ref = load_ref_token_compression()
    key = jax.random.PRNGKey(1)
    emb = jax.random.normal(key, (20, 8))
    scores = jax.random.normal(jax.random.fold_in(key, 1), (20,))
    slices = ((0, 12), (12, 8))
    keep = (10, 8)
    ref_out = ref.compute_top_k_tokens(emb, scores, slices, keep)
    ours = compat.compute_top_k_tokens(emb, scores, slices, keep)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref_out),
                               rtol=1e-6)


def test_compat_misc_functions():
    x = jnp.linspace(-1, 1, 11)
    assert compat.mu_law_encoder(x).shape == x.shape
    assert compat.assign_bins(x, (-1, 1), 8).shape == x.shape
    assert compat.cosine_beta_schedule(32).shape == (32,)
    img = jnp.zeros((8, 8, 3))
    assert compat.image_to_patches(img, 4, True).shape == (4, 4, 4, 3)


def test_reference_param_converter_handles_auto_numbered_names():
    """convert_reference_octo_params documents support for hydra's
    auto-numbered flax names (Conv_0/GroupNorm_0/Embed_0/...); build such a
    tree by renaming an attr-named one and check both convert identically."""
    import numpy as np

    from multi_modal_transformers_tokenmerge_tpu.compat import (
        convert_reference_octo_params)

    rng = np.random.default_rng(0)
    arr = lambda *s: rng.normal(size=s).astype(np.float32)
    E, A, T = 32, 8, 16

    dense = lambda i, o: {"kernel": arr(i, o), "bias": arr(o)}
    attr_named = {
        "text_encoder": {"embedding": {"embedding": arr(64, E)},
                         "position_embedding": {"embedding": arr(4, E)}},
        "image_encoder": {
            "resnet": {"input_conv": dense(8, 8),
                       "resnet_norm": {"scale": arr(8), "bias": arr(8)},
                       "resnet_conv": dense(8, 8),
                       "output_dense": dense(200, E)},
            "row_position_embedding": {"embedding": arr(3, E)},
            "col_position_embedding": {"embedding": arr(3, E)},
        },
        "readout_encoder": {"pos_embedding": arr(1, 8, E)},
        "attention_blocks": {
            "posembed_input": {"pos_embedding": arr(1, 20, E)},
            "ScanEncoder1DBlock_0": {
                "LayerNorm_0": {"scale": arr(2, E), "bias": arr(2, E)},
                "LayerNorm_1": {"scale": arr(2, E), "bias": arr(2, E)},
                "MultiHeadDotProductAttention_0": {
                    "query": {"kernel": arr(2, E, 2, 16)},
                    "key": {"kernel": arr(2, E, 2, 16)},
                    "value": {"kernel": arr(2, E, 2, 16)},
                    "out": {"kernel": arr(2, 2, 16, E)}},
                "Dense_0": {"kernel": arr(2, E, 64), "bias": arr(2, 64)},
                "Dense_1": {"kernel": arr(2, 64, E), "bias": arr(2, E)},
            }},
        "continuous_action_head": {"dense": dense(E, A)},
        "diffusion_action_head": {"denoising_model": {
            "time_encoder": {
                "fourier_kernel": arr(8, 1),
                "mlp_block": {"dense": dense(1, 32),
                              "dense_out": dense(32, T)}},
            "mlp_block": {"dense": dense(A + T + E, 32),
                          "dense_out": dense(32, A)}}},
    }

    # auto-numbered variant: rename per hydra's in-call instantiation order
    auto = {
        "text_encoder": {"Embed_0": attr_named["text_encoder"]["embedding"],
                         "Embed_1":
                             attr_named["text_encoder"]["position_embedding"]},
        "image_encoder": {
            "embedding_function": {
                "Conv_0": attr_named["image_encoder"]["resnet"]["input_conv"],
                "GroupNorm_0":
                    attr_named["image_encoder"]["resnet"]["resnet_norm"],
                "Conv_1": attr_named["image_encoder"]["resnet"]["resnet_conv"],
                "Dense_0":
                    attr_named["image_encoder"]["resnet"]["output_dense"]},
            "Embed_0":
                attr_named["image_encoder"]["row_position_embedding"],
            "Embed_1":
                attr_named["image_encoder"]["col_position_embedding"],
        },
        "readout_encoder": attr_named["readout_encoder"],
        "attention_blocks": attr_named["attention_blocks"],
        "continuous_action_head": {
            "Dense_0": attr_named["continuous_action_head"]["dense"]},
        "diffusion_action_head": {"denoiser": {
            "FourierFeatures_0": {
                "fourier_kernel": (attr_named["diffusion_action_head"]
                                   ["denoising_model"]["time_encoder"]
                                   ["fourier_kernel"]),
                "MLPBlock_0": {
                    "Dense_0": (attr_named["diffusion_action_head"]
                                ["denoising_model"]["time_encoder"]
                                ["mlp_block"]["dense"]),
                    "Dense_1": (attr_named["diffusion_action_head"]
                                ["denoising_model"]["time_encoder"]
                                ["mlp_block"]["dense_out"])}},
            "MLPBlock_1": {
                "Dense_0": (attr_named["diffusion_action_head"]
                            ["denoising_model"]["mlp_block"]["dense"]),
                "Dense_1": (attr_named["diffusion_action_head"]
                            ["denoising_model"]["mlp_block"]["dense_out"])},
        }},
    }

    a = convert_reference_octo_params(attr_named)
    b = convert_reference_octo_params(auto)
    import jax
    assert jax.tree.structure(a) == jax.tree.structure(b)
    jax.tree.map(lambda x, y: np.testing.assert_array_equal(x, y), a, b)


def test_upgrade_fused_qkv_params_roundtrip():
    """Pre-round-3 checkpoints kept attn/{q,k,v}/kernel; the upgrader must
    rebuild the fused attn/qkv/kernel exactly and pass fused trees through
    unchanged (idempotence)."""
    from multi_modal_transformers_tokenmerge_tpu.modules.t5 import (
        T5EncoderStack)

    model = T5EncoderStack(vocab_size=50, d_model=16, num_layers=2,
                           num_heads=2, d_kv=8, d_ff=32)
    ids = jnp.zeros((1, 5), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)["params"]
    fused = params["blocks"]["attn"]["qkv"]["kernel"]  # (L, D, 3, H, dkv)

    old = jax.tree.map(lambda x: x, params)  # deep-ish copy of the dicts
    old["blocks"] = dict(old["blocks"])
    attn_old = {
        "q": {"kernel": fused[:, :, 0]},
        "k": {"kernel": fused[:, :, 1]},
        "v": {"kernel": fused[:, :, 2]},
        "o": old["blocks"]["attn"]["o"],
    }
    old["blocks"]["attn"] = attn_old

    upgraded = compat.upgrade_fused_qkv_params(old)
    assert jax.tree.structure(upgraded) == jax.tree.structure(params)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), upgraded, params)
    # model runs with the upgraded tree
    out_a = model.apply({"params": params}, ids)
    out_b = model.apply({"params": upgraded}, ids)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))

    # idempotent on an already-fused tree
    again = compat.upgrade_fused_qkv_params(upgraded)
    assert jax.tree.structure(again) == jax.tree.structure(params)
