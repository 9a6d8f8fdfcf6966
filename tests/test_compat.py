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
