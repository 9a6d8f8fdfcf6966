"""Golden tests for the sequence DSL, layout tables, and block-causal mask —
checked against the reference implementation executed directly
(reference: multi_modal_transformers/tokenizers/token_sequencer.py).
"""

import numpy as np
import pytest

from multi_modal_transformers_tokenmerge_tpu.sequence.dsl import (
    TokenSetSpec,
    parse_sequence,
)
from multi_modal_transformers_tokenmerge_tpu.sequence.layout import SequenceLayout

from ref_loader import load_ref_token_sequencer

OCTO_BASE_SEQ = "[TaskDescriptionPrefix{16}] [Image{25};Readout{4}]*2"

SEQ_CASES = [
    OCTO_BASE_SEQ,
    "[TaskDescriptionPrefix{20}] [Image{10};Readout{10}]*2",
    "[Text{5}] [Image{4};Readout{2}]*3",
    "[TaskDescriptionPrefix{8}] [Image{6};Image{6};Readout{3}]*2",
    "[Image{9};Readout{1}]",
    # two distinct same-timestep Readout sets: intra keys on (kind,
    # timestep), not set identity — reference isinstance semantics
    "[Image{2};Readout{2};Readout{2}]",
]


def test_parse_octo_base():
    sets = parse_sequence(OCTO_BASE_SEQ)
    assert sets == (
        TokenSetSpec("TaskDescriptionPrefix", 16, 0),
        TokenSetSpec("Image", 25, 1),
        TokenSetSpec("Readout", 4, 1),
        TokenSetSpec("Image", 25, 2),
        TokenSetSpec("Readout", 4, 2),
    )


def test_parse_compression():
    sets = parse_sequence(
        "[TaskDescriptionPrefix{20}] [Image{10};Readout{10}]*2",
        "[TaskDescriptionPrefix{0}] [Image{2};Readout{0}]*2",
    )
    assert [s.compressed_per_layer for s in sets] == [0, 2, 0, 2, 0]
    assert [s.tokens_at_layer(2) for s in sets] == [20, 6, 10, 6, 10]


@pytest.mark.parametrize("seq_str", SEQ_CASES)
def test_mask_matches_reference(seq_str):
    ref = load_ref_token_sequencer()
    ref_mask = np.asarray(ref.TokenSequence(seq_str).generate_attention_mask())
    ref_mask = ref_mask[0]  # strip repeats dim

    layout = SequenceLayout.from_strings(seq_str)
    ours = layout.attention_mask()

    assert ours.shape == ref_mask.shape
    np.testing.assert_array_equal(ours, ref_mask.astype(bool))


def test_same_timestep_readout_sets_are_intra():
    """Documented reference quirk (layout.py module docstring): two
    distinct Readout sets sharing a timestep resolve to the INTRA rule —
    full mutual attention — because the reference keys on
    ``isinstance(tokenset, self.__class__) and same timestep``, not set
    identity (token_sequencer.py:178-180).  Golden-pinned above; this
    asserts the quirk explicitly so a 'fix' can't silently change it."""
    mask = SequenceLayout.from_strings(
        "[Image{2};Readout{2};Readout{2}]").attention_mask()
    assert mask[2:4, 4:6].all() and mask[4:6, 2:4].all()


def test_unequal_same_timestep_text_sets_fail_loudly():
    """Text-like sets of different sizes at one timestep hit the causal
    intra rule; the reference silently emits a misaligned mask block
    there (its intra rule ignores the key set size) — we raise."""
    with pytest.raises(ValueError, match="equal set sizes"):
        SequenceLayout.from_strings(
            "[TaskDescriptionPrefix{4};Text{2}]").attention_mask()


@pytest.mark.parametrize("seq_str", SEQ_CASES)
def test_modality_idx_matches_reference(seq_str):
    ref = load_ref_token_sequencer()
    ref_seq = ref.TokenSequence(seq_str)
    layout = SequenceLayout.from_strings(seq_str)
    for modality in ("text", "images", "readouts"):
        ref_idx = np.asarray(ref_seq.get_modality_idx(modality)).ravel()
        ours = layout.modality_index(modality)
        np.testing.assert_array_equal(ours, ref_idx)


@pytest.mark.parametrize("seq_str", SEQ_CASES)
def test_slices_match_reference(seq_str):
    ref = load_ref_token_sequencer()
    ref_seq = ref.TokenSequence(seq_str)
    layout = SequenceLayout.from_strings(seq_str)
    # reference slice tables are one-shot iterators
    assert list(ref_seq.slice_idx) == list(layout.modality_slices())
    assert list(ref_seq.tokenset_slices) == list(layout.set_slices())


def test_layered_mask_shapes():
    layout = SequenceLayout.from_strings(
        "[TaskDescriptionPrefix{20}] [Image{10};Readout{10}]*2",
        "[TaskDescriptionPrefix{0}] [Image{2};Readout{0}]*2",
    )
    m0 = layout.attention_mask(layer=0)
    m1 = layout.attention_mask(layer=1)
    assert m0.shape == (60, 60)
    assert m1.shape == (56, 56)
    # compressed mask keeps the same block structure
    assert m1[:20, :20].all()  # task prefix intra
    assert not m1[:20, 20:].any()  # task prefix attends only to itself


def test_assembly_permutation_octo_base():
    layout = SequenceLayout.from_strings(OCTO_BASE_SEQ)
    perm = layout.assembly_permutation
    assert perm.shape == (74,)
    # text stream (16 tokens) first, then image frame 1 (25), readout 1 (4)...
    text_n, img_n = 16, 50
    np.testing.assert_array_equal(perm[:16], np.arange(16))
    np.testing.assert_array_equal(perm[16:41], text_n + np.arange(25))
    np.testing.assert_array_equal(perm[41:45], text_n + img_n + np.arange(4))
    np.testing.assert_array_equal(perm[45:70], text_n + 25 + np.arange(25))
    np.testing.assert_array_equal(perm[70:74], text_n + img_n + 4 + np.arange(4))


def test_assembly_permutation_is_gather_equivalent_to_reference_assembly():
    """Reference assembles with per-set dynamic_slice + concat; ours is a
    single gather over concat(text, images, readouts).  Check equivalence."""
    layout = SequenceLayout.from_strings(OCTO_BASE_SEQ)
    rng = np.random.default_rng(0)
    text = rng.normal(size=(2, 16, 8))
    images = rng.normal(size=(2, 50, 8))
    readouts = rng.normal(size=(2, 8, 8))

    combined = np.concatenate([text, images, readouts], axis=1)
    ours = combined[:, layout.assembly_permutation]

    # hand-rolled reference-style assembly
    expected = np.concatenate(
        [text[:, :16], images[:, :25], readouts[:, :4],
         images[:, 25:50], readouts[:, 4:8]],
        axis=1,
    )
    np.testing.assert_allclose(ours, expected)


def test_readout_mask_isolation():
    """Readouts never provide keys to any other set; observations never see
    readouts (OCTO invariant)."""
    layout = SequenceLayout.from_strings(OCTO_BASE_SEQ)
    mask = layout.attention_mask()
    r_idx = layout.modality_index("readouts")
    not_r = np.setdiff1d(np.arange(layout.total_tokens), r_idx)
    # no non-readout query attends to a readout key
    assert not mask[np.ix_(not_r, r_idx)].any()
    # readout at t=1 attends to task prefix + image(t=1) + itself
    sl = dict(zip(range(len(layout.sets)), layout.set_slices()))
    ro1 = slice(41, 45)
    assert mask[ro1, 0:41].all()     # prefix + image t1
    assert mask[ro1, 41:45].all()    # itself
    assert not mask[ro1, 45:].any()  # nothing in the future / other readouts
