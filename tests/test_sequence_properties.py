"""Property-based tests (hypothesis) for the sequence core: invariants that
must hold for EVERY valid DSL program, not just the hand-picked cases."""

import numpy as np
from hypothesis import given, settings, strategies as st

from multi_modal_transformers_tokenmerge_tpu.sequence.dsl import (
    KIND_IMAGE,
    KIND_READOUT,
    KIND_TASK,
    KIND_TEXT,
)
from multi_modal_transformers_tokenmerge_tpu.sequence.layout import (
    SequenceLayout,
)

_KINDS = [KIND_TASK, KIND_TEXT, KIND_IMAGE, KIND_READOUT]


@st.composite
def sequences(draw):
    """Random valid DSL strings: 1-4 blocks, 1-3 sets each, 1-12 tokens."""
    n_blocks = draw(st.integers(1, 4))
    blocks = []
    for _ in range(n_blocks):
        n_sets = draw(st.integers(1, 3))
        sets = [
            f"{draw(st.sampled_from(_KINDS))}"
            f"{{{draw(st.integers(1, 12))}}}"
            for _ in range(n_sets)
        ]
        repeat = draw(st.integers(1, 3))
        suffix = f"*{repeat}" if repeat > 1 else ""
        blocks.append(f"[{';'.join(sets)}]{suffix}")
    return " ".join(blocks)


@settings(max_examples=40, deadline=None)
@given(sequences())
def test_assembly_permutation_is_bijection(seq):
    layout = SequenceLayout.from_strings(seq)
    perm = layout.assembly_permutation
    assert perm.shape == (layout.total_tokens,)
    assert sorted(perm.tolist()) == list(range(layout.total_tokens))


@settings(max_examples=40, deadline=None)
@given(sequences())
def test_mask_invariants(seq):
    layout = SequenceLayout.from_strings(seq)
    try:
        mask = layout.attention_mask()
    except ValueError:
        # reference-faithful rejection: a Text query set treats a same-
        # timestep TaskDescriptionPrefix key set as 'intra' (isinstance
        # lattice), and causal intra rules require equal sizes — the
        # reference crashes on the same programs (token_sequencer.py:82)
        return
    s = layout.total_tokens
    assert mask.shape == (s, s)

    # 1. no one ever attends to a readout key (OCTO invariant)
    r_idx = layout.modality_index("readouts")
    not_r = np.setdiff1d(np.arange(s), r_idx)
    if r_idx.size and not_r.size:
        assert not mask[np.ix_(not_r, r_idx)].any()

    # 2. nothing attends to strictly-future timesteps
    ts = np.concatenate([
        np.full(n, spec.timestep)
        for spec, (start, n) in zip(layout.sets, layout.set_slices())
    ])
    future = ts[None, :] > ts[:, None]
    assert not (mask & future).any()

    # 3. intra rules hold on every set's diagonal block: causal for Text,
    #    full for everything else
    for spec, (start, n) in zip(layout.sets, layout.set_slices()):
        block = mask[start:start + n, start:start + n]
        if spec.kind == KIND_TEXT:
            np.testing.assert_array_equal(
                block, np.tril(np.ones((n, n), dtype=bool)))
        else:
            assert block.all()


@settings(max_examples=25, deadline=None)
@given(sequences(), st.integers(0, 2))
def test_layered_counts_monotone(seq, layer):
    """With a compression string shedding 1 token per image set per layer,
    layer counts decrease exactly as declared and masks stay square."""
    import re
    comp = re.sub(r"\{\d+\}", "{0}", seq)
    comp = comp.replace("Image{0}", "Image{1}")
    layout = SequenceLayout.from_strings(seq, comp)
    try:
        m = layout.attention_mask(layer)
    except ValueError:
        return  # a set exhausted — rejection is the correct behaviour
    assert m.shape[0] == layout.tokens_at_layer(layer)
    assert layout.tokens_at_layer(layer) <= layout.total_tokens


def test_compression_repeat_mismatch_rejected():
    """A compression string whose *K differs from the sequence string's is
    a structural mismatch and must raise, not silently reinterpret the
    schedule over the sequence's timesteps."""
    import pytest

    from multi_modal_transformers_tokenmerge_tpu.sequence.dsl import (
        parse_sequence)

    with pytest.raises(ValueError, match="repeat"):
        parse_sequence("[Image{25};Readout{4}]*4",
                       compression="[Image{2};Readout{0}]*2")
    # matching repeats parse fine
    parse_sequence("[Image{25};Readout{4}]*4",
                   compression="[Image{2};Readout{0}]*4")
