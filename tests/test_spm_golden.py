"""Differential golden fixtures for the sentencepiece path (VERDICT r2
item 5).

The environment has neither the ``sentencepiece`` package nor the real
t5-base ``spiece.model``, so full-vocabulary equality cannot run here.
These tests instead hard-code *known t5-base tokenizations* (piece
sequences and ids as produced by HF ``AutoTokenizer('t5-base')`` — the
exact call the reference makes, /root/reference/multi_modal_transformers/
models/octo/octo.py:402-409) and assert that our Viterbi segmenter
reproduces them over a fixture vocabulary that:

* contains the involved pieces at realistic relative scores, AND
* contains *competitor decompositions* (sub-pieces like ``▁trans``/
  ``late``, ``▁wonder``/``ful``, the bare ``▁`` space piece, no-space
  word variants) that a wrong segmenter (greedy-longest, wrong score
  accumulation, wrong whitespace convention) would pick instead.

So unlike the self-round-trip tests in test_spm.py, failure here means
divergence from the real tokenizer's documented behavior, not just
internal inconsistency.  Plus unicode-normalization and unknown-char
property tests.
"""

import numpy as np
import pytest

from multi_modal_transformers_tokenmerge_tpu.utils import spm
from multi_modal_transformers_tokenmerge_tpu.utils.spm import (
    CONTROL, NORMAL, UNKNOWN, SentencePieceUnigramModel, T5StyleTokenizer,
    build_model_proto)

# golden/fidelity/parallel suite: nightly lane (VERDICT r4 item 7)
pytestmark = pytest.mark.slow

S = "▁"  # sentencepiece space marker

# (piece, unigram log-prob score, real t5-base id).  Scores are realistic
# magnitudes (common/short pieces higher); ids are the REAL t5-base vocab
# ids for the pieces used in the golden sentences below.
_T5_SUBSET = [
    ("<pad>", 0.0, 0),
    ("</s>", 0.0, 1),
    ("<unk>", 0.0, 2),
    (S, -7.5, 3),
    (".", -3.5, 5),
    (":", -6.5, 10),
    (S + "to", -4.4, 12),
    (S + "is", -4.6, 19),
    (S + "The", -4.2, 37),
    (S + "That", -7.8, 466),
    (S + "good", -6.6, 207),
    (S + "house", -7.9, 629),
    (S + "English", -8.5, 1566),
    (S + "German", -9.0, 2968),
    (S + "translate", -9.2, 13959),
    (S + "wonderful", -10.4, 1627),
    (S + "summarize", -11.5, 21603),
    # --- competitor pieces a wrong segmenter would pick ---
    (S + "trans", -10.5, None),
    ("late", -8.0, None),
    ("translate", -11.0, None),
    (S + "wonder", -10.0, None),
    ("ful", -7.4, None),
    (S + "hous", -11.5, None),
    ("e", -5.0, None),
    ("s", -5.2, None),
    ("ize", -7.5, None),
    (S + "summar", -12.5, None),
    ("good", -8.9, None),
    ("The", -7.9, None),
    ("is", -6.8, None),
    ("to", -6.4, None),
    (S + "Th", -11.9, None),
    ("at", -5.9, None),
    ("German", -11.8, None),
    ("English", -11.2, None),
]

# HF t5-base golden tokenizations (piece sequence, ids WITHOUT eos/pad).
_GOLDENS = [
    ("translate English to German: That is good.",
     [S + "translate", S + "English", S + "to", S + "German", ":",
      S + "That", S + "is", S + "good", "."],
     [13959, 1566, 12, 2968, 10, 466, 19, 207, 5]),
    ("The house is wonderful.",
     [S + "The", S + "house", S + "is", S + "wonderful", "."],
     [37, 629, 19, 1627, 5]),
    ("summarize: That is good.",
     [S + "summarize", ":", S + "That", S + "is", S + "good", "."],
     [21603, 10, 466, 19, 207, 5]),
]


def _fixture_model():
    pieces = []
    for piece, score, _ in _T5_SUBSET:
        if piece == "<unk>":
            t = UNKNOWN
        elif piece in ("<pad>", "</s>"):
            t = CONTROL
        else:
            t = NORMAL
        pieces.append((piece, score, t))
    blob = build_model_proto(pieces)
    model = SentencePieceUnigramModel.from_bytes(blob)
    piece_to_t5 = {p: i for p, _, i in _T5_SUBSET if i is not None}
    return model, piece_to_t5


@pytest.mark.parametrize("text,pieces,t5_ids", _GOLDENS,
                         ids=[g[0][:24] for g in _GOLDENS])
def test_golden_piece_sequences(text, pieces, t5_ids):
    model, piece_to_t5 = _fixture_model()
    ids = model.encode(text)
    got_pieces = [model.id_to_piece(i) for i in ids]
    assert got_pieces == pieces
    # mapping the pieces through the real t5-base vocab ids reproduces the
    # exact HF AutoTokenizer('t5-base') output
    assert [piece_to_t5[p] for p in got_pieces] == t5_ids


def test_t5_style_tokenizer_eos_and_padding_convention():
    model, _ = _fixture_model()
    tok = T5StyleTokenizer(model, max_length=16)
    out = tok("The house is wonderful.")
    assert out.shape == (1, 16)
    n_pieces = 5
    assert out[0, n_pieces] == tok.eos_id        # EOS appended
    assert (out[0, n_pieces + 1:] == 0).all()    # <pad> = 0 after EOS
    # truncation keeps max_length-1 pieces + EOS (HF truncation=True)
    tok4 = T5StyleTokenizer(model, max_length=4)
    out4 = tok4("translate English to German: That is good.")
    assert out4.shape == (1, 4)
    assert out4[0, 3] == tok4.eos_id


def test_unicode_nfkc_normalization_applies():
    model, _ = _fixture_model()
    # fullwidth colon U+FF1A and ligature-free NFKC folding must match the
    # plain form (t5's nmt_nfkc normalizer includes NFKC)
    assert model.encode("That is good．") == model.encode(
        "That is good.")  # fullwidth full stop -> '.'
    assert model.normalize("Ⅰ") == model.normalize("I")  # roman numeral


def test_whitespace_collapsing_and_dummy_prefix():
    model, _ = _fixture_model()
    base = model.encode("The house is wonderful.")
    assert model.encode("  The   house\tis\nwonderful.  ") == base
    # leading dummy prefix: first piece carries the space marker
    assert model.id_to_piece(base[0]).startswith(S)


def test_unknown_characters_merge_to_single_unk():
    model, _ = _fixture_model()
    ids = model.encode("That is \U0001f600\U0001f601 good.")
    unk = model.unk_id
    assert ids.count(unk) == 1  # consecutive unknowns merge (spm behavior)
    pieces = [model.id_to_piece(i) for i in ids if i != unk]
    assert pieces[0] == S + "That"
    assert pieces[-1] == "."


def test_segmenter_prefers_whole_word_over_decompositions():
    """Remove the whole-word piece and the segmenter must fall back to the
    competitor decomposition — proving the goldens exercise real Viterbi
    choice, not a vocabulary where only one segmentation exists."""
    pieces = [(p, s, NORMAL if i is None or i > 2 else UNKNOWN)
              for p, s, i in _T5_SUBSET if p != S + "wonderful"]
    model = SentencePieceUnigramModel.from_bytes(build_model_proto(
        [(p, s, t) for p, s, t in pieces]))
    ids = model.encode("wonderful")
    assert [model.id_to_piece(i) for i in ids] == [S + "wonder", "ful"]
