"""SentencePiece unigram loader: wire-format round-trip, Viterbi
segmentation, T5 calling convention, and string-instruction serving
(closes the reference's raw-instruction tokenization path,
reference: models/octo/octo.py:402-409)."""

import numpy as np
import pytest

from multi_modal_transformers_tokenmerge_tpu.utils.spm import (
    CONTROL,
    NORMAL,
    UNKNOWN,
    SentencePieceUnigramModel,
    T5StyleTokenizer,
    build_model_proto,
)

# t5-style layout: pad=0, </s>=1, <unk>=2, then vocabulary
PIECES = [
    ("<pad>", 0.0, CONTROL),
    ("</s>", 0.0, CONTROL),
    ("<unk>", -10.0, UNKNOWN),
    ("▁", -2.0, NORMAL),
    ("▁pick", -3.0, NORMAL),
    ("▁up", -3.1, NORMAL),
    ("▁the", -2.5, NORMAL),
    ("▁red", -3.5, NORMAL),
    ("▁block", -3.6, NORMAL),
    ("▁b", -5.0, NORMAL),
    ("lock", -5.5, NORMAL),
    ("p", -6.0, NORMAL),
    ("i", -6.0, NORMAL),
    ("ck", -6.5, NORMAL),
    ("▁pi", -6.0, NORMAL),
]


@pytest.fixture(scope="module")
def model():
    return SentencePieceUnigramModel.from_bytes(build_model_proto(PIECES))


def test_proto_round_trip(model):
    assert model.pieces == [p for p, _, _ in PIECES]
    np.testing.assert_allclose(model.scores, [s for _, s, _ in PIECES],
                               atol=1e-6)
    assert model.types == [t for _, _, t in PIECES]
    assert model.unk_id == 2
    assert model.piece_to_id("▁block") == 8
    assert model.id_to_piece(6) == "▁the"


def test_viterbi_prefers_max_score_segmentation(model):
    # "▁pick" (-3.0) must beat "▁pi"+"ck" (-12.5) and "▁b"... splits
    assert model.encode("pick") == [model.piece_to_id("▁pick")]
    assert model.encode("pick up the red block") == [
        model.piece_to_id(p)
        for p in ["▁pick", "▁up", "▁the", "▁red", "▁block"]]
    # forced split: "blocklock" -> ▁block + lock
    assert model.encode("blocklock") == [
        model.piece_to_id("▁block"), model.piece_to_id("lock")]


def test_unknown_chars_fall_back_to_merged_unk(model):
    ids = model.encode("pick zzz")
    # "▁pick" then "▁" then three unknown chars merged into ONE unk
    assert ids == [model.piece_to_id("▁pick"), model.piece_to_id("▁"),
                   model.unk_id]


def test_normalization_collapses_whitespace_and_nfkc(model):
    assert model.encode("  pick   up ") == model.encode("pick up")
    # NFKC: fullwidth latin -> ascii
    assert model.encode("ｐick") == model.encode("pick")


def test_decode_round_trip(model):
    ids = model.encode("pick up the red block")
    assert model.decode(ids) == "pick up the red block"


def test_t5_style_tokenizer_convention(model):
    tok = T5StyleTokenizer(model, max_length=8)
    out = tok(["pick up", "pick up the red block"])
    assert out.shape == (2, 8) and out.dtype == np.int32
    # eos after last piece, pad to the end
    row = list(out[0])
    eos_pos = row.index(tok.eos_id)
    assert all(v == tok.pad_id for v in row[eos_pos + 1:])
    # truncation keeps room for eos
    tok2 = T5StyleTokenizer(model, max_length=3)
    row2 = list(tok2("pick up the red block")[0])
    assert len(row2) == 3 and row2[-1] == tok2.eos_id


def test_t5_style_tokenizer_requires_eos_piece():
    """A model without '</s>' must be rejected at construction —
    piece_to_id's unk fallback would otherwise terminate every encoded
    instruction with a wrong id, silently (review finding)."""
    no_eos = SentencePieceUnigramModel.from_bytes(build_model_proto(
        [("<pad>", 0.0, CONTROL), ("<unk>", 0.0, UNKNOWN),
         ("▁pick", -2.0, NORMAL)]))
    with pytest.raises(ValueError, match="</s>"):
        T5StyleTokenizer(no_eos, max_length=8)


def test_policy_engine_accepts_string_instructions(tmp_path):
    """End-to-end: raw string -> local spm model -> cached instruction ->
    action, through the serving engine."""
    import jax
    import jax.numpy as jnp

    from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo
    from multi_modal_transformers_tokenmerge_tpu.serve.policy import (
        PolicyEngine)

    from micro_configs import octo_micro

    blob = build_model_proto(PIECES)
    path = tmp_path / "t5_test.model"
    path.write_bytes(blob)
    tok = T5StyleTokenizer(str(path), max_length=4)

    cfg = octo_micro()
    cfg = cfg.replace(text=cfg.text.replace(vocab_size=tok.vocab_size))
    m = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = jnp.asarray(tok(["pick up"] * 2))
    images = jnp.ones((2, 64, 64, 3))
    v = jax.jit(m.init)({"params": keys[0], "patch_encoding": keys[1],
                         "dropout": keys[2], "diffusion": keys[3]},
                        text, images)

    eng = PolicyEngine(m, v, head="continuous", batch_size=2, tokenizer=tok)
    eng.set_instruction("pick up the red block")
    a1 = eng(images)
    a2 = eng(images, text_tokens="pick up the red block")
    assert a1.shape == a2.shape == (2, 1, 4)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)

    with pytest.raises(ValueError, match="no tokenizer"):
        PolicyEngine(m, v, head="continuous",
                     batch_size=2).set_instruction("pick up")
