"""Native T5 encoder vs HuggingFace FlaxT5EncoderModel (built from a local
T5Config — no hub access needed): identical parameters must give identical
outputs.  This validates the text tower the reference gets from HF
(reference: tokenizers/text/t5_base.py:8-15) is reproduced exactly by our
native stack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from multi_modal_transformers_tokenmerge_tpu.modules.t5 import T5EncoderStack

V, D, DKV, DFF, L, H, BUCKETS, MAXDIST = 64, 32, 8, 64, 2, 4, 8, 16


def _hf_model():
    cfg = transformers.T5Config(
        vocab_size=V, d_model=D, d_kv=DKV, d_ff=DFF, num_layers=L,
        num_heads=H, relative_attention_num_buckets=BUCKETS,
        relative_attention_max_distance=MAXDIST, dropout_rate=0.0)
    return transformers.FlaxT5EncoderModel(cfg, seed=0)


# HF->native mapping lives in the library:
# compat.convert_hf_t5_encoder_params (golden-tested here against HF)
from multi_modal_transformers_tokenmerge_tpu.compat import (  # noqa: E402
    convert_hf_t5_encoder_params)

# golden/fidelity/parallel suite: nightly lane (VERDICT r4 item 7)
pytestmark = pytest.mark.slow


def test_native_t5_matches_hf():
    hf = _hf_model()
    ids = (jnp.arange(10)[None] * 7) % V

    expected = np.asarray(hf(np.asarray(ids)).last_hidden_state)

    ours = T5EncoderStack(vocab_size=V, d_model=D, num_layers=L, num_heads=H,
                          d_kv=DKV, d_ff=DFF, rel_pos_buckets=BUCKETS,
                          rel_pos_max_distance=MAXDIST)
    params = convert_hf_t5_encoder_params(hf.params)
    out = np.asarray(ours.apply({"params": params}, ids))

    assert out.shape == expected.shape
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


def test_native_t5_batch_invariance():
    ours = T5EncoderStack(vocab_size=V, d_model=D, num_layers=L, num_heads=H,
                          d_kv=DKV, d_ff=DFF, rel_pos_buckets=BUCKETS,
                          rel_pos_max_distance=MAXDIST)
    ids = (jnp.arange(8)[None] * 3) % V
    v = ours.init(jax.random.PRNGKey(0), ids)
    single = ours.apply(v, ids)
    batched = ours.apply(v, jnp.concatenate([ids, ids], axis=0))
    np.testing.assert_allclose(np.asarray(batched[0]), np.asarray(single[0]),
                               rtol=1e-5, atol=1e-6)


def test_scan_unroll_equivalence():
    """scan_unroll is an execution knob: same params (stacked layout is
    unchanged), same math.  Full unroll must reproduce the scanned stack."""
    ids = jnp.asarray(np.random.default_rng(0).integers(0, V, (3, 10)),
                      dtype=jnp.int32)
    scanned = T5EncoderStack(vocab_size=V, d_model=D, num_layers=L,
                             num_heads=H, d_kv=DKV, d_ff=DFF,
                             rel_pos_buckets=BUCKETS,
                             rel_pos_max_distance=MAXDIST)
    unrolled = T5EncoderStack(vocab_size=V, d_model=D, num_layers=L,
                              num_heads=H, d_kv=DKV, d_ff=DFF,
                              rel_pos_buckets=BUCKETS,
                              rel_pos_max_distance=MAXDIST, scan_unroll=L)
    variables = scanned.init(jax.random.PRNGKey(0), ids)
    # identical param tree (unroll does not change the stacked layout)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        variables, unrolled.init(jax.random.PRNGKey(0), ids))
    a = scanned.apply(variables, ids)
    b = unrolled.apply(variables, ids)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)
