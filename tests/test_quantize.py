"""int8 PTQ text tower: the quantized forward must track the float tower
closely (it is a serving approximation, not a fidelity path — the bound
here is cosine similarity + relative error, not 1e-3 equality)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_transformers_tokenmerge_tpu.modules.t5 import T5EncoderStack
from multi_modal_transformers_tokenmerge_tpu.serve.quantize import (
    int8_matmul,
    quantize_matrix,
    quantize_t5_params,
    t5_encode_int8,
)

B, T = 2, 16


def test_quantize_matrix_round_trip():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32)) * 0.1
    qt = quantize_matrix(w)
    assert qt.q.dtype == jnp.int8 and qt.scale.shape == (32,)
    deq = qt.q.astype(jnp.float32) * qt.scale
    err = np.max(np.abs(np.asarray(deq - w)))
    # max error is at most half an int8 step per column
    assert err <= float(np.max(np.asarray(qt.scale))) * 0.5 + 1e-7


def test_int8_matmul_tracks_float():
    key = jax.random.PRNGKey(1)
    a = jax.random.normal(key, (B, 24, 64))
    w = jax.random.normal(jax.random.PRNGKey(2), (64, 48)) * 0.05
    ref = a @ w
    out = int8_matmul(a, quantize_matrix(w))
    rel = np.linalg.norm(np.asarray(out - ref)) / np.linalg.norm(
        np.asarray(ref))
    assert rel < 0.02, rel


@pytest.fixture(scope="module")
def tower():
    stack = T5EncoderStack(vocab_size=128, d_model=64, num_layers=3,
                           num_heads=4, d_kv=16, d_ff=128,
                           rel_pos_buckets=8, rel_pos_max_distance=16)
    ids = (jnp.arange(B * T, dtype=jnp.int32).reshape(B, T) * 13) % 128
    params = stack.init(jax.random.PRNGKey(3), ids)["params"]
    return stack, params, ids


def test_t5_int8_tracks_float_tower(tower):
    stack, params, ids = tower
    ref = np.asarray(stack.apply({"params": params}, ids), dtype=np.float32)
    qp = quantize_t5_params(params)
    out = np.asarray(
        t5_encode_int8(qp, ids, rel_pos_buckets=8, rel_pos_max_distance=16,
                       dtype=jnp.float32), dtype=np.float32)
    assert out.shape == ref.shape
    cos = np.sum(out * ref) / (np.linalg.norm(out) * np.linalg.norm(ref))
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert cos > 0.999, cos
    assert rel < 0.05, rel


def test_int8_tower_jits_and_is_deterministic(tower):
    stack, params, ids = tower
    qp = quantize_t5_params(params)
    fn = jax.jit(lambda ids: t5_encode_int8(
        qp, ids, rel_pos_buckets=8, rel_pos_max_distance=16,
        dtype=jnp.float32))
    a, b = fn(ids), fn(ids)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_make_int8_text_encoder_serving_path():
    """Quantized tower slots in ahead of the *_with_text serving methods."""
    from multi_modal_transformers_tokenmerge_tpu.core.config import (
        TextEncoderConfig)
    from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo
    from multi_modal_transformers_tokenmerge_tpu.serve.quantize import (
        make_int8_text_encoder)

    from micro_configs import octo_micro

    cfg = octo_micro()
    cfg = cfg.replace(text=TextEncoderConfig(
        kind="t5", vocab_size=64, max_length=4, embedding_dim=32,
        t5_num_layers=2, t5_num_heads=2, t5_d_kv=16, t5_d_ff=64,
        t5_rel_pos_buckets=8, t5_rel_pos_max_distance=16))
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = jnp.ones((2, 4), dtype=jnp.int32)
    images = jnp.ones((2, 64, 64, 3))
    v = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]}, text, images)

    encode = make_int8_text_encoder(model, v, dtype=jnp.float32)
    emb_q = encode(text)
    emb_f = model.apply(v, text, method="encode_text")
    assert emb_q.shape == emb_f.shape

    a_q = model.apply(v, emb_q, images,
                      method="predict_continuous_action_with_text")
    a_f = model.apply(v, emb_f, images,
                      method="predict_continuous_action_with_text")
    # same action to serving tolerance
    np.testing.assert_allclose(np.asarray(a_q), np.asarray(a_f),
                               rtol=0.05, atol=0.02)

    with pytest.raises(ValueError, match="t5"):
        make_int8_text_encoder(Octo(octo_micro()), v)


def test_policy_engine_int8_text_tower():
    """PolicyEngine(text_tower='int8') routes instruction encoding through
    the quantized tower; actions must track the bf16 engine to serving
    tolerance, and non-t5 configs must be rejected."""
    from multi_modal_transformers_tokenmerge_tpu.core.config import (
        TextEncoderConfig)
    from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo
    from multi_modal_transformers_tokenmerge_tpu.serve.policy import (
        PolicyEngine)

    from micro_configs import octo_micro

    cfg = octo_micro()
    cfg = cfg.replace(text=TextEncoderConfig(
        kind="t5", vocab_size=64, max_length=4, embedding_dim=32,
        t5_num_layers=2, t5_num_heads=2, t5_d_kv=16, t5_d_ff=64,
        t5_rel_pos_buckets=8, t5_rel_pos_max_distance=16))
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = np.ones((1, 4), dtype=np.int32)
    images = jnp.ones((2, 64, 64, 3))
    v = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]},
        jnp.asarray(text), images[:1])

    eng_f = PolicyEngine(model, v, head="continuous", batch_size=2)
    eng_q = PolicyEngine(model, v, head="continuous", batch_size=2,
                         text_tower="int8")
    eng_f.set_instruction(text)
    eng_q.set_instruction(text)
    a_f = np.asarray(eng_f(images))
    a_q = np.asarray(eng_q(images))
    np.testing.assert_allclose(a_q, a_f, rtol=0.05, atol=0.02)

    # per-request instruction rows go through the int8 tower too
    row = eng_q.encode_instruction(text[0])
    assert row.shape == eng_f.encode_instruction(text[0]).shape

    with pytest.raises(ValueError, match="t5"):
        PolicyEngine(Octo(octo_micro()), v, head="continuous",
                     batch_size=2, text_tower="int8")
    with pytest.raises(ValueError, match="text_tower"):
        PolicyEngine(model, v, head="continuous", batch_size=2,
                     text_tower="fp8")


def test_t5_w8_tracks_float_tower_tightly(tower):
    """Weight-only mode: no activation quantization, so the w8 tower must
    sit an order closer to float than the int8 mirror's 5% bound."""
    stack, params, ids = tower
    ref = np.asarray(stack.apply({"params": params}, ids), dtype=np.float32)
    qp = quantize_t5_params(params)
    out = np.asarray(
        t5_encode_int8(qp, ids, rel_pos_buckets=8, rel_pos_max_distance=16,
                       dtype=jnp.float32, mode="w8"), dtype=np.float32)
    assert out.shape == ref.shape
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    # random-init width-32 micro tower is the PTQ worst case (no
    # central-limit averaging); trained/base-width towers measure tighter
    assert rel < 0.03, rel
    # and closer than the int8 output on the same inputs
    out8 = np.asarray(
        t5_encode_int8(qp, ids, rel_pos_buckets=8, rel_pos_max_distance=16,
                       dtype=jnp.float32), dtype=np.float32)
    rel8 = np.linalg.norm(out8 - ref) / np.linalg.norm(ref)
    assert rel < rel8, (rel, rel8)


def test_t5_encode_unknown_mode_rejected(tower):
    _, params, ids = tower
    qp = quantize_t5_params(params)
    with pytest.raises(ValueError, match="mode"):
        t5_encode_int8(qp, ids, rel_pos_buckets=8,
                       rel_pos_max_distance=16, mode="fp4")


def test_policy_engine_w8_text_tower():
    """PolicyEngine(text_tower='w8'): weight-only tower slots into
    instruction encoding and tracks the bf16 engine tighter than int8."""
    from multi_modal_transformers_tokenmerge_tpu.core.config import (
        TextEncoderConfig)
    from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo
    from multi_modal_transformers_tokenmerge_tpu.serve.policy import (
        PolicyEngine)

    from micro_configs import octo_micro

    cfg = octo_micro()
    cfg = cfg.replace(text=TextEncoderConfig(
        kind="t5", vocab_size=64, max_length=4, embedding_dim=32,
        t5_num_layers=2, t5_num_heads=2, t5_d_kv=16, t5_d_ff=64,
        t5_rel_pos_buckets=8, t5_rel_pos_max_distance=16))
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = np.ones((1, 4), dtype=np.int32)
    images = jnp.ones((2, 64, 64, 3))
    v = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]},
        jnp.asarray(text), images[:1])

    eng_f = PolicyEngine(model, v, head="continuous", batch_size=2)
    eng_w = PolicyEngine(model, v, head="continuous", batch_size=2,
                         text_tower="w8")
    eng_f.set_instruction(text)
    eng_w.set_instruction(text)
    a_f = np.asarray(eng_f(images))
    a_w = np.asarray(eng_w(images))
    np.testing.assert_allclose(a_w, a_f, rtol=0.02, atol=0.01)
