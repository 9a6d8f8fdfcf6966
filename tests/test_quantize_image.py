"""int8 PTQ image tower (serve/quantize.py): the quantized embedder must
track the float ImageTokenizer closely, and the ``*_with_modalities``
serving path must run end-to-end with it.  Serving approximation —
bounds are relative error / cosine similarity, not 1e-3 fidelity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo
from multi_modal_transformers_tokenmerge_tpu.serve.quantize import (
    int8_conv_hwcn,
    make_int8_image_embedder,
    quantize_conv_kernel,
)

from micro_configs import octo_micro


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = octo_micro()
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = jnp.ones((2, 4), jnp.int32)
    images = jax.random.uniform(keys[3], (2, 64, 64, 3)) * 255.0
    variables = model.init(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]}, text, images)
    return model, variables, text, images


def test_int8_conv_tracks_float():
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (16, 16, 8, 64))
    w = jax.random.normal(kw, (3, 3, 8, 16)) * 0.1
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("HWCN", "HWIO", "HWCN"))
    ref = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                       dimension_numbers=dn)
    out = int8_conv_hwcn(x, quantize_conv_kernel(w), (1, 1), "SAME")
    rel = (np.linalg.norm(np.asarray(out - ref))
           / np.linalg.norm(np.asarray(ref)))
    assert rel < 0.02, rel


@pytest.mark.parametrize("frames", [None, 2])
def test_int8_image_tower_tracks_float(model_and_vars, frames):
    model, variables, _, _ = model_and_vars
    shape = (2, 64, 64, 3) if frames is None else (2, frames, 64, 64, 3)
    images = jax.random.uniform(jax.random.PRNGKey(7), shape) * 255.0

    ref = model.apply(variables, images, train=False,
                      method=lambda m, im, train: m.image_encoder(im, train))
    got = make_int8_image_embedder(model, variables,
                                   dtype=jnp.float32)(images)
    assert got.shape == ref.shape
    ref = np.asarray(ref, np.float32)
    got = np.asarray(got, np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.05, rel
    cos = (got.ravel() @ ref.ravel()) / (
        np.linalg.norm(got) * np.linalg.norm(ref))
    assert cos > 0.998, cos


def test_with_modalities_end_to_end(model_and_vars):
    model, variables, text, images = model_and_vars
    text_emb = model.apply(variables, text, method="encode_text")
    img_emb = make_int8_image_embedder(model, variables)(images)

    act_q = model.apply(variables, text_emb, img_emb,
                        rngs={"diffusion": jax.random.PRNGKey(5)},
                        method="predict_diffusion_action_with_modalities")
    act_f = model.apply(variables, text, images,
                        rngs={"diffusion": jax.random.PRNGKey(5)},
                        method="predict_diffusion_action")
    assert act_q.shape == act_f.shape
    assert np.all(np.isfinite(np.asarray(act_q)))

    # the iterated random-init denoiser amplifies tower perturbations, so
    # the quantitative bound is on the READOUTS feeding the heads...
    ro_q = model.apply(variables, text_emb, img_emb,
                       method="generate_readouts_with_modalities")
    ro_f = model.apply(variables, text, images, method="generate_readouts")
    ro_q, ro_f = np.asarray(ro_q, np.float32), np.asarray(ro_f, np.float32)
    rel = np.linalg.norm(ro_q - ro_f) / np.linalg.norm(ro_f)
    assert rel < 0.05, rel

    # ... and on the deterministic continuous head's actions
    ca_q = model.apply(variables, text_emb, img_emb,
                       method=lambda m, te, ie:
                       m.continuous_action_head(
                           m.generate_readouts_with_modalities(te, ie)))
    ca_f = model.apply(variables, text, images,
                       method="predict_continuous_action")
    # random-init 8-channel micro net is the worst case for PTQ (no
    # central-limit averaging across channels); trained/base-width towers
    # measure tighter (see test_int8_image_tower_tracks_float's 5% rel)
    err = np.max(np.abs(np.asarray(ca_q - ca_f)))
    assert err < 0.1, err


def test_policy_engine_int8_tower(model_and_vars):
    from multi_modal_transformers_tokenmerge_tpu.serve.policy import (
        PolicyEngine,
    )
    model, variables, text, images = model_and_vars

    eng_f = PolicyEngine(model, variables, head="continuous", batch_size=2)
    eng_q = PolicyEngine(model, variables, head="continuous", batch_size=2,
                         image_tower="int8")
    a_f = np.asarray(eng_f(images, text_tokens=text))
    a_q = np.asarray(eng_q(images, text_tokens=text))
    assert a_q.shape == a_f.shape
    assert np.max(np.abs(a_q - a_f)) < 0.1

    # cached-instruction path agrees with the direct path (same tower)
    eng_q.set_instruction(text)
    cached = np.asarray(eng_q(images))
    np.testing.assert_allclose(cached, a_q, rtol=1e-5, atol=1e-5)

    # AOT path agrees with the jit path
    eng_aot = PolicyEngine(model, variables, head="continuous",
                           batch_size=2, image_tower="int8")
    eng_aot.compile((4,), (64, 64, 3))
    eng_aot.set_instruction(text)
    np.testing.assert_allclose(np.asarray(eng_aot(images)), cached,
                               rtol=1e-5, atol=1e-5)


def test_with_modalities_matches_with_text_float(model_and_vars):
    """The new method with the FLOAT image tower must agree exactly with
    the established with_text path (pure refactor equivalence)."""
    model, variables, text, images = model_and_vars
    text_emb = model.apply(variables, text, method="encode_text")
    img_emb = model.apply(
        variables, images, train=False,
        method=lambda m, im, train: m.image_encoder(im, train))

    a = model.apply(variables, text_emb, img_emb,
                    rngs={"diffusion": jax.random.PRNGKey(9)},
                    method="predict_diffusion_action_with_modalities")
    b = model.apply(variables, text_emb, images,
                    rngs={"diffusion": jax.random.PRNGKey(9)},
                    method="predict_diffusion_action_with_text")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=0, atol=1e-6)


@pytest.mark.parametrize("frames", [None, 2])
def test_w8_image_tower_tracks_float_tightly(model_and_vars, frames):
    """Weight-only int8 (image_embed_w8): no activation quantization, so
    the tower must track float to weight-rounding error — an order
    tighter than the int8 mirror's 5% bound."""
    from multi_modal_transformers_tokenmerge_tpu.serve.quantize import (
        make_w8_image_embedder,
    )
    model, variables, _, _ = model_and_vars
    shape = (2, 64, 64, 3) if frames is None else (2, frames, 64, 64, 3)
    images = jax.random.uniform(jax.random.PRNGKey(7), shape) * 255.0

    ref = model.apply(variables, images, train=False,
                      method=lambda m, im, train: m.image_encoder(im, train))
    got = make_w8_image_embedder(model, variables,
                                 dtype=jnp.float32)(images)
    assert got.shape == ref.shape
    ref = np.asarray(ref, np.float32)
    got = np.asarray(got, np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.01, rel


def test_policy_engine_w8_tower(model_and_vars):
    from multi_modal_transformers_tokenmerge_tpu.serve.policy import (
        PolicyEngine,
    )
    model, variables, text, images = model_and_vars

    eng_f = PolicyEngine(model, variables, head="continuous", batch_size=2)
    eng_w = PolicyEngine(model, variables, head="continuous", batch_size=2,
                         image_tower="w8")
    a_f = np.asarray(eng_f(images, text_tokens=text))
    a_w = np.asarray(eng_w(images, text_tokens=text))
    assert a_w.shape == a_f.shape
    # weight-only quantization sits much closer to float than the int8
    # tower's 0.1 action bound
    assert np.max(np.abs(a_w - a_f)) < 0.05, np.max(np.abs(a_w - a_f))

    # cached-instruction path agrees with the direct path (same tower)
    eng_w.set_instruction(text)
    cached = np.asarray(eng_w(images))
    np.testing.assert_allclose(cached, a_w, rtol=1e-5, atol=1e-5)


def test_w8_image_tower_threads_compute_dtype(model_and_vars):
    """Regression: image_embed_w8 must pass the caller's dtype into its
    conv/dense compute (an early version always computed in the bf16
    default, silently adding bf16 rounding for f32 models)."""
    from multi_modal_transformers_tokenmerge_tpu.serve.quantize import (
        make_w8_image_embedder,
    )
    model, variables, _, _ = model_and_vars
    images = jax.random.uniform(jax.random.PRNGKey(9), (2, 64, 64, 3)) * 255.0

    ref = np.asarray(model.apply(
        variables, images, train=False,
        method=lambda m, im, train: m.image_encoder(im, train)), np.float32)
    got32 = np.asarray(
        make_w8_image_embedder(model, variables, dtype=jnp.float32)(images),
        np.float32)
    gotbf = np.asarray(
        make_w8_image_embedder(model, variables, dtype=jnp.bfloat16)(images),
        np.float32)
    # dtype reaches the compute: the two settings must not be bit-identical
    assert np.any(got32 != gotbf)
    # and f32 compute tracks the (f32) float tower at least as tightly
    rel32 = np.linalg.norm(got32 - ref) / np.linalg.norm(ref)
    relbf = np.linalg.norm(gotbf - ref) / np.linalg.norm(ref)
    assert rel32 <= relbf, (rel32, relbf)
