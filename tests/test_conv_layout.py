"""Embedder conv-layout equivalence: the batch-in-lanes (HWCN) path must
be a pure physical-layout change — identical parameter structure and
numerics to the flax-standard NHWC path, for both GroupNorm stats scopes,
forward AND gradients (docs/KERNELS.md 'Patch embedder' section)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_transformers_tokenmerge_tpu.core.config import (
    ResNetEmbedderConfig)
from multi_modal_transformers_tokenmerge_tpu.modules.image_tokenizer import (
    ResNetV2Embedder)

# golden/fidelity/parallel suite: nightly lane (VERDICT r4 item 7)
pytestmark = pytest.mark.slow


def _pair(scope):
    return (ResNetEmbedderConfig(norm_stats_scope=scope, conv_layout="hwcn"),
            ResNetEmbedderConfig(norm_stats_scope=scope, conv_layout="nhwc"))


@pytest.mark.parametrize("scope", ["image", "patch"])
def test_param_structure_identical(scope):
    cfg_h, cfg_n = _pair(scope)
    x = jnp.ones((2, 6, 56, 56, 3))
    v_h = ResNetV2Embedder(cfg_h).init(jax.random.PRNGKey(1), x)
    v_n = ResNetV2Embedder(cfg_n).init(jax.random.PRNGKey(1), x)
    assert jax.tree.structure(v_h) == jax.tree.structure(v_n)
    shapes_match = jax.tree.map(lambda a, b: a.shape == b.shape, v_h, v_n)
    assert all(jax.tree.leaves(shapes_match))


@pytest.mark.parametrize("scope", ["image", "patch"])
def test_forward_numerically_equal(scope):
    cfg_h, cfg_n = _pair(scope)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 56, 56, 3))
    m_h, m_n = ResNetV2Embedder(cfg_h), ResNetV2Embedder(cfg_n)
    v = m_n.init(jax.random.PRNGKey(1), x)  # same params drive both
    y_n = m_n.apply(v, x)
    y_h = m_h.apply(v, x)
    np.testing.assert_allclose(np.asarray(y_h), np.asarray(y_n),
                               rtol=2e-5, atol=2e-4)


def test_gradients_numerically_equal():
    cfg_h, cfg_n = _pair("image")
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 56, 56, 3))
    m_h, m_n = ResNetV2Embedder(cfg_h), ResNetV2Embedder(cfg_n)
    v = m_n.init(jax.random.PRNGKey(1), x)

    def loss(params, model):
        return jnp.mean(jnp.square(model.apply({"params": params}, x)))

    g_n = jax.grad(loss)(v["params"], m_n)
    g_h = jax.grad(loss)(v["params"], m_h)
    leaves_h = {jax.tree_util.keystr(p): g for p, g in
                jax.tree_util.tree_leaves_with_path(g_h)}
    leaves_n = {jax.tree_util.keystr(p): g for p, g in
                jax.tree_util.tree_leaves_with_path(g_n)}
    assert leaves_h.keys() == leaves_n.keys()
    for key in leaves_n:
        gn, gh = np.asarray(leaves_n[key]), np.asarray(leaves_h[key])
        scale = max(float(np.abs(gn).max()), 1e-8)
        np.testing.assert_allclose(
            gh, gn, rtol=5e-4, atol=5e-4 * scale,
            err_msg=f"gradient mismatch at {key}")


def test_smaller_features_and_blocks():
    """Non-default widths (octo_tiny: features=32) and block counts."""
    cfg_h = ResNetEmbedderConfig(features=32, num_blocks=1,
                                 group_norm_groups=32, output_features=128,
                                 conv_layout="hwcn")
    cfg_n = cfg_h.replace(conv_layout="nhwc")
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 2, 56, 56, 3))
    v = ResNetV2Embedder(cfg_n).init(jax.random.PRNGKey(1), x)
    y_n = ResNetV2Embedder(cfg_n).apply(v, x)
    y_h = ResNetV2Embedder(cfg_h).apply(v, x)
    assert y_h.shape == (2, 2, 128)
    np.testing.assert_allclose(np.asarray(y_h), np.asarray(y_n),
                               rtol=2e-5, atol=2e-4)


def test_unknown_layout_raises():
    cfg = ResNetEmbedderConfig(conv_layout="nchw")
    with pytest.raises(ValueError, match="conv_layout"):
        ResNetV2Embedder(cfg).init(
            jax.random.PRNGKey(0), jnp.ones((1, 2, 56, 56, 3)))


def test_s2d_wgrad_custom_vjp_matches_direct_autodiff():
    """_strided_conv_hwcn (s2d weight-gradient reformulation, kept for
    wgrad-dominated regimes) must match direct conv autodiff exactly."""
    from multi_modal_transformers_tokenmerge_tpu.modules.image_tokenizer import (
        _conv_hwcn_raw, _strided_conv_hwcn)

    x = jax.random.normal(jax.random.PRNGKey(0), (16, 16, 3, 32))
    w = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 3, 8)) * 0.1
    g = jax.random.normal(jax.random.PRNGKey(2), (7, 7, 8, 32))

    y_ref = _conv_hwcn_raw(x, w, (2, 2), "VALID")
    y_new = _strided_conv_hwcn(x, w, (2, 2))
    np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)

    _, vjp_ref = jax.vjp(lambda x_, w_: _conv_hwcn_raw(x_, w_, (2, 2),
                                                       "VALID"), x, w)
    _, vjp_new = jax.vjp(lambda x_, w_: _strided_conv_hwcn(x_, w_, (2, 2)),
                         x, w)
    for a, b in zip(vjp_new(g), vjp_ref(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_group_norm_hwcn_no_nan_on_large_constant_groups():
    """Regression (review r3): the fast-variance formula must clamp at
    zero like flax — near-constant large-magnitude groups drive
    E[x^2]-mu^2 negative past epsilon and rsqrt would emit NaN."""
    cfg_h, cfg_n = _pair("image")
    # constant 1000.0 activations: worst-case cancellation
    x = jnp.full((1, 4, 56, 56, 3), 1000.0)
    v = ResNetV2Embedder(cfg_n).init(jax.random.PRNGKey(0), x)
    y_h = ResNetV2Embedder(cfg_h).apply(v, x)
    y_n = ResNetV2Embedder(cfg_n).apply(v, x)
    assert np.isfinite(np.asarray(y_h)).all()
    assert np.isfinite(np.asarray(y_n)).all()
