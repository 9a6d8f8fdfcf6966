"""Attention implementation selection + in-model flash equivalence
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from multi_modal_transformers_tokenmerge_tpu.models.octo import (
    _select_attention_fn,
)
from multi_modal_transformers_tokenmerge_tpu.core.config import (
    TransformerConfig,
)
from multi_modal_transformers_tokenmerge_tpu.sequence.layout import (
    SequenceLayout,
)

SHORT = SequenceLayout.from_strings(
    "[TaskDescriptionPrefix{16}] [Image{25};Readout{4}]*2")  # 74 tokens
LONG = SequenceLayout.from_strings(
    "[TaskDescriptionPrefix{16}] "
    "[Image{25};Image{25};Image{25};Image{25};Readout{4}]*3")  # 328 tokens


def test_auto_selects_xla_on_cpu():
    cfg = TransformerConfig(attention_impl="auto")
    assert _select_attention_fn(cfg, LONG) is None  # cpu backend in tests


def test_auto_respects_min_seq():
    cfg = TransformerConfig(attention_impl="auto", flash_min_seq=256)
    assert _select_attention_fn(cfg, SHORT) is None


def test_explicit_xla():
    assert _select_attention_fn(
        TransformerConfig(attention_impl="xla"), LONG) is None


def test_explicit_flash_with_weight_dropout():
    import pytest
    from multi_modal_transformers_tokenmerge_tpu.core.config import (
        AttentionConfig)
    # with the Pallas backward, the kernel applies attention-weight dropout
    # natively — selection must succeed
    cfg = TransformerConfig(attention_impl="flash",
                            flash_backward="pallas",
                            attention=AttentionConfig(dropout_rate=0.1))
    assert _select_attention_fn(cfg, SHORT) is not None
    # the XLA recompute backward cannot regenerate the kernel's dropout
    # masks; forcing it must fail loudly instead of dropping semantics
    cfg = TransformerConfig(attention_impl="flash", flash_backward="xla",
                            attention=AttentionConfig(dropout_rate=0.1))
    with pytest.raises(ValueError, match="dropout"):
        _select_attention_fn(cfg, SHORT)


def test_explicit_flash_returns_fn():
    from multi_modal_transformers_tokenmerge_tpu.core.config import (
        AttentionConfig)
    fn = _select_attention_fn(
        TransformerConfig(attention_impl="flash",
                          attention=AttentionConfig(dropout_rate=0.0)), SHORT)
    assert fn is not None
    # runs in interpret mode via flash_attention's interpret path
    from multi_modal_transformers_tokenmerge_tpu.ops.flash_attention import (
        flash_attention)
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 74, 2, 16))
    out = flash_attention(q, q, q, SHORT.attention_mask(), interpret=True)
    assert out.shape == q.shape
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()


def test_attention_fn_hook_dropout_contract():
    """A 4-arg hook works deterministically and with dropout_rate=0; with
    dropout CONFIGURED and training, a hook that cannot take dropout_rng
    fails loudly (never silently un-regularized), while a **kwargs hook
    receives the rng."""
    import jax
    import jax.numpy as jnp
    import pytest
    from multi_modal_transformers_tokenmerge_tpu.core.config import (
        AttentionConfig)
    from multi_modal_transformers_tokenmerge_tpu.modules.attention import (
        MultiHeadAttention)

    def hook(q, k, v, mask):
        return jax.nn.dot_product_attention(
            q, k, v, mask=None if mask is None else mask[None, None])

    x = jnp.ones((2, 8, 16))

    # deterministic pass: fine with any hook
    mha = MultiHeadAttention(
        AttentionConfig(num_heads=2, qkv_features=16, dropout_rate=0.5),
        attention_fn=hook)
    v = mha.init({"params": jax.random.PRNGKey(0)}, x)
    assert mha.apply(v, x, deterministic=True).shape == x.shape

    # training with configured dropout + incapable hook: loud error
    with pytest.raises(ValueError, match="dropout_rng"):
        mha.apply(v, x, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(1)})

    # a **kwargs hook receives the rng
    seen = {}

    def hook_kw(q, k, v, mask, **kw):
        seen.update(kw)
        return hook(q, k, v, mask)

    mha2 = MultiHeadAttention(
        AttentionConfig(num_heads=2, qkv_features=16, dropout_rate=0.5),
        attention_fn=hook_kw)
    v2 = mha2.init({"params": jax.random.PRNGKey(0)}, x)
    out = mha2.apply(v2, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    assert out.shape == x.shape and "dropout_rng" in seen


def test_final_norm_bounds_deep_stack_output():
    """Regression for the octo_deep training freeze: a deep pre-LN stack's
    residual stream grows unnormalized with depth and saturates the tanh
    action head (bf16 tanh gradient exactly 0).  cfg.final_norm must bound
    the output; default-off must keep the reference behavior."""
    from multi_modal_transformers_tokenmerge_tpu.core.config import (
        AttentionConfig)
    from multi_modal_transformers_tokenmerge_tpu.modules.attention import (
        TransformerStack)

    base = TransformerConfig(
        num_blocks=12,
        attention=AttentionConfig(num_heads=2, qkv_features=32,
                                  dropout_rate=0.0),
        mlp_dim=64, dropout_rate=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 32))

    def run(cfg):
        stack = TransformerStack(cfg)
        v = stack.init(jax.random.PRNGKey(1), x)
        return np.asarray(stack.apply(v, x), np.float32)

    out_raw = run(base)
    out_norm = run(base.replace(final_norm=True))
    std_raw = float(np.std(out_raw))
    std_norm = float(np.std(out_norm))
    assert std_raw > 2.0, std_raw          # unnormalized stream grows
    assert 0.5 < std_norm < 1.5, std_norm  # final LN bounds it
