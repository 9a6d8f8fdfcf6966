"""Flash-attention kernel vs jnp reference attention (interpret mode on CPU;
the same kernel compiles on TPU via bench/serving paths)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_transformers_tokenmerge_tpu.ops.flash_attention import (
    flash_attention,
)
from multi_modal_transformers_tokenmerge_tpu.sequence.layout import (
    SequenceLayout,
)


def reference_attention(q, k, v, mask):
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d)
    logits = jnp.where(jnp.asarray(mask)[None, None], logits, -1e30)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v)


def _rand_qkv(key, b, s, h, d):
    ks = jax.random.split(key, 3)
    shape = (b, s, h, d)
    return (jax.random.normal(ks[0], shape), jax.random.normal(ks[1], shape),
            jax.random.normal(ks[2], shape))


@pytest.mark.parametrize("s,block", [(74, 128), (200, 128), (74, 32)])
def test_flash_matches_reference_octo_mask(s, block):
    if s == 74:
        mask = SequenceLayout.from_strings(
            "[TaskDescriptionPrefix{16}] [Image{25};Readout{4}]*2"
        ).attention_mask()
    else:
        rng = np.random.default_rng(0)
        mask = rng.random((s, s)) < 0.5
        mask |= np.eye(s, dtype=bool)  # every query has >=1 valid key
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), 2, s, 3, 64)

    out = flash_attention(q, k, v, mask, block_q=block, block_k=block,
                          interpret=True)
    ref = reference_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_flash_tile_skipping_correct():
    """Block-causal mask where late key tiles are dead for early q tiles —
    skipped tiles must not change the result."""
    s, block = 256, 64
    mask = np.tril(np.ones((s, s), dtype=bool))  # causal: prefix per q tile
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), 1, s, 2, 32)
    out = flash_attention(q, k, v, mask, block_q=block, block_k=block,
                          interpret=True)
    ref = reference_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_flash_bf16_inputs():
    mask = np.tril(np.ones((74, 74), dtype=bool))
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), 2, 74, 3, 64)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out = flash_attention(q, k, v, mask, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = reference_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                              v.astype(jnp.float32), mask)
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_flash_rejects_traced_mask():
    q, k, v = _rand_qkv(jax.random.PRNGKey(4), 1, 8, 1, 8)
    with pytest.raises(TypeError):
        flash_attention(q, k, v, jnp.ones((8, 8), dtype=bool))


def test_flash_gradients_match_xla(monkeypatch):
    """Custom-VJP backward (XLA recompute) == direct XLA attention grads.
    Uses interpret-capable path by running the vjp fns directly."""
    from multi_modal_transformers_tokenmerge_tpu.ops import flash_attention as fa

    mask = np.tril(np.ones((16, 16), dtype=bool))
    q, k, v = _rand_qkv(jax.random.PRNGKey(5), 2, 16, 2, 8)
    g = jax.random.normal(jax.random.PRNGKey(6), q.shape)

    mask_key = fa._register_mask(mask)
    grads = fa._flash_vjp_bwd(mask_key, 8, 8,
                              (q, k, v, jnp.asarray(mask)), g)

    def ref(q, k, v):
        return reference_attention(q, k, v, mask)

    _, vjp = jax.vjp(ref, q, k, v)
    expected = vjp(g)
    for a, b in zip(grads, expected):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


@pytest.mark.parametrize("s,bq,bk", [(40, 8, 8), (74, 16, 16)])
def test_native_backward_matches_xla(s, bq, bk):
    """Pallas dq/dkv kernels (interpret) vs autodiff through the XLA
    reference — exact to f32 tolerance, including non-prefix masks."""
    rng = np.random.default_rng(0)
    mask = rng.random((s, s)) < 0.5
    mask[np.arange(s), np.arange(s)] = True
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), 2, s, 3, 16)
    g = jax.random.normal(jax.random.PRNGKey(2), q.shape)

    _, vjp_p = jax.vjp(
        lambda a, b, c: flash_attention(a, b, c, mask, block_q=bq,
                                        block_k=bk, interpret=True,
                                        backward="pallas"), q, k, v)
    _, vjp_x = jax.vjp(lambda a, b, c: reference_attention(a, b, c, mask),
                       q, k, v)
    for got, want in zip(vjp_p(g), vjp_x(g)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)


def test_native_forward_lse_path_matches(s=74):
    mask = np.tril(np.ones((s, s), dtype=bool))
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), 1, s, 2, 16)
    a = flash_attention(q, k, v, mask, block_q=16, block_k=16,
                        interpret=True, backward="pallas")
    b = flash_attention(q, k, v, mask, block_q=16, block_k=16,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                               atol=1e-6)


def test_interior_fully_masked_rows_emit_zeros_and_zero_grads():
    """A query row whose mask forbids EVERY key — sitting inside a tile
    that other rows keep alive — must output zeros (not the unmasked mean
    of V) and contribute zero gradients, through both backward paths."""
    s = 16
    mask = np.tril(np.ones((s, s), dtype=bool))
    mask[5] = False  # dead row inside the live first tile
    q, k, v = _rand_qkv(jax.random.PRNGKey(8), 2, s, 2, 8)

    for backward in ("xla", "pallas"):
        out = flash_attention(q, k, v, mask, block_q=8, block_k=8,
                              interpret=True, backward=backward)
        np.testing.assert_array_equal(np.asarray(out)[:, 5], 0.0)

    # native backward: grads for q at the dead row are zero, and the mask's
    # dead row contributes nothing to dk/dv
    def loss(q_, k_, v_):
        return jnp.sum(flash_attention(q_, k_, v_, mask, block_q=8,
                                       block_k=8, interpret=True,
                                       backward="pallas") ** 2)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_array_equal(np.asarray(dq)[:, 5], 0.0)

    # xla-recompute backward: its reference is dead-row-aware, so its
    # grads agree with the kernel's zero-output semantics too (regression:
    # the plain softmax reference gave the dead row UNIFORM weights and
    # polluted dk/dv with 1/S contributions)
    from multi_modal_transformers_tokenmerge_tpu.ops import (
        flash_attention as fa)
    out = flash_attention(q, k, v, mask, block_q=8, block_k=8,
                          interpret=True, backward="pallas")
    mask_key = fa._register_mask(mask)
    g = 2.0 * out  # cotangent of sum(out**2)
    dq_x, dk_x, dv_x = fa._flash_vjp_bwd(mask_key, 8, 8,
                                         (q, k, v, jnp.asarray(mask)), g)
    np.testing.assert_allclose(np.asarray(dq_x), np.asarray(dq),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk_x), np.asarray(dk),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dv_x), np.asarray(dv),
                               rtol=1e-4, atol=1e-5)

    # the XLA softmax gives a dead row UNIFORM weights (exp(-1e30) ties);
    # the kernel's semantics zero it — compare against a dead-row-aware
    # reference that masks the row out of the loss
    live = jnp.asarray(mask.any(axis=1), jnp.float32)[None, :, None, None]

    def ref_loss(q_, k_, v_):
        return jnp.sum((reference_attention(q_, k_, v_, mask) * live) ** 2)

    ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip((dq, dk, dv), ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_flash_random_blocky_masks_property(seed):
    """Property sweep mirroring the ring-attention one: random block masks
    (occasional dead rows) through the interpret-mode kernel, forward and
    native backward, vs the dead-row-aware reference."""
    s = 32
    rng = np.random.default_rng(seed)
    mask = np.zeros((s, s), dtype=bool)
    edges = np.sort(rng.choice(np.arange(4, s - 4), size=2, replace=False))
    blocks = np.split(np.arange(s), edges)
    for bi, rows in enumerate(blocks):
        for bj, cols in enumerate(blocks):
            if bj <= bi and rng.random() < 0.8:
                mask[np.ix_(rows, cols)] = True
    mask[rng.choice(s, size=2, replace=False)] = False

    q, k, v = _rand_qkv(jax.random.PRNGKey(seed + 20), 2, s, 2, 8)
    out = flash_attention(q, k, v, mask, block_q=8, block_k=8,
                          interpret=True, backward="pallas")
    live_rows = mask.any(axis=1)
    live = jnp.asarray(live_rows, jnp.float32)[None, :, None, None]
    ref = reference_attention(q, k, v, mask) * live
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    g_ours = jax.grad(lambda q_, k_, v_: jnp.sum(flash_attention(
        q_, k_, v_, mask, block_q=8, block_k=8, interpret=True,
        backward="pallas") ** 2), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(lambda q_, k_, v_: jnp.sum(
        (reference_attention(q_, k_, v_, mask) * live) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
