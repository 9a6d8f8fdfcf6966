"""Pallas max-pool backward kernel (ops/pool.py) vs XLA's
select_and_scatter VJP — elementwise equality including first-match tie
routing on tie-heavy data.

Runs in interpret mode on CPU; the same kernel is exercised compiled on
hardware by the TPU lane (benchmarks/tpu_lane.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_transformers_tokenmerge_tpu.core.config import (
    ResNetEmbedderConfig,
)
from multi_modal_transformers_tokenmerge_tpu.modules.image_tokenizer import (
    ResNetV2Embedder,
)
from multi_modal_transformers_tokenmerge_tpu.ops.pool import max_pool_hwcn


INTERPRET = jax.default_backend() != "tpu"


def _xla_pool(x, window=(3, 3), strides=(1, 1)):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (*window, 1, 1), (*strides, 1, 1),
        "VALID")


def _grads(pool_fn, x, g):
    _, vjp = jax.vjp(pool_fn, x)
    return vjp(g)[0]


CASES = [
    # (H, W, C, N, window, dtype) — includes ragged C and N blocks
    (9, 9, 16, 128, (3, 3), jnp.float32),
    (9, 9, 16, 130, (3, 3), jnp.bfloat16),
    (7, 6, 24, 100, (3, 3), jnp.float32),
    (8, 8, 8, 64, (2, 2), jnp.bfloat16),
    (5, 5, 16, 128, (4, 2), jnp.float32),
]


@pytest.mark.parametrize("h,w,c,n,window,dtype", CASES)
def test_pool_bwd_routing_exact(h, w, c, n, window, dtype):
    """Integer-valued cotangents make every per-position sum exactly
    representable, so any tie-routing difference vs XLA's
    select_and_scatter shows up as a mismatch >= 1 (float summation
    order cannot hide it)."""
    key = jax.random.PRNGKey(0)
    kx, kg = jax.random.split(key)
    # quantize to few distinct values -> many exact ties inside windows
    x = jnp.round(jax.random.normal(kx, (h, w, c, n)) * 2.0) / 2.0
    x = x.astype(dtype)
    oh, ow = h - window[0] + 1, w - window[1] + 1
    # small integers: sums of <= 9 of them are exact even in bf16
    g = jnp.asarray(
        jax.random.randint(kg, (oh, ow, c, n), 1, 17), dtype)

    ours = _grads(
        lambda v: max_pool_hwcn(v, window, interpret=INTERPRET), x, g)
    ref = _grads(lambda v: _xla_pool(v, window), x, g)
    np.testing.assert_array_equal(np.asarray(ours, np.float32),
                                  np.asarray(ref, np.float32))


@pytest.mark.parametrize("h,w,c,n,window,dtype", CASES)
def test_pool_bwd_matches_xla_float(h, w, c, n, window, dtype):
    """Real-valued cotangents: equal up to summation order (a position
    can receive up to wh*ww contributions; ours and XLA's accumulate in
    different orders)."""
    key = jax.random.PRNGKey(0)
    kx, kg = jax.random.split(key)
    x = jnp.round(jax.random.normal(kx, (h, w, c, n)) * 2.0) / 2.0
    x = x.astype(dtype)
    oh, ow = h - window[0] + 1, w - window[1] + 1
    g = jax.random.normal(kg, (oh, ow, c, n)).astype(dtype)

    ours = _grads(
        lambda v: max_pool_hwcn(v, window, interpret=INTERPRET), x, g)
    ref = _grads(lambda v: _xla_pool(v, window), x, g)
    tol = 2e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(ours, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0, atol=tol * window[0] * window[1])


def test_pool_bwd_constant_input_ties():
    # every window is a 9-way tie: the full gradient must land on each
    # window's raster-order-first element
    x = jnp.ones((6, 6, 16, 128), jnp.float32)
    g = jnp.ones((4, 4, 16, 128), jnp.float32)
    ours = _grads(lambda v: max_pool_hwcn(v, (3, 3), interpret=INTERPRET), x, g)
    ref = _grads(lambda v: _xla_pool(v, (3, 3)), x, g)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))
    # first-match: position (0,0) collects exactly its covering windows
    assert float(ours[0, 0, 0, 0]) == 1.0
    assert float(ours[5, 5, 0, 0]) == 0.0


def test_pool_forward_unchanged():
    x = jax.random.normal(jax.random.PRNGKey(1), (9, 9, 16, 128))
    np.testing.assert_array_equal(
        np.asarray(max_pool_hwcn(x, (3, 3), interpret=INTERPRET)),
        np.asarray(_xla_pool(x)))


def test_pool_stride_fallback():
    # stride != 1 silently uses the XLA path (value + grad still correct)
    x = jax.random.normal(jax.random.PRNGKey(2), (9, 9, 16, 128))
    g = jnp.ones((4, 4, 16, 128))
    got = max_pool_hwcn(x, (3, 3), (2, 2), vjp="pallas")
    want = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (3, 3, 1, 1), (2, 2, 1, 1), "VALID")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    ours = _grads(lambda v: max_pool_hwcn(v, (3, 3), (2, 2),
                                          vjp="pallas"), x, g)
    ref = _grads(
        lambda v: jax.lax.reduce_window(
            v, -jnp.inf, jax.lax.max, (3, 3, 1, 1), (2, 2, 1, 1),
            "VALID"), x, g)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_embedder_grads_pool_vjp_parity():
    """Whole-embedder gradients identical between pool_vjp settings."""
    cfg = ResNetEmbedderConfig(num_blocks=1, features=16,
                               input_kernel=(4, 4), input_stride=(2, 2),
                               pool_window=(3, 3), pool_stride=(1, 1),
                               group_norm_groups=4, output_features=32)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 9, 12, 12, 3))

    def loss(params, pool_vjp):
        m = ResNetV2Embedder(cfg.replace(pool_vjp=pool_vjp))
        return jnp.sum(m.apply({"params": params}, x) ** 2)

    params = ResNetV2Embedder(cfg).init(jax.random.PRNGKey(4), x)["params"]
    g_xla = jax.grad(loss)(params, "xla")
    g_pal = jax.grad(loss)(params, "pallas")
    # up-to-summation-order equality (see test_pool_bwd_matches_xla_float)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        g_xla, g_pal)
