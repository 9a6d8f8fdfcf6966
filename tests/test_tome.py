"""Golden tests: our ToMe (one-hot-scatter merge) vs the reference's
serial-loop implementation executed directly
(reference: tokenizers/token_compression.py:54-129).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_transformers_tokenmerge_tpu.ops.pruning import (
    prune_gather,
    topk_tokens_per_set,
)
from multi_modal_transformers_tokenmerge_tpu.ops.tome import (
    apply_merge,
    bipartite_soft_matching,
    merge_wavg,
)

from ref_loader import load_ref_token_compression


@pytest.mark.parametrize("b,t,c,r", [(2, 10, 8, 3), (1, 25, 16, 5),
                                     (4, 50, 64, 12), (3, 9, 4, 2)])
def test_merge_matches_reference(b, t, c, r):
    ref = load_ref_token_compression()
    key = jax.random.PRNGKey(42)
    metric = jax.random.normal(key, (b, t, c))
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, t, c))

    ref_merge = ref.bipartite_soft_matching(metric, r)
    ref_out = ref_merge(x, mode="sum")

    plan = bipartite_soft_matching(metric, r)
    ours = apply_merge(plan, x, mode="sum")

    assert ours.shape == (b, t - r, c)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("b,t,c,r", [(2, 10, 8, 3), (4, 50, 64, 12)])
def test_merge_wavg_matches_reference(b, t, c, r):
    ref = load_ref_token_compression()
    key = jax.random.PRNGKey(7)
    metric = jax.random.normal(key, (b, t, c))
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, t, c))

    ref_merge = ref.bipartite_soft_matching(metric, r)
    ref_x, ref_size = ref.merge_wavg(ref_merge, x)

    plan = bipartite_soft_matching(metric, r)
    our_x, our_size = merge_wavg(plan, x)

    np.testing.assert_allclose(np.asarray(our_x), np.asarray(ref_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(our_size), np.asarray(ref_size),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("class_token,distill_token",
                         [(True, False), (False, True), (True, True)])
def test_merge_protected_tokens_match_reference(class_token, distill_token):
    """class/distill-token protection AND the distill interleaved output
    order (reference concat [unm[:1], dst[:1], unm[1:], dst[1:]],
    token_compression.py:103-105) must match the reference exactly."""
    ref = load_ref_token_compression()
    b, t, c, r = 2, 12, 8, 3
    key = jax.random.PRNGKey(11)
    metric = jax.random.normal(key, (b, t, c))
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, t, c))

    ref_merge = ref.bipartite_soft_matching(
        metric, r, class_token=class_token, distill_token=distill_token)
    ref_out = ref_merge(x, mode="sum")

    plan = bipartite_soft_matching(metric, r, class_token=class_token,
                                   distill_token=distill_token)
    ours = apply_merge(plan, x, mode="sum")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-5)


def test_merge_size_conservation():
    """Total token 'mass' is conserved by weighted merging."""
    key = jax.random.PRNGKey(0)
    metric = jax.random.normal(key, (2, 20, 8))
    x = jax.random.normal(jax.random.fold_in(key, 1), (2, 20, 8))
    plan = bipartite_soft_matching(metric, 6)
    _, size = merge_wavg(plan, x)
    np.testing.assert_allclose(np.asarray(size.sum(axis=(1, 2))), 20.0,
                               rtol=1e-6)


def test_merge_r_zero_is_identity():
    x = jnp.ones((2, 6, 4))
    assert bipartite_soft_matching(x, 0) is None
    np.testing.assert_array_equal(np.asarray(apply_merge(None, x)),
                                  np.asarray(x))


def test_merge_r_too_large_raises():
    x = jnp.ones((2, 6, 4))
    with pytest.raises(ValueError):
        bipartite_soft_matching(x, 4)  # max is 6//2 = 3


def test_merge_is_jittable_with_static_shapes():
    @jax.jit
    def f(metric, x):
        plan = bipartite_soft_matching(metric, 3)
        return apply_merge(plan, x)

    key = jax.random.PRNGKey(3)
    out = f(jax.random.normal(key, (2, 10, 8)),
            jax.random.normal(key, (2, 10, 8)))
    assert out.shape == (2, 7, 8)


# --- pruning -------------------------------------------------------------

def test_topk_per_set_matches_reference():
    """Our per-set top-k against the reference compute_top_k_tokens
    (token_compression.py:15-46)."""
    ref = load_ref_token_compression()
    key = jax.random.PRNGKey(0)
    b, t, c = 3, 40, 16
    x = jax.random.normal(key, (b, t, c))
    importance = jax.random.normal(jax.random.fold_in(key, 1), (b, t))

    set_slices = ((0, 20), (20, 10), (30, 10))
    keep = (18, 8, 10)

    ref_out = jax.vmap(
        lambda e, s: ref.compute_top_k_tokens(e, s, set_slices, keep),
        in_axes=(0, 0))(x, importance)

    keep_idx = topk_tokens_per_set(importance, set_slices, keep,
                                   sort_kept=False)
    ours = prune_gather(x, keep_idx)

    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref_out),
                               rtol=1e-6)


def test_topk_keep_all_is_identity_order():
    importance = jnp.asarray(np.random.default_rng(0).normal(size=(2, 10)))
    idx = topk_tokens_per_set(importance, ((0, 10),), (10,))
    # keep == size short-circuits to identity order (no top_k reorder)
    np.testing.assert_array_equal(np.asarray(idx[0]), np.arange(10))


def test_topk_sort_kept_preserves_relative_order():
    importance = jnp.asarray([[5.0, 1.0, 4.0, 2.0, 3.0]])
    idx = topk_tokens_per_set(importance, ((0, 5),), (3,), sort_kept=True)
    np.testing.assert_array_equal(np.asarray(idx[0]), [0, 2, 4])
