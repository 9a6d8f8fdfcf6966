"""Stable-ordering bipartite matching: same merged-token selection and
values as the reference 'score' ordering, different (original) order."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_transformers_tokenmerge_tpu.ops.tome import (
    apply_merge,
    bipartite_soft_matching,
    merge_wavg,
)


@pytest.mark.parametrize("b,t,c,r", [(2, 10, 8, 3), (3, 25, 16, 7)])
def test_stable_is_permutation_of_score(b, t, c, r):
    key = jax.random.PRNGKey(0)
    metric = jax.random.normal(key, (b, t, c))
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, t, c))

    out_score = apply_merge(bipartite_soft_matching(metric, r), x)
    out_stable = apply_merge(
        bipartite_soft_matching(metric, r, ordering="stable"), x)

    assert out_score.shape == out_stable.shape == (b, t - r, c)
    # same multiset of token vectors, per batch element
    for bi in range(b):
        a = np.asarray(out_score[bi])
        s = np.asarray(out_stable[bi])
        a_sorted = a[np.lexsort(a.T)]
        s_sorted = s[np.lexsort(s.T)]
        np.testing.assert_allclose(a_sorted, s_sorted, rtol=1e-5, atol=1e-5)


def test_stable_unmerged_in_original_order():
    key = jax.random.PRNGKey(1)
    metric = jax.random.normal(key, (1, 12, 4))
    plan = bipartite_soft_matching(metric, 3, ordering="stable")
    unm = np.asarray(plan.unm_idx[0, :, 0])
    assert (np.diff(unm) > 0).all()  # strictly ascending = original order


def test_stable_size_conservation():
    key = jax.random.PRNGKey(2)
    metric = jax.random.normal(key, (2, 20, 8))
    x = jax.random.normal(jax.random.fold_in(key, 1), (2, 20, 8))
    plan = bipartite_soft_matching(metric, 6, ordering="stable")
    _, size = merge_wavg(plan, x)
    np.testing.assert_allclose(np.asarray(size.sum(axis=(1, 2))), 20.0,
                               rtol=1e-6)
