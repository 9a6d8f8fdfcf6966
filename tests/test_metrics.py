"""Generalized metric collections (VERDICT r2 item 7): named average/sum
metrics, clu-style merge, donation-safe fixed treedef.

Reference counterpart: clu OCTOMetrics collection
(/root/reference/multi_modal_transformers/models/octo/octo.py:322-324).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_transformers_tokenmerge_tpu.train.state import Metrics


def test_default_declaration_matches_round2_behavior():
    m = Metrics.empty()
    m = m.update(2.0, 4.0)          # positional (loss, grad_norm) compat
    m = m.update(loss=4.0, grad_norm=0.0)
    out = jax.device_get(m.compute())
    assert out["loss"] == pytest.approx(3.0)
    assert out["grad_norm"] == pytest.approx(2.0)


def test_named_declaration_avg_and_sum():
    m = Metrics.empty(l2="avg", tokens="sum", diffusion_loss="avg")
    m = m.update(l2=1.0, tokens=128.0, diffusion_loss=0.5)
    m = m.update(l2=3.0, tokens=128.0, diffusion_loss=1.5)
    out = jax.device_get(m.compute())
    assert out["l2"] == pytest.approx(2.0)
    assert out["tokens"] == pytest.approx(256.0)  # sum, not averaged
    assert out["diffusion_loss"] == pytest.approx(1.0)


def test_partial_update_keeps_other_accumulators():
    m = Metrics.empty(a="avg", b="sum")
    m = m.update(a=2.0, b=1.0)
    m = m.update(a=4.0)             # b missing: accumulator unchanged
    out = jax.device_get(m.compute())
    assert out["a"] == pytest.approx(3.0)
    assert out["b"] == pytest.approx(1.0)


def test_unknown_metric_raises():
    m = Metrics.empty(a="avg")
    with pytest.raises(KeyError, match="not declared"):
        m.update(nope=1.0)


def test_bad_kind_raises():
    with pytest.raises(ValueError, match="'avg' or 'sum'"):
        Metrics.empty(x="mean")


def test_merge_across_collections():
    a = Metrics.empty(loss="avg", n="sum").update(loss=1.0, n=10.0)
    b = Metrics.empty(loss="avg", n="sum").update(loss=3.0, n=20.0)
    out = jax.device_get(a.merge(b).compute())
    assert out["loss"] == pytest.approx(2.0)
    assert out["n"] == pytest.approx(30.0)


def test_merge_rejects_mismatched_declarations():
    with pytest.raises(ValueError, match="different declarations"):
        Metrics.empty(a="avg").merge(Metrics.empty(b="avg"))


def test_zeros_like_preserves_treedef():
    m = Metrics.empty(x="avg", y="sum").update(x=1.0, y=2.0)
    z = m.zeros_like()
    assert jax.tree.structure(m) == jax.tree.structure(z)
    assert all(np.asarray(v) == 0.0 for v in jax.tree.leaves(z))


def test_update_inside_jit_donation_safe():
    """Same declaration -> same treedef -> one compile; works donated."""
    m = Metrics.empty(loss="avg", seen="sum")

    @jax.jit
    def step(m, x):
        return m.update(loss=x, seen=jnp.float32(8.0))

    for i in range(3):
        m = step(m, jnp.float32(i))
    out = jax.device_get(m.compute())
    assert out["loss"] == pytest.approx(1.0)
    assert out["seen"] == pytest.approx(24.0)


def test_custom_declaration_works_with_standard_train_step():
    """Regression (code-review r3): a collection without the default
    loss/grad_norm names must not crash make_train_step's metric feed."""
    import optax
    from multi_modal_transformers_tokenmerge_tpu.train.state import (
        create_train_state)
    from multi_modal_transformers_tokenmerge_tpu.train.steps import (
        make_train_step)
    from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from micro_configs import octo_micro

    cfg = octo_micro()
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = jnp.ones((4, 4), jnp.int32)
    images = jnp.zeros((4, 64, 64, 3))
    variables = model.init(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]}, text, images)
    actions = jnp.full((4, 4), 0.3)
    state = create_train_state(
        model, variables, optax.adam(1e-3),
        rngs={"dropout": keys[2], "patch_encoding": keys[1]},
        metrics=Metrics.empty(loss="avg", seen="sum"))  # no grad_norm
    step = make_train_step("continuous")
    state, loss = step(state, text, images, actions)
    out = jax.device_get(state.metrics.compute())
    assert out["loss"] == pytest.approx(float(loss))
    assert out["seen"] == 0.0  # declared but unfed: untouched


def test_two_update_calls_do_not_skew_each_other():
    """Regression (review r3): counts are per metric, so feeding different
    metrics in separate update() calls (e.g. the standard step + a user
    wrapper) must not halve anyone's average."""
    m = Metrics.empty(loss="avg", aux="avg")
    for i in range(4):
        m = m.update(loss=2.0)   # the built-in step's feed
        m = m.update(aux=6.0)    # a custom wrapper's separate feed
    out = jax.device_get(m.compute())
    assert out["loss"] == pytest.approx(2.0)
    assert out["aux"] == pytest.approx(6.0)
