"""Optimizer toolkit and micro-batching policy server tests."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo
from multi_modal_transformers_tokenmerge_tpu.serve.policy import PolicyEngine
from multi_modal_transformers_tokenmerge_tpu.serve.server import PolicyServer
from multi_modal_transformers_tokenmerge_tpu.train.optim import (
    decay_mask,
    make_optimizer,
    mask_frozen,
    trainable_mask,
    warmup_cosine_schedule,
)

from micro_configs import octo_micro


def test_warmup_cosine_shape():
    sched = warmup_cosine_schedule(1e-3, warmup_steps=10, total_steps=100)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(10)) - 1e-3) < 1e-9
    assert float(sched(100)) < float(sched(50)) < float(sched(10))
    assert float(sched(100)) >= 1e-4 - 1e-9  # end_lr_ratio floor


def test_decay_mask_excludes_norms_and_embeddings():
    params = {
        "dense": {"kernel": jnp.zeros((4, 4)), "bias": jnp.zeros((4,))},
        "ln": {"scale": jnp.zeros((4,))},
        "embed": {"embedding": jnp.zeros((10, 4))},
        "pos": {"pos_embedding": jnp.zeros((1, 5, 4))},
    }
    mask = decay_mask(params)
    assert mask["dense"]["kernel"] is True
    assert mask["dense"]["bias"] is False
    assert mask["ln"]["scale"] is False
    assert mask["embed"]["embedding"] is False
    assert mask["pos"]["pos_embedding"] is False


def test_trainable_mask_marks_frozen_subtree():
    params = {
        "text_encoder": {"t5": {"kernel": jnp.ones((4, 4))}},
        "transformer": {"dense": {"kernel": jnp.ones((4, 4))}},
    }
    mask = trainable_mask(params, ("text_encoder",))
    assert mask["text_encoder"]["t5"]["kernel"] is False
    assert mask["transformer"]["dense"]["kernel"] is True


def test_mask_frozen_zero_updates_and_no_state_for_frozen():
    params = {
        "text_encoder": {"k": jnp.ones((8, 8))},
        "head": {"k": jnp.ones((8, 8))},
    }
    tx = mask_frozen(optax.adam(1e-1), params, ("text_encoder",))
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # frozen subtree receives exactly zero update
    np.testing.assert_array_equal(np.asarray(updates["text_encoder"]["k"]),
                                  0.0)
    assert float(jnp.abs(updates["head"]["k"]).max()) > 0
    # frozen leaves carry no m/v state (MaskedNode, no .shape)
    leaves = jax.tree.leaves(state, is_leaf=lambda x: isinstance(
        x, optax.MaskedNode))
    assert any(isinstance(l, optax.MaskedNode) for l in leaves)


def test_mask_frozen_noop_when_nothing_frozen():
    params = {"head": {"k": jnp.ones((4, 4))}}
    tx = optax.adam(1e-2)
    assert mask_frozen(tx, params, ("text_encoder",)) is tx


def test_make_optimizer_with_frozen_prefixes_learns_only_trainable():
    params = {
        "text_encoder": {"k": jnp.ones((8, 8))},
        "head": {"k": jnp.ones((8, 8))},
    }
    tx = make_optimizer(peak_lr=1e-1, warmup_steps=1, total_steps=10,
                        params=params, frozen_prefixes=("text_encoder",))
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    p = params
    for _ in range(3):
        updates, state = tx.update(grads, state, p)
        p = optax.apply_updates(p, updates)
    np.testing.assert_array_equal(np.asarray(p["text_encoder"]["k"]), 1.0)
    assert float(jnp.abs(p["head"]["k"] - 1.0).max()) > 0


def test_trainable_mask_prefix_semantics_not_contains():
    """Regression (code-review r3): only TOP-LEVEL module names freeze —
    a nested submodule sharing the name must stay trainable."""
    params = {
        "text_encoder": {"k": jnp.ones((2, 2))},
        "head": {"text_encoder": {"k": jnp.ones((2, 2))}},
    }
    mask = trainable_mask(params, ("text_encoder",))
    assert mask["text_encoder"]["k"] is False
    assert mask["head"]["text_encoder"]["k"] is True


def test_make_optimizer_steps():
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    tx = make_optimizer(peak_lr=1e-2, warmup_steps=2, total_steps=10,
                        clip_norm=1.0, params=params)
    state = tx.init(params)
    grads = {"w": jnp.ones((4, 4)) * 100, "b": jnp.ones((4,))}
    updates, state = tx.update(grads, state, params)
    # clipped + warmup step 0 -> zero lr -> zero update
    assert float(jnp.abs(updates["w"]).max()) == 0.0
    updates, state = tx.update(grads, state, params)
    assert float(jnp.abs(updates["w"]).max()) > 0.0


def test_make_optimizer_skips_nonfinite_steps():
    """apply_if_finite wrapper: a nan/inf gradient leaves params and the
    inner optimizer state untouched; finite steps still apply."""
    params = {"w": jnp.ones((4, 4))}
    tx = make_optimizer(peak_lr=1e-2, warmup_steps=0, total_steps=10,
                        clip_norm=None, params=params,
                        skip_nonfinite_steps=3)
    state = tx.init(params)
    bad = {"w": jnp.full((4, 4), jnp.nan)}
    updates, state = tx.update(bad, state, params)
    assert float(jnp.abs(updates["w"]).max()) == 0.0
    assert int(state.notfinite_count) == 1
    good = {"w": jnp.ones((4, 4))}
    updates, state = tx.update(good, state, params)
    assert float(jnp.abs(updates["w"]).max()) > 0.0
    assert bool(jnp.all(jnp.isfinite(updates["w"])))
    assert int(state.notfinite_count) == 0


@pytest.fixture(scope="module")
def engine():
    cfg = octo_micro()
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = jnp.ones((4, 4), dtype=jnp.int32)
    images = jnp.ones((4, 64, 64, 3))
    v = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]}, text, images)
    eng = PolicyEngine(model, v, head="continuous", batch_size=4)
    eng.set_instruction(text)
    return eng


def test_policy_server_single_and_burst(engine):
    import threading
    with PolicyServer(engine, max_wait_ms=1.0) as server:
        img = np.ones((64, 64, 3), np.float32)
        a = server.predict(img)
        assert a.shape == (1, 4)

        # burst of concurrent requests coalesces into batches
        results = [None] * 6
        def call(i):
            results[i] = server.predict(img * (i + 1) % 255)
        threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
        [t.start() for t in threads]
        [t.join(timeout=30) for t in threads]
        assert all(r is not None and np.isfinite(r).all() for r in results)


def test_policy_server_propagates_errors(engine):
    with PolicyServer(engine, max_wait_ms=1.0) as server:
        with pytest.raises(Exception):
            server.predict(np.ones((3, 3), np.float32))  # bad image shape


def test_encode_instruction_cache_and_equivalence(engine):
    ids = jnp.asarray(np.array([1, 2, 3, 2], np.int32))
    e1 = engine.encode_instruction(ids)
    e2 = engine.encode_instruction(ids)
    assert e1 is e2  # memoized
    # equals the batched text tower on the same ids
    ref = engine.model.apply(engine.variables, ids[None],
                             method="encode_text")[0]
    np.testing.assert_allclose(np.asarray(e1), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # batch input rejected
    with pytest.raises(ValueError):
        engine.encode_instruction(jnp.ones((2, 4), jnp.int32))


def test_mixed_instruction_batch_matches_tokens_path(engine):
    ids_a = jnp.asarray(np.array([1, 2, 3, 4], np.int32))
    ids_b = jnp.asarray(np.array([5, 6, 7, 8], np.int32))
    images = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (4, 64, 64, 3)),
        jnp.float32)

    emb = jnp.stack([engine.encode_instruction(ids_a),
                     engine.encode_instruction(ids_b),
                     engine.encode_instruction(ids_a),
                     engine.encode_instruction(ids_b)])
    mixed = engine(images, text_embeddings=emb)

    tokens = jnp.stack([ids_a, ids_b, ids_a, ids_b])
    direct = engine(images, text_tokens=tokens)
    np.testing.assert_allclose(np.asarray(mixed), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)

    with pytest.raises(ValueError):
        engine(images, text_tokens=tokens, text_embeddings=emb)


def test_policy_server_rejects_missing_instruction_early(engine):
    """A request with no instruction and no engine default is rejected in
    predict() itself — before enqueueing — so it cannot poison a batch of
    valid requests (review fix: the old check raised inside the batch
    worker and failed every coalesced request)."""
    import threading

    bare = PolicyEngine(engine.model, engine.variables, head="continuous",
                        batch_size=4)  # no set_instruction default
    ids = np.asarray([1, 2, 3, 4], np.int32)
    img = np.ones((64, 64, 3), np.float32)
    with PolicyServer(bare, max_wait_ms=20.0) as server:
        result = {}

        def valid():
            result["a"] = server.predict(img, instruction=ids)

        t = threading.Thread(target=valid)
        t.start()
        # rejected synchronously, while the valid request is in flight
        with pytest.raises(ValueError, match="no set_instruction default"):
            server.predict(img)
        t.join(timeout=60)
    assert "a" in result and np.isfinite(result["a"]).all()


def test_policy_server_predict_after_stop_raises(engine):
    server = PolicyServer(engine, max_wait_ms=1.0).start()
    img = np.ones((64, 64, 3), np.float32)
    assert server.predict(img).shape == (1, 4)
    server.stop()
    with pytest.raises(RuntimeError, match="not running"):
        server.predict(img)


def test_policy_server_mixed_instructions(engine):
    import threading
    ids = [np.asarray([9 + i, 1, 2, 3], np.int32) for i in range(3)]
    rng = np.random.default_rng(1)
    imgs = [rng.uniform(0, 255, (64, 64, 3)).astype(np.float32)
            for _ in range(3)]

    # ground truth: per-request mixed batch via the engine directly
    want = []
    for instr, im in zip(ids, imgs):
        emb = jnp.broadcast_to(engine.encode_instruction(instr),
                               (4, *engine.encode_instruction(instr).shape))
        batch = jnp.broadcast_to(jnp.asarray(im), (4, 64, 64, 3))
        want.append(np.asarray(engine(batch, text_embeddings=emb))[0])

    with PolicyServer(engine, max_wait_ms=50.0) as server:
        results = [None] * 3

        def call(i):
            results[i] = server.predict(imgs[i], instruction=ids[i])

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(3)]
        [t.start() for t in threads]
        [t.join(timeout=60) for t in threads]
    for i in range(3):
        assert results[i] is not None
        np.testing.assert_allclose(results[i], want[i], rtol=1e-4,
                                   atol=1e-4)


def test_make_optimizer_frozen_prefixes_require_params():
    """Silently skipping the freeze mask would leave the 'frozen' tower
    decaying every step — fail loudly instead."""
    with pytest.raises(ValueError, match="frozen_prefixes requires"):
        make_optimizer(peak_lr=1e-3, warmup_steps=0, total_steps=10,
                       frozen_prefixes=("text_encoder",))
