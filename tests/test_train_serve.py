"""Training loop, checkpoint roundtrip, and serving-engine tests."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo
from multi_modal_transformers_tokenmerge_tpu.serve.policy import PolicyEngine
from multi_modal_transformers_tokenmerge_tpu.train.checkpoint import (
    CheckpointManager,
)
from multi_modal_transformers_tokenmerge_tpu.train.loop import fit
from multi_modal_transformers_tokenmerge_tpu.train.state import (
    create_train_state,
)
from multi_modal_transformers_tokenmerge_tpu.train.steps import make_train_step

from micro_configs import octo_micro


pytestmark = pytest.mark.slow

def _fresh_variables(variables):
    """Deep-copy params: jitted train steps donate the state, invalidating
    the original buffers — each test needs its own copy."""
    return jax.tree.map(jnp.array, variables)


@pytest.fixture(scope="module")
def setup():
    cfg = octo_micro()
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = jnp.ones((4, 4), dtype=jnp.int32)
    images = jax.random.uniform(keys[0], (4, 64, 64, 3)) * 255
    actions = jnp.full((4, 4), 0.3)
    variables = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]},
        text, images)
    return cfg, model, variables, keys, text, images, actions


def test_training_reduces_loss(setup):
    cfg, model, variables, keys, text, images, actions = setup
    state = create_train_state(
        model, _fresh_variables(variables), optax.adam(1e-3),
        rngs={"dropout": keys[2], "patch_encoding": keys[1]})
    step = make_train_step("continuous")
    _, loss0 = step(state, text, images, actions)
    state = create_train_state(
        model, _fresh_variables(variables), optax.adam(1e-3),
        rngs={"dropout": keys[2], "patch_encoding": keys[1]})

    def batches():
        while True:
            yield (text, images, actions)

    state = fit(state, batches(), head="continuous", num_steps=30)
    assert int(state.step) == 30
    _, loss_end = make_train_step("continuous", donate=False)(
        state, text, images, actions)
    assert float(loss_end) < float(loss0)


def test_diffusion_train_step(setup):
    cfg, model, variables, keys, text, images, actions = setup
    state = create_train_state(
        model, _fresh_variables(variables), optax.adam(1e-3),
        rngs={"dropout": keys[2], "patch_encoding": keys[1],
              "diffusion": keys[3]})
    step = make_train_step("diffusion")
    state, loss = step(state, text, images, actions)
    assert np.isfinite(float(loss))


def test_checkpoint_roundtrip(tmp_path, setup):
    cfg, model, variables, keys, text, images, actions = setup
    state = create_train_state(
        model, _fresh_variables(variables), optax.adam(1e-3),
        rngs={"dropout": keys[2], "patch_encoding": keys[1]})
    step = make_train_step("continuous")
    state, _ = step(state, text, images, actions)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    assert mgr.save(int(state.step), state)
    mgr.wait()
    assert mgr.latest_step() == 1

    restored = mgr.restore(abstract_state=jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state))
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_checkpoint_roundtrip_with_frozen_mask(tmp_path, setup):
    """mask_frozen opt states contain optax.MaskedNode sentinels — the
    checkpoint path must round-trip them (users freeze the t5 tower)."""
    from multi_modal_transformers_tokenmerge_tpu.train.optim import (
        mask_frozen)

    cfg, model, variables, keys, text, images, actions = setup
    fresh = _fresh_variables(variables)
    # freeze an arbitrary existing submodule to exercise MaskedNode
    prefix = next(iter(fresh["params"].keys()))
    tx = mask_frozen(optax.adam(1e-3), fresh["params"], (prefix,))
    state = create_train_state(
        model, fresh, tx,
        rngs={"dropout": keys[2], "patch_encoding": keys[1]})
    step = make_train_step("continuous")
    state, _ = step(state, text, images, actions)
    frozen_before = jax.tree.map(np.asarray, state.params[prefix])

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    assert mgr.save(int(state.step), state)
    mgr.wait()
    restored = mgr.restore(abstract_state=jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state))
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()

    # frozen subtree unchanged by the step; training continues after
    # restore with the same masked optimizer
    for a, b in zip(jax.tree.leaves(frozen_before),
                    jax.tree.leaves(jax.tree.map(
                        np.asarray, restored.params[prefix]))):
        np.testing.assert_array_equal(a, b)
    restored = restored.replace(apply_fn=state.apply_fn, tx=state.tx)
    restored, loss = step(restored, text, images, actions)
    assert np.isfinite(float(loss))


def test_checkpoint_restores_legacy_metrics_layout(tmp_path, setup):
    """Checkpoints written before the Metrics generalization stored a
    single scalar 'count' instead of per-metric 'counts'; restore must
    migrate them instead of failing on the pytree-structure mismatch."""
    import flax.serialization as ser

    cfg, model, variables, keys, text, images, actions = setup
    state = create_train_state(
        model, _fresh_variables(variables), optax.adam(1e-3),
        rngs={"dropout": keys[2], "patch_encoding": keys[1]})
    step = make_train_step("continuous")
    state, _ = step(state, text, images, actions)

    legacy = ser.to_state_dict(state)
    m = legacy["metrics"]
    legacy["metrics"] = {"sums": m["sums"], "count": m["counts"]["loss"]}

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    assert mgr.save(1, legacy)
    mgr.wait()

    # raw restore migrates in place
    raw = mgr.restore(1)
    assert "counts" in raw["metrics"] and "count" not in raw["metrics"]
    np.testing.assert_array_equal(np.asarray(raw["metrics"]["counts"]["loss"]),
                                  np.asarray(m["counts"]["loss"]))

    # abstract-state restore falls back to the migration path
    restored = mgr.restore(1, abstract_state=jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state))
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert set(restored.metrics.counts) == set(state.metrics.counts)
    mgr.close()


def test_policy_engine_cached_text_matches(setup):
    cfg, model, variables, keys, text, images, actions = setup
    engine = PolicyEngine(model, variables, head="continuous", batch_size=4)
    direct = engine(images, text_tokens=text)

    engine2 = PolicyEngine(model, variables, head="continuous", batch_size=4)
    engine2.set_instruction(text)
    cached = engine2(images)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(cached),
                               rtol=1e-6, atol=1e-6)


def test_policy_engine_set_instruction_id_shapes(setup):
    """Pre-tokenized (T,) and (1, T) ids broadcast to the batch exactly
    like a single string does; a wrong row count fails loudly instead of
    poisoning the cached-predict path (review finding)."""
    cfg, model, variables, keys, text, images, actions = setup
    ref_engine = PolicyEngine(model, variables, head="continuous",
                              batch_size=4)
    ref_engine.set_instruction(text)  # (4, T), all rows identical
    ref = np.asarray(ref_engine(images))

    row = np.asarray(text)[0]
    for ids in (row, row[None]):
        eng = PolicyEngine(model, variables, head="continuous",
                           batch_size=4)
        eng.set_instruction(ids)
        assert eng._text_embeddings.shape[0] == 4
        np.testing.assert_allclose(np.asarray(eng(images)), ref,
                                   rtol=1e-6, atol=1e-6)

    eng = PolicyEngine(model, variables, head="continuous", batch_size=4)
    with pytest.raises(ValueError, match="instruction rows"):
        eng.set_instruction(np.tile(row[None], (3, 1)))
    with pytest.raises(ValueError, match="instruction ids"):
        eng.set_instruction(np.zeros((1, 1, 4), np.int32))


def test_policy_engine_requires_instruction(setup):
    cfg, model, variables, keys, text, images, actions = setup
    engine = PolicyEngine(model, variables, head="continuous", batch_size=4)
    with pytest.raises(ValueError):
        engine(images)


def test_policy_engine_aot_cached(setup):
    cfg, model, variables, keys, text, images, actions = setup
    engine = PolicyEngine(model, variables, head="continuous",
                          batch_size=4).compile((4,), (64, 64, 3))
    engine.set_instruction(text)
    a = engine(images)
    b = engine(images, text_tokens=text)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                               atol=1e-6)


def test_cached_text_training_matches_ids():
    """Training on precomputed text embeddings (frozen t5 tower) is EXACTLY
    the ids objective: same loss, same updated params — the tower sits
    behind stop_gradient, so its output per instruction is a constant."""
    from multi_modal_transformers_tokenmerge_tpu.core.config import (
        TextEncoderConfig)
    from multi_modal_transformers_tokenmerge_tpu.utils.data import (
        cache_text_embeddings)

    cfg = octo_micro(text=TextEncoderConfig(
        kind="t5", vocab_size=64, max_length=4, embedding_dim=32,
        t5_num_layers=1, t5_num_heads=2, t5_d_kv=16, t5_d_ff=64))
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    text = jnp.asarray(np.tile([[3, 5, 2, 0]], (4, 1)).astype(np.int32))
    images = jax.random.uniform(keys[0], (4, 64, 64, 3)) * 255
    actions = jnp.full((4, 4), 0.3)
    variables = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]},
        text, images)
    rngs = {"dropout": keys[2], "patch_encoding": keys[1]}

    state_ids = create_train_state(model, _fresh_variables(variables),
                                   optax.adam(1e-3), rngs=rngs)
    s1, loss_ids = make_train_step("continuous", donate=False)(
        state_ids, text, images, actions)

    cached = cache_text_embeddings(
        iter([(text, images, actions)]), model, variables)
    emb, im2, act2 = next(cached)
    assert emb.shape == (4, 4, 32)

    state_emb = create_train_state(model, _fresh_variables(variables),
                                   optax.adam(1e-3), rngs=rngs)
    s2, loss_emb = make_train_step(
        "continuous", donate=False, text_input="embeddings")(
            state_emb, jnp.asarray(emb), im2, act2)

    np.testing.assert_allclose(float(loss_ids), float(loss_emb),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    # repeated instructions hit the cache (same rows -> identical output)
    cached2 = cache_text_embeddings(
        iter([(text, images, actions), (text, images, actions)]),
        model, variables)
    e1 = next(cached2)[0]
    e2 = next(cached2)[0]
    np.testing.assert_array_equal(e1, e2)

    # a trainable tower is rejected eagerly
    trainable = Octo(octo_micro())
    with pytest.raises(ValueError, match="frozen"):
        cache_text_embeddings(iter([]), trainable, variables)


def test_checkpoint_restore_into_sharded_layout(tmp_path, setup):
    """Save a replicated state, restore directly into a mesh-sharded layout
    (the v5e-8 restore path — SURVEY.md §5 checkpoint row)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from multi_modal_transformers_tokenmerge_tpu.parallel.mesh import (
        make_mesh, param_shardings)

    cfg, model, variables, keys, text, images, actions = setup
    state = create_train_state(
        model, _fresh_variables(variables), optax.sgd(1e-2),
        rngs={"dropout": keys[2], "patch_encoding": keys[1]})
    mgr = CheckpointManager(str(tmp_path / "ckpt_sharded"))
    assert mgr.save(0, state)
    mgr.wait()

    mesh = make_mesh(data=4, model=2)
    shardings = param_shardings(state.params, mesh, model_parallel=True)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
    abstract = abstract.replace(
        params=jax.tree.map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            abstract.params, shardings))
    restored = mgr.restore(abstract_state=abstract)

    # values equal AND the tensor-parallel layout was applied on restore
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    q = restored.params["transformer"]["blocks"]["attention"]["query"]["kernel"]
    assert q.sharding.spec == P(None, None, "model", None)
    mgr.close()


def test_policy_export_roundtrip(tmp_path, setup):
    """AOT export -> serialize -> load -> identical actions."""
    from multi_modal_transformers_tokenmerge_tpu.serve.export import (
        export_policy, load_policy)

    cfg, model, variables, keys, text, images, actions = setup
    path = str(tmp_path / "policy.bin")
    blob = export_policy(model, variables, head="continuous", batch_size=4,
                         text_shape=(4,), image_shape=(64, 64, 3), path=path)
    assert len(blob) > 1000

    fn = load_policy(path)
    key_data = jax.random.key_data(jax.random.PRNGKey(0)).astype(jnp.uint32)
    got = fn(variables, text, images, key_data)
    want = model.apply(variables, text, images,
                       method="predict_continuous_action")
    # exported StableHLO compiles with different fusion choices than the
    # live jit — identical math, ~1e-6 float noise
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-4)


def test_policy_engine_from_artifact(tmp_path, setup):
    from multi_modal_transformers_tokenmerge_tpu.serve.export import (
        export_policy)

    cfg, model, variables, keys, text, images, actions = setup
    path = str(tmp_path / "engine_policy.bin")
    export_policy(model, variables, head="continuous", batch_size=4,
                  text_shape=(4,), image_shape=(64, 64, 3), path=path)

    engine = PolicyEngine(model, variables, head="continuous",
                          batch_size=4).load_artifact(path)
    got = engine(images, text_tokens=text)
    want = model.apply(variables, text, images,
                       method="predict_continuous_action")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-4)


def test_policy_engine_cached_artifact(tmp_path, setup):
    """Both serving paths load from precompiled artifacts: the engine
    compiles NOTHING for predict (only the text tower runs live once per
    instruction)."""
    from multi_modal_transformers_tokenmerge_tpu.serve.export import (
        export_cached_policy, export_policy)

    cfg, model, variables, keys, text, images, actions = setup
    full = str(tmp_path / "full.bin")
    cached = str(tmp_path / "cached.bin")
    export_policy(model, variables, head="continuous", batch_size=4,
                  text_shape=(4,), image_shape=(64, 64, 3), path=full)
    export_cached_policy(model, variables, head="continuous", batch_size=4,
                         text_shape=(4,), image_shape=(64, 64, 3),
                         path=cached)

    engine = PolicyEngine(model, variables, head="continuous",
                          batch_size=4).load_artifact(full, cached)
    assert engine._compiled_cached is not None
    engine.set_instruction(text)
    got = engine(images)  # exercises the cached artifact
    want = model.apply(variables, text, images,
                       method="predict_continuous_action")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_ema_params_track_and_serve(setup):
    cfg, model, variables, keys, text, images, actions = setup
    state = create_train_state(
        model, _fresh_variables(variables), optax.adam(1e-3),
        rngs={"dropout": keys[2], "patch_encoding": keys[1]},
        ema_decay=0.9)
    step = make_train_step("continuous")
    p0 = jax.tree.map(jnp.array, state.params)
    for _ in range(5):
        state, _ = step(state, text, images, actions)

    # ema lags the live params but has moved from init
    d_live = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(p0)))
    d_ema = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree.leaves(state.ema_params), jax.tree.leaves(p0)))
    assert 0 < d_ema < d_live

    # ema params serve through the normal apply path
    out = model.apply({"params": state.ema_params}, text, images,
                      method="predict_continuous_action")
    assert np.isfinite(np.asarray(out)).all()


def test_ema_disabled_by_default(setup):
    cfg, model, variables, keys, text, images, actions = setup
    state = create_train_state(
        model, _fresh_variables(variables), optax.adam(1e-3),
        rngs={"dropout": keys[2], "patch_encoding": keys[1]})
    assert state.ema_params is None
    step = make_train_step("continuous")
    state, _ = step(state, text, images, actions)
    assert state.ema_params is None


def test_checkpoint_roundtrip_with_ema(tmp_path, setup):
    cfg, model, variables, keys, text, images, actions = setup
    state = create_train_state(
        model, _fresh_variables(variables), optax.adam(1e-3),
        rngs={"dropout": keys[2], "patch_encoding": keys[1]},
        ema_decay=0.9)
    step = make_train_step("continuous")
    state, _ = step(state, text, images, actions)

    mgr = CheckpointManager(str(tmp_path / "ckpt_ema"))
    assert mgr.save(int(state.step), state)
    mgr.wait()
    restored = mgr.restore(abstract_state=jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state))
    for a, b in zip(jax.tree.leaves(state.ema_params),
                    jax.tree.leaves(restored.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_gradient_accumulation_matches_full_batch():
    """accum_steps=4 must produce the same update as one full-batch step
    when the loss is deterministic (continuous head, rngs unused by the
    loss beyond patch positions which we keep deterministic via eval-free
    equality of the accumulated gradient math)."""
    import optax

    from micro_configs import octo_micro

    cfg = octo_micro()
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    rng = np.random.default_rng(0)
    B = 8
    text = jnp.asarray(rng.integers(0, 64, (B, 4)), dtype=jnp.int32)
    images = jnp.asarray(rng.uniform(0, 255, (B, 64, 64, 3)),
                         dtype=jnp.float32)
    actions = jnp.asarray(rng.uniform(-1, 1, (B, 4)), dtype=jnp.float32)
    variables = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]}, text, images)

    def fresh():
        # dropout 0 in micro config transformer? ensure determinism by
        # reusing identical rngs; continuous loss itself is deterministic
        return create_train_state(
            model, variables, optax.sgd(1e-2),
            rngs={"dropout": keys[2], "patch_encoding": keys[1]})

    full = make_train_step("continuous", donate=False)
    accum = make_train_step("continuous", donate=False, accum_steps=4)

    s1, l1 = full(fresh(), text, images, actions)
    s2, l2 = accum(fresh(), text, images, actions)
    # identical data, deterministic losses -> same mean loss; grads equal
    # up to accumulation-order float noise.  NOTE: patch_encoding rng
    # differs per microbatch (folded) — micro config uses train-mode
    # stochastic positions in the loss path, so allow a small tolerance.
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.params, s2.params)
    max_diff = max(jax.tree.leaves(diffs))
    assert max_diff < 5e-2, max_diff

    with pytest.raises(ValueError, match="divisible"):
        make_train_step("continuous", donate=False, accum_steps=3)(
            fresh(), text, images, actions)


def test_gradient_accumulation_diffusion_head_rng_folding():
    """accum_steps with the diffusion head: per-microbatch rngs fold by
    index (independent diffusion-time draws), losses finite, state
    advances one step per call."""
    import optax

    from micro_configs import octo_micro

    cfg = octo_micro()
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    rng = np.random.default_rng(1)
    B = 8
    text = jnp.asarray(rng.integers(0, 64, (B, 4)), dtype=jnp.int32)
    images = jnp.asarray(rng.uniform(0, 255, (B, 64, 64, 3)),
                         dtype=jnp.float32)
    actions = jnp.asarray(rng.uniform(-1, 1, (B, 4)), dtype=jnp.float32)
    variables = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]}, text, images)
    state = create_train_state(
        model, variables, optax.adam(1e-3),
        rngs={"dropout": keys[2], "patch_encoding": keys[1],
              "diffusion": keys[3]})
    step = make_train_step("diffusion", donate=False, accum_steps=2)
    s1, l1 = step(state, text, images, actions)
    s2, l2 = step(s1, text, images, actions)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert int(s2.step) == int(state.step) + 2


def test_evaluate_and_fit_eval_hook(setup):
    """evaluate() averages held-out loss without touching state; fit's
    eval_fn hook fires on schedule and logs under eval/."""
    from multi_modal_transformers_tokenmerge_tpu.train.loop import evaluate

    cfg, model, variables, keys, text, images, actions = setup
    state = create_train_state(
        model, _fresh_variables(variables), optax.adam(1e-3),
        rngs={"dropout": keys[2], "patch_encoding": keys[1]})

    def eval_batches():
        while True:
            yield (text, images, actions)

    ev1 = evaluate(state, eval_batches(), "continuous", num_batches=2)
    ev2 = evaluate(state, eval_batches(), "continuous", num_batches=2)
    assert np.isfinite(ev1["loss"])
    assert ev1["loss"] == pytest.approx(ev2["loss"])  # deterministic
    # state untouched
    assert int(state.step) == 0

    # eval runs the model in EVAL mode: the loss equals a train=False
    # forward (dropout off, midpoint patch positions) — NOT the train-mode
    # loss the step function optimizes
    expected = float(jnp.mean(model.apply(
        {"params": state.params}, text, images, actions, train=False,
        method="compute_l2_loss")))
    assert ev1["loss"] == pytest.approx(expected, rel=1e-5)

    logged = []

    class Rec:
        def log(self, payload, step=None):
            logged.append((dict(payload), step))

    state = fit(state, eval_batches(), head="continuous", num_steps=4,
                logger=Rec(), log_every=2,
                eval_fn=lambda st: evaluate(st, eval_batches(),
                                            "continuous", 1),
                eval_every=2)
    eval_logs = [p for p, _ in logged if any(k.startswith("eval/")
                                             for k in p)]
    assert len(eval_logs) == 2  # steps 2 and 4
    assert all(np.isfinite(p["eval/loss"]) for p in eval_logs)


def test_checkpoint_data_state_sidecar(tmp_path, setup):
    """Data-stream position rides with each checkpoint: saved atomically,
    restored by step, pruned with orbax's max_to_keep GC, and a
    resumed RecordReader continues the exact batch order."""
    from multi_modal_transformers_tokenmerge_tpu.utils.recordio import (
        RecordReader, write_records)

    cfg, model, variables, keys, text, images, actions = setup
    state = create_train_state(
        model, _fresh_variables(variables), optax.adam(1e-3),
        rngs={"dropout": keys[2], "patch_encoding": keys[1]})

    path = str(tmp_path / "train.rec")
    write_records(path, ({"x": np.full((2,), i, np.float32)}
                         for i in range(20)))
    reader = RecordReader(path, batch_size=4, shuffle_seed=5,
                          backend="numpy")
    for _ in range(3):
        next(reader)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    assert mgr.save(1, state, data_state=reader.state())
    mgr.wait()
    assert mgr.restore_data_state() == {"consumed": 3}

    # resume from the sidecar: identical continuation
    want = [next(reader)["x"][:, 0].tolist() for _ in range(3)]
    r2 = RecordReader(path, batch_size=4, shuffle_seed=5,
                      backend="numpy").restore_state(
        mgr.restore_data_state(1))
    got = [next(r2)["x"][:, 0].tolist() for _ in range(3)]
    assert got == want

    # max_to_keep=2: step-1 sidecar pruned once steps 2 and 3 exist
    state2 = create_train_state(
        model, _fresh_variables(variables), optax.adam(1e-3),
        rngs={"dropout": keys[2], "patch_encoding": keys[1]})
    mgr.save(2, state2, data_state={"consumed": 6})
    mgr.wait()
    state3 = create_train_state(
        model, _fresh_variables(variables), optax.adam(1e-3),
        rngs={"dropout": keys[2], "patch_encoding": keys[1]})
    mgr.save(3, state3, data_state={"consumed": 9})
    mgr.wait()
    assert mgr.restore_data_state() == {"consumed": 9}
    assert mgr.restore_data_state(1) is None  # pruned with its checkpoint
    # a save without data_state is fine and restores as None
    mgr.close()


def test_fit_saves_data_state(tmp_path, setup):
    """fit(data_state_fn=...) persists the stream position at every
    checkpoint boundary, including the final save."""
    cfg, model, variables, keys, text, images, actions = setup
    state = create_train_state(
        model, _fresh_variables(variables), optax.adam(1e-3),
        rngs={"dropout": keys[2], "patch_encoding": keys[1]})

    pulled = 0

    def batches():
        nonlocal pulled
        while True:
            pulled += 1
            yield (text, images, actions)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    state = fit(state, batches(), head="continuous", num_steps=3,
                checkpointer=mgr, checkpoint_every=2,
                data_state_fn=lambda: {"consumed": pulled})
    mgr.wait()
    assert mgr.latest_step() == 3
    assert mgr.restore_data_state() == {"consumed": 3}
    assert mgr.restore_data_state(2) == {"consumed": 2}
    mgr.close()


def test_fit_graceful_stop_checkpoints_and_returns(tmp_path, setup):
    """A preemption signal mid-run makes fit checkpoint and return early
    instead of dying; the saved step and data state reflect the stop
    point, and a previously installed handler still fires (chained)."""
    import os
    import signal as sig

    from multi_modal_transformers_tokenmerge_tpu.train.loop import (
        graceful_stop)

    cfg, model, variables, keys, text, images, actions = setup
    state = create_train_state(
        model, _fresh_variables(variables), optax.adam(1e-3),
        rngs={"dropout": keys[2], "patch_encoding": keys[1]})

    chained = []
    prev = sig.signal(sig.SIGUSR1, lambda s, f: chained.append(s))
    try:
        stop = graceful_stop(signals=(sig.SIGUSR1,))
        pulled = 0

        def batches():
            nonlocal pulled
            while True:
                pulled += 1
                if pulled == 3:  # preemption arrives mid-run
                    os.kill(os.getpid(), sig.SIGUSR1)
                yield (text, images, actions)

        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        state = fit(state, batches(), head="continuous", num_steps=100,
                    checkpointer=mgr, checkpoint_every=1000,
                    data_state_fn=lambda: {"consumed": pulled},
                    should_stop=stop)
        mgr.wait()
        assert int(state.step) == 3  # stopped at the signal, not at 100
        assert mgr.latest_step() == 3
        assert mgr.restore_data_state() == {"consumed": 3}
        assert chained == [sig.SIGUSR1]  # previous handler still ran
    finally:
        sig.signal(sig.SIGUSR1, prev)


def test_checkpoint_best_metric_retention(tmp_path, setup):
    """best_metric retention keeps the lowest-loss checkpoints, metricless
    saves rank worst, and fit threads its eval results through."""
    cfg, model, variables, keys, text, images, actions = setup
    state = create_train_state(
        model, _fresh_variables(variables), optax.adam(1e-3),
        rngs={"dropout": keys[2], "patch_encoding": keys[1]})

    mgr = CheckpointManager(str(tmp_path / "best"), max_to_keep=2,
                            best_metric="loss")
    for step, loss in [(1, 5.0), (2, 1.0), (3, 3.0), (4, 2.0)]:
        assert mgr.save(step, state, metrics={"loss": loss})
    mgr.wait()
    assert sorted(mgr._mgr.all_steps()) == [2, 4]  # two lowest losses
    mgr.close()

    # through fit: eval every 2 steps, checkpoint every 2 steps — each
    # save carries the latest eval dict (ascending fake loss, so the
    # EARLIEST checkpoints are retained as best)
    evals = iter([{"loss": 1.0}, {"loss": 2.0}, {"loss": 3.0}])
    mgr2 = CheckpointManager(str(tmp_path / "best2"), max_to_keep=1,
                             best_metric="loss")
    state2 = create_train_state(
        model, _fresh_variables(variables), optax.adam(1e-3),
        rngs={"dropout": keys[2], "patch_encoding": keys[1]})
    state2 = fit(state2,
                 iter(lambda: (text, images, actions), None),
                 head="continuous", num_steps=6,
                 checkpointer=mgr2, checkpoint_every=2,
                 eval_fn=lambda s: next(evals), eval_every=2)
    mgr2.wait()
    assert sorted(mgr2._mgr.all_steps()) == [2]  # lowest eval loss wins
    mgr2.close()


@pytest.mark.parametrize("tower", ["int8", "w8"])
def test_policy_engine_quantized_rejects_artifact(setup, tower):
    """Exported artifacts serve the bf16 image tower; a quantized-tower
    engine must refuse them with a message naming ITS configured mode."""
    cfg, model, variables, keys, text, images, actions = setup
    engine = PolicyEngine(model, variables, head="continuous",
                          batch_size=4, image_tower=tower)
    with pytest.raises(ValueError, match=tower):
        engine.load_artifact(b"ignored")
