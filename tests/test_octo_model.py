"""Model-level tests: init/forward shapes for every head and the ToMe path,
determinism in eval mode, gradient flow, and frozen text tower."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo

from micro_configs import octo_micro, octo_micro_tome


@pytest.fixture(scope="module")
def micro_model():
    cfg = octo_micro()
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = jnp.ones((2, 4), dtype=jnp.int32)
    images = jnp.ones((2, 64, 64, 3))
    variables = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]},
        text, images)
    return model, variables, text, images, keys


def test_all_heads_forward(micro_model):
    model, v, text, images, keys = micro_model
    act = model.apply(v, text, images, method="predict_continuous_action")
    assert act.shape == (2, 1, 4)
    assert np.abs(np.asarray(act)).max() <= 1.0  # tanh-squashed

    logits = model.apply(v, text, images, method="predict_action_logits")
    assert logits.shape == (2, 2, 16)  # (B, action_dims, bins)

    diff = model.apply(v, text, images, method="predict_diffusion_action",
                       rngs={"diffusion": keys[3]})
    assert diff.shape == (2, 4)


def test_all_losses_finite(micro_model):
    model, v, text, images, keys = micro_model
    rngs = {"dropout": keys[2], "patch_encoding": keys[1],
            "diffusion": keys[3]}
    actions4 = jnp.full((2, 4), 0.3)
    actions2 = jnp.full((2, 2), 0.3)
    l2 = model.apply(v, text, images, actions4, rngs=rngs,
                     method="compute_l2_loss")
    ce = model.apply(v, text, images, actions2, rngs=rngs,
                     method="compute_ce_loss")
    dn = model.apply(v, text, images, actions4, rngs=rngs,
                     method="compute_diffusion_denoise_loss")
    for loss in (l2, ce, dn):
        assert np.isfinite(np.asarray(loss)).all()


def test_eval_deterministic(micro_model):
    model, v, text, images, keys = micro_model
    f = jax.jit(partial(model.apply, method="predict_continuous_action"))
    a = f(v, text, images)
    b = f(v, text, images)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_mode_stochastic_positions(micro_model):
    """Train-mode patch-position sampling must vary with the rng."""
    model, v, text, images, keys = micro_model
    f = partial(model.apply, method="predict_continuous_action", train=True)
    a = f(v, text, images, rngs={"patch_encoding": keys[1],
                                 "dropout": keys[2]})
    b = f(v, text, images, rngs={"patch_encoding": keys[3],
                                 "dropout": keys[2]})
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_gradients_flow(micro_model):
    model, v, text, images, keys = micro_model
    rngs = {"dropout": keys[2], "patch_encoding": keys[1]}

    def loss_fn(params):
        l = model.apply({"params": params}, text, images,
                        jnp.full((2, 4), 0.3), rngs=rngs,
                        method="compute_l2_loss")
        return jnp.mean(l)

    grads = jax.grad(loss_fn)(v["params"])
    norms = jax.tree.map(lambda g: float(jnp.abs(g).sum()), grads)
    total = sum(jax.tree.leaves(norms))
    assert np.isfinite(total) and total > 0
    # transformer and continuous head must receive gradient
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    hit = {"transformer": 0.0, "continuous_action_head": 0.0}
    for path, g in flat:
        top = path[0].key
        if top in hit:
            hit[top] += float(jnp.abs(g).sum())
    assert all(val > 0 for val in hit.values()), hit


def test_tome_model_forward_and_grads():
    cfg = octo_micro_tome()
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    text = jnp.ones((2, 4), dtype=jnp.int32)
    images = jnp.ones((2, 2, 64, 64, 3))
    v = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]},
        text, images)

    act = model.apply(v, text, images, method="predict_continuous_action")
    assert act.shape == (2, 1, 4)

    def loss_fn(params):
        l = model.apply({"params": params}, text, images,
                        jnp.full((2, 4), 0.2),
                        rngs={"dropout": keys[2], "patch_encoding": keys[1]},
                        method="compute_l2_loss")
        return jnp.mean(l)

    loss, grads = jax.value_and_grad(loss_fn)(v["params"])
    assert np.isfinite(float(loss))
    total = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(total) and total > 0


def test_prune_model_forward():
    cfg = octo_micro_tome()
    cfg = cfg.replace(transformer=cfg.transformer.replace(
        compression_mode="prune"))
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    text = jnp.ones((2, 4), dtype=jnp.int32)
    images = jnp.ones((2, 2, 64, 64, 3))
    v = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]},
        text, images)
    act = model.apply(v, text, images, method="predict_continuous_action")
    assert act.shape == (2, 1, 4)


def test_frozen_t5_receives_no_gradient():
    cfg = octo_micro()
    cfg = cfg.replace(text=cfg.text.replace(
        kind="t5", vocab_size=64, t5_num_layers=1, t5_num_heads=2,
        t5_d_ff=32, t5_d_kv=8, embedding_dim=32))
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    text = jnp.ones((2, 4), dtype=jnp.int32)
    images = jnp.ones((2, 64, 64, 3))
    v = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]},
        text, images)

    def loss_fn(params):
        l = model.apply({"params": params}, text, images,
                        jnp.full((2, 4), 0.2),
                        rngs={"dropout": keys[2], "patch_encoding": keys[1]},
                        method="compute_l2_loss")
        return jnp.mean(l)

    grads = jax.grad(loss_fn)(v["params"])
    t5_grads = grads["text_encoder"]
    t5_total = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(t5_grads))
    assert t5_total == 0.0  # stop_gradient freezes the whole text tower


def test_wrong_modality_token_count_raises(micro_model):
    """A modality stream whose token count disagrees with the sequence
    layout must fail loudly at trace time: the assembly gather is a
    jnp.take whose out-of-bounds mode under jit is 'fill', which would
    otherwise emit NaN embeddings silently (found live: a 2-frame input
    fed to a 4-camera model NaN'd the whole forward)."""
    model, v, text, _, keys = micro_model
    bad_images = jnp.ones((2, 2, 64, 64, 3))  # 2 frames; micro is 1-frame
    with pytest.raises(ValueError, match="images stream has .* tokens"):
        model.apply(v, text, bad_images, method="generate_readouts")


def test_octo_deep_preset_layout_and_schedule():
    """The production-scale ToMe flagship preset (octo_deep): 224-token
    sequence, grouped merging shedding 32 image tokens per set per merge
    event -> 96 tokens by the last event."""
    from multi_modal_transformers_tokenmerge_tpu.models.presets import (
        octo_deep)
    from multi_modal_transformers_tokenmerge_tpu.sequence import (
        SequenceLayout)

    cfg = octo_deep()
    assert cfg.transformer.num_blocks == 12
    assert cfg.transformer.tome_merge_every == 4
    # 280/28 = 10 -> 100 patches per frame matches Image{100}
    h = cfg.images.image_size[0]
    assert (h // cfg.images.patch_size) ** 2 == 100

    layout = SequenceLayout.from_strings(cfg.input_sequence,
                                         cfg.compression_sequence)
    assert layout.total_tokens == 224
    # merge events at blocks 4 and 8 shed 2 sets x 32 tokens each
    events = cfg.transformer.num_blocks // cfg.transformer.tome_merge_every
    shed_per_event = 2 * 32
    # per-layer schedule: layer index k sees tokens after k merge events
    assert layout.tokens_at_layer(0) == 224
    final = 224 - (events - 1) * shed_per_event
    assert layout.tokens_at_layer(events - 1) == final == 96
