"""Learnability integration test: the full pipeline (image tokenizer ->
transformer -> head) must learn a synthetic image->action mapping, i.e.
generalize to unseen images — not just drive the loss down on constants."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from multi_modal_transformers_tokenmerge_tpu.models.octo import Octo
from multi_modal_transformers_tokenmerge_tpu.train.state import (
    create_train_state,
)
from multi_modal_transformers_tokenmerge_tpu.train.steps import make_train_step

from micro_configs import octo_micro


pytestmark = pytest.mark.slow

def _make_batch(rng, batch):
    """Action dim 0/1 encode the mean brightness of the image's left/right
    halves — a signal the conv tokenizer can read."""
    images = rng.uniform(0, 255, (batch, 64, 64, 3)).astype(np.float32)
    left = images[:, :, :32].mean(axis=(1, 2, 3)) / 255.0
    right = images[:, :, 32:].mean(axis=(1, 2, 3)) / 255.0
    actions = np.stack([
        2 * left - 1, 2 * right - 1,
        np.zeros(batch), np.zeros(batch)], axis=1).astype(np.float32)
    text = np.ones((batch, 4), np.int32)
    return jnp.asarray(text), jnp.asarray(images), jnp.asarray(actions)


def test_pipeline_learns_image_signal():
    cfg = octo_micro()
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    rng = np.random.default_rng(0)
    text, images, actions = _make_batch(rng, 16)
    variables = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]}, text, images)
    state = create_train_state(
        model, variables, optax.adam(1e-3),
        rngs={"dropout": keys[2], "patch_encoding": keys[1]})
    step = make_train_step("continuous")

    # held-out evaluation batch
    text_ev, images_ev, actions_ev = _make_batch(
        np.random.default_rng(999), 16)

    def eval_mse(params):
        pred = jnp.squeeze(model.apply(
            {"params": params}, text_ev, images_ev,
            method="predict_continuous_action"))
        return float(jnp.mean(jnp.square(pred - actions_ev)))

    initial = eval_mse(jax.tree.map(jnp.array, state.params))
    for i in range(160):
        text_b, images_b, actions_b = _make_batch(rng, 16)
        state, loss = step(state, text_b, images_b, actions_b)
    final = eval_mse(state.params)

    # must generalize: held-out MSE down by at least 3x
    assert final < initial / 3, (initial, final)
    assert np.isfinite(final)


def test_tome_model_learns_image_signal():
    """The ToMe-compressed stack (the fork's headline feature) must also
    LEARN, not just run: held-out MSE down 3x on the image-dependent
    target, with merged per-layer layouts active."""
    from micro_configs import octo_micro_tome

    cfg = octo_micro_tome()
    model = Octo(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    rng = np.random.default_rng(0)

    def make_batch(r, b):
        text, img, act = _make_batch(r, b)
        img2 = np.repeat(img[:, None], 2, axis=1)  # 2 frames
        return text, jnp.asarray(img2), act

    text, images, actions = make_batch(rng, 16)
    variables = jax.jit(model.init)(
        {"params": keys[0], "patch_encoding": keys[1],
         "dropout": keys[2], "diffusion": keys[3]}, text, images)
    state = create_train_state(
        model, variables, optax.adam(1e-3),
        rngs={"dropout": keys[2], "patch_encoding": keys[1]})
    step = make_train_step("continuous")

    text_ev, images_ev, actions_ev = make_batch(np.random.default_rng(99), 16)

    def eval_mse(params):
        pred = jnp.squeeze(model.apply(
            {"params": params}, text_ev, images_ev,
            method="predict_continuous_action"))
        return float(jnp.mean(jnp.square(pred - actions_ev)))

    initial = eval_mse(jax.tree.map(jnp.array, state.params))
    for _ in range(160):
        tb, ib, ab = make_batch(rng, 16)
        state, _ = step(state, tb, ib, ab)
    final = eval_mse(state.params)
    assert np.isfinite(final) and final < initial / 3, (initial, final)
