"""Jitted, donated train steps for every action head.

The reference's train steps are plain un-jitted Python (reference:
models/octo/octo.py:204-320 — every step re-dispatches op-by-op).  Here each
step is built once per (model, head), jitted with the state donated, and runs
end-to-end on device: fold rngs -> value_and_grad -> optimizer update ->
metrics update.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from .state import OctoTrainState

__all__ = ["make_train_step", "LOSS_METHODS"]

LOSS_METHODS = {
    "continuous": "compute_l2_loss",
    "categorical": "compute_ce_loss",
    "diffusion": "compute_diffusion_denoise_loss",
}


def make_train_step(head: str, donate: bool = True,
                    jit: bool = True) -> Callable:
    """Build ``step(state, text_tokens, images, actions) -> (state, loss)``.

    Sharded training needs no special step: place the state/batch on a mesh
    (parallel.mesh) and jit's SPMD partitioner inserts the gradient
    all-reduce automatically.
    """
    try:
        method = LOSS_METHODS[head]
    except KeyError:
        raise ValueError(f"unknown head {head!r}; one of {sorted(LOSS_METHODS)}")

    def step(state: OctoTrainState, text_tokens, images, actions):
        rngs = state.step_rngs()

        def loss_fn(params):
            loss = state.apply_fn({"params": params}, text_tokens, images,
                                  actions, rngs=rngs, method=method)
            return jnp.mean(loss)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grad_norm = optax.global_norm(grads)
        state = state.apply_gradients(grads)
        state = state.replace(
            metrics=state.metrics.update(loss, grad_norm))
        return state, loss

    if jit:
        step = jax.jit(step, donate_argnums=(0,) if donate else ())
    return step
