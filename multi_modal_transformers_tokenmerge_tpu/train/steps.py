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

__all__ = ["make_train_step", "LOSS_METHODS", "LOSS_METHODS_WITH_TEXT"]

LOSS_METHODS = {
    "continuous": "compute_l2_loss",
    "categorical": "compute_ce_loss",
    "diffusion": "compute_diffusion_denoise_loss",
}

# precomputed-text variants: the first batch element is (B, T, E) text
# embeddings instead of (B, T) ids — valid when the text tower is frozen
# (its output per instruction is a constant; see
# utils.data.cache_text_embeddings)
LOSS_METHODS_WITH_TEXT = {
    "continuous": "compute_l2_loss_with_text",
    "categorical": "compute_ce_loss_with_text",
    "diffusion": "compute_diffusion_denoise_loss_with_text",
}


def make_train_step(head: str, donate: bool = True, jit: bool = True,
                    accum_steps: int = 1,
                    text_input: str = "ids") -> Callable:
    """Build ``step(state, text, images, actions) -> (state, loss)``.

    Sharded training needs no special step: place the state/batch on a mesh
    (parallel.mesh) and jit's SPMD partitioner inserts the gradient
    all-reduce automatically.

    ``accum_steps`` > 1 enables gradient accumulation: the batch splits
    into that many microbatches processed sequentially by a ``lax.scan``
    (one optimizer update per call, activation memory of one microbatch).
    Per-microbatch rngs are folded by the microbatch index, so stochastic
    pieces (dropout, patch positions, diffusion times) draw independently.

    ``text_input='embeddings'`` takes precomputed (B, T, E) text-tower
    embeddings instead of (B, T) ids — pair with
    ``utils.data.cache_text_embeddings`` to skip the frozen tower's
    forward every step (identical objective: the tower is behind
    stop_gradient, so its output per instruction is a constant).
    """
    if text_input not in ("ids", "embeddings"):
        raise ValueError(
            f"text_input must be 'ids' or 'embeddings', got {text_input!r}")
    methods = (LOSS_METHODS if text_input == "ids"
               else LOSS_METHODS_WITH_TEXT)
    try:
        method = methods[head]
    except KeyError:
        raise ValueError(f"unknown head {head!r}; one of {sorted(methods)}")

    # auxiliary objective terms (e.g. the MoE load-balance loss) are sown
    # into the 'losses' collection pre-weighted; applying with
    # mutable=['losses'] surfaces them so they are trained — without it
    # flax silently drops the sow and e.g. a Switch router gets no balance
    # gradient.  Dense models sow nothing and pay nothing.
    def _total_loss(apply_fn, params, rngs, text, images, actions):
        loss, mut = apply_fn({"params": params}, text, images, actions,
                             rngs=rngs, method=method, mutable=["losses"])
        aux = sum(jnp.sum(leaf) for leaf in
                  jax.tree_util.tree_leaves(mut.get("losses", {})))
        return jnp.mean(loss) + aux

    def step(state: OctoTrainState, text_tokens, images, actions):
        rngs = state.step_rngs()

        if accum_steps == 1:
            def loss_fn(params):
                return _total_loss(state.apply_fn, params, rngs,
                                   text_tokens, images, actions)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
        else:
            b = text_tokens.shape[0]
            if b % accum_steps:
                raise ValueError(
                    f"batch {b} not divisible by accum_steps={accum_steps}")
            split = lambda x: x.reshape(accum_steps, b // accum_steps,
                                        *x.shape[1:])
            mbs = (split(text_tokens), split(images), split(actions))

            def micro(carry, xs):
                i, text_mb, img_mb, act_mb = xs
                mb_rngs = {k: jax.random.fold_in(v, i)
                           for k, v in rngs.items()}

                def loss_fn(params):
                    return _total_loss(state.apply_fn, params, mb_rngs,
                                       text_mb, img_mb, act_mb)

                l, g = jax.value_and_grad(loss_fn)(state.params)
                acc_l, acc_g = carry
                return (acc_l + l,
                        jax.tree.map(jnp.add, acc_g, g)), None

            zeros = jax.tree.map(
                lambda t: jnp.zeros(t.shape, jnp.promote_types(t.dtype,
                                                               jnp.float32)),
                state.params)
            (loss_sum, grad_sum), _ = jax.lax.scan(
                micro, (jnp.float32(0.0), zeros),
                (jnp.arange(accum_steps), *mbs))
            inv = 1.0 / accum_steps
            loss = loss_sum * inv
            grads = jax.tree.map(
                lambda g, p: (g * inv).astype(p.dtype), grad_sum,
                state.params)

        grad_norm = optax.global_norm(grads)
        state = state.apply_gradients(grads)
        # feed only the metrics this state's collection declares — custom
        # declarations (Metrics.empty(name=kind, ...)) may omit the
        # defaults.  Extra declared metrics accumulate safely via a second
        # update() in the user's step wrapper: counts are per metric, so
        # separate feeds never skew each other's averages
        std = {k: v for k, v in (("loss", loss), ("grad_norm", grad_norm))
               if k in state.metrics.sums}
        state = state.replace(metrics=state.metrics.update(**std))
        return state, loss

    if jit:
        step = jax.jit(step, donate_argnums=(0,) if donate else ())
    return step
