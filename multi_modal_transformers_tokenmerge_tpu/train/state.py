"""Training state + metrics.

Counterpart of the reference's ``OCTOTrainState`` / ``OCTOMetrics``
(reference: models/octo/octo.py:322-386), redesigned as a plain flax
``struct.PyTreeNode`` so the whole state (params, optimizer, rngs, metrics)
is a donatable pytree that lives on device across jitted steps.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import flax.struct
import jax
import jax.numpy as jnp
import optax

__all__ = ["Metrics", "OctoTrainState", "create_train_state"]


@flax.struct.dataclass
class Metrics:
    """Running averages of training loss and gradient norm (jit-friendly,
    mergeable — mirrors clu's Average collection used by the reference,
    octo.py:322-324, plus grad-norm observability the reference lacks)."""

    loss_sum: jax.Array
    grad_norm_sum: jax.Array
    count: jax.Array

    @classmethod
    def empty(cls) -> "Metrics":
        return cls(loss_sum=jnp.zeros((), jnp.float32),
                   grad_norm_sum=jnp.zeros((), jnp.float32),
                   count=jnp.zeros((), jnp.float32))

    def update(self, loss, grad_norm=0.0) -> "Metrics":
        return Metrics(loss_sum=self.loss_sum + loss,
                       grad_norm_sum=self.grad_norm_sum + grad_norm,
                       count=self.count + 1.0)

    def compute(self) -> Dict[str, jax.Array]:
        denom = jnp.maximum(self.count, 1.0)
        return {"loss": self.loss_sum / denom,
                "grad_norm": self.grad_norm_sum / denom}


class OctoTrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: optax.OptState
    rngs: Dict[str, jax.Array]
    metrics: Metrics
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    # host-side text tokenizer carried with the state for convenience
    # (reference: octo.py:328 text_tokenize_fn)
    text_tokenize_fn: Any = flax.struct.field(pytree_node=False,
                                              default=None)
    # exponential moving average of params (standard for serving DDPM
    # policies; None when disabled)
    ema_params: Any = None
    ema_decay: float = flax.struct.field(pytree_node=False, default=0.0)

    def apply_gradients(self, grads) -> "OctoTrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if new_ema is not None:
            d = self.ema_decay
            new_ema = jax.tree.map(
                lambda e, p: d * e + (1.0 - d) * p, new_ema, new_params)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state, ema_params=new_ema)

    def step_rngs(self) -> Dict[str, jax.Array]:
        """Per-step derived rngs (reference folds per step, octo.py:210-213)."""
        return {name: jax.random.fold_in(key, self.step)
                for name, key in self.rngs.items()}


def create_train_state(model, variables, optimizer,
                       rngs: Dict[str, jax.Array],
                       text_tokenize_fn=None,
                       ema_decay: float = 0.0) -> OctoTrainState:
    """``ema_decay > 0`` tracks an exponential moving average of the
    parameters (updated inside the jitted step); serve from
    ``{"params": state.ema_params}``."""
    params = variables["params"]
    return OctoTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        rngs=rngs,
        metrics=Metrics.empty(),
        apply_fn=model.apply,
        tx=optimizer,
        text_tokenize_fn=text_tokenize_fn,
        ema_params=(jax.tree.map(jnp.array, params) if ema_decay > 0
                    else None),
        ema_decay=ema_decay,
    )
