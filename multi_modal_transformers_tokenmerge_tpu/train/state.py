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
    """Named mergeable metric collection (jit-friendly, donation-safe —
    generalizes clu's collections used by the reference, octo.py:322-324).

    Each metric has a static *kind*: ``'avg'`` (sum / update count, clu
    Average) or ``'sum'`` (plain accumulator).  The set of names and kinds
    is part of the (static) pytree structure, so a given declaration
    compiles once and the accumulator dict is a plain donatable pytree.

    Default declaration matches round-2 behavior: running averages of
    ``loss`` and ``grad_norm``.  Declare more with e.g.
    ``Metrics.empty(loss='avg', l2_head='avg', tokens='sum')`` and feed
    them per step via ``metrics.update(loss=..., l2_head=..., tokens=...)``.
    Counts are PER METRIC (clu Average semantics): each average divides by
    the number of updates that actually fed it, so partial updates — or a
    second ``update`` call from a custom step wrapper — never skew the
    other averages.
    """

    sums: Dict[str, jax.Array]
    counts: Dict[str, jax.Array]
    # (name, kind) pairs; tuple (hashable) so jit treedef comparison works.
    kinds: tuple = flax.struct.field(
        pytree_node=False, default=(("grad_norm", "avg"), ("loss", "avg")))

    @classmethod
    def empty(cls, **declared: str) -> "Metrics":
        """``Metrics.empty()`` → loss/grad_norm averages (compat);
        ``Metrics.empty(name='avg'|'sum', ...)`` → custom collection."""
        if not declared:
            declared = {"loss": "avg", "grad_norm": "avg"}
        for name, kind in declared.items():
            if kind not in ("avg", "sum"):
                raise ValueError(
                    f"metric {name!r}: kind must be 'avg' or 'sum', "
                    f"got {kind!r}")
        kinds = tuple(sorted(declared.items()))
        return cls(sums={n: jnp.zeros((), jnp.float32) for n, _ in kinds},
                   counts={n: jnp.zeros((), jnp.float32) for n, _ in kinds},
                   kinds=kinds)

    def zeros_like(self) -> "Metrics":
        """Fresh empty collection with the same declaration (same treedef
        — safe to swap into a donated state between logging windows)."""
        return Metrics(
            sums={n: jnp.zeros((), jnp.float32) for n in self.sums},
            counts={n: jnp.zeros((), jnp.float32) for n in self.sums},
            kinds=self.kinds)

    def update(self, loss=None, grad_norm=None, **values) -> "Metrics":
        """Accumulate one step's values (positional compat for the two
        default metrics: ``metrics.update(loss, grad_norm)``).  Only the
        metrics passed advance their sum AND count."""
        if loss is not None:
            values["loss"] = loss
        if grad_norm is not None:
            values["grad_norm"] = grad_norm
        unknown = set(values) - set(self.sums)
        if unknown:
            raise KeyError(
                f"metrics {sorted(unknown)} not declared; declared: "
                f"{sorted(self.sums)} (use Metrics.empty(name=kind, ...))")
        new_sums = {n: (s + values[n] if n in values else s)
                    for n, s in self.sums.items()}
        new_counts = {n: (c + 1.0 if n in values else c)
                      for n, c in self.counts.items()}
        return self.replace(sums=new_sums, counts=new_counts)

    def merge(self, other: "Metrics") -> "Metrics":
        """Merge two collections with the same declaration (clu-style —
        e.g. across eval shards or logging windows)."""
        if self.kinds != other.kinds:
            raise ValueError(f"cannot merge metric collections with "
                             f"different declarations: {self.kinds} vs "
                             f"{other.kinds}")
        return self.replace(
            sums={n: s + other.sums[n] for n, s in self.sums.items()},
            counts={n: c + other.counts[n]
                    for n, c in self.counts.items()})

    def compute(self) -> Dict[str, jax.Array]:
        return {n: (self.sums[n] / jnp.maximum(self.counts[n], 1.0)
                    if kind == "avg" else self.sums[n])
                for n, kind in self.kinds}


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
                       ema_decay: float = 0.0,
                       metrics: Metrics | None = None) -> OctoTrainState:
    """``ema_decay > 0`` tracks an exponential moving average of the
    parameters (updated inside the jitted step); serve from
    ``{"params": state.ema_params}``.  ``metrics`` overrides the default
    loss/grad_norm collection (see ``Metrics.empty(**declared)``)."""
    params = variables["params"]
    return OctoTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        rngs=rngs,
        metrics=metrics if metrics is not None else Metrics.empty(),
        apply_fn=model.apply,
        tx=optimizer,
        text_tokenize_fn=text_tokenize_fn,
        ema_params=(jax.tree.map(jnp.array, params) if ema_decay > 0
                    else None),
        ema_decay=ema_decay,
    )
