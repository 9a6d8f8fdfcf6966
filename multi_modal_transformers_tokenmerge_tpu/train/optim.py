"""Optimizer construction: schedules, clipping, weight-decay masking.

The reference passes a bare optax optimizer in (octo.py:341 ``optimizer``
arg) with no schedule/clip/decay policy.  Production VLA training needs
warmup + cosine decay, global-norm clipping, and no weight decay on
norms/biases/embeddings — assembled here.
"""

from __future__ import annotations

from typing import Optional

import jax
import optax

__all__ = ["warmup_cosine_schedule", "make_optimizer", "decay_mask",
           "trainable_mask", "mask_frozen"]


def warmup_cosine_schedule(peak_lr: float, warmup_steps: int,
                           total_steps: int,
                           end_lr_ratio: float = 0.1) -> optax.Schedule:
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=peak_lr,
        warmup_steps=warmup_steps,
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=peak_lr * end_lr_ratio,
    )


def decay_mask(params):
    """True where weight decay applies: 2D+ kernels only (no biases, norm
    scales, position embeddings, or token embeddings)."""
    def keep(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return leaf.ndim >= 2 and name not in ("embedding", "pos_embedding")

    return jax.tree_util.tree_map_with_path(keep, params)


def trainable_mask(params, frozen_prefixes=("text_encoder",)):
    """Bool pytree: False for every leaf under a frozen module prefix.

    The flagship config freezes the T5 text tower by stop_gradient (as the
    reference does, t5_base.py:14) — its gradients are structurally zero,
    but a bare optimizer still pays full m/v/update HBM traffic for its
    110M parameters every step (~4 GB/step at octo_base: measured ~5 ms of
    the 16.5 ms round-3 train step).  Mask them out instead.
    """
    def mark(path, leaf):
        # PREFIX semantics: only the top-level module name is matched, so
        # a nested submodule that happens to share a frozen name (e.g.
        # params['head']['text_encoder']) is NOT silently frozen
        head = path[0].key if path and hasattr(path[0], "key") else None
        return head not in frozen_prefixes

    return jax.tree_util.tree_map_with_path(mark, params)


def mask_frozen(tx: optax.GradientTransformation, params,
                frozen_prefixes=("text_encoder",)
                ) -> optax.GradientTransformation:
    """Wrap ``tx`` so frozen-module leaves carry no optimizer state and no
    update traffic (``optax.masked``).  No-op if nothing is frozen."""
    mask = trainable_mask(params, frozen_prefixes)
    if all(jax.tree_util.tree_leaves(mask)):
        return tx
    inv = jax.tree.map(lambda m: not m, mask)
    # masked(tx) skips state+update traffic for frozen leaves but passes
    # their raw gradient through; the masked set_to_zero pins those
    # updates to exactly zero even if a caller forgets stop_gradient
    return optax.chain(optax.masked(tx, mask),
                       optax.masked(optax.set_to_zero(), inv))


def make_optimizer(peak_lr: float = 3e-4,
                   warmup_steps: int = 1000,
                   total_steps: int = 100_000,
                   weight_decay: float = 1e-4,
                   clip_norm: Optional[float] = 1.0,
                   b1: float = 0.9, b2: float = 0.999,
                   params=None,
                   frozen_prefixes=(),
                   skip_nonfinite_steps: int = 0
                   ) -> optax.GradientTransformation:
    """AdamW with warmup-cosine LR, global-norm clipping, masked decay,
    and (opt-in) frozen-module state masking.

    Pass ``params`` to enable the decay mask (otherwise decay applies to
    all leaves, matching plain adamw).  Pass
    ``frozen_prefixes=('text_encoder',)`` for t5-frozen configs — NOT the
    default because embed-kind text towers are trainable.

    ``skip_nonfinite_steps`` > 0 wraps the whole chain in
    ``optax.apply_if_finite``: a step whose gradients contain inf/nan is
    SKIPPED (params and inner optimizer state untouched) instead of
    poisoning the parameters; training aborts only after that many
    consecutive bad steps.  Long bf16 runs hit occasional overflow —
    production trainers skip those steps rather than die or diverge.
    """
    schedule = warmup_cosine_schedule(peak_lr, warmup_steps, total_steps)
    chain = []
    if clip_norm is not None:
        chain.append(optax.clip_by_global_norm(clip_norm))
    mask = decay_mask(params) if params is not None else None
    chain.append(optax.adamw(schedule, b1=b1, b2=b2,
                             weight_decay=weight_decay, mask=mask))
    tx = optax.chain(*chain)
    if frozen_prefixes and params is None:
        # silently skipping would leave the "frozen" tower with optimizer
        # state AND weight decay shrinking it every step
        raise ValueError("frozen_prefixes requires params (the masks are "
                         "built from the param tree)")
    if params is not None and frozen_prefixes:
        tx = mask_frozen(tx, params, frozen_prefixes)
    if skip_nonfinite_steps > 0:
        tx = optax.apply_if_finite(tx, skip_nonfinite_steps)
    return tx
