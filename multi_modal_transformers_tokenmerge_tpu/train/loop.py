"""Training loop driver.

The reference has no loop — only per-step functions the user must wire up
(reference: models/octo/octo.py:204-320).  This driver runs jitted donated
steps over a batch iterator with periodic metric draining and async
checkpointing, optionally sharded over a device mesh.
"""

from __future__ import annotations

import functools
import signal
from typing import Callable, Iterable, Optional

import jax

from ..parallel.mesh import batch_sharding
from .state import OctoTrainState
from .steps import make_train_step

__all__ = ["fit", "evaluate", "graceful_stop"]


def graceful_stop(signals=(signal.SIGTERM, signal.SIGINT)):
    """Returns a zero-arg callable that flips to True once any of
    ``signals`` arrives — pass it as ``fit(should_stop=...)`` so a
    preempted run (TPU pod eviction sends SIGTERM) checkpoints and
    returns instead of dying mid-step.

    Previously installed handlers are chained, not replaced — EXCEPT
    Python's default SIGINT handler, which raises KeyboardInterrupt and
    would kill the run before the final checkpoint (the very thing this
    exists to prevent).  Ctrl-C therefore stops gracefully; a SECOND
    ctrl-C raises KeyboardInterrupt for users who want out now."""
    state = {"stop": False, "sigints": 0}

    def make_handler(prev):
        def handler(signum, frame):
            if signum == getattr(signal, "SIGINT", None):
                # count SIGINTs specifically: a SIGTERM must not arm the
                # escape hatch, or preemption + one ctrl-C would kill the
                # run before its final checkpoint
                state["sigints"] += 1
                if state["sigints"] >= 2:
                    raise KeyboardInterrupt  # second ctrl-C: out now
            state["stop"] = True
            if callable(prev) and prev is not signal.default_int_handler:
                prev(signum, frame)
        return handler

    for s in signals:
        signal.signal(s, make_handler(signal.getsignal(s)))
    return lambda: state["stop"]


def fit(state: OctoTrainState,
        batches: Iterable,
        head: str,
        num_steps: int,
        mesh=None,
        logger=None,
        log_every: int = 50,
        reset_metrics_on_log: bool = True,
        checkpointer=None,
        checkpoint_every: int = 1000,
        step_fn: Optional[Callable] = None,
        eval_fn: Optional[Callable] = None,
        eval_every: int = 0,
        text_input: str = "ids",
        data_state_fn: Optional[Callable] = None,
        should_stop: Optional[Callable] = None) -> OctoTrainState:
    """Run ``num_steps`` train steps.

    ``batches`` yields ``(text_tokens, images, actions)``.  With a mesh,
    batches are placed batch-sharded along the data axis before each step.
    With ``reset_metrics_on_log`` the logged loss is a windowed average
    (since the previous log) rather than a lifetime average.

    ``eval_fn(state) -> dict`` runs every ``eval_every`` steps (when both
    are set) and its results are logged under an ``eval/`` prefix — pair
    it with :func:`evaluate` for held-out loss.  The latest eval result
    also rides along with every checkpoint save, so a
    ``CheckpointManager(best_metric='loss')`` retains the BEST
    checkpoints rather than the newest.

    ``text_input='embeddings'``: batches carry precomputed (B, T, E) text
    embeddings (utils.data.cache_text_embeddings) instead of ids — the
    frozen text tower is skipped every step.

    ``data_state_fn() -> dict`` (e.g. ``reader.state``) is saved alongside
    each checkpoint so a resumed run fast-forwards its data stream
    (``RecordReader.restore_state``) instead of replaying examples.  Note
    it reports the SOURCE's position: batches sitting in wrapping prefetch
    buffers (``prefetch_to_device``) count as consumed, so a resume may
    skip up to the prefetch depth — bounded, and preferable to the
    unbounded replay of not checkpointing data position at all.

    ``should_stop()`` (e.g. :func:`graceful_stop`) is polled once per
    step; when it turns true the loop checkpoints (if a checkpointer is
    set) and returns early — preemption-safe training.
    """
    step = (step_fn if step_fn is not None
            else make_train_step(head, text_input=text_input))
    sharding = batch_sharding(mesh) if mesh is not None else None

    import time as _time

    it = iter(batches)
    last_eval = None
    t_last_log = _time.perf_counter()
    for i in range(num_steps):
        batch = next(it)
        if sharding is not None:
            batch = tuple(jax.device_put(x, sharding) for x in batch)
        state, loss = step(state, *batch)

        # the hot path never reads state.step (int() would block on the
        # just-dispatched donated step); log/checkpoint boundaries read
        # the authoritative device value — they already sync for metrics
        if logger is not None and (i + 1) % log_every == 0:
            metrics = jax.device_get(state.metrics.compute())
            step_no = int(state.step)
            now = _time.perf_counter()
            # wall-clock throughput since the previous log (the device
            # sync above makes the window boundary honest); first window
            # includes compile time — read the steady-state from window 2+
            sps = log_every / max(now - t_last_log, 1e-9)
            t_last_log = now
            logger.log({**metrics, "last_loss": float(loss),
                        "steps_per_sec": round(sps, 2)}, step=step_no)
            if reset_metrics_on_log and (i + 1) < num_steps:
                # same declaration -> same treedef -> no re-jit of step
                state = state.replace(metrics=state.metrics.zeros_like())
        if eval_fn is not None and eval_every and (i + 1) % eval_every == 0:
            ev = eval_fn(state)
            last_eval = {k: float(v) for k, v in ev.items()}
            if logger is not None:
                logger.log({f"eval/{k}": v for k, v in last_eval.items()},
                           step=int(state.step))
        if checkpointer is not None and (i + 1) % checkpoint_every == 0:
            checkpointer.save(int(state.step), state,
                              data_state=_maybe(data_state_fn),
                              metrics=last_eval)
        if should_stop is not None and should_stop():
            break

    if checkpointer is not None:
        checkpointer.save(int(state.step), state,
                          data_state=_maybe(data_state_fn),
                          metrics=last_eval)
        checkpointer.wait()
    return state


def _maybe(fn):
    return fn() if fn is not None else None


@functools.lru_cache(maxsize=8)
def _make_eval_step(apply_fn, method):
    """Jitted eval step, cached per (apply_fn, method) so repeated
    evaluate() calls (e.g. from fit's eval_fn hook) reuse the compiled
    executable instead of retracing a fresh closure every call."""
    import jax.numpy as jnp

    @jax.jit
    def eval_step(params, rngs, text, images, actions):
        # train=False: eval-mode forward (no dropout, midpoint patch
        # positions) — the loss methods default train=True for the
        # train step's convenience
        loss = apply_fn({"params": params}, text, images, actions,
                        rngs=rngs, train=False, method=method)
        return jnp.mean(loss)

    return eval_step


def evaluate(state: OctoTrainState,
             batches: Iterable,
             head: str,
             num_batches: int,
             mesh=None,
             text_input: str = "ids") -> dict:
    """Average the head's loss over ``num_batches`` held-out batches — no
    gradients, no state mutation (the reference has no eval path at all).
    Runs the model in EVAL mode (train=False: dropout off, deterministic
    patch positions), so the measured loss is the deployed model's.

    Deterministic given ``state.rngs``: stochastic pieces (diffusion
    timesteps) fold a fixed eval offset plus the batch index, so repeated
    calls on the same data agree.
    """
    from .state import Metrics
    from .steps import LOSS_METHODS, LOSS_METHODS_WITH_TEXT

    method = (LOSS_METHODS if text_input == "ids"
              else LOSS_METHODS_WITH_TEXT)[head]
    sharding = batch_sharding(mesh) if mesh is not None else None
    eval_step = _make_eval_step(state.apply_fn, method)

    metrics = Metrics.empty(loss="avg")
    it = iter(batches)
    for i in range(num_batches):
        batch = next(it)
        if sharding is not None:
            batch = tuple(jax.device_put(x, sharding) for x in batch)
        rngs = {name: jax.random.fold_in(
                    jax.random.fold_in(key, 0xE7A1), i)
                for name, key in state.rngs.items()}
        metrics = metrics.update(loss=eval_step(state.params, rngs, *batch))
    return jax.device_get(metrics.compute())
