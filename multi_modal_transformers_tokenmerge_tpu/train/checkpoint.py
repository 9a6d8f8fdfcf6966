"""Orbax checkpointing for train state.

The reference declares orbax in its deps but never calls it
(SURVEY.md §5: pyproject.toml:33-34, zero call sites).  Here it is wired:
async-capable save/restore of the full train state, with restore able to
target sharded (multi-device) layouts by passing an abstract state.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager for OctoTrainState.

    ``best_metric`` switches retention from newest-N to BEST-N: saves
    carry ``metrics`` dicts (fit threads its eval results through) and
    orbax keeps the ``max_to_keep`` checkpoints with the lowest
    (``best_mode='min'``, e.g. eval loss) or highest (``'max'``) value.
    Saves made before any metric exists are treated as worst-possible so
    real measurements displace them.
    """

    def __init__(self, directory: str, max_to_keep: int = 3,
                 save_interval_steps: int = 1,
                 best_metric: Optional[str] = None,
                 best_mode: str = "min"):
        self._best_metric = best_metric
        self._best_mode = best_mode
        kw = {}
        if best_metric is not None:
            worst = float("inf") if best_mode == "min" else float("-inf")
            kw = dict(best_fn=lambda m: (m or {}).get(best_metric, worst),
                      best_mode=best_mode)
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                enable_async_checkpointing=True,
                **kw,
            ),
        )

    def save(self, step: int, state, data_state: Optional[dict] = None,
             metrics: Optional[dict] = None) -> bool:
        """Async save; returns whether a save was started.

        ``data_state`` (a small JSON-serializable dict, e.g.
        ``RecordReader.state()``) is written synchronously as a sidecar so
        a resumed run can fast-forward its data stream to the same
        position (``restore_data_state``).  Sidecars for steps orbax has
        garbage-collected are pruned on each save.

        The state is snapshotted with device-side copies first: the async
        serializer holds references to the arrays while the training loop's
        next DONATED step deletes the original buffers — without the copy,
        saving from a donated-step loop races into "Array has been deleted"
        (observed on TPU; CPU ignores donation, so tests there can't catch
        it).  The copy is enqueued before the next step can touch the
        buffers, and costs one state-sized allocation at checkpoint
        cadence only."""
        # non-fully-addressable (multi-host) arrays cannot be copied with
        # an eager op — orbax handles global arrays natively, so leave them
        # as-is (multi-host donated-loop callers should use donate=False
        # steps or call wait() before the next step)
        snapshot = jax.tree.map(
            lambda x: jnp.array(x, copy=True)
            if isinstance(x, jax.Array) and x.is_fully_addressable else x,
            state)
        started = self._mgr.save(step, args=ocp.args.StandardSave(snapshot),
                                 metrics=metrics)
        if data_state is not None and started:
            self._write_data_state(step, data_state)
        return started

    def restore(self, step: Optional[int] = None,
                abstract_state: Optional[Any] = None):
        """Restore a checkpoint.

        ``abstract_state`` (a pytree of jax.ShapeDtypeStruct with shardings)
        restores directly into a sharded on-device layout.

        Checkpoints written before the Metrics generalization (scalar
        ``count`` instead of per-metric ``counts``) are migrated on
        restore: the single count seeds every declared metric's count.
        """
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        if abstract_state is not None:
            try:
                return self._mgr.restore(
                    step, args=ocp.args.StandardRestore(abstract_state))
            except Exception:
                import flax.serialization as ser
                raw = _migrate_legacy_metrics(self._mgr.restore(step))
                structured = ser.from_state_dict(abstract_state, raw)
                return jax.tree.map(_place_like, abstract_state, structured)
        return _migrate_legacy_metrics(self._mgr.restore(step))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    # -- data-stream position sidecars ------------------------------------

    @property
    def _data_dir(self) -> str:
        return os.path.join(self._mgr.directory.as_posix(), "data_state")

    def _write_data_state(self, step: int, data_state: dict):
        import json
        os.makedirs(self._data_dir, exist_ok=True)
        path = os.path.join(self._data_dir, f"{step}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data_state, f)
        os.replace(tmp, path)  # atomic: never a torn sidecar
        kept = {f"{s}.json" for s in self._mgr.all_steps()}
        for name in os.listdir(self._data_dir):
            if name.endswith(".json") and name not in kept:
                try:
                    os.remove(os.path.join(self._data_dir, name))
                except FileNotFoundError:
                    pass  # another host pruned it first (shared ckpt dir)

    def restore_data_state(self, step: Optional[int] = None
                           ) -> Optional[dict]:
        """Data-stream position saved alongside ``step`` (default: latest),
        or None when that save carried no data state — callers fall back
        to a fresh stream, which only costs data-order continuity."""
        import json
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        path = os.path.join(self._data_dir, f"{step}.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def wait(self):
        """Block until any in-flight async save completes."""
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def _migrate_legacy_metrics(tree):
    """Rewrite a raw restored state dict from the pre-generalization
    Metrics layout ({'sums': {...}, 'count': x}) to the current one
    ({'sums': {...}, 'counts': {name: x, ...}})."""
    if isinstance(tree, dict):
        if ("count" in tree and "counts" not in tree
                and isinstance(tree.get("sums"), dict)):
            tree = dict(tree)
            count = tree.pop("count")
            tree["counts"] = {n: count for n in tree["sums"]}
            return tree
        return {k: _migrate_legacy_metrics(v) for k, v in tree.items()}
    return tree


def _place_like(abstract, value):
    """Place a restored leaf per an abstract ShapeDtypeStruct (dtype cast +
    sharding if one is attached)."""
    if not hasattr(abstract, "dtype"):
        return value
    arr = jnp.asarray(value, abstract.dtype)
    sharding = getattr(abstract, "sharding", None)
    return jax.device_put(arr, sharding) if sharding is not None else arr
