"""Micro-batching policy server.

Production serving runs many robot sessions against one chip; this server
coalesces concurrent obs->action requests into fixed-size device batches
(padding the tail), runs the AOT-compiled engine, and scatters results back
to callers.  Host-side only — no model changes.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .policy import PolicyEngine

__all__ = ["PolicyServer"]


class PolicyServer:
    """Thread-based request batcher around a PolicyEngine.

    The engine must be built (and optionally compiled) for ``batch_size``;
    requests are single observations; the server pads partial batches.
    """

    def __init__(self, engine: PolicyEngine, max_wait_ms: float = 2.0):
        self.engine = engine
        self.batch_size = engine.batch_size
        self.max_wait = max_wait_ms / 1e3
        self._requests: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> "PolicyServer":
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
        # fail pending waiters promptly instead of letting each block for
        # its full predict() timeout
        shutdown = RuntimeError("policy server stopped")
        while True:
            try:
                _, _, slot, done = self._requests.get_nowait()
            except queue.Empty:
                break
            slot["error"] = shutdown
            done.set()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # -- client API --------------------------------------------------------

    def predict(self, images: np.ndarray, instruction=None,
                timeout: float = 30.0):
        """Blocking single-observation obs->action.  ``images`` has NO batch
        dim; returns the action for this observation.

        ``instruction`` (a string or pre-tokenized (T,) ids) selects this
        REQUEST's instruction — requests with different instructions batch
        together (per-row cached text embeddings,
        ``PolicyEngine.encode_instruction``).  Without it the engine's
        ``set_instruction`` default applies."""
        if self._thread is None or self._stop.is_set():
            raise RuntimeError(
                "policy server is not running (call start() / use the "
                "context manager before predict())")
        if instruction is None and self.engine._text_embeddings is None:
            # reject HERE rather than in the batch worker: a bad request
            # raised inside _run would fail every request coalesced into
            # the same batch
            raise ValueError(
                "request without instruction but the engine has no "
                "set_instruction default — pass instruction= or call "
                "engine.set_instruction() first")
        done = threading.Event()
        slot = {}
        self._requests.put((images, instruction, slot, done))
        if self._stop.is_set() and not done.is_set():
            # stop() may have drained the queue between our running check
            # and the put landing; fail fast instead of blocking the full
            # timeout on a request nobody will serve.  (If stop()'s drain
            # did catch the entry, done is already set and slot holds the
            # same shutdown error.)
            slot["error"] = RuntimeError("policy server stopped")
            done.set()
        if not done.wait(timeout):
            raise TimeoutError("policy server did not respond")
        if "error" in slot:
            raise slot["error"]
        return slot["action"]

    # -- batching loop -----------------------------------------------------

    def _loop(self):
        while not self._stop.is_set():
            try:
                first = self._requests.get(timeout=0.05)
            except queue.Empty:
                continue
            batch = [first]
            t0 = time.perf_counter()
            while len(batch) < self.batch_size:
                remaining = self.max_wait - (time.perf_counter() - t0)
                if remaining <= 0:
                    break
                try:
                    batch.append(self._requests.get(timeout=remaining))
                except queue.Empty:
                    break
            self._run(batch)

    def _run(self, batch):
        try:
            n = len(batch)
            images = np.stack([b[0] for b in batch])
            if n < self.batch_size:  # pad the tail
                pad = np.repeat(images[-1:], self.batch_size - n, axis=0)
                images = np.concatenate([images, pad])
            if any(b[1] is not None for b in batch):
                # mixed-instruction batch: one cached (T, E) row per
                # request (encode_instruction memoizes; a never-seen
                # instruction costs one text-tower call here)
                default = self.engine._text_embeddings
                rows = []
                for _, instr, _, _ in batch:
                    if instr is not None:
                        rows.append(self.engine.encode_instruction(instr))
                    elif default is not None:
                        rows.append(default[0])
                    else:
                        raise ValueError(
                            "request without instruction but the engine "
                            "has no set_instruction default")
                emb = jnp.stack(rows)
                if n < self.batch_size:
                    emb = jnp.concatenate(
                        [emb, jnp.repeat(emb[-1:], self.batch_size - n,
                                         axis=0)])
                actions = np.asarray(
                    self.engine(jnp.asarray(images), text_embeddings=emb))
            else:
                actions = np.asarray(self.engine(jnp.asarray(images)))
            for i, (_, _, slot, done) in enumerate(batch):
                slot["action"] = actions[i]
                done.set()
        except Exception as e:  # propagate to all waiters
            for _, _, slot, done in batch:
                slot["error"] = e
                done.set()
