"""Hardware-platform introspection for kernel-dispatch gates.

Every Pallas call site gates on "am I actually lowering for TPU?" to
pick the Mosaic kernel vs the XLA fallback (and interpret mode for CPU
tests).  ``jax.default_backend()`` alone is NOT that answer on this
image: the remote-TPU plugin stays registered as the default backend
even when computation is pinned to virtual CPU devices via
``jax.default_device(...)`` — exactly what ``dryrun_multichip`` does —
so a backend-only gate lowers Mosaic kernels for a CPU executable and
dies in ``pallas_call`` ("Only interpret mode is supported on CPU
backend").  The gate must honor the innermost ``jax.default_device``
context first.
"""

from __future__ import annotations

import jax

__all__ = ["compute_platform", "on_tpu"]


def compute_platform() -> str:
    """Platform ('tpu' | 'cpu' | ...) the next eager op / unsharded jit
    will target: the ``jax.default_device`` context when one is active
    (thread-local, innermost wins), else the default backend."""
    dev = jax.config.jax_default_device
    if dev is not None:
        # may be a Device or (newer jax) a string like 'cpu'
        platform = getattr(dev, "platform", None)
        return platform if platform is not None else str(dev)
    return jax.default_backend()


def on_tpu() -> bool:
    return compute_platform() == "tpu"
