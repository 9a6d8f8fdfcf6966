"""Debug / sanitizer toggles (SURVEY.md §5 'race detection / sanitizers').

JAX programs have no data races to detect (functional, XLA-scheduled); the
practical sanitizers are NaN-checking, disabling jit for step-through
debugging, and shape assertions.  The reference sprinkles chex asserts but
globally disables them (point_cloud_tokenizer.py:15).
"""

from __future__ import annotations

import contextlib

import jax

__all__ = ["enable_debug_checks", "debug_mode", "assert_finite"]


def enable_debug_checks(nans: bool = True, disable_jit: bool = False):
    """Turn on global debug checks: NaN detection in every op result and
    (optionally) op-by-op execution."""
    jax.config.update("jax_debug_nans", nans)
    if disable_jit:
        jax.config.update("jax_disable_jit", True)


@contextlib.contextmanager
def debug_mode(nans: bool = True, disable_jit: bool = True):
    """Scoped debug mode: NaN checks + unjitted op-by-op execution."""
    prev_nans = jax.config.jax_debug_nans
    prev_jit = jax.config.jax_disable_jit
    try:
        jax.config.update("jax_debug_nans", nans)
        jax.config.update("jax_disable_jit", disable_jit)
        yield
    finally:
        jax.config.update("jax_debug_nans", prev_nans)
        jax.config.update("jax_disable_jit", prev_jit)


def assert_finite(tree, name: str = "tree"):
    """Host-side finiteness check over a pytree (eager contexts only)."""
    import numpy as np
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            key = jax.tree_util.keystr(path)
            raise FloatingPointError(
                f"non-finite values in {name}{key}: "
                f"nan={np.isnan(arr).sum()}, inf={np.isinf(arr).sum()}")
