"""Multi-host initialization.

The reference is single-process with no distributed runtime
(SURVEY.md §2 row 24).  On TPU pods, cross-host coordination rides DCN via
``jax.distributed.initialize``; within a slice, collectives ride ICI through
``jit`` over the mesh — no explicit transport layer is needed or built.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

__all__ = ["initialize_multihost", "is_multihost", "process_info"]


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize the JAX distributed runtime for multi-host TPU slices.

    On Cloud TPU the arguments are auto-detected from the metadata server;
    elsewhere pass them explicitly (or via JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID).  No-op when already initialized or
    when running single-process.
    """
    if jax.process_count() > 1:
        return  # already initialized
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        # single host, nothing to do
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_multihost() -> bool:
    return jax.process_count() > 1


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }
