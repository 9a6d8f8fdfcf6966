"""GPipe-style pipeline parallelism for the scanned transformer stack.

The reference has no parallelism of any kind (SURVEY.md §2 rows 23-24); at
OCTO scale (1 block, 74 tokens) pipelining has no workload — this module
exists for the deep-stack configs (12+ blocks, longer multi-camera
sequences) and to complete the parallelism matrix (DP / TP / FSDP / PP).

TPU-idiomatic design: the layer dimension that ``nn.scan`` already gives the
stacked block parameters — ``(L, ...)`` per leaf — is reshaped to
``(num_stages, L/num_stages, ...)`` and sharded over a ``pipe`` mesh axis
with ``shard_map``.  Microbatches stream through the stages with
``jax.lax.ppermute`` ring shifts (ICI neighbor exchange); each device scans
its own layer slice.  The whole schedule is one ``lax.scan`` — fully
differentiable, so the same code path serves training (the backward replays
the pipeline in reverse via the transposed ppermute).

Schedule: plain GPipe — M microbatches over P stages in M + P - 1 ticks
with (P-1)/(M+P-1) bubble overhead.  Choose M >= P for efficiency.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["split_stages", "pipelined_apply", "PIPE_AXIS"]

PIPE_AXIS = "pipe"


def split_stages(stacked_params, num_stages: int):
    """Reshape nn.scan-stacked block params ``(L, ...)`` into
    ``(num_stages, L/num_stages, ...)`` for sharding over the pipe axis."""
    def reshape(leaf):
        if leaf.shape[0] % num_stages:
            raise ValueError(
                f"{leaf.shape[0]} layers not divisible by "
                f"{num_stages} pipeline stages")
        return leaf.reshape(num_stages, leaf.shape[0] // num_stages,
                            *leaf.shape[1:])
    return jax.tree.map(reshape, stacked_params)


def pipelined_apply(
    layer_fn: Callable,
    stage_params,
    x: jax.Array,
    mesh: Mesh,
    num_microbatches: int,
    axis: str = PIPE_AXIS,
    data_axis: str = None,
) -> jax.Array:
    """Run ``x`` through all pipeline stages.

    Args:
      layer_fn: ``(one_layer_params, x) -> x`` — applies a single block
        (e.g. an ``EncoderBlock.apply`` with the mask closed over).
      stage_params: output of :func:`split_stages` —
        ``(num_stages, layers_per_stage, ...)`` leaves, laid out (or to be
        laid out) with axis 0 on the ``pipe`` mesh axis.
      x: ``(B, ...)`` activations; B must divide by ``num_microbatches``
        (times the data-axis size when ``data_axis`` is given).
      mesh: mesh containing ``axis`` (and ``data_axis`` if used).
      num_microbatches: GPipe microbatch count (M >= P recommended).
      data_axis: optional second mesh axis for combined PP x DP — each
        microbatch's batch dimension shards over it (params replicate
        across it; the backward inserts the data-axis grad psum
        automatically through shard_map's transpose).

    Returns ``(B, ...)`` outputs, replicated over the pipe axis and
    sharded over the data axis.
    """
    num_stages = mesh.shape[axis]
    b = x.shape[0]
    if b % num_microbatches:
        raise ValueError(f"batch {b} not divisible by M={num_microbatches}")
    if data_axis is not None and (
            (b // num_microbatches) % mesh.shape[data_axis]):
        raise ValueError(
            f"microbatch size {b // num_microbatches} not divisible by the "
            f"data axis ({mesh.shape[data_axis]})")
    mbs = x.reshape(num_microbatches, b // num_microbatches, *x.shape[1:])
    batch_spec = P(None, data_axis) if data_axis else P()

    def stage_fn(params, h):
        def body(h, layer_params):
            return layer_fn(layer_params, h), None
        h, _ = jax.lax.scan(body, h, params)
        return h

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), batch_spec), out_specs=batch_spec,
        check_vma=False)
    def run(stage_params, mbs):
        # shard_map gives this device a (1, L/P, ...) slice; drop the axis
        params = jax.tree.map(lambda t: t[0], stage_params)
        idx = jax.lax.axis_index(axis)
        p = num_stages
        m = mbs.shape[0]
        perm = [(i, (i + 1) % p) for i in range(p)]

        def tick(carry, t):
            state, outputs = carry
            # stage 0 ingests microbatch t; other stages keep what the ring
            # delivered last tick
            inject = jax.lax.dynamic_index_in_dim(
                mbs, jnp.clip(t, 0, m - 1), keepdims=False)
            state = jnp.where(idx == 0, inject, state)
            out = stage_fn(params, state)
            # the last stage finishes microbatch t-(P-1) at tick t
            out_t = t - (p - 1)
            valid = (idx == p - 1) & (out_t >= 0)
            updated = jax.lax.dynamic_update_index_in_dim(
                outputs, out, jnp.clip(out_t, 0, m - 1), 0)
            outputs = jnp.where(valid, updated, outputs)
            state = jax.lax.ppermute(out, axis, perm)
            return (state, outputs), None

        state0 = jnp.zeros_like(mbs[0])
        out0 = jnp.zeros_like(mbs)
        (_, outputs), _ = jax.lax.scan(
            tick, (state0, out0), jnp.arange(m + p - 1))
        # results live on the last stage only; broadcast them to every
        # device so downstream (replicated) heads can consume directly
        return jax.lax.psum(
            jnp.where(idx == p - 1, outputs, jnp.zeros_like(outputs)), axis)

    out = run(stage_params, mbs)
    return out.reshape(b, *x.shape[1:])
