"""Device mesh + sharding rules.

The reference has **no parallelism at all** (SURVEY.md §2 rows 23-24: no
pjit/pmap/Mesh anywhere).  This module is the TPU-native scale-out layer:

* a ``(data, model)`` 2-D :class:`jax.sharding.Mesh` over ICI;
* batch sharding along ``data`` (pure DP — XLA inserts the psum grad
  all-reduce);
* optional tensor-parallel parameter sharding along ``model`` via
  PartitionSpec rules on the parameter pytree (XLA inserts all-gathers /
  reduce-scatters), plus optional FSDP-style sharding of large replicated
  parameters along ``data``.

Everything rides ``jit`` + ``NamedSharding`` — no explicit collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "param_shardings",
           "shard_params", "DATA_AXIS", "MODEL_AXIS"]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh.  ``data=None`` uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(
            f"mesh {data}x{model} != {n} available devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _spec_for_param(path: str, shape, model_parallel: bool,
                    fsdp: bool, data_size: int, model_size: int,
                    fsdp_min_size: int = 2 ** 16):
    """Tensor-parallel PartitionSpec rules keyed on parameter role.

    Megatron-style: qkv projections split by head, attention-out and
    mlp dense_out contract over the sharded dim, mlp dense_in splits the
    hidden dim.  Axes are indexed from the END of the shape so the rules
    apply equally to plain kernels and nn.scan-stacked kernels with a
    leading layer dimension (e.g. (E,H,D) and (L,E,H,D)).
    """
    ndim = len(shape)
    spec = [None] * ndim

    def _try(axis_from_end):
        axis = ndim - axis_from_end
        if 0 <= axis < ndim and shape[axis] % model_size == 0:
            spec[axis] = MODEL_AXIS

    if model_parallel and model_size > 1:
        leaf = path.rsplit("/", 2)[-2:]  # [module, param] tail
        tail = "/".join(leaf)
        if tail in ("query/kernel", "key/kernel", "value/kernel",
                    "q/kernel", "k/kernel", "v/kernel"):
            # (..., E, H, D): shard heads
            _try(2)
        elif tail in ("out/kernel", "o/kernel") and ndim >= 3:
            # (..., H, D, E): contract over sharded heads
            _try(3)
        elif tail in ("dense_in/kernel", "wi/kernel"):
            # (..., E, F): split the hidden dim
            _try(1)
        elif tail in ("dense_out/kernel", "wo/kernel"):
            # (..., F, E): contract over the sharded hidden dim
            _try(2)
        elif leaf[-1] in ("expert_wi", "expert_wo"):
            # stacked experts (..., E, D, F): expert parallelism — shard
            # the expert dim; XLA inserts the dispatch/combine all-to-alls
            _try(3)
        elif leaf[-1] in ("expert_bi", "expert_bo"):
            # (..., E, F): expert-dim shard to match the kernels
            _try(2)

    if fsdp and data_size > 1 and all(s is None for s in spec):
        # shard the largest divisible axis of big replicated params over data
        if np.prod(shape) >= fsdp_min_size:
            order = sorted(range(ndim), key=lambda i: -shape[i])
            for i in order:
                if shape[i] % data_size == 0:
                    spec[i] = DATA_AXIS
                    break
    return P(*spec)


def param_shardings(params, mesh: Mesh, model_parallel: bool = True,
                    fsdp: bool = False, fsdp_min_size: int = 2 ** 16):
    """A pytree of NamedShardings matching ``params``."""
    data_size = mesh.shape[DATA_AXIS]
    model_size = mesh.shape[MODEL_AXIS]

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    shardings = []
    for path, leaf in flat:
        path_str = jax.tree_util.keystr(path, simple=True, separator="/")
        spec = _spec_for_param(path_str, leaf.shape, model_parallel, fsdp,
                               data_size, model_size, fsdp_min_size)
        shardings.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, shardings)


def shard_params(params, mesh: Mesh, model_parallel: bool = True,
                 fsdp: bool = False):
    """Place a parameter pytree onto the mesh per the sharding rules."""
    shardings = param_shardings(params, mesh, model_parallel, fsdp)
    return jax.tree.map(jax.device_put, params, shardings)
