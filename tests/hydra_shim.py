"""Minimal hydra/omegaconf shim so the reference's modules (which call
``hydra.utils.instantiate``/``call`` inside their forward passes) can
actually execute in tests — enabling true end-to-end numerical comparison
against reference code that is otherwise unrunnable in this image.
"""

import functools
import importlib
import sys
import types
from collections.abc import Mapping

__all__ = ["install", "instantiate", "call"]


def _resolve(target: str):
    mod, _, name = target.rpartition(".")
    return getattr(importlib.import_module(mod), name)


def _build(cfg, *args, **overrides):
    if not isinstance(cfg, Mapping) or "_target_" not in cfg:
        return cfg
    cfg = dict(cfg)
    target = _resolve(cfg.pop("_target_"))
    partial = cfg.pop("_partial_", False)
    cfg.pop("_recursive_", None)
    kwargs = {k: _build(v) if isinstance(v, Mapping) else v
              for k, v in cfg.items()}
    kwargs.update(overrides)
    if partial:
        return functools.partial(target, *args, **kwargs)
    return target(*args, **kwargs)


def instantiate(cfg, *args, _recursive_=True, _partial_=False, **kw):
    if _partial_:
        built = dict(cfg)
        built["_partial_"] = True
        return _build(built, *args, **kw)
    return _build(cfg, *args, **kw)


def call(cfg, *args, **kw):
    out = _build(cfg)
    if callable(out) and (args or kw):
        return out(*args, **kw)
    return out


def install():
    """Register hydra/omegaconf stub modules backed by this shim (idempotent;
    replaces any inert stubs installed earlier in the process)."""
    hydra = sys.modules.get("hydra") or types.ModuleType("hydra")
    utils = sys.modules.get("hydra.utils") or types.ModuleType("hydra.utils")
    utils.instantiate = instantiate
    utils.call = call
    hydra.utils = utils
    sys.modules["hydra"] = hydra
    sys.modules["hydra.utils"] = utils
    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")
        oc.OmegaConf = object
        oc.DictConfig = dict
        sys.modules["omegaconf"] = oc
