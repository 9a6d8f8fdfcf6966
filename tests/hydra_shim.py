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


class AttrDict(Mapping):
    """Mapping with attribute access — stands in for OmegaConf's DictConfig
    so reference modules can do ``config.tokenizers.text.encoder``.

    Deliberately NOT a dict subclass: flax converts dict-valued module
    attributes into FrozenDicts (losing attribute access), but leaves
    non-dict Mappings alone — exactly how the real DictConfig behaves."""

    def __init__(self, data=None, **kw):
        self._data = dict(data or {}, **kw)

    def __getitem__(self, key):
        return self._data[key]

    def __iter__(self):
        return iter(self._data)

    def __len__(self):
        return len(self._data)

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        try:
            return self._data[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def pop(self, *args):
        return self._data.pop(*args)

    def __repr__(self):
        return f"AttrDict({self._data!r})"

    @classmethod
    def deep(cls, obj):
        """Recursively convert nested dicts/lists into AttrDicts."""
        if isinstance(obj, Mapping):
            return cls({k: cls.deep(v) for k, v in obj.items()})
        if isinstance(obj, (list, tuple)) and not isinstance(obj, str):
            converted = [cls.deep(v) for v in obj]
            return converted if isinstance(obj, list) else tuple(converted)
        return obj


def install():
    """Register hydra/omegaconf stub modules backed by this shim (idempotent;
    replaces any inert stubs installed earlier in the process)."""
    hydra = sys.modules.get("hydra") or types.ModuleType("hydra")
    utils = sys.modules.get("hydra.utils") or types.ModuleType("hydra.utils")
    utils.instantiate = instantiate
    utils.call = call
    hydra.utils = utils
    # inert stubs for hydra's compose API, imported (never exercised) by
    # the reference's octo.py:41-44 module scope
    core = sys.modules.get("hydra.core") or types.ModuleType("hydra.core")
    store = (sys.modules.get("hydra.core.config_store")
             or types.ModuleType("hydra.core.config_store"))
    store.ConfigStore = type("ConfigStore", (), {
        "instance": classmethod(lambda cls: cls())})
    gh = (sys.modules.get("hydra.core.global_hydra")
          or types.ModuleType("hydra.core.global_hydra"))
    gh.GlobalHydra = type("GlobalHydra", (), {
        "instance": classmethod(lambda cls: cls()),
        "clear": lambda self: None})
    core.config_store = store
    core.global_hydra = gh
    hydra.core = core
    hydra.compose = lambda *a, **k: None
    hydra.initialize = lambda *a, **k: None
    sys.modules["hydra"] = hydra
    sys.modules["hydra.utils"] = utils
    sys.modules["hydra.core"] = core
    sys.modules["hydra.core.config_store"] = store
    sys.modules["hydra.core.global_hydra"] = gh
    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")
        oc.OmegaConf = object
        oc.DictConfig = AttrDict
        sys.modules["omegaconf"] = oc
    sys.modules["omegaconf"].DictConfig = AttrDict
