"""Load modules from the read-only reference repo for golden-value tests.

The reference's ``token_sequencer`` module defines a ``flax.struct.dataclass``
with mutable jnp-array defaults, which is a hard error on Python 3.12.  We
import it with ``flax.struct.dataclass`` temporarily stubbed out so the parts
under test (TokenSequence / mask rules / ToMe math) load unchanged.
"""

import importlib.util
import sys
import types

REF_ROOT = "/root/reference"


def _ensure_ref_path():
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)


def load_ref_token_sequencer():
    _ensure_ref_path()
    name = "_ref_token_sequencer"
    if name in sys.modules:
        return sys.modules[name]
    import flax.struct as fs

    orig = fs.dataclass
    fs.dataclass = lambda cls=None, **kw: (cls if cls is not None else (lambda c: c))
    try:
        spec = importlib.util.spec_from_file_location(
            name,
            f"{REF_ROOT}/multi_modal_transformers/tokenizers/token_sequencer.py",
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    finally:
        fs.dataclass = orig
    return mod


def load_ref_image_tokenizer():
    """Load the reference image tokenizer module with hydra/omegaconf
    stubbed (only the pure functions image_to_patches /
    encode_patch_position are used)."""
    _ensure_ref_path()
    name = "_ref_image_tokenizer"
    if name in sys.modules:
        return sys.modules[name]

    import hydra_shim
    hydra_shim.install()

    spec = importlib.util.spec_from_file_location(
        name,
        f"{REF_ROOT}/multi_modal_transformers/tokenizers/images/"
        "image_tokenizer.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_ref_attention():
    """Load the reference's attention blocks with the working hydra shim so
    Encoder1DBlock / MLPBlock actually execute."""
    _ensure_ref_path()
    name = "_ref_attention"
    if name in sys.modules:
        return sys.modules[name]
    import hydra_shim
    hydra_shim.install()
    spec = importlib.util.spec_from_file_location(
        name,
        f"{REF_ROOT}/multi_modal_transformers/attention_blocks/attention.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_ref_octo():
    """Import the reference's WHOLE package (models.octo.octo) so its full
    Octo model can be executed end-to-end.

    Needs four shims, none of which alter reference behavior:
    * hydra/omegaconf — working ``instantiate``/``call`` (hydra_shim);
    * ``wandb`` / ``sentencepiece`` — inert import-time stubs (wandb.log is
      only reached from the un-jitted train steps, which we don't call);
    * ``flax.struct.dataclass`` — reference ``TokenEmbeddings`` declares
      mutable ``jnp.array`` defaults (token_sequencer.py:342-346), a hard
      error on Python 3.12; we rewrite such defaults into
      ``default_factory`` fields and then apply the REAL struct.dataclass,
      so the class behaves exactly as intended.
    """
    _ensure_ref_path()
    name = "multi_modal_transformers.models.octo.octo"
    if name in sys.modules:
        return sys.modules[name]

    import hydra_shim
    hydra_shim.install()
    for mod_name, attrs in (("wandb", {"log": lambda *a, **k: None}),
                            ("sentencepiece", {})):
        if mod_name not in sys.modules:
            m = types.ModuleType(mod_name)
            # a real ModuleSpec so importlib.util.find_spec (used by
            # transformers' import scanner) accepts the stub
            m.__spec__ = importlib.machinery.ModuleSpec(mod_name, loader=None)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[mod_name] = m

    import dataclasses as dc

    import flax.struct as fs
    import jax

    orig = fs.dataclass

    def patched(cls=None, **kw):
        if cls is None:
            return lambda c: patched(c, **kw)
        for fname in list(getattr(cls, "__annotations__", {})):
            v = getattr(cls, fname, None)
            if isinstance(v, jax.Array):
                setattr(cls, fname,
                        dc.field(default_factory=lambda v=v: v))
        return orig(cls, **kw)

    fs.dataclass = patched
    try:
        mod = importlib.import_module(name)
    finally:
        fs.dataclass = orig
    return mod


def load_ref_token_compression():
    _ensure_ref_path()
    name = "_ref_token_compression"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name,
        f"{REF_ROOT}/multi_modal_transformers/tokenizers/token_compression.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
