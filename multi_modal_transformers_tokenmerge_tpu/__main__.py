"""Package CLI.

    python -m multi_modal_transformers_tokenmerge_tpu info
    python -m multi_modal_transformers_tokenmerge_tpu layout "<sequence dsl>" [compression]
    python -m multi_modal_transformers_tokenmerge_tpu config <name> [overrides...]
"""

import json
import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    cmd = argv.pop(0) if argv else "info"

    if cmd == "info":
        import jax
        from . import __version__
        from .models.presets import PRESETS
        print(json.dumps({
            "version": __version__,
            "backend": jax.default_backend(),
            "devices": [str(d) for d in jax.devices()],
            "presets": sorted(PRESETS),
        }, indent=2))
        return 0

    if cmd == "layout":
        if not argv:
            print("usage: ... layout '<sequence>' ['<compression>']",
                  file=sys.stderr)
            return 2
        from .sequence.layout import SequenceLayout
        layout = SequenceLayout.from_strings(argv[0],
                                             argv[1] if len(argv) > 1 else None)
        print(json.dumps({
            "total_tokens": layout.total_tokens,
            "sets": [{"kind": s.kind, "tokens": s.num_tokens,
                      "timestep": s.timestep,
                      "compressed_per_layer": s.compressed_per_layer}
                     for s in layout.sets],
            "mask_density": round(float(layout.attention_mask().mean()), 4),
            "readout_positions": layout.modality_index("readouts").tolist(),
        }, indent=2))
        return 0

    if cmd == "config":
        if not argv:
            print("usage: ... config <name> [key=value ...]", file=sys.stderr)
            return 2
        import dataclasses
        from .core.yaml_loader import load_config
        cfg = load_config(argv[0], argv[1:])
        print(json.dumps(dataclasses.asdict(cfg), indent=2, default=str))
        return 0

    print(f"unknown command {cmd!r}; one of: info, layout, config",
          file=sys.stderr)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
