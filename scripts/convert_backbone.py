#!/usr/bin/env python
"""Convert a local HF torch checkpoint into a flax backbone param file.

The runtime loader (models/modules/pretrained_loading.py) consumes the
output via the config key ``CONVERTED_WEIGHTS`` — the offline equivalent of
the reference's unconditional ``AutoModel.from_pretrained``
(/root/reference/models/modules/text_embeddings.py:303-337).

Usage:
  python scripts/convert_backbone.py --family bert \
      --checkpoint /path/to/hf_dir_or_cached_name \
      --out /path/to/backbone.msgpack [--layers N]

Families: bert, roberta (incl. phobert/xlm-r), t5 (incl. mt5), albert,
deberta (v2/v3), vit.
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--family", required=True,
                        choices=["bert", "roberta", "t5", "albert", "deberta", "vit"])
    parser.add_argument("--checkpoint", required=True,
                        help="HF name (must be in the local cache) or a local dir")
    parser.add_argument("--out", required=True,
                        help=".msgpack (flax) or .npz ('/'-joined keys)")
    parser.add_argument("--layers", type=int, default=None,
                        help="truncate to the first N encoder layers")
    args = parser.parse_args()

    from openvivqa_tpu.models.modules.pretrained_loading import (
        _hf_state_dict,
        convert_hf_checkpoint,
    )

    _, hf_config = _hf_state_dict(args.family, args.checkpoint)
    depth = args.layers or int(
        getattr(hf_config, "num_hidden_layers", 0)
        or getattr(hf_config, "num_layers", 0)
    )
    converted = convert_hf_checkpoint(args.family, args.checkpoint, depth)

    if args.out.endswith(".npz"):
        import numpy as np

        flat = {}

        def flatten(tree, prefix=""):
            for key, value in tree.items():
                here = f"{prefix}/{key}" if prefix else str(key)
                if hasattr(value, "keys"):
                    flatten(value, here)
                else:
                    flat[here] = np.asarray(value)

        flatten(converted)
        np.savez_compressed(args.out, **flat)
    else:
        from flax import serialization

        with open(args.out, "wb") as handle:
            handle.write(serialization.msgpack_serialize(converted))
    print(f"wrote {args.out} ({args.family}, {depth} layers)")


if __name__ == "__main__":
    main()
