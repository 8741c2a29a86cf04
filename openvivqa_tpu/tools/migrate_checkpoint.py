"""Migrate a reference (torch) checkpoint into this framework's task format.

Users with trained `last_model.pth` / `best_model.pth` files from the
PyTorch reference (tasks/base_task.py:78-112 layout: a torch.save dict with
`state_dict`, `epoch`, `best_val_score`, ...) can convert them in place:

    python -m openvivqa_tpu.tools.migrate_checkpoint \
        --config config.yaml --checkpoint /path/to/best_model.pth

This builds the task from the config (so vocab/datasets/model match what
training will use), converts the weights through
`convert_reference_checkpoint` (supported architectures listed there),
validates every leaf's shape against the freshly-initialised model, and
writes a resumable `last_model.pth` in the task's checkpoint dir with a
fresh optimizer state.  `--also-best` additionally copies it to
`best_model.pth` so evaluation-only runs pick it up.

Note: reference BERT stacks use the HF default intermediate size (3072)
regardless of HIDDEN_SIZE; for checkpoints trained at hidden != 768, set
`MMT.INTERMEDIATE_SIZE: 3072` (and `TEXT_BERT.INTERMEDIATE_SIZE`) in the
config — the shape validation reports the exact mismatching leaves if not.
"""

from __future__ import annotations

import argparse
import os
import shutil
from typing import Optional, Sequence


def migrate(config, torch_checkpoint: str, also_best: bool = False) -> str:
    import jax
    import jax.numpy as jnp
    import torch

    from ..builders import build_task, populate
    from ..logging_utils import setup_logger
    from ..models.modules.torch_conversion import convert_reference_checkpoint
    from ..training.checkpoint import BEST_NAME, LAST_NAME
    from ..training.checkpoint import promote as checkpoint_promote

    logger = setup_logger()
    populate()
    task = build_task(config)

    checkpoint = torch.load(
        torch_checkpoint, map_location="cpu", weights_only=False
    )
    converted = jax.tree.map(
        jnp.asarray, convert_reference_checkpoint(checkpoint, config.MODEL)
    )

    # every converted leaf must match the freshly-initialised tree exactly
    want_map = {
        jax.tree_util.keystr(path): leaf.shape
        for path, leaf in jax.tree_util.tree_leaves_with_path(task.state.params)
    }
    got_map = {
        jax.tree_util.keystr(path): leaf.shape
        for path, leaf in jax.tree_util.tree_leaves_with_path(converted)
    }
    if set(want_map) != set(got_map):
        missing = sorted(set(want_map) - set(got_map))[:5]
        extra = sorted(set(got_map) - set(want_map))[:5]
        raise ValueError(
            f"converted tree does not match the model built from the config; "
            f"missing: {missing} extra: {extra}"
        )
    mismatched = [key for key in want_map if want_map[key] != got_map[key]]
    if mismatched:
        detail = {k: (want_map[k], got_map[k]) for k in mismatched[:5]}
        raise ValueError(f"shape mismatches (model vs checkpoint): {detail}")

    task.state = task.state.replace(params=converted)
    task.epoch = int(checkpoint.get("epoch", 0))
    task.save_checkpoint(
        {
            "best_val_score": float(checkpoint.get("best_val_score", -1.0)),
            "patience": int(checkpoint.get("patience", 0)),
            "use_rl": bool(checkpoint.get("use_rl", False)),
        }
    )
    last = os.path.join(task.checkpoint_path, LAST_NAME)
    logger.info("Wrote migrated checkpoint to %s (epoch %d)", last, task.epoch)
    if also_best:
        best = os.path.join(task.checkpoint_path, BEST_NAME)
        checkpoint_promote(last, best)
        logger.info("Copied to %s", best)
    return last


def main(argv: Optional[Sequence[str]] = None) -> None:
    from ..config import get_config

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True, help="task YAML config")
    parser.add_argument(
        "--checkpoint", required=True, help="reference torch .pth file"
    )
    parser.add_argument(
        "--also-best", action="store_true",
        help="also write best_model.pth (for evaluation-only runs)",
    )
    args = parser.parse_args(argv)
    migrate(get_config(args.config), args.checkpoint, also_best=args.also_best)


if __name__ == "__main__":
    main()
