"""CLI entry point (parity: /root/reference/train.py:1-18).

    python train.py --config-file configs/saaa.yaml [--opts KEY=VALUE ...]
"""

from __future__ import annotations

import argparse

from .builders import build_task, populate
from .config import get_config
from .logging_utils import setup_logger


def _parse_opts(pairs):
    """KEY.SUBKEY=value overrides (our addition; SURVEY.md §5.6)."""
    import yaml

    overrides = {}
    for pair in pairs or []:
        key, _, value = pair.partition("=")
        node = overrides
        parts = key.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = yaml.safe_load(value)
    return overrides


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (first TPU compiles are 20-40s;
    cached reruns are instant).  Override dir via OPENVIVQA_COMPILE_CACHE;
    disable with OPENVIVQA_COMPILE_CACHE=off."""
    import os

    cache_dir = os.environ.get(
        "OPENVIVQA_COMPILE_CACHE",
        os.path.expanduser("~/.cache/openvivqa_tpu/xla"),
    )
    if cache_dir.lower() in ("off", "0", "none"):
        return
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass


def main(argv=None):
    logger = setup_logger()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", type=str, required=True)
    parser.add_argument("--opts", nargs="*", default=None)
    parser.add_argument(
        "--eval-only",
        action="store_true",
        help="skip training; evaluate the existing best_model.pth on the "
        "test split (e.g. right after tools/migrate_checkpoint)",
    )
    args = parser.parse_args(argv)

    _enable_compilation_cache()
    populate()
    config = get_config(args.config_file, _parse_opts(args.opts))
    task = build_task(config)
    if not args.eval_only:
        task.start()
    task.get_predictions()
    logger.info("Task done.")


if __name__ == "__main__":
    main()
