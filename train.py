#!/usr/bin/env python
"""Repo-root launcher: python train.py --config-file <yaml>."""

from openvivqa_tpu.train import main

if __name__ == "__main__":
    main()
