"""OpenViVQA-TPU: a TPU-native (JAX/XLA/Pallas) framework with the
capabilities of hieunghia-pat/OpenViVQA (PyTorch reference mounted at
/root/reference, studied for behaviour only).

Layers (mirroring SURVEY.md §1, re-designed TPU-first):
  config.py / registry.py / builders.py  - config-driven dependency injection
  data/                                  - vocabs, datasets, host pipeline
  models/                                - flax.linen model zoo + module library
  ops/                                   - Pallas TPU kernels
  parallel/                              - device mesh + shardings
  training/                              - tasks, trainer, decode, checkpoint
  evaluation/                            - host-side metric suite
"""

__version__ = "0.1.0"

from .config import ConfigNode, get_config  # noqa: F401
from .registry import Registry  # noqa: F401
