"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set the platform flags *before* jax initialises (SURVEY.md §4.5: the
host-platform device-count trick gives multi-device semantics without TPU
hardware).
"""

import os

# tests exercise the documented pseudo-random fallback deliberately
os.environ.setdefault("OPENVIVQA_ALLOW_RANDOM_EMBEDDINGS", "1")

# NOTE: in this image the JAX_PLATFORMS env var is ignored (the axon TPU
# plugin wins); JAX_PLATFORM_NAME + jax.config.update do work.
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

from openvivqa_tpu.data.synthetic import generate_synthetic_dataset  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthetic")
    return generate_synthetic_dataset(str(root), seed=0)
