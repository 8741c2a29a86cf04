"""Every reference config must build against this framework: vocab,
datasets, model, and a traced init (jax.eval_shape — full graph wiring
without compute).  This covers the reference's dangling registry names too
(SURVEY.md §2.3: ExtendedMCAN, T5Embedding, MultiModalEncoder and the
commented-out model imports all crash the reference as checked out; here
every config must pass)."""

import glob
import os

import jax
import numpy as np
import pytest

from openvivqa_tpu.builders import (
    build_dataset,
    build_model,
    build_vocab,
    populate,
)
from openvivqa_tpu.config import get_config
from openvivqa_tpu.utils.instance import collate

populate()

REFERENCE_CONFIGS = sorted(glob.glob("/root/reference/configs/*.yaml"))
SKIP_FILES = {"utils.py"}


def _override_paths(config, paths):
    """Point every data path in the config at the synthetic store."""
    json_paths = {
        "TRAIN": paths["train"],
        "DEV": paths["dev"],
        "TEST": paths["test"],
        "PUBLIC_TEST": paths["test"],
        "PRIVATE_TEST": paths["test"],
    }
    feature_paths = {
        "FEATURES": paths["features"],
        "SCENE_TEXT": paths["scene_text"],
        "IMAGE": paths["images"],
    }
    overrides = {"DATASET": {"JSON_PATH": {}}}
    dataset = config.DATASET
    section_overrides = {
        "FEATURE_PATH": feature_paths,
        "MAX_REGIONS": 36,
        "IMAGE_SIZE": 32,
        "MAX_SCENE_TEXT": 8,
    }
    flat_schema = dataset.get("FEATURE_DATASET") is None  # older flat configs
    if flat_schema:
        overrides["DATASET"].update(section_overrides)
    for key in ("FEATURE_DATASET", "DICT_DATASET"):
        section = dataset.get(key)
        if section is None:
            continue
        overrides["DATASET"][key] = dict(section_overrides)
    vocab_section = dataset.get("VOCAB")
    if vocab_section is not None:
        existing = vocab_section.get("JSON_PATH") or {}
        overrides["DATASET"]["VOCAB"] = {
            "JSON_PATH": {k: json_paths.get(k) for k in set(existing) | {"TRAIN", "DEV", "TEST"}}
        }
    existing_jp = dataset.get("JSON_PATH") or {}
    overrides["DATASET"]["JSON_PATH"] = {
        k: json_paths.get(k) for k in set(existing_jp) | {"TRAIN", "DEV", "TEST"}
    }
    return config.merged(overrides)


@pytest.mark.parametrize(
    "config_path", REFERENCE_CONFIGS, ids=[os.path.basename(p) for p in REFERENCE_CONFIGS]
)
def test_reference_config_builds(config_path, synthetic_data):
    config = _override_paths(get_config(config_path), synthetic_data)

    vocab = build_vocab(config.DATASET.VOCAB)
    # a few configs (extended_mcan_vlsp, vit_mbert_classification) use the
    # older flat DATASET schema without FEATURE_DATASET nesting
    feature_section = config.DATASET.get("FEATURE_DATASET") or config.DATASET
    dataset = build_dataset(
        config.DATASET.JSON_PATH.TRAIN, vocab, feature_section
    )
    assert len(dataset) > 0
    samples = [dataset[i] for i in range(min(2, len(dataset)))]
    batch = collate(samples, batch_pad_to=2)

    dict_section = config.DATASET.get("DICT_DATASET")
    if dict_section is not None:
        dict_dataset = build_dataset(
            config.DATASET.JSON_PATH.DEV, vocab, dict_section
        )
        assert len(dict_dataset) > 0
        _ = dict_dataset[0]

    model = build_model(config.MODEL, vocab)
    arrays = batch.arrays()
    shapes = jax.eval_shape(
        lambda r: model.init(
            {"params": r, "dropout": r}, arrays, train=False
        ),
        jax.random.PRNGKey(0),
    )
    assert "params" in shapes

    # trace one full train step (loss + grads) — validates every config's
    # differentiable path without compute (SURVEY.md §4.3 in spirit)
    def train_trace(rng):
        variables = model.init({"params": rng, "dropout": rng}, arrays, train=False)

        def loss_fn(params):
            out = model.apply(
                {"params": params,
                 **({"frozen": variables["frozen"]} if "frozen" in variables else {})},
                arrays, train=True, rngs={"dropout": rng},
            )
            scores = out["scores"] if isinstance(out, dict) else out
            return jnp.sum(scores.astype(jnp.float32) ** 2)

        return jax.grad(loss_fn)(variables["params"])

    import jax.numpy as jnp

    grads = jax.eval_shape(train_trace, jax.random.PRNGKey(1))
    assert jax.tree_util.tree_leaves(grads)
