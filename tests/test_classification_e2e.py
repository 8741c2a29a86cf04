"""End-to-end: config -> task -> train epochs -> eval -> checkpoint ->
resume -> predictions JSON, on synthetic data (SAAA and MCAN)."""

import json
import os

import pytest

from openvivqa_tpu.builders import build_task, populate
from openvivqa_tpu.config import ConfigNode


def _attn(d_model):
    return {
        "ARCHITECTURE": "ScaledDotProductAttention",
        "HEAD": 2, "D_MODEL": d_model, "D_KEY": 8, "D_VALUE": 8, "D_FF": 32,
        "USE_AOA": False, "CAN_BE_STATEFUL": False, "DROPOUT": 0.1,
    }


def _base_config(paths, tmp_path, name, d_model=32):
    return {
        "TASK": "ClassificationTask",
        "DATASET": {
            "FEATURE_DATASET": {
                "TYPE": "FeatureClassificationDataset",
                "BATCH_SIZE": 8,
                "WORKERS": 2,
                "MAX_REGIONS": 36,
                "FEATURE_PATH": {"FEATURES": paths["features"]},
            },
            "VOCAB": {
                "TYPE": "ClassificationVocab",
                "TOKENIZER": None,
                "MIN_FREQ": 1,
                "WORD_EMBEDDING": None,
                "WORD_EMBEDDING_CACHE": None,
                "PAD_TOKEN": "<pad>", "BOS_TOKEN": "<bos>",
                "EOS_TOKEN": "<eos>", "UNK_TOKEN": "<unk>",
                "JSON_PATH": {
                    "TRAIN": paths["train"], "DEV": paths["dev"], "TEST": paths["test"],
                },
            },
            "JSON_PATH": {
                "TRAIN": paths["train"], "DEV": paths["dev"], "TEST": paths["test"],
            },
        },
        "TRAINING": {
            "CHECKPOINT_PATH": str(tmp_path / "saved_models"),
            "LEARNING_RATE": 0.01,
            "WARMUP": 100,
            "SCORE": "CIDEr",
            "GET_SCORES": True,
            "PATIENCE": 2,
            "MAX_EPOCHS": 2,
            "SEED": 7,
        },
        "MODEL": {
            "NAME": name,
            "DEVICE": "cuda",  # accepted-and-ignored (SURVEY.md §7.1)
            "D_MODEL": d_model,
        },
    }


def _saaa_config(paths, tmp_path):
    cfg = _base_config(paths, tmp_path, "saaa_test")
    cfg["MODEL"].update(
        {
            "ARCHITECTURE": "SAAA",
            "VISION_PROCESSOR": {
                "ARCHITECTURE": "FeatureEmbedding",
                "D_FEATURE": 1024, "D_MODEL": 32, "DROPOUT": 0.1,
            },
            "TEXT_PROCESSOR": {
                "ARCHITECTURE": "LSTMTextEmbedding",
                "D_MODEL": 32, "D_EMBEDDING": 16, "DROPOUT": 0.1,
                "WORD_EMBEDDING": None, "WORD_EMBEDDING_CACHE": None,
            },
            "ATTENTION": {
                "D_VISION": 32, "D_LANGUAGE": 32, "D_MODEL": 32,
                "DROPOUT": 0.1, "GLIMPSES": 2,
            },
        }
    )
    return ConfigNode(cfg)


def _mcan_config(paths, tmp_path):
    cfg = _base_config(paths, tmp_path, "mcan_test")
    cfg["MODEL"].update(
        {
            "ARCHITECTURE": "MCAN",
            "VISION_EMBEDDING": {
                "ARCHITECTURE": "FeatureEmbedding",
                "D_FEATURE": 1024, "D_MODEL": 32, "DROPOUT": 0.1,
            },
            "TEXT_EMBEDDING": {
                "ARCHITECTURE": "LSTMTextEmbedding",
                "D_MODEL": 32, "D_EMBEDDING": 16, "DROPOUT": 0.1,
                "WORD_EMBEDDING": None, "WORD_EMBEDDING_CACHE": None,
            },
            "SELF_ENCODER": {
                "ARCHITECTURE": "Encoder",
                "D_MODEL": 32, "LAYERS": 2, "SELF_ATTENTION": _attn(32),
            },
            "GUIDED_ENCODER": {
                "ARCHITECTURE": "GuidedAttentionEncoder",
                "D_MODEL": 32, "LAYERS": 2,
                "SELF_ATTENTION": _attn(32), "GUIDED_ATTENTION": _attn(32),
            },
            "VISION_ATTR_REDUCE": {"D_MODEL": 32, "DROPOUT": 0.1},
            "TEXT_ATTR_REDUCE": {"D_MODEL": 32, "DROPOUT": 0.1},
        }
    )
    return ConfigNode(cfg)


@pytest.mark.parametrize("make_config", [_saaa_config, _mcan_config])
def test_classification_end_to_end(synthetic_data, tmp_path, make_config):
    populate()
    config = make_config(synthetic_data, tmp_path)
    task = build_task(config)
    task.start()

    ckpt_dir = os.path.join(
        config.TRAINING.CHECKPOINT_PATH, config.MODEL.NAME
    )
    assert os.path.isfile(os.path.join(ckpt_dir, "last_model.pth"))
    assert os.path.isfile(os.path.join(ckpt_dir, "best_model.pth"))
    assert os.path.isfile(os.path.join(ckpt_dir, "vocab.bin"))

    scores = task.get_predictions()
    assert "CIDEr" in scores and "Accuracy" in scores
    with open(os.path.join(ckpt_dir, "test_results.json")) as handle:
        dumped = json.load(handle)
    assert "results" in dumped and len(dumped["results"]) > 0

    # resume: a fresh task picks up the checkpoint and continues
    task2 = build_task(config)
    meta = task2.load_checkpoint(os.path.join(ckpt_dir, "last_model.pth"))
    assert meta is not None and "best_val_score" in meta


def test_transfer_dtype_bf16(synthetic_data, tmp_path):
    """TRAINING.TRANSFER_DTYPE bfloat16: float inputs are cast on host
    before the H2D copy (halved transfer bytes); training still converges
    and checkpoints round-trip."""
    populate()
    config = ConfigNode(_saaa_config(synthetic_data, tmp_path)).merged(
        {
            "TRAINING": {"TRANSFER_DTYPE": "bfloat16"},
            "MODEL": {"NAME": "saaa_bf16_transfer"},
        }
    )
    task = build_task(config)
    device_batch = task.put_batch(task.example_batch())
    import jax.numpy as jnp

    floats = [v for v in device_batch.values() if v.dtype == jnp.bfloat16]
    assert floats, "no float arrays were cast to bfloat16"
    task.start()
    assert task.epoch >= 1


def test_eval_only_cli(synthetic_data, tmp_path):
    """train.py --eval-only: evaluates an existing best checkpoint without
    training; errors clearly when none exists."""
    import yaml

    from openvivqa_tpu.train import main

    config = ConfigNode(_saaa_config(synthetic_data, tmp_path)).merged(
        {"MODEL": {"NAME": "saaa_evalonly"}, "TRAINING": {"MAX_EPOCHS": 1}}
    )
    yaml_path = tmp_path / "evalonly.yaml"
    yaml_path.write_text(yaml.safe_dump(config.to_dict()))

    # no checkpoint yet -> clear error
    with pytest.raises(FileNotFoundError, match="best_model"):
        main(["--config-file", str(yaml_path), "--eval-only"])

    main(["--config-file", str(yaml_path)])  # train once
    results = (
        tmp_path / "saved_models" / "saaa_evalonly" / "test_results.json"
    )
    before = results.stat().st_mtime
    main(["--config-file", str(yaml_path), "--eval-only"])  # re-eval only
    assert results.stat().st_mtime >= before
