"""End-to-end generative: IterativeMCAN + OpenEndedTask on synthetic data
(train XE -> beam-search eval -> checkpoint -> predictions), plus one SCST
step."""

import json
import os

import pytest

from openvivqa_tpu.builders import build_task, populate
from openvivqa_tpu.config import ConfigNode


def _attn(d_model, stateful=False):
    return {
        "ARCHITECTURE": "ScaledDotProductAttention",
        "HEAD": 2, "D_MODEL": d_model, "D_KEY": 8, "D_VALUE": 8, "D_FF": 32,
        "USE_AOA": False, "CAN_BE_STATEFUL": stateful, "DROPOUT": 0.1,
    }


def _iterative_mcan_config(paths, tmp_path, d_model=32):
    dataset_section = {
        "FEATURE_DATASET": {
            "TYPE": "FeatureDataset",
            "BATCH_SIZE": 8,
            "WORKERS": 2,
            "MAX_REGIONS": 36,
            "FEATURE_PATH": {"FEATURES": paths["features"]},
        },
        "DICT_DATASET": {
            "TYPE": "DictionaryDataset",
            "BATCH_SIZE": 8,
            "WORKERS": 2,
            "MAX_REGIONS": 36,
            "FEATURE_PATH": {"FEATURES": paths["features"]},
        },
        "VOCAB": {
            "TYPE": "Vocab",
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
    }
    return ConfigNode(
        {
            "TASK": "OpenEndedTask",
            "DATASET": dataset_section,
            "TRAINING": {
                "CHECKPOINT_PATH": str(tmp_path / "saved_models"),
                "LEARNING_RATE": 1.0,
                "RL_LEARNING_RATE": 0.000005,
                "WARMUP": 100,
                "SCORE": "CIDEr",
                "TRAINING_BEAM_SIZE": 3,
                "EVALUATING_BEAM_SIZE": 2,
                "PATIENCE": 2,
                "MAX_EPOCHS": 2,
                "SEED": 11,
            },
            "MODEL": {
                "NAME": "iterative_mcan_test",
                "ARCHITECTURE": "IterativeMCAN",
                "DEVICE": "cuda",
                "D_MODEL": d_model,
                "VISION_EMBEDDING": {
                    "ARCHITECTURE": "FeatureEmbedding",
                    "D_FEATURE": 1024, "D_MODEL": d_model, "DROPOUT": 0.1,
                },
                "TEXT_EMBEDDING": {
                    "ARCHITECTURE": "UsualEmbedding",
                    "D_MODEL": d_model, "D_EMBEDDING": d_model, "DROPOUT": 0.1,
                    "WORD_EMBEDDING": None, "WORD_EMBEDDING_CACHE": None,
                },
                "SELF_ENCODER": {
                    "ARCHITECTURE": "Encoder", "D_MODEL": d_model, "LAYERS": 2,
                    "SELF_ATTENTION": _attn(d_model),
                },
                "GUIDED_ENCODER": {
                    "ARCHITECTURE": "GuidedAttentionEncoder", "D_MODEL": d_model,
                    "LAYERS": 2, "SELF_ATTENTION": _attn(d_model),
                    "GUIDED_ATTENTION": _attn(d_model),
                },
                "MULTIMODAL_FUSION": {
                    "D_MODEL": d_model, "D_FF": 32, "DROPOUT": 0.1,
                },
                "DECODER": {
                    "ARCHITECTURE": "Decoder", "D_MODEL": d_model, "LAYERS": 2,
                    "ATTENTION": {
                        "SELF_ATTENTION": _attn(d_model, stateful=True),
                        "ENC_ATTENTION": _attn(d_model),
                    },
                    "TEXT_EMBEDDING": {
                        "ARCHITECTURE": "UsualEmbedding",
                        "D_MODEL": d_model, "D_EMBEDDING": d_model,
                        "DROPOUT": 0.1, "WORD_EMBEDDING": None,
                        "WORD_EMBEDDING_CACHE": None,
                    },
                },
            },
        }
    )


def test_open_ended_end_to_end(synthetic_data, tmp_path):
    populate()
    config = _iterative_mcan_config(synthetic_data, tmp_path)
    task = build_task(config)
    task.start()

    ckpt_dir = os.path.join(config.TRAINING.CHECKPOINT_PATH, config.MODEL.NAME)
    assert os.path.isfile(os.path.join(ckpt_dir, "best_model.pth"))

    scores = task.get_predictions()
    assert "CIDEr" in scores
    with open(os.path.join(ckpt_dir, "test_results.json")) as handle:
        dumped = json.load(handle)
    assert len(dumped["results"]) > 0
    # generated answers must be strings over the vocab
    first = dumped["results"][0]["gens"]
    assert all(isinstance(v, str) for v in first.values())

    # one SCST step must run and update state
    step_before = int(task.state.step)
    task.train_scst()
    assert int(task.state.step) > step_before
