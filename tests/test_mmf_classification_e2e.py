"""End-to-end LoRRA classification: MMF_LoRRA + MmfClassificationTask
(BCE loss over fixed vocab + OCR choices)."""

import json
import os

from openvivqa_tpu.builders import build_task, populate
from openvivqa_tpu.config import ConfigNode

D = 32
K = 8


def _config(paths, tmp_path):
    jp = {"TRAIN": paths["train"], "DEV": paths["dev"], "TEST": paths["test"]}
    return ConfigNode(
        {
            "TASK": "MmfClassificationTask",
            "DATASET": {
                "FEATURE_DATASET": {
                    "TYPE": "OcrClassificationDataset",
                    "BATCH_SIZE": 8, "WORKERS": 2, "MAX_REGIONS": 36,
                    "SCENE_TEXT_THRESHOLD": 0.3, "MAX_SCENE_TEXT": K,
                    "FEATURE_PATH": {
                        "FEATURES": paths["features"],
                        "SCENE_TEXT": paths["scene_text"],
                    },
                },
                "VOCAB": {
                    "TYPE": "OcrClassificationVocab",
                    "TOKENIZER": None, "MIN_FREQ": 1, "WORD_EMBEDDING": None,
                    "MAX_SCENE_TEXT": K,
                    "PAD_TOKEN": "<pad>", "BOS_TOKEN": "<bos>",
                    "EOS_TOKEN": "<eos>", "UNK_TOKEN": "<unk>",
                    "JSON_PATH": jp,
                },
                "JSON_PATH": jp,
            },
            "TRAINING": {
                "CHECKPOINT_PATH": str(tmp_path / "saved_models"),
                "LEARNING_RATE": 0.01, "WARMUP": 100, "SCORE": "CIDEr",
                "GET_SCORES": True, "PATIENCE": 2, "MAX_EPOCHS": 2, "SEED": 3,
            },
            "MODEL": {
                "NAME": "mmf_lorra_test",
                "ARCHITECTURE": "MMF_LoRRA",
                "DEVICE": "cuda",
                "D_MODEL": D,
                "MAX_SCENE_TEXT": K,
                "TEXT_EMBEDDING": {"ARCHITECTURE": "UsualEmbedding",
                                   "D_MODEL": D, "D_EMBEDDING": D,
                                   "DROPOUT": 0.1, "WORD_EMBEDDING": None},
                "OBJECT_EMBEDDING": {"D_FEATURE": 1024, "DROPOUT": 0.1},
                "OCR_EMBEDDING": {"D_FEATURE": 300, "DROPOUT": 0.1},
            },
        }
    )


def test_mmf_classification_end_to_end(synthetic_data, tmp_path):
    populate()
    config = _config(synthetic_data, tmp_path)
    task = build_task(config)
    assert task.vocab.num_choices == task.vocab.total_answers + K
    task.start()

    ckpt_dir = os.path.join(config.TRAINING.CHECKPOINT_PATH, config.MODEL.NAME)
    scores = task.get_predictions()
    assert "Accuracy" in scores
    with open(os.path.join(ckpt_dir, "test_results.json")) as handle:
        dumped = json.load(handle)
    assert len(dumped["results"]) > 0
