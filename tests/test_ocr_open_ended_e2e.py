"""End-to-end OCR generative: IterativeM4C + OcrOpenEndedTask (dynamic
vocab + pointer network + OCR-copy beam decoding)."""

import json
import os

from openvivqa_tpu.builders import build_task, populate
from openvivqa_tpu.config import ConfigNode

D = 32
K = 8


def _attn(stateful=False):
    return {
        "ARCHITECTURE": "ScaledDotProductAttention",
        "HEAD": 2, "D_MODEL": D, "D_KEY": 8, "D_VALUE": 8, "D_FF": 32,
        "USE_AOA": False, "CAN_BE_STATEFUL": stateful, "DROPOUT": 0.1,
    }


def _config(paths, tmp_path):
    jp = {"TRAIN": paths["train"], "DEV": paths["dev"], "TEST": paths["test"]}
    dataset_common = {
        "MAX_REGIONS": 36,
        "SCENE_TEXT_THRESHOLD": 0.3,
        "MAX_SCENE_TEXT": K,
        "FEATURE_PATH": {
            "FEATURES": paths["features"],
            "SCENE_TEXT": paths["scene_text"],
        },
    }
    return ConfigNode(
        {
            "TASK": "OcrOpenEndedTask",
            "DATASET": {
                "FEATURE_DATASET": dict(
                    dataset_common, TYPE="OcrFeatureDataset", BATCH_SIZE=8,
                    WORKERS=2,
                ),
                "DICT_DATASET": dict(
                    dataset_common, TYPE="OcrDictionaryDataset", BATCH_SIZE=8,
                    WORKERS=2,
                ),
                "VOCAB": {
                    "TYPE": "OcrVocab",
                    "TOKENIZER": None, "MIN_FREQ": 1, "WORD_EMBEDDING": None,
                    "PAD_TOKEN": "<pad>", "BOS_TOKEN": "<bos>",
                    "EOS_TOKEN": "<eos>", "UNK_TOKEN": "<unk>",
                    "IMG_TOKEN": "<img>", "FEAT_TOKEN": "<feat>",
                    "BOX_TOKEN": "<box>", "OCR_TOKEN": "<ocr>",
                    "OCR_DET_TOKEN": "<ocr_det>", "OCR_REC_TOKEN": "<ocr_rec>",
                    "QUESTION_TOKEN": "<question>", "ANSWER_TOKEN": "<answer>",
                    "JSON_PATH": jp,
                },
                "JSON_PATH": jp,
            },
            "TRAINING": {
                "CHECKPOINT_PATH": str(tmp_path / "saved_models"),
                "LEARNING_RATE": 1.0, "RL_LEARNING_RATE": 0.000005,
                "WARMUP": 100, "SCORE": "CIDEr",
                "TRAINING_BEAM_SIZE": 2, "EVALUATING_BEAM_SIZE": 2,
                "PATIENCE": 2, "MAX_EPOCHS": 1, "SEED": 13,
            },
            "MODEL": {
                "NAME": "iterative_m4c_test",
                "ARCHITECTURE": "IterativeM4C",
                "DEVICE": "cuda",
                "D_MODEL": D,
                "REGION_EMBEDDING": {"ARCHITECTURE": "FeatureEmbedding",
                                     "D_FEATURE": 1024, "D_MODEL": D,
                                     "DROPOUT": 0.1},
                "GRID_EMBEDDING": {"ARCHITECTURE": "FeatureEmbedding",
                                   "D_FEATURE": 2048, "D_MODEL": D,
                                   "DROPOUT": 0.1},
                "BOX_EMBEDDING": {"ARCHITECTURE": "FeatureEmbedding",
                                  "D_FEATURE": 4, "D_MODEL": D, "DROPOUT": 0.1},
                "OCR_DET_EMBEDDING": {"ARCHITECTURE": "FeatureEmbedding",
                                      "D_FEATURE": 256, "D_MODEL": D,
                                      "DROPOUT": 0.1},
                "OCR_REC_EMBEDDING": {"ARCHITECTURE": "FeatureEmbedding",
                                      "D_FEATURE": 256, "D_MODEL": D,
                                      "DROPOUT": 0.1},
                "TEXT_EMBEDDING": {"ARCHITECTURE": "UsualEmbedding",
                                   "D_MODEL": D, "D_EMBEDDING": D,
                                   "DROPOUT": 0.1, "WORD_EMBEDDING": None},
                "OCR_TEXT_EMBEDDING": {"ARCHITECTURE": "OcrWordEmbedding",
                                       "D_MODEL": D, "D_EMBEDDING": 300,
                                       "DROPOUT": 0.1, "WORD_EMBEDDING": None},
                "DYNAMIC_EMBEDDING": {"ARCHITECTURE": "DynamicEmbedding",
                                      "D_MODEL": D},
                "ENCODER": {"ARCHITECTURE": "MultiModalEncoder", "D_MODEL": D,
                            "LAYERS": 2, "SELF_ATTENTION": _attn()},
            },
        }
    )


def test_ocr_open_ended_end_to_end(synthetic_data, tmp_path):
    populate()
    config = _config(synthetic_data, tmp_path)
    task = build_task(config)
    task.start()

    ckpt_dir = os.path.join(config.TRAINING.CHECKPOINT_PATH, config.MODEL.NAME)
    scores = task.get_predictions()
    assert "CIDEr" in scores
    with open(os.path.join(ckpt_dir, "test_results.json")) as handle:
        dumped = json.load(handle)
    assert len(dumped["results"]) > 0
    gens = dumped["results"][0]["gens"]
    assert all(isinstance(v, str) for v in gens.values())
