"""End-to-end: MMF_M4C + TrainingMMF on synthetic OCR data (train ->
greedy-decode eval -> checkpoint -> predictions with provenance)."""

import json
import os

from openvivqa_tpu.builders import build_task, populate
from openvivqa_tpu.config import ConfigNode

D = 32
K = 8


def _mmf_task_config(paths, tmp_path):
    dataset_common = {
        "MAX_REGIONS": 36,
        "SCENE_TEXT_THRESHOLD": 0.3,
        "MAX_SCENE_TEXT": K,
        "FEATURE_PATH": {
            "FEATURES": paths["features"],
            "SCENE_TEXT": paths["scene_text"],
        },
    }
    jp = {"TRAIN": paths["train"], "DEV": paths["dev"], "TEST": paths["test"]}
    return ConfigNode(
        {
            "TASK": "TrainingMMF",
            "DATASET": {
                "FEATURE_DATASET": dict(
                    dataset_common, TYPE="OcrFeatureDataset", BATCH_SIZE=8, WORKERS=2
                ),
                "DICT_DATASET": dict(
                    dataset_common, TYPE="OcrDictionaryDataset", BATCH_SIZE=8,
                    WORKERS=2,
                ),
                "VOCAB": {
                    "TYPE": "OcrVocab",
                    "TOKENIZER": None,
                    "MIN_FREQ": 1,
                    "WORD_EMBEDDING": None,
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
                "LEARNING_RATE": 1.0,
                "WARMUP": 100,
                "SCORE": "CIDEr",
                "TRAINING_BEAM_SIZE": 2,
                "EVALUATING_BEAM_SIZE": 2,
                "PATIENCE": 2,
                "MAX_EPOCHS": 2,
                "SEED": 5,
            },
            "MODEL": {
                "NAME": "mmf_m4c_test",
                "ARCHITECTURE": "MMF_M4C",
                "DEVICE": "cuda",
                "D_MODEL": D,
                "MMT": {
                    "HIDDEN_SIZE": D, "NUM_HIDDEN_LAYERS": 2,
                    "NUM_ATTENTION_HEADS": 2,
                },
                "TEXT_BERT": {
                    "HIDDEN_SIZE": D, "NUM_HIDDEN_LAYERS": 1,
                    "LOAD_PRETRAINED": False,
                },
                "OBJECT_EMBEDDING": {"D_FEATURE": 1024, "DROPOUT": 0.1},
                "OCR_EMBEDDING": {"D_FEATURE": 300 + 256 + 256, "DROPOUT": 0.1},
                "OCR_PTR_NET": {"HIDDEN_SIZE": D, "QUERY_KEY_SIZE": D},
            },
        }
    )


def test_mmf_end_to_end(synthetic_data, tmp_path):
    populate()
    config = _mmf_task_config(synthetic_data, tmp_path)
    task = build_task(config)
    task.start()

    ckpt_dir = os.path.join(config.TRAINING.CHECKPOINT_PATH, config.MODEL.NAME)
    assert os.path.isfile(os.path.join(ckpt_dir, "best_model.pth"))

    scores = task.get_predictions()
    assert "CIDEr" in scores
    with open(os.path.join(ckpt_dir, "test_results.json")) as handle:
        dumped = json.load(handle)
    assert len(dumped["results"]) > 0
    assert "in_fixed_vocab" in dumped["results"][0]


def test_standalone_m4c_end_to_end(synthetic_data, tmp_path):
    """The standalone M4C (round 3, models/standalone_m4c.py) through the
    same TrainingMMF task: train -> greedy eval -> checkpoint."""
    populate()
    config = _mmf_task_config(synthetic_data, tmp_path)
    model = dict(
        config.MODEL.to_dict(),
        NAME="standalone_m4c_test",
        ARCHITECTURE="M4C",
        ENCODER={
            "LAYERS": 2,
            "INTERMEDIATE_SIZE": 64,
            "SELF_ATTENTION": {"D_MODEL": D, "HEAD": 2},
        },
        DYNAMIC_EMBEDDING={
            "ARCHITECTURE": "FixedVocabDynamicEmbedding",
            "D_MODEL": D,
            "DROPOUT": 0.1,
        },
    )
    config = config.merged({"MODEL": model})
    task = build_task(config)
    task.start()

    ckpt_dir = os.path.join(config.TRAINING.CHECKPOINT_PATH, config.MODEL.NAME)
    assert os.path.isfile(os.path.join(ckpt_dir, "best_model.pth"))
    scores = task.get_predictions()
    assert "CIDEr" in scores
