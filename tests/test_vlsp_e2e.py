"""End-to-end EVJVQA: VlspEvjVqaTask with 4 splits, multilingual vocab,
generative cross-modality model; public/private prediction dumps."""

import json
import os

from openvivqa_tpu.builders import build_task, populate
from openvivqa_tpu.config import ConfigNode

D = 32


def _attn(stateful=False):
    return {
        "ARCHITECTURE": "ScaledDotProductAttention",
        "HEAD": 2, "D_MODEL": D, "D_KEY": 8, "D_VALUE": 8, "D_FF": 32,
        "USE_AOA": False, "CAN_BE_STATEFUL": stateful, "DROPOUT": 0.1,
    }


def _config(paths, tmp_path):
    jp = {
        "TRAIN": paths["train"], "DEV": paths["dev"],
        "PUBLIC_TEST": paths["test"], "PRIVATE_TEST": None,
    }
    dataset_common = {
        "MAX_REGIONS": 36,
        "FEATURE_PATH": {"FEATURES": paths["features"]},
    }
    return ConfigNode(
        {
            "TASK": "VlspEvjVqaTask",
            "DATASET": {
                "FEATURE_DATASET": dict(
                    dataset_common, TYPE="MultilingualFeatureDataset",
                    BATCH_SIZE=8, WORKERS=2,
                ),
                "DICT_DATASET": dict(
                    dataset_common, TYPE="MultilingualDictionaryDataset",
                    BATCH_SIZE=8, WORKERS=2,
                ),
                "VOCAB": {
                    "TYPE": "VlspEvjVqaVocab",
                    "TOKENIZER": None, "MIN_FREQ": 1, "WORD_EMBEDDING": None,
                    "PAD_TOKEN": "<pad>", "BOS_TOKEN": "<bos>",
                    "EOS_TOKEN": "<eos>", "UNK_TOKEN": "<unk>",
                    "JSON_PATH": jp,
                },
                "JSON_PATH": jp,
            },
            "TRAINING": {
                "CHECKPOINT_PATH": str(tmp_path / "saved_models"),
                "LEARNING_RATE": 1.0, "RL_LEARNING_RATE": 0.000005,
                "WARMUP": 100, "SCORE": "CIDEr",
                "TRAINING_BEAM_SIZE": 2, "EVALUATING_BEAM_SIZE": 2,
                "PATIENCE": 2, "MAX_EPOCHS": 1, "SEED": 9,
            },
            "MODEL": {
                "NAME": "vlsp_test",
                "ARCHITECTURE": "CrossModalityTransformer",
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
                "TEXT_EMBEDDING": {"ARCHITECTURE": "UsualEmbedding",
                                   "D_MODEL": D, "D_EMBEDDING": D,
                                   "DROPOUT": 0.1, "WORD_EMBEDDING": None},
                "ENCODER": {
                    "ARCHITECTURE": "CrossModalityEncoder", "D_MODEL": D,
                    "LAYERS": 2,
                    "VISION_LANGUAGE_ATTENTION": _attn(),
                    "LANGUAGE_VISION_ATTENTION": _attn(),
                    "VISION_SELF_ATTENTION": _attn(),
                    "LANGUAGE_SELF_ATTENTION": _attn(),
                },
                "MULTIMODAL_FUSION": {"D_MODEL": D, "D_FF": 32, "DROPOUT": 0.1},
                "DECODER": {
                    "ARCHITECTURE": "Decoder", "D_MODEL": D, "LAYERS": 2,
                    "ATTENTION": {"SELF_ATTENTION": _attn(True),
                                  "ENC_ATTENTION": _attn()},
                    "TEXT_EMBEDDING": {"ARCHITECTURE": "UsualEmbedding",
                                       "D_MODEL": D, "D_EMBEDDING": D,
                                       "DROPOUT": 0.1, "WORD_EMBEDDING": None},
                },
            },
        }
    )


def test_vlsp_end_to_end(synthetic_data, tmp_path):
    populate()
    config = _config(synthetic_data, tmp_path)
    task = build_task(config)
    # private test absent -> loaders None
    assert task.private_test_dict_dataloader is None
    task.start()

    ckpt_dir = os.path.join(config.TRAINING.CHECKPOINT_PATH, config.MODEL.NAME)
    scores = task.get_predictions()
    assert "public_test" in scores and "private_test" not in scores
    with open(os.path.join(ckpt_dir, "public_test_results.json")) as handle:
        dumped = json.load(handle)
    assert len(dumped["results"]) > 0
    assert not os.path.exists(
        os.path.join(ckpt_dir, "private_test_results.json")
    )
