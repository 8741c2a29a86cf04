"""EVJVQA/multilingual stack tests: ja-aware vocabs, raw-question/image
datasets, ViT/pretrained models, ExtendedMCAN, ReadableIterativeMCAN."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvivqa_tpu.builders import (
    META_ARCHITECTURE,
    build_dataset,
    build_vocab,
    populate,
)
from openvivqa_tpu.config import ConfigNode
from openvivqa_tpu.data.multilingual import multilingual_tokenize
from openvivqa_tpu.training.decode import generate

populate()

D = 32


def _write_multilingual_json(tmp_path):
    data = {
        "images": [{"id": 0, "filename": "0.jpg"}, {"id": 1, "filename": "1.jpg"}],
        "annotations": [
            {"id": 0, "image_id": 0, "question": "con mèo màu gì?",
             "answers": ["màu đen"], "QA-type": 0},
            {"id": 1, "image_id": 1, "question": "これは何ですか",
             "answers": ["猫です"], "QA-type": 1},
            {"id": 2, "image_id": 0, "question": "what color is the cat?",
             "answers": ["black"], "QA-type": 0},
        ],
    }
    path = tmp_path / "ml.json"
    path.write_text(json.dumps(data, ensure_ascii=False))
    return str(path)


def test_multilingual_tokenize():
    assert multilingual_tokenize("これは何", None) == ["こ", "れ", "は", "何"]
    assert multilingual_tokenize("con mèo?", None) == ["con", "mèo", "?"]


def test_multilingual_vocab(tmp_path):
    path = _write_multilingual_json(tmp_path)
    cfg = ConfigNode(
        {
            "TYPE": "MultilingualVocab", "TOKENIZER": None, "MIN_FREQ": 1,
            "WORD_EMBEDDING": None,
            "PAD_TOKEN": "<pad>", "BOS_TOKEN": "<bos>",
            "EOS_TOKEN": "<eos>", "UNK_TOKEN": "<unk>",
            "JSON_PATH": {"TRAIN": path, "DEV": path, "TEST": path},
        }
    )
    vocab = build_vocab(cfg)
    assert "猫" in vocab.stoi  # japanese chars entered the vocab
    assert "mèo" in vocab.stoi  # vietnamese words too

    # VLSP vocab ignores TEST
    cfg2 = cfg.merged({"TYPE": "VlspEvjVqaVocab", "JSON_PATH": {"TEST": None}})
    vocab2 = build_vocab(cfg2)
    assert "猫" in vocab2.stoi


def test_image_question_dataset(synthetic_data):
    vocab_cfg = ConfigNode(
        {
            "TYPE": "Vocab", "TOKENIZER": None, "MIN_FREQ": 1,
            "WORD_EMBEDDING": None,
            "PAD_TOKEN": "<pad>", "BOS_TOKEN": "<bos>",
            "EOS_TOKEN": "<eos>", "UNK_TOKEN": "<unk>",
            "JSON_PATH": {
                "TRAIN": synthetic_data["train"],
                "DEV": synthetic_data["dev"],
                "TEST": synthetic_data["test"],
            },
        }
    )
    vocab = build_vocab(vocab_cfg)
    ds = build_dataset(
        synthetic_data["train"], vocab,
        ConfigNode(
            {
                "TYPE": "ImageQuestionDataset",
                "IMAGE_SIZE": 32,
                "FEATURE_PATH": {
                    "FEATURES": synthetic_data["features"],
                    "IMAGE": synthetic_data["images"],
                },
            }
        ),
    )
    item = ds[0]
    assert item["pixel_values"].shape == (32, 32, 3)
    assert isinstance(item["question"], str)
    assert item["question_tokens"].shape == (vocab.max_question_length,)


class EvjVocab:
    padding_idx, bos_idx, eos_idx, unk_idx = 0, 1, 2, 3
    total_answers = 12
    max_question_length = 6
    max_answer_length = 5
    word_embeddings = None

    def __len__(self):
        return 50


def _attn(stateful=False):
    return {
        "ARCHITECTURE": "ScaledDotProductAttention",
        "HEAD": 2, "D_MODEL": D, "D_KEY": 8, "D_VALUE": 8, "D_FF": 32,
        "USE_AOA": False, "CAN_BE_STATEFUL": stateful, "DROPOUT": 0.1,
    }


def _decoder():
    return {
        "ARCHITECTURE": "Decoder", "D_MODEL": D, "LAYERS": 2,
        "ATTENTION": {"SELF_ATTENTION": _attn(True), "ENC_ATTENTION": _attn()},
        "TEXT_EMBEDDING": {
            "ARCHITECTURE": "UsualEmbedding", "D_MODEL": D, "D_EMBEDDING": D,
            "DROPOUT": 0.1, "WORD_EMBEDDING": None,
        },
    }


def _batch(vocab, bs=2, with_pixels=True, seed=0):
    rng = np.random.default_rng(seed)
    answers = rng.integers(4, len(vocab), (bs, vocab.max_answer_length))
    batch = {
        "question_tokens": jnp.asarray(
            rng.integers(4, len(vocab), (bs, vocab.max_question_length)).astype(
                np.int32
            )
        ),
        "region_features": jnp.asarray(rng.normal(size=(bs, 5, 24)).astype(np.float32)),
        "region_boxes": jnp.asarray(rng.uniform(size=(bs, 5, 4)).astype(np.float32)),
        "grid_features": jnp.asarray(rng.normal(size=(bs, 4, 20)).astype(np.float32)),
        "grid_boxes": jnp.asarray(rng.uniform(size=(bs, 4, 4)).astype(np.float32)),
        "ocr_det_features": jnp.asarray(rng.normal(size=(bs, 3, 16)).astype(np.float32)),
        "ocr_rec_features": jnp.asarray(rng.normal(size=(bs, 3, 12)).astype(np.float32)),
        "ocr_fasttext_features": jnp.asarray(
            rng.normal(size=(bs, 3, 300)).astype(np.float32)
        ),
        "ocr_boxes": jnp.asarray(rng.uniform(size=(bs, 3, 4)).astype(np.float32)),
        "answer_tokens": jnp.asarray(answers.astype(np.int32)),
    }
    if with_pixels:
        batch["pixel_values"] = jnp.asarray(
            rng.normal(size=(bs, 32, 32, 3)).astype(np.float32)
        )
    return batch


def test_vit_mbert_classification():
    vocab = EvjVocab()
    cfg = ConfigNode(
        {
            "ARCHITECTURE": "ViTmBERTClassification",
            "D_MODEL": D, "DROPOUT": 0.1,
            "VISION_EMBEDDING": {
                "ARCHITECTURE": "ViTEmbedding", "D_MODEL": D, "DROPOUT": 0.1,
                "D_PRETRAINED_FEATURE": 48, "PATCH_SIZE": 16,
                "PRETRAINED_LAYERS": 1,
            },
            "TEXT_EMBEDDING": {
                "ARCHITECTURE": "BertEmbedding", "D_MODEL": D, "DROPOUT": 0.1,
                "D_PRETRAINED_FEATURE": 48, "PRETRAINED_LAYERS": 1,
            },
        }
    )
    model = META_ARCHITECTURE.get("ViTmBERTClassification")(config=cfg, vocab=vocab)
    batch = _batch(vocab)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch
    )
    out = model.apply(variables, batch, train=False)
    assert out.shape == (2, vocab.total_answers)

    # frozen backbones: gradients through them must be zero
    def loss(params):
        return model.apply({"params": params}, batch, train=False).sum()

    grads = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    backbone_grads = [
        float(jnp.abs(v).max())
        for path, v in flat
        if "BertEncoderStack" in str(path) or "patch_embed" in str(path)
    ]
    assert backbone_grads and max(backbone_grads) == 0.0


@pytest.mark.parametrize(
    "name", ["ViTmBERTGeneration", "ViTmT5", "ExtendedMCAN", "ReadableIterativeMCAN"]
)
def test_evjvqa_generative_models(name):
    vocab = EvjVocab()
    base = {
        "ARCHITECTURE": name,
        "D_MODEL": D, "DROPOUT": 0.1,
        "DECODER": _decoder(),
    }
    if name == "ViTmBERTGeneration":
        base["VISION_EMBEDDING"] = {
            "ARCHITECTURE": "FeatureEmbedding", "D_FEATURE": 20,
            "D_MODEL": D, "DROPOUT": 0.1,
        }
        base["TEXT_EMBEDDING"] = {
            "ARCHITECTURE": "BertEmbedding", "D_MODEL": D, "DROPOUT": 0.1,
            "D_PRETRAINED_FEATURE": 48, "PRETRAINED_LAYERS": 1,
        }
        batch = _batch(vocab, with_pixels=False)
    elif name == "ViTmT5":
        base["VISION_EMBEDDING"] = {
            "ARCHITECTURE": "ViTEmbedding", "D_MODEL": D, "DROPOUT": 0.1,
            "D_PRETRAINED_FEATURE": 48, "PATCH_SIZE": 16, "PRETRAINED_LAYERS": 1,
        }
        base["TEXT_EMBEDDING"] = {
            "ARCHITECTURE": "T5Embedding", "D_MODEL": D, "DROPOUT": 0.1,
            "D_PRETRAINED_FEATURE": 48, "PRETRAINED_LAYERS": 1,
        }
        batch = _batch(vocab)
    elif name == "ExtendedMCAN":
        base.update(
            {
                "REGION_EMBEDDING": {"ARCHITECTURE": "FeatureEmbedding",
                                     "D_FEATURE": 24, "D_MODEL": D, "DROPOUT": 0.1},
                "GRID_EMBEDDING": {"ARCHITECTURE": "FeatureEmbedding",
                                   "D_FEATURE": 20, "D_MODEL": D, "DROPOUT": 0.1},
                "BOX_EMBEDDING": {"ARCHITECTURE": "FeatureEmbedding",
                                  "D_FEATURE": 4, "D_MODEL": D, "DROPOUT": 0.1},
                "TEXT_EMBEDDING": {"ARCHITECTURE": "UsualEmbedding", "D_MODEL": D,
                                   "D_EMBEDDING": D, "DROPOUT": 0.1,
                                   "WORD_EMBEDDING": None},
                "SELF_ENCODER": {"ARCHITECTURE": "Encoder", "D_MODEL": D,
                                 "LAYERS": 2, "SELF_ATTENTION": _attn()},
                "GUIDED_ENCODER": {"ARCHITECTURE": "GuidedAttentionEncoder",
                                   "D_MODEL": D, "LAYERS": 2,
                                   "SELF_ATTENTION": _attn(),
                                   "GUIDED_ATTENTION": _attn()},
                "MULTIMODAL_FUSION": {"D_MODEL": D, "D_FF": 32, "DROPOUT": 0.1},
            }
        )
        batch = _batch(vocab, with_pixels=False)
    else:  # ReadableIterativeMCAN
        base.update(
            {
                "VISION_EMBEDDING": {
                    "ARCHITECTURE": "VisionOcrEmbedding", "D_MODEL": D,
                    "DROPOUT": 0.1, "D_OBJ_FEATURE": 24,
                    "D_OCR_FEATURE": 16 + 12 + 300,
                },
                "TEXT_EMBEDDING": {"ARCHITECTURE": "UsualEmbedding", "D_MODEL": D,
                                   "D_EMBEDDING": D, "DROPOUT": 0.1,
                                   "WORD_EMBEDDING": None},
                "SELF_ENCODER": {"ARCHITECTURE": "Encoder", "D_MODEL": D,
                                 "LAYERS": 2, "SELF_ATTENTION": _attn()},
                "GUIDED_ENCODER": {"ARCHITECTURE": "GuidedAttentionEncoder",
                                   "D_MODEL": D, "LAYERS": 2,
                                   "SELF_ATTENTION": _attn(),
                                   "GUIDED_ATTENTION": _attn()},
                "MULTIMODAL_FUSION": {"D_MODEL": D, "D_FF": 32, "DROPOUT": 0.1},
            }
        )
        batch = _batch(vocab, with_pixels=False)

    model = META_ARCHITECTURE.get(name)(config=ConfigNode(base), vocab=vocab)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch
    )
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert out.shape == (2, vocab.max_answer_length, len(vocab))
    assert np.isfinite(np.asarray(out)).all()

    outs, _ = jax.jit(
        lambda v, b: generate(model, v, b, batch_size=2, beam_size=2)
    )({"params": variables["params"]}, batch)
    assert outs.shape == (2, vocab.max_answer_length)
