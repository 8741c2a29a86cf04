"""OCR stack tests: OcrVocab index space, OCR datasets (static shapes),
M4C-family model forwards + greedy decode, IterativeM4C beam decode, and an
MMF end-to-end run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvivqa_tpu.builders import (
    META_ARCHITECTURE,
    build_dataset,
    build_task,
    build_vocab,
    populate,
)
from openvivqa_tpu.config import ConfigNode
from openvivqa_tpu.training.decode import generate

populate()

D = 32


def _ocr_vocab_config(paths):
    return ConfigNode(
        {
            "TYPE": "OcrVocab",
            "TOKENIZER": None,
            "MIN_FREQ": 1,
            "WORD_EMBEDDING": None,
            "PAD_TOKEN": "<pad>", "BOS_TOKEN": "<bos>",
            "EOS_TOKEN": "<eos>", "UNK_TOKEN": "<unk>",
            "IMG_TOKEN": "<img>", "FEAT_TOKEN": "<feat>", "BOX_TOKEN": "<box>",
            "OCR_TOKEN": "<ocr>", "OCR_DET_TOKEN": "<ocr_det>",
            "OCR_REC_TOKEN": "<ocr_rec>",
            "QUESTION_TOKEN": "<question>", "ANSWER_TOKEN": "<answer>",
            "JSON_PATH": {
                "TRAIN": paths["train"], "DEV": paths["dev"], "TEST": paths["test"],
            },
        }
    )


def test_ocr_vocab_index_space(synthetic_data):
    vocab = build_vocab(_ocr_vocab_config(synthetic_data))
    assert vocab.ocr_idx and vocab.answer_idx  # specials registered
    ocr_tokens = ["xyz", "màu", "xyz"]
    # OCR-only word must map to an OCR slot (>= len(stoi))
    np.random.seed(0)
    ids = vocab.match_text_to_indices(["xyz"], {
        "xyz": [len(vocab.stoi), len(vocab.stoi) + 2]
    })
    assert ids[0] >= len(vocab.stoi) or ids[0] == vocab.unk_idx

    encoded = vocab.encode_answer(["màu"], ocr_tokens)
    decoded = vocab.decode_answer(encoded[None, :], [ocr_tokens])[0]
    assert "màu" in decoded

    # OCR slot decodes to the OCR token string
    vec = np.array([vocab.bos_idx, len(vocab.stoi) + 0, vocab.eos_idx], np.int32)
    out = vocab.decode_answer(vec[None, :], [ocr_tokens])[0]
    assert out == "xyz"
    out2, flags = vocab.decode_answer_with_determination(
        vec[None, :], [ocr_tokens]
    )
    assert out2[0] == "xyz" and flags[0][1] is False


def _ocr_dataset_cfg(paths, dataset_type):
    return ConfigNode(
        {
            "TYPE": dataset_type,
            "MAX_REGIONS": 36,
            "SCENE_TEXT_THRESHOLD": 0.3,
            "MAX_SCENE_TEXT": 8,
            "FEATURE_PATH": {
                "FEATURES": paths["features"],
                "SCENE_TEXT": paths["scene_text"],
            },
        }
    )


def test_ocr_datasets_static_shapes(synthetic_data):
    vocab = build_vocab(_ocr_vocab_config(synthetic_data))
    ds = build_dataset(
        synthetic_data["train"], vocab, _ocr_dataset_cfg(synthetic_data, "OcrFeatureDataset")
    )
    shapes = set()
    for i in range(min(4, len(ds))):
        item = ds[i]
        shapes.add(
            (
                item["ocr_det_features"].shape,
                item["ocr_rec_features"].shape,
                item["ocr_boxes"].shape,
                len(item["ocr_tokens"]),
            )
        )
        assert item["ocr_fasttext_features"].shape == (8, 300)
    assert len(shapes) == 1  # static across samples

    dict_ds = build_dataset(
        synthetic_data["dev"], vocab,
        _ocr_dataset_cfg(synthetic_data, "OcrDictionaryDataset"),
    )
    item = dict_ds[0]
    assert len(item["ocr_tokens"]) == 8 and "answers" in item


class M4CVocab:
    padding_idx, bos_idx, eos_idx, unk_idx = 0, 1, 2, 3
    img_idx, feat_idx, box_idx, ocr_idx = 4, 5, 6, 7
    ocr_det_idx, ocr_rec_idx, question_idx, answer_idx = 8, 9, 10, 11
    total_answers = 15
    max_question_length = 6
    max_answer_length = 5
    word_embeddings = None
    stoi = {f"w{i}": i for i in range(40)}

    def __len__(self):
        return 40


K_OCR = 4


def _m4c_batch(vocab, bs=2, seed=0):
    rng = np.random.default_rng(seed)
    # answers may point into the OCR block [len(vocab), len(vocab)+K)
    answers = rng.integers(12, len(vocab) + K_OCR, (bs, vocab.max_answer_length))
    return {
        "question_tokens": jnp.asarray(
            rng.integers(12, len(vocab), (bs, vocab.max_question_length)).astype(
                np.int32
            )
        ),
        "region_features": jnp.asarray(
            rng.normal(size=(bs, 5, 24)).astype(np.float32)
        ),
        "region_boxes": jnp.asarray(rng.uniform(size=(bs, 5, 4)).astype(np.float32)),
        "grid_features": jnp.asarray(rng.normal(size=(bs, 3, 20)).astype(np.float32)),
        "grid_boxes": jnp.asarray(rng.uniform(size=(bs, 3, 4)).astype(np.float32)),
        "ocr_det_features": jnp.asarray(
            rng.normal(size=(bs, K_OCR, 16)).astype(np.float32)
        ),
        "ocr_rec_features": jnp.asarray(
            rng.normal(size=(bs, K_OCR, 256)).astype(np.float32)
        ),
        "ocr_fasttext_features": jnp.asarray(
            rng.normal(size=(bs, K_OCR, 300)).astype(np.float32)
        ),
        "ocr_boxes": jnp.asarray(rng.uniform(size=(bs, K_OCR, 4)).astype(np.float32)),
        "answer_tokens": jnp.asarray(answers.astype(np.int32)),
        "answer": jnp.asarray(
            rng.integers(0, 15 + K_OCR, (bs, 1)).astype(np.int32)
        ),
    }


def _mmf_config(**over):
    base = {
        "ARCHITECTURE": "MMF_M4C",
        "D_MODEL": D,
        "MMT": {"HIDDEN_SIZE": D, "NUM_HIDDEN_LAYERS": 2, "NUM_ATTENTION_HEADS": 2},
        "TEXT_BERT": {
            "HIDDEN_SIZE": D, "NUM_HIDDEN_LAYERS": 1, "LOAD_PRETRAINED": False,
            # LanguageAdaptive's frozen backbone dims (ignored by others)
            "D_LANGUAGE": 16, "PRETRAINED_LAYERS": 1,
            "PRETRAINED_VOCAB_SIZE": 64,
        },
        "OBJECT_EMBEDDING": {"D_FEATURE": 24, "DROPOUT": 0.1},
        "OCR_EMBEDDING": {"D_FEATURE": 300 + 256 + 16, "DROPOUT": 0.1},
        "OCR_PTR_NET": {"HIDDEN_SIZE": D, "QUERY_KEY_SIZE": D},
        "REGION_EMBEDDING": {"D_FEATURE": 20, "DROPOUT": 0.1},
        "LANGUAGES": ["vi", "en"],
        "MAX_SCENE_TEXT": K_OCR,
    }
    base.update(over)
    return ConfigNode(base)


MMF_MODELS = [
    "MMF_M4C", "M4C", "MMF_ImprovedDecodingM4C", "experimental_MMF_M4C",
    "MMF_REGIONAL_M4C", "MMF_SAL", "MMF_IterativeM4C",
    "MMF_Iterative_Multilevel_M4C", "MMF_LanguageAdaptiveM4C",
]


# the standalone M4C (round 3, models/standalone_m4c.py) reads the
# reference m4c.yaml schema rather than the MMF one
_STANDALONE_M4C_EXTRA = {
    "ENCODER": {
        "LAYERS": 2,
        "INTERMEDIATE_SIZE": 64,
        "SELF_ATTENTION": {"D_MODEL": D, "HEAD": 2},
    },
    "DYNAMIC_EMBEDDING": {
        "ARCHITECTURE": "FixedVocabDynamicEmbedding",
        "D_MODEL": D,
        "DROPOUT": 0.1,
    },
}


@pytest.mark.parametrize("name", MMF_MODELS)
def test_mmf_family_forward_and_greedy(name):
    vocab = M4CVocab()
    extra = _STANDALONE_M4C_EXTRA if name == "M4C" else {}
    model = META_ARCHITECTURE.get(name)(
        config=_mmf_config(ARCHITECTURE=name, **extra), vocab=vocab
    )
    batch = _m4c_batch(vocab)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch
    )
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert out["scores"].shape == (2, vocab.max_answer_length, len(vocab) + K_OCR)
    assert np.isfinite(np.asarray(out["scores"])).all()

    decoded = jax.jit(
        lambda v, b: model.apply(v, b, method=model.greedy_decode)
    )({"params": variables["params"]}, batch)
    assert decoded["scores"].shape == (2, vocab.max_answer_length, len(vocab) + K_OCR)
    assert decoded["prev_inds"].shape == (2, vocab.max_answer_length)


def test_mmf_lorra_forward():
    vocab = M4CVocab()
    cfg = _mmf_config(
        ARCHITECTURE="MMF_LoRRA",
        TEXT_EMBEDDING={
            "ARCHITECTURE": "UsualEmbedding", "D_MODEL": D,
            "D_EMBEDDING": D, "DROPOUT": 0.1, "WORD_EMBEDDING": None,
        },
    )
    model = META_ARCHITECTURE.get("MMF_LoRRA")(config=cfg, vocab=vocab)
    batch = _m4c_batch(vocab)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch
    )
    out = model.apply(variables, batch, train=False)
    assert out["scores"].shape == (2, vocab.total_answers + K_OCR)
    assert np.isfinite(np.asarray(out["scores"])).all()


def test_mmf_iterative_lorra_forward_and_greedy():
    """Round-3 faithful rebuild: MMF_IterativeLoRRA is GENERATIVE (branch
    outputs feed the MMF MMT + pointer net, mmf_iterative_lorra.py:16-208)
    — teacher-forced scores over (T, vocab+ocr) and greedy decode."""
    vocab = M4CVocab()
    cfg = _mmf_config(
        ARCHITECTURE="MMF_IterativeLoRRA",
        TEXT_EMBEDDING={
            "ARCHITECTURE": "UsualEmbedding", "D_MODEL": D,
            "D_EMBEDDING": D, "DROPOUT": 0.1, "WORD_EMBEDDING": None,
        },
    )
    model = META_ARCHITECTURE.get("MMF_IterativeLoRRA")(config=cfg, vocab=vocab)
    batch = _m4c_batch(vocab)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch
    )
    out = model.apply(variables, batch, train=False)
    assert out["scores"].shape == (2, vocab.max_answer_length, len(vocab) + K_OCR)
    assert np.isfinite(np.asarray(out["scores"])).all()
    decoded = jax.jit(
        lambda v, b: model.apply(v, b, method=model.greedy_decode)
    )({"params": variables["params"]}, batch)
    assert decoded["prev_inds"].shape == (2, vocab.max_answer_length)


def test_iterative_m4c_forward_and_beam():
    vocab = M4CVocab()
    attn = {
        "ARCHITECTURE": "ScaledDotProductAttention",
        "HEAD": 2, "D_MODEL": D, "D_KEY": 8, "D_VALUE": 8, "D_FF": 32,
        "USE_AOA": False, "CAN_BE_STATEFUL": False, "DROPOUT": 0.1,
    }
    cfg = ConfigNode(
        {
            "ARCHITECTURE": "IterativeM4C",
            "D_MODEL": D,
            "REGION_EMBEDDING": {"ARCHITECTURE": "FeatureEmbedding",
                                 "D_FEATURE": 24, "D_MODEL": D, "DROPOUT": 0.1},
            "GRID_EMBEDDING": {"ARCHITECTURE": "FeatureEmbedding",
                               "D_FEATURE": 20, "D_MODEL": D, "DROPOUT": 0.1},
            "BOX_EMBEDDING": {"ARCHITECTURE": "FeatureEmbedding",
                              "D_FEATURE": 4, "D_MODEL": D, "DROPOUT": 0.1},
            "OCR_DET_EMBEDDING": {"ARCHITECTURE": "FeatureEmbedding",
                                  "D_FEATURE": 16, "D_MODEL": D, "DROPOUT": 0.1},
            "OCR_REC_EMBEDDING": {"ARCHITECTURE": "FeatureEmbedding",
                                  "D_FEATURE": 256, "D_MODEL": D, "DROPOUT": 0.1},
            "TEXT_EMBEDDING": {"ARCHITECTURE": "UsualEmbedding", "D_MODEL": D,
                               "D_EMBEDDING": D, "DROPOUT": 0.1,
                               "WORD_EMBEDDING": None},
            "OCR_TEXT_EMBEDDING": {"ARCHITECTURE": "OcrWordEmbedding",
                                   "D_MODEL": D, "D_EMBEDDING": 300,
                                   "DROPOUT": 0.1, "WORD_EMBEDDING": None},
            "DYNAMIC_EMBEDDING": {"ARCHITECTURE": "DynamicEmbedding",
                                  "D_MODEL": D},
            "ENCODER": {"ARCHITECTURE": "Encoder", "D_MODEL": D, "LAYERS": 2,
                        "SELF_ATTENTION": attn},
        }
    )
    model = META_ARCHITECTURE.get("IterativeM4C")(config=cfg, vocab=vocab)
    batch = _m4c_batch(vocab)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch
    )
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert out.shape == (2, vocab.max_answer_length, len(vocab) + K_OCR)
    np.testing.assert_allclose(
        np.exp(np.asarray(out)).sum(-1), 1.0, rtol=1e-3
    )

    outs, log_probs = jax.jit(
        lambda v, b: generate(model, v, b, batch_size=2, beam_size=2)
    )({"params": variables["params"]}, batch)
    assert outs.shape == (2, vocab.max_answer_length)
    assert (np.asarray(outs) < len(vocab) + K_OCR).all()

    # SCST re-scoring path: decode_teacher_forced over encode() state must
    # equal the training forward on the same answers (the single-stream
    # model had no override and crashed on the GenerativeModel default)
    def rescore(mdl, b):
        state, bias = mdl.encode(b, train=False)
        return mdl.decode_teacher_forced(b["answer_tokens"], state, bias)

    got = model.apply(variables, batch, method=rescore)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(got), atol=1e-5
    )


def test_scst_decode_batch_beam_row_alignment():
    """ADVICE r1: with out_size=beam the SCST path hands _decode_batch a
    (n_samples, k, L) array — row r must decode against sample r//k's OCR
    table, not table r."""
    import numpy as np

    from openvivqa_tpu.training.tasks.ocr_tasks import OcrOpenEndedTask

    class _StubVocab:
        max_answer_length = 4

        def decode_answer(self, vecs, list_ocr_tokens, join_words=False):
            assert len(list_ocr_tokens) == vecs.shape[0]
            return [[list_ocr_tokens[r][0]] for r in range(vecs.shape[0])]

    task = OcrOpenEndedTask.__new__(OcrOpenEndedTask)
    task.vocab = _StubVocab()
    outs = np.zeros((2, 3, 4), np.int64)  # 2 samples x 3 beams
    batch = {"ocr_tokens": [["alpha"], ["beta"]]}
    decoded = task._decode_batch(outs, batch)
    assert decoded == ["alpha"] * 3 + ["beta"] * 3

    # eval path: (bs, L) with batch-dim padding rows reusing the last table
    outs2 = np.zeros((3, 4), np.int64)
    batch2 = {"ocr_tokens": [["alpha"], ["beta"]]}  # n_real=2, bs=3
    assert task._decode_batch(outs2, batch2) == ["alpha", "beta", "beta"]
