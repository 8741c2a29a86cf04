"""Model-zoo smoke tests: every registered architecture initialises, runs a
forward pass with finite log-probs, and (generative models) beam-decodes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvivqa_tpu.builders import META_ARCHITECTURE, populate
from openvivqa_tpu.config import ConfigNode
from openvivqa_tpu.training.decode import generate

populate()

D = 32


class ZooVocab:
    padding_idx, bos_idx, eos_idx, unk_idx = 0, 1, 2, 3
    img_idx, feat_idx, box_idx, question_idx, answer_idx = 4, 5, 6, 7, 8
    total_answers = 17
    max_question_length = 7
    max_answer_length = 6
    word_embeddings = None

    def __len__(self):
        return 60


def _attn(stateful=False):
    return {
        "ARCHITECTURE": "ScaledDotProductAttention",
        "HEAD": 2, "D_MODEL": D, "D_KEY": 8, "D_VALUE": 8, "D_FF": 32,
        "USE_AOA": False, "CAN_BE_STATEFUL": stateful, "DROPOUT": 0.1,
    }


def _feature_embedding(d_feature):
    return {
        "ARCHITECTURE": "FeatureEmbedding",
        "D_FEATURE": d_feature, "D_MODEL": D, "DROPOUT": 0.1,
    }


def _usual_embedding():
    return {
        "ARCHITECTURE": "UsualEmbedding",
        "D_MODEL": D, "D_EMBEDDING": D, "DROPOUT": 0.1, "WORD_EMBEDDING": None,
    }


def _lstm_embedding():
    return {
        "ARCHITECTURE": "LSTMTextEmbedding",
        "D_MODEL": D, "D_EMBEDDING": 16, "DROPOUT": 0.1, "WORD_EMBEDDING": None,
    }


def _encoder():
    return {"ARCHITECTURE": "Encoder", "D_MODEL": D, "LAYERS": 2,
            "SELF_ATTENTION": _attn()}


def _coattention_encoder(arch="CoAttentionEncoder"):
    return {
        "ARCHITECTURE": arch, "D_MODEL": D, "LAYERS": 2,
        "VISION_LANGUAGE_ATTENTION": _attn(),
        "LANGUAGE_VISION_ATTENTION": _attn(),
        "VISION_SELF_ATTENTION": _attn(),
        "LANGUAGE_SELF_ATTENTION": _attn(),
    }


def _decoder():
    return {
        "ARCHITECTURE": "Decoder", "D_MODEL": D, "LAYERS": 2,
        "ATTENTION": {
            "SELF_ATTENTION": _attn(stateful=True),
            "ENC_ATTENTION": _attn(),
        },
        "TEXT_EMBEDDING": _usual_embedding(),
    }


def _attr_reduce():
    return {"D_MODEL": D, "DROPOUT": 0.1}


MODEL_CONFIGS = {
    "SAAA": {
        "D_MODEL": D,
        "VISION_PROCESSOR": _feature_embedding(24),
        "TEXT_PROCESSOR": _lstm_embedding(),
        "ATTENTION": {"D_VISION": D, "D_LANGUAGE": D, "D_MODEL": D,
                      "DROPOUT": 0.1, "GLIMPSES": 2},
    },
    "MCAN": {
        "D_MODEL": D,
        "VISION_EMBEDDING": _feature_embedding(24),
        "TEXT_EMBEDDING": _lstm_embedding(),
        "SELF_ENCODER": _encoder(),
        "GUIDED_ENCODER": {
            "ARCHITECTURE": "GuidedAttentionEncoder", "D_MODEL": D, "LAYERS": 2,
            "SELF_ATTENTION": _attn(), "GUIDED_ATTENTION": _attn(),
        },
        "VISION_ATTR_REDUCE": _attr_reduce(),
        "TEXT_ATTR_REDUCE": _attr_reduce(),
    },
    "VanillaTransformer": {
        "D_MODEL": D,
        "VISION_EMBEDDING": _feature_embedding(24),
        "TEXT_EMBEDDING": _usual_embedding(),
        "ENCODER": _encoder(),
        "ATTR_REDUCE": _attr_reduce(),
    },
    "ParallelAttentionTransformer": {
        "D_MODEL": D,
        "VISION_EMBEDDING": _feature_embedding(24),
        "TEXT_EMBEDDING": _usual_embedding(),
        "ENCODER": _coattention_encoder(),
        "VISION_ATTR_REDUCE": _attr_reduce(),
        "TEXT_ATTR_REDUCE": _attr_reduce(),
    },
    "CrossModalityTransformer": {
        "D_MODEL": D,
        "REGION_EMBEDDING": _feature_embedding(24),
        "TEXT_EMBEDDING": _usual_embedding(),
        "ENCODER": {
            "ARCHITECTURE": "CrossModalityEncoder", "D_MODEL": D, "LAYERS": 2,
            "VISION_LANGUAGE_ATTENTION": _attn(),
            "LANGUAGE_VISION_ATTENTION": _attn(),
            "VISION_SELF_ATTENTION": _attn(),
            "LANGUAGE_SELF_ATTENTION": _attn(),
        },
        "VISION_ATTR_REDUCE": _attr_reduce(),
        "TEXT_ATTR_REDUCE": _attr_reduce(),
    },
    "VisiolinguisticTransformer": {
        "D_MODEL": D,
        "REGION_EMBEDDING": _feature_embedding(24),
        "TEXT_EMBEDDING": _usual_embedding(),
        "ENCODER": _coattention_encoder(),
        "VISION_ATTR_REDUCE": _attr_reduce(),
        "TEXT_ATTR_REDUCE": _attr_reduce(),
    },
    "HierarchicalCoAttention": {
        "D_MODEL": D,
        "VISION_EMBEDDING": _feature_embedding(24),
        "TEXT_EMBEDDING": _usual_embedding(),
        "HIERARCHICAL": {"D_MODEL": D, "N_GRAMS": [1, 2, 3],
                         "WORD_EMBEDDING_DIM": D},
        "ENCODER": _coattention_encoder(),
        "VISION_ATTR_REDUCE": _attr_reduce(),
        "TEXT_ATTR_REDUCE": _attr_reduce(),
    },
    "IterativeMCAN": {
        "D_MODEL": D,
        "VISION_EMBEDDING": _feature_embedding(24),
        "TEXT_EMBEDDING": _usual_embedding(),
        "SELF_ENCODER": _encoder(),
        "GUIDED_ENCODER": {
            "ARCHITECTURE": "GuidedAttentionEncoder", "D_MODEL": D, "LAYERS": 2,
            "SELF_ATTENTION": _attn(), "GUIDED_ATTENTION": _attn(),
        },
        "MULTIMODAL_FUSION": {"D_MODEL": D, "D_FF": 32, "DROPOUT": 0.1},
        "DECODER": _decoder(),
    },
    "IterativeSAAA": {
        "D_MODEL": D,
        "VISION_PROCESSOR": _feature_embedding(24),
        "TEXT_PROCESSOR": {"D_MODEL": D, "D_EMBEDDING": 16, "DROPOUT": 0.1},
        "ATTENTION": {"D_VISION": D, "D_LANGUAGE": D, "D_MODEL": D,
                      "DROPOUT": 0.1, "GLIMPSES": 2},
        "MULTIMODAL_FUSION": {"D_MODEL": D, "D_FF": 32, "DROPOUT": 0.1},
        "DECODER": _decoder(),
    },
    "JointTransformer": {
        "D_MODEL": D,
        "REGION_EMBEDDING": _feature_embedding(24),
        "GRID_EMBEDDING": _feature_embedding(20),
        "BOX_EMBEDDING": _feature_embedding(4),
        "TEXT_EMBEDDING": _usual_embedding(),
        "ENCODER": _encoder(),
        "DECODER": _decoder(),
    },
    "UniqueTransformer": {
        "D_MODEL": D,
        "REGION_EMBEDDING": _feature_embedding(24),
        "GRID_EMBEDDING": _feature_embedding(20),
        "BOX_EMBEDDING": _feature_embedding(4),
        "TEXT_EMBEDDING": _usual_embedding(),
        "ENCODER": _encoder(),
    },
}

GENERATIVE = {
    "IterativeMCAN", "IterativeSAAA", "JointTransformer", "UniqueTransformer",
}


def _batch(vocab, bs=2, seed=0):
    rng = np.random.default_rng(seed)
    answers = rng.integers(9, len(vocab), (bs, vocab.max_answer_length)).astype(
        np.int32
    )
    return {
        "region_features": jnp.asarray(
            rng.normal(size=(bs, 5, 24)).astype(np.float32)
        ),
        "grid_features": jnp.asarray(
            rng.normal(size=(bs, 4, 20)).astype(np.float32)
        ),
        "region_boxes": jnp.asarray(
            rng.uniform(size=(bs, 5, 4)).astype(np.float32)
        ),
        "grid_boxes": jnp.asarray(rng.uniform(size=(bs, 4, 4)).astype(np.float32)),
        "question_tokens": jnp.asarray(
            rng.integers(9, len(vocab), (bs, vocab.max_question_length)).astype(
                np.int32
            )
        ),
        "answer_tokens": jnp.asarray(answers),
        "answer": jnp.asarray(
            rng.integers(0, vocab.total_answers, (bs, 1)).astype(np.int32)
        ),
    }


@pytest.mark.parametrize("name", sorted(MODEL_CONFIGS))
def test_model_forward(name):
    vocab = ZooVocab()
    model = META_ARCHITECTURE.get(name)(
        config=ConfigNode(dict(MODEL_CONFIGS[name], ARCHITECTURE=name)),
        vocab=vocab,
    )
    batch = _batch(vocab)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch
    )
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    if name in GENERATIVE:
        assert out.shape == (2, vocab.max_answer_length, len(vocab))
    else:
        assert out.shape == (2, vocab.total_answers)
    arr = np.asarray(out)
    assert np.isfinite(arr).all()
    # log-probs: rows sum to ~1 in prob space
    np.testing.assert_allclose(np.exp(arr).sum(-1), 1.0, rtol=1e-3)

    # dropout path works
    out_train = model.apply(
        variables, batch, train=True, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    assert np.isfinite(np.asarray(out_train)).all()


@pytest.mark.parametrize("name", sorted(GENERATIVE))
def test_model_beam_decode(name):
    vocab = ZooVocab()
    model = META_ARCHITECTURE.get(name)(
        config=ConfigNode(dict(MODEL_CONFIGS[name], ARCHITECTURE=name)),
        vocab=vocab,
    )
    batch = _batch(vocab)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch
    )
    outs, log_probs = jax.jit(
        lambda v, b: generate(model, v, b, batch_size=2, beam_size=2)
    )({"params": variables["params"]}, batch)
    assert outs.shape == (2, vocab.max_answer_length)
    assert np.isfinite(np.asarray(log_probs)).all()
    assert (np.asarray(outs) >= 0).all() and (np.asarray(outs) < len(vocab)).all()


@pytest.mark.parametrize("name", sorted(GENERATIVE))
def test_decode_teacher_forced_matches_forward(name):
    """The SCST re-scoring path (model.decode_teacher_forced over encode()
    outputs) must produce the same log-probs as the training forward on the
    same answers — UniqueTransformer used to crash here (no `decoder`
    submodule for the GenerativeModel default to delegate to)."""
    vocab = ZooVocab()
    model = META_ARCHITECTURE.get(name)(
        config=ConfigNode(dict(MODEL_CONFIGS[name], ARCHITECTURE=name)),
        vocab=vocab,
    )
    batch = _batch(vocab)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch
    )
    want = model.apply(variables, batch, train=False)

    def rescore(mdl, b):
        feats, bias = mdl.encode(b, train=False)
        return mdl.decode_teacher_forced(b["answer_tokens"], feats, bias)

    got = model.apply(variables, batch, method=rescore)
    np.testing.assert_allclose(
        np.asarray(want), np.asarray(got), atol=1e-5
    )
