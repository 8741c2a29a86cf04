"""SCP/TSS research modules + AdaptiveDecoder + language models."""

import jax
import jax.numpy as jnp
import numpy as np

from openvivqa_tpu.builders import populate
from openvivqa_tpu.config import ConfigNode
from openvivqa_tpu.models.modules.scp_tss import (
    SpatialCirclePosition,
    TextSemanticSeparate,
    quantise_to_patch_grid,
)

populate()

D = 32


class TinyVocab:
    padding_idx, bos_idx, eos_idx, unk_idx = 0, 1, 2, 3
    max_answer_length = 6
    word_embeddings = None

    def __len__(self):
        return 30


def test_quantise_to_patch_grid():
    boxes = jnp.asarray([[[0.0, 0.0, 0.05, 0.05], [0.9, 0.9, 1.0, 1.0]]])
    patches = np.asarray(quantise_to_patch_grid(boxes))
    assert patches.shape == (1, 2, 2)
    assert (patches[0, 0] < 0.1).all() and (patches[0, 1] > 0.9).all()


def test_spatial_circle_position():
    cfg = ConfigNode(
        {
            "ARCHITECTURE": "SpatialCirclePosition",
            "HEAD": 2, "D_MODEL": D, "D_KEY": 8, "D_VALUE": 8,
            "NUM_DISTANCE": 8, "DROPOUT": 0.1, "USE_AOA": False,
            "CAN_BE_STATEFUL": False,
        }
    )
    scp = SpatialCirclePosition(cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, 5, D)).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(size=(2, 5, 4)).astype(np.float32))
    bias = jnp.zeros((2, 1, 1, 5))
    params = scp.init(jax.random.PRNGKey(0), feats, boxes, bias)
    out, weights = scp.apply(params, feats, boxes, bias)
    assert out.shape == (2, 5, D)
    np.testing.assert_allclose(np.asarray(weights).sum(-1), 1.0, atol=1e-5)


def test_text_semantic_separate():
    tss = TextSemanticSeparate(ConfigNode({"D_MODEL": D}))
    rng = np.random.default_rng(1)
    args = [
        jnp.asarray(rng.normal(size=(2, 4, D)).astype(np.float32)) for _ in range(4)
    ]
    params = tss.init(jax.random.PRNGKey(0), *args)
    out = tss.apply(params, *args)
    assert out.shape == (2, 8, D)  # interleaved: 2x the OCR length


def test_adaptive_decoder_with_language_model():
    from openvivqa_tpu.builders import META_DECODER

    attn = {
        "ARCHITECTURE": "ScaledDotProductAttention",
        "HEAD": 2, "D_MODEL": D, "D_KEY": 8, "D_VALUE": 8, "D_FF": 32,
        "USE_AOA": False, "DROPOUT": 0.1,
    }
    adaptive_attn = dict(attn, ARCHITECTURE="AdaptiveScaledDotProductAttention")
    cfg = ConfigNode(
        {
            "ARCHITECTURE": "AdaptiveDecoder",
            "D_MODEL": D,
            "LAYERS": 1,
            "ATTENTION": {
                "SELF_ATTENTION": dict(attn, CAN_BE_STATEFUL=True),
                "ENC_ATTENTION": dict(attn, CAN_BE_STATEFUL=False),
            },
            "ADAPTIVE_ATTENTION": {
                "SELF_ATTENTION": dict(adaptive_attn, CAN_BE_STATEFUL=True),
                "ENC_ATTENTION": dict(attn, CAN_BE_STATEFUL=False),
            },
            "TEXT_EMBEDDING": {
                "ARCHITECTURE": "UsualEmbedding", "D_MODEL": D,
                "D_EMBEDDING": D, "DROPOUT": 0.1, "WORD_EMBEDDING": None,
            },
            "LANGUAGE_MODEL": {
                "ARCHITECTURE": "BERTModel", "D_MODEL": D,
                "D_PRETRAINED_FEATURE": 48, "PRETRAINED_LAYERS": 1,
                "DROPOUT": 0.1,
            },
        }
    )
    vocab = TinyVocab()
    decoder = META_DECODER.get("AdaptiveDecoder")(config=cfg, vocab=vocab)
    tokens = jnp.asarray([[1, 5, 6, 0], [1, 7, 0, 0]], dtype=jnp.int32)
    enc = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, 7, D)).astype(np.float32)
    )
    bias = jnp.zeros((2, 1, 1, 7))
    variables = jax.jit(lambda r: decoder.init(r, tokens, enc, bias))(
        jax.random.PRNGKey(0)
    )
    out = decoder.apply(variables, tokens, enc, bias)
    assert out.shape == (2, 4, len(vocab))
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(-1), 1.0, rtol=1e-3)


def test_adaptive_decoder_step_decode():
    """AdaptiveDecoder.step: single-token decode with the ring cache and
    the per-step adaptive language column.  No bit-equality with __call__
    is possible (the frozen LM sees the full sequence there but only the
    current token here — exactly the reference's stateful behaviour,
    decoders.py:118), so this pins that generation works at all: the
    registered decoder used to have no step() and crashed in decode."""
    from openvivqa_tpu.builders import META_DECODER

    attn = {
        "ARCHITECTURE": "ScaledDotProductAttention",
        "HEAD": 2, "D_MODEL": D, "D_KEY": 8, "D_VALUE": 8, "D_FF": 32,
        "USE_AOA": False, "DROPOUT": 0.1,
    }
    adaptive_attn = dict(attn, ARCHITECTURE="AdaptiveScaledDotProductAttention")
    cfg = ConfigNode(
        {
            "ARCHITECTURE": "AdaptiveDecoder",
            "D_MODEL": D,
            "LAYERS": 1,
            "ATTENTION": {
                "SELF_ATTENTION": dict(attn, CAN_BE_STATEFUL=True),
                "ENC_ATTENTION": dict(attn, CAN_BE_STATEFUL=False),
            },
            "ADAPTIVE_ATTENTION": {
                "SELF_ATTENTION": dict(adaptive_attn, CAN_BE_STATEFUL=True),
                "ENC_ATTENTION": dict(attn, CAN_BE_STATEFUL=False),
            },
            "TEXT_EMBEDDING": {
                "ARCHITECTURE": "UsualEmbedding", "D_MODEL": D,
                "D_EMBEDDING": D, "DROPOUT": 0.1, "WORD_EMBEDDING": None,
            },
            "LANGUAGE_MODEL": {
                "ARCHITECTURE": "BERTModel", "D_MODEL": D,
                "D_PRETRAINED_FEATURE": 48, "PRETRAINED_LAYERS": 1,
                "DROPOUT": 0.1,
            },
        }
    )
    vocab = TinyVocab()
    decoder = META_DECODER.get("AdaptiveDecoder")(config=cfg, vocab=vocab)
    tokens = jnp.asarray([[1, 5, 6, 0], [1, 7, 2, 0]], dtype=jnp.int32)
    enc = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 7, D)).astype(np.float32)
    )
    bias = jnp.zeros((2, 1, 1, 7))
    variables = jax.jit(lambda r: decoder.init(r, tokens, enc, bias))(
        jax.random.PRNGKey(0)
    )

    caches = {}
    outs = []
    for i in range(tokens.shape[1]):
        out, mutated = decoder.apply(
            {"params": variables["params"], **caches},
            tokens[:, i : i + 1], enc, bias,
            method="step", mutable=["cache"],
        )
        caches = {"cache": mutated["cache"]}
        outs.append(out)
    stacked = np.asarray(jnp.concatenate(outs, axis=1))
    assert stacked.shape == (2, 4, len(vocab))
    assert np.isfinite(stacked).all()
    np.testing.assert_allclose(np.exp(stacked).sum(-1), 1.0, rtol=1e-3)
