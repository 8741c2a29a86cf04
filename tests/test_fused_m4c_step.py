"""Kernel-D fused M4C decode step (ops/decode_step.fused_bert_self_step +
fused_ffn_step with BERT eps): interpret-mode equivalence against both the
XLA incremental path and the quadratic full-re-encode greedy.

The fused path differs from the XLA path only in reduction order (segmented
block-diagonal head sums) and the in-kernel erf approximation (max abs err
1.5e-7), so scores must agree to ~1e-4 and greedy tokens exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvivqa_tpu.builders import populate
from openvivqa_tpu.config import ConfigNode
from openvivqa_tpu.models.mmf_m4c import MMF_M4C

populate()

H, HEADS, VOCAB, MAXA = 32, 4, 25, 6
N_OBJ, N_OCR, QLEN = 4, 3, 5


class Vocab:
    padding_idx, bos_idx, eos_idx, unk_idx = 0, 1, 2, 3
    max_answer_length = MAXA

    def __len__(self):
        return VOCAB


def _config(**extra):
    return ConfigNode(
        {
            "ARCHITECTURE": "MMF_M4C",
            "D_MODEL": H,
            "MMT": {
                "HIDDEN_SIZE": H,
                "NUM_HIDDEN_LAYERS": 2,
                "NUM_ATTENTION_HEADS": HEADS,
            },
            "TEXT_BERT": {"HIDDEN_SIZE": H, "NUM_HIDDEN_LAYERS": 1},
            "OBJECT_EMBEDDING": {"D_FEATURE": 12, "DROPOUT": 0.0},
            "OCR_EMBEDDING": {"D_FEATURE": 24, "DROPOUT": 0.0},
            "OCR_PTR_NET": {"HIDDEN_SIZE": H, "QUERY_KEY_SIZE": 16},
            **extra,
        }
    )


def _batch(bs=3, seed=13):
    rng = np.random.default_rng(seed)

    def feats(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32))

    q = rng.integers(4, VOCAB, (bs, QLEN)).astype(np.int32)
    q[:, -1] = 0
    return {
        "question_tokens": jnp.asarray(q),
        "region_features": feats(bs, N_OBJ, 12),
        "region_boxes": feats(bs, N_OBJ, 4),
        "ocr_fasttext_features": feats(bs, N_OCR, 10),
        "ocr_rec_features": feats(bs, N_OCR, 8),
        "ocr_det_features": feats(bs, N_OCR, 6),
        "ocr_boxes": feats(bs, N_OCR, 4),
        "answer_tokens": jnp.asarray(
            rng.integers(4, VOCAB + N_OCR, (bs, MAXA)).astype(np.int32)
        ),
    }


def _params_and_batch():
    batch = _batch()
    model = MMF_M4C(_config(CONTEXT_BLIND=True), Vocab())
    variables = jax.jit(
        lambda r, b: model.init({"params": r, "dropout": r}, b, train=False)
    )(jax.random.PRNGKey(3), batch)
    return variables["params"], batch


def test_fused_step_matches_xla_and_quadratic(monkeypatch):
    params, batch = _params_and_batch()
    vocab = Vocab()
    quadratic = MMF_M4C(_config(CONTEXT_BLIND=True), vocab)
    incremental = MMF_M4C(_config(DECODING_MODE="incremental"), vocab)

    want = quadratic.apply({"params": params}, batch, method="greedy_decode")
    xla = incremental.apply({"params": params}, batch, method="greedy_decode")

    monkeypatch.setenv("OPENVIVQA_DECODE_KERNEL", "interpret")
    fused = incremental.apply({"params": params}, batch, method="greedy_decode")

    np.testing.assert_array_equal(
        np.asarray(fused["prev_inds"]), np.asarray(want["prev_inds"])
    )
    np.testing.assert_allclose(
        np.asarray(fused["scores"]), np.asarray(xla["scores"]), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(fused["scores"]), np.asarray(want["scores"]), atol=2e-4
    )


def test_fused_step_multi_chunk_streaming(monkeypatch):
    """Forcing a chunk smaller than the context length exercises the
    flash-style running-softmax accumulation across grid steps (nj=2 with
    a MASK_VALUE-padded tail here) — the path the kernel takes at real
    MMF dims where the 220-row context cannot fit one VMEM block."""
    params, batch = _params_and_batch()
    vocab = Vocab()
    quadratic = MMF_M4C(_config(CONTEXT_BLIND=True), vocab)
    incremental = MMF_M4C(_config(DECODING_MODE="incremental"), vocab)

    want = quadratic.apply({"params": params}, batch, method="greedy_decode")
    monkeypatch.setenv("OPENVIVQA_DECODE_KERNEL", "interpret")
    monkeypatch.setenv("OPENVIVQA_DECODE_CHUNK", "8")
    fused = incremental.apply({"params": params}, batch, method="greedy_decode")

    np.testing.assert_array_equal(
        np.asarray(fused["prev_inds"]), np.asarray(want["prev_inds"])
    )
    np.testing.assert_allclose(
        np.asarray(fused["scores"]), np.asarray(want["scores"]), atol=2e-4
    )


def test_fused_state_engages_in_interpret_mode(monkeypatch):
    """The dispatch actually routes through kernel D under interpret (a
    silent fall-through to the XLA path would vacuously pass the test
    above)."""
    from openvivqa_tpu.models.modules.bert import BertEncoderStack

    params, batch = _params_and_batch()
    incremental = MMF_M4C(_config(DECODING_MODE="incremental"), Vocab())

    calls = []
    orig = BertEncoderStack.fused_decode_step

    def spy(self, *a, **k):
        calls.append(1)
        return orig(self, *a, **k)

    monkeypatch.setattr(BertEncoderStack, "fused_decode_step", spy)
    monkeypatch.setenv("OPENVIVQA_DECODE_KERNEL", "interpret")
    incremental.apply({"params": params}, batch, method="greedy_decode")
    assert calls, "kernel-D path did not engage under interpret mode"

    # and does NOT engage when forced off
    calls.clear()
    monkeypatch.setenv("OPENVIVQA_DECODE_KERNEL", "0")
    incremental.apply({"params": params}, batch, method="greedy_decode")
    assert not calls


@pytest.mark.parametrize(
    "arch", ["MMF_IterativeM4C", "MMF_Iterative_Multilevel_M4C"]
)
def test_fused_iterative_step(arch, monkeypatch):
    """The Iterative M4C family's fused decode (kernel A self-attn over the
    slot ring + kernel E cross-attn streamed over encoder chunks + fused
    FFN, all at BertLayer eps) matches both its XLA incremental path and
    the quadratic greedy.  Chunk forced below the encoder length so the
    kernel-E flash accumulation across grid steps is exercised."""
    from openvivqa_tpu.builders import META_ARCHITECTURE

    vocab = Vocab()
    build = META_ARCHITECTURE.get(arch)
    quadratic = build(config=_config(), vocab=vocab)
    incremental = build(
        config=_config(DECODING_MODE="incremental"), vocab=vocab
    )
    batch = _batch()
    variables = jax.jit(
        lambda r, b: quadratic.init({"params": r, "dropout": r}, b, train=False)
    )(jax.random.PRNGKey(7), batch)
    params = variables["params"]

    want = quadratic.apply({"params": params}, batch, method="greedy_decode")
    xla = incremental.apply({"params": params}, batch, method="greedy_decode")

    monkeypatch.setenv("OPENVIVQA_DECODE_KERNEL", "interpret")
    monkeypatch.setenv("OPENVIVQA_DECODE_CHUNK", "8")
    fused = incremental.apply({"params": params}, batch, method="greedy_decode")

    np.testing.assert_array_equal(
        np.asarray(fused["prev_inds"]), np.asarray(want["prev_inds"])
    )
    np.testing.assert_allclose(
        np.asarray(fused["scores"]), np.asarray(xla["scores"]), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(fused["scores"]), np.asarray(want["scores"]), atol=2e-4
    )


def test_fused_step_standalone_m4c(monkeypatch):
    """The standalone M4C routes through the same kernel-D state; its
    incremental greedy stays equivalent to its quadratic greedy."""
    from openvivqa_tpu.builders import META_ARCHITECTURE

    class OcrVocab(Vocab):
        pass

    cfg = {
        "ARCHITECTURE": "M4C",
        "DEVICE": "cpu",
        "D_MODEL": H,
        "OBJECT_EMBEDDING": {"D_FEATURE": 12, "DROPOUT": 0.0},
        "OCR_EMBEDDING": {"D_FEATURE": 24, "DROPOUT": 0.0},
        "DYNAMIC_EMBEDDING": {
            "ARCHITECTURE": "FixedVocabDynamicEmbedding",
            "D_MODEL": H,
            "DROPOUT": 0.0,
        },
        "MMT": {
            "HIDDEN_SIZE": H,
            "NUM_HIDDEN_LAYERS": 2,
            "NUM_ATTENTION_HEADS": HEADS,
        },
        "TEXT_BERT": {"HIDDEN_SIZE": H, "NUM_HIDDEN_LAYERS": 1},
        "ENCODER": {
            "ARCHITECTURE": "MultiModalEncoder",
            "D_MODEL": H,
            "LAYERS": 2,
            "SELF_ATTENTION": {"D_MODEL": H, "HEAD": HEADS},
        },
    }
    batch = _batch()

    def build(**extra):
        return META_ARCHITECTURE.get("M4C")(
            config=ConfigNode({**cfg, **extra}), vocab=OcrVocab()
        )

    quadratic = build(CONTEXT_BLIND=True)
    incremental = build(DECODING_MODE="incremental")
    variables = jax.jit(
        lambda r, b: quadratic.init({"params": r, "dropout": r}, b, train=False)
    )(jax.random.PRNGKey(5), batch)
    params = variables["params"]

    want = quadratic.apply({"params": params}, batch, method="greedy_decode")
    monkeypatch.setenv("OPENVIVQA_DECODE_KERNEL", "interpret")
    fused = incremental.apply({"params": params}, batch, method="greedy_decode")

    np.testing.assert_array_equal(
        np.asarray(fused["prev_inds"]), np.asarray(want["prev_inds"])
    )
    np.testing.assert_allclose(
        np.asarray(fused["scores"]), np.asarray(want["scores"]), atol=2e-4
    )


def test_encode_ffn_kernel_routing(monkeypatch):
    """Full-sequence encodes route each BertLayer FFN through the fused
    Pallas FFN kernel (bert.BertLayer._ffn_fused — the MMT context encode
    was the largest MMF-greedy stage and its FFN half the larger part).
    Equivalence vs the XLA sublayer within the erf-approximation bound,
    plus an engagement check so a silent fall-through cannot pass."""
    from openvivqa_tpu.models.modules.bert import BertEncoderStack
    import openvivqa_tpu.ops.decode_step as ds

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 24, H)).astype(np.float32))
    stack = BertEncoderStack(hidden_size=H, num_layers=2, num_heads=HEADS)
    variables = jax.jit(stack.init)(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("OPENVIVQA_ENCODE_FFN", "0")
    want = stack.apply(variables, x)

    calls = []
    real = ds.fused_ffn_step

    def counting(*args, **kwargs):
        calls.append(args[0].shape)
        return real(*args, **kwargs)

    monkeypatch.setattr(ds, "fused_ffn_step", counting)
    monkeypatch.delenv("OPENVIVQA_ENCODE_FFN")
    monkeypatch.setenv("OPENVIVQA_DECODE_KERNEL", "interpret")
    fused = stack.apply(variables, x)

    assert calls == [(48, H), (48, H)], "encode FFN kernel did not engage"
    np.testing.assert_allclose(np.asarray(fused), np.asarray(want), atol=2e-5)


def test_encode_ffn_kernel_skips_train_and_single_token(monkeypatch):
    """The routing must NOT engage for training (no dropout/AD in the
    kernel) or single-token decode rows (in-scan weight casts are not
    hoisted by XLA)."""
    from openvivqa_tpu.models.modules.bert import BertEncoderStack
    import openvivqa_tpu.ops.decode_step as ds

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(2, 8, H)).astype(np.float32))
    stack = BertEncoderStack(hidden_size=H, num_layers=1, num_heads=HEADS)
    variables = jax.jit(stack.init)(jax.random.PRNGKey(0), x)

    calls = []
    real = ds.fused_ffn_step

    def counting(*args, **kwargs):
        calls.append(args[0].shape)
        return real(*args, **kwargs)

    monkeypatch.setattr(ds, "fused_ffn_step", counting)
    monkeypatch.setenv("OPENVIVQA_DECODE_KERNEL", "interpret")

    stack.apply(
        variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    assert calls == [], "kernel must not engage in training mode"

    stack.apply(variables, x[:, :1, :])
    assert calls == [], "kernel must not engage for single-token rows"


def test_decoder_layer_plan_legality_odd_batch():
    """Planner blocks must satisfy Mosaic's second-to-last-dim rule:
    divisible by 8 or equal to the full batch.  A 63-row SCST beam batch
    used to get blk=1 and crash pallas lowering (round-5 regression)."""
    from openvivqa_tpu.ops.decode_step import decoder_layer_step_viable

    for bs in (63, 21, 7, 12, 60, 64, 192):
        blk = decoder_layer_step_viable(bs, 14, 120, 512, 2048, 2)
        assert blk is None or blk == bs or blk % 8 == 0, (bs, blk)
        if blk is not None:
            assert bs % blk == 0
