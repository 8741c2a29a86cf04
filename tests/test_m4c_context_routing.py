"""MMF context-encode kernel routing (ROADMAP: 'context encode now
dominates' MMF greedy).  The 220-token joint [txt|obj|ocr] stream is in
the packed Pallas kernel's winning regime (>=192 keys measured crossover);
this pins that the BertEncoderStack encode site actually ASKS the router
with those dims and that the crossover decision holds — so a refactor of
the encode path cannot silently drop the kernel and the 1.3-1.8x with it.

CPU-only test: `should_use_fused` returns False off-TPU, so we record the
(sq, sk, d) queries it receives and check `fused_attention_wins` (the
TPU decision) on them instead of executing the kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


H, HEADS, LAYERS = 128, 4, 2
QLEN, N_OBJ, N_OCR = 20, 100, 100


@pytest.fixture()
def mmf_setup():
    import sys

    sys.path.insert(0, "/root/repo")
    from scripts.bench_m4c_decode import VOCAB  # noqa: F401 (import check)
    from openvivqa_tpu.builders import populate
    from openvivqa_tpu.config import ConfigNode
    from openvivqa_tpu.models.mmf_m4c import MMF_M4C

    populate()
    config = ConfigNode(
        {
            "ARCHITECTURE": "MMF_M4C",
            "D_MODEL": H,
            "MMT": {
                "HIDDEN_SIZE": H,
                "NUM_HIDDEN_LAYERS": LAYERS,
                "NUM_ATTENTION_HEADS": HEADS,
            },
            "TEXT_BERT": {"HIDDEN_SIZE": H, "NUM_HIDDEN_LAYERS": 1},
            "OBJECT_EMBEDDING": {"D_FEATURE": 64, "DROPOUT": 0.1},
            "OCR_EMBEDDING": {"D_FEATURE": 64, "DROPOUT": 0.1},
            "OCR_PTR_NET": {"HIDDEN_SIZE": H, "QUERY_KEY_SIZE": H},
            "DECODING_MODE": "incremental",
        }
    )

    class _Vocab:
        padding_idx, bos_idx, eos_idx, unk_idx = 0, 1, 2, 3
        max_answer_length = 6

        def __len__(self):
            return 50

    model = MMF_M4C(config, _Vocab())
    rng = np.random.default_rng(0)
    bs = 2

    def feats(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32))

    q = rng.integers(4, 50, (bs, QLEN)).astype(np.int32)
    batch = {
        "question_tokens": jnp.asarray(q),
        "region_features": feats(bs, N_OBJ, 64),
        "region_boxes": feats(bs, N_OBJ, 4),
        "ocr_fasttext_features": feats(bs, N_OCR, 24),
        "ocr_rec_features": feats(bs, N_OCR, 20),
        "ocr_det_features": feats(bs, N_OCR, 20),
        "ocr_boxes": feats(bs, N_OCR, 4),
        "answer_tokens": jnp.asarray(
            rng.integers(4, 50, (bs, 6)).astype(np.int32)
        ),
    }
    variables = jax.jit(
        lambda r, b: model.init({"params": r, "dropout": r}, b, train=False)
    )(jax.random.PRNGKey(0), batch)
    return model, batch, variables


def test_context_encode_queries_packed_kernel_at_winning_dims(
    mmf_setup, monkeypatch
):
    """incremental_greedy_decode's one-time context encode must route its
    joint-stream attention through the packed-kernel router with the
    220-key dims, and the TPU crossover must WIN there."""
    from openvivqa_tpu.ops import fused_attention as fa

    model, batch, variables = mmf_setup
    queries = []
    real = fa.should_use_fused

    def recording(sq, sk, d):
        queries.append((sq, sk, d))
        return real(sq, sk, d)

    monkeypatch.setattr(fa, "should_use_fused", recording)
    out = model.apply(
        variables, batch, method="greedy_decode", mutable=["cache"]
    )[0]
    assert out["prev_inds"].shape == (2, 6)

    joint = QLEN + N_OBJ + N_OCR  # 220
    d_head = H // HEADS
    ctx_queries = [q for q in queries if q[1] == joint]
    assert ctx_queries, (
        f"no attention site queried the router at the {joint}-key joint "
        f"stream; recorded queries: {sorted(set(queries))}"
    )
    assert (joint, joint, d_head) in ctx_queries, sorted(set(ctx_queries))
    # the TPU decision at those dims is a WIN (the packed kernel engages)
    assert fa.fused_attention_wins(joint, joint, d_head)
    # and the 20-token question stream correctly stays on XLA
    assert not fa.fused_attention_wins(QLEN, QLEN, d_head)


def test_decode_steps_query_packed_kernel(mmf_setup, monkeypatch):
    """The single-token decode steps attend over the [ctx|slots] cache
    (220+T keys) — also a winning stream; pin the sq=1 routing query."""
    from openvivqa_tpu.ops import fused_attention as fa

    model, batch, variables = mmf_setup
    queries = []
    real = fa.should_use_fused

    def recording(sq, sk, d):
        queries.append((sq, sk, d))
        return real(sq, sk, d)

    monkeypatch.setattr(fa, "should_use_fused", recording)
    model.apply(variables, batch, method="greedy_decode", mutable=["cache"])

    joint_plus_slots = QLEN + N_OBJ + N_OCR + 6
    step_queries = [q for q in queries if q[0] == 1]
    assert (1, joint_plus_slots, H // HEADS) in step_queries, sorted(
        set(step_queries)
    )
    assert fa.fused_attention_wins(1, joint_plus_slots, H // HEADS)
