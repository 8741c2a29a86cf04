"""Module-library tests: mask/table parity vs the torch reference, flax
module shapes, and decode-cache equivalence with the full forward."""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvivqa_tpu.config import ConfigNode
from openvivqa_tpu.models.modules.masks import (
    MASK_VALUE,
    box_relational_embedding,
    causal_bias,
    combine_biases,
    padding_bias,
    sinusoid_encoding_table,
)


# ---------------------------------------------------------------------------
# parity vs reference models/utils.py (loaded standalone; torch CPU)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def ref_utils():
    torch = pytest.importorskip("torch")
    fake_types = types.ModuleType("data_utils.types")
    fake_types.TensorOrSequence = object
    fake_types.TensorOrNone = object
    fake_pkg = types.ModuleType("data_utils")
    fake_pkg.types = fake_types
    sys.modules.setdefault("data_utils", fake_pkg)
    sys.modules["data_utils.types"] = fake_types
    spec = importlib.util.spec_from_file_location(
        "ref_models_utils", "/root/reference/models/utils.py"
    )
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module, torch


def test_sinusoid_table_parity(ref_utils):
    ref, torch = ref_utils
    ours = sinusoid_encoding_table(17, 64, padding_idx=0)
    theirs = ref.sinusoid_encoding_table(17, 64, padding_idx=0).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_padding_mask_parity(ref_utils):
    ref, torch = ref_utils
    tokens = np.array([[1, 5, 2, 0, 0], [7, 0, 0, 0, 0]], dtype=np.int64)
    ours = np.asarray(padding_bias(jnp.asarray(tokens), padding_idx=0))
    theirs = ref.generate_padding_mask(torch.tensor(tokens), padding_idx=0).numpy()
    np.testing.assert_allclose(ours, theirs)

    feats = np.random.default_rng(0).normal(size=(2, 4, 8)).astype(np.float32)
    feats[0, 2:] = 0.0
    ours_f = np.asarray(padding_bias(jnp.asarray(feats), padding_idx=0))
    theirs_f = ref.generate_padding_mask(torch.tensor(feats), padding_idx=0).numpy()
    np.testing.assert_allclose(ours_f, theirs_f)


def test_causal_and_combined_parity(ref_utils):
    ref, torch = ref_utils
    ours = np.asarray(causal_bias(6))
    theirs = ref.generate_sequential_mask(6).numpy()
    np.testing.assert_allclose(ours, theirs)

    tokens = torch.tensor([[1, 4, 0, 0]], dtype=torch.long)
    pad_t = ref.generate_padding_mask(tokens, 0)
    seq_t = ref.generate_sequential_mask(4)
    combined_t = ref.generate_self_attention_masks(pad_t, seq_t).numpy()
    combined_o = np.asarray(
        combine_biases(padding_bias(jnp.asarray(tokens.numpy()), 0), causal_bias(4))
    )
    np.testing.assert_allclose(combined_o, combined_t)


def test_box_relational_embedding_parity(ref_utils):
    ref, torch = ref_utils
    rng = np.random.default_rng(1)
    boxes = rng.uniform(0, 1, size=(2, 5, 4)).astype(np.float32)
    boxes[..., 2:] += boxes[..., :2]
    ours = np.asarray(box_relational_embedding(jnp.asarray(boxes), dim_g=64))
    theirs = ref.box_relational_embedding(torch.tensor(boxes), dim_g=64).numpy()
    # sin/cos of ~|100*log(1e-3)|≈690-magnitude arguments: f32 argument ulp
    # differences between libs dominate; 2e-2 is the achievable parity there
    np.testing.assert_allclose(ours, theirs, atol=2e-2)

    ours4 = np.asarray(
        box_relational_embedding(jnp.asarray(boxes), trignometric_embedding=False)
    )
    theirs4 = ref.box_relational_embedding(
        torch.tensor(boxes), trignometric_embedding=False
    ).numpy()
    np.testing.assert_allclose(ours4, theirs4, atol=5e-4)


# ---------------------------------------------------------------------------
# flax module behaviour
# ---------------------------------------------------------------------------
def _attn_config(**over):
    base = {
        "ARCHITECTURE": "ScaledDotProductAttention",
        "HEAD": 4,
        "D_MODEL": 32,
        "D_KEY": 8,
        "D_VALUE": 8,
        "D_FF": 64,
        "USE_AOA": False,
        "CAN_BE_STATEFUL": False,
        "DROPOUT": 0.0,
        "TRIGNOMETRIC_EMBEDDING": True,
        "MEMORY": 6,
    }
    base.update(over)
    return ConfigNode(base)


@pytest.mark.parametrize(
    "arch,extra",
    [
        ("ScaledDotProductAttention", {}),
        ("AugmentedMemoryScaledDotProductAttention", {}),
        ("AugmentedGeometryScaledDotProductAttention", {"boxes": True}),
        ("AdaptiveScaledDotProductAttention", {"language_signals": True}),
    ],
)
def test_attention_variants(arch, extra):
    from openvivqa_tpu.models.modules.attentions import MultiHeadAttention

    cfg = _attn_config(ARCHITECTURE=arch)
    mha = MultiHeadAttention(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 32))
    bias = padding_bias(x, 0)
    kwargs = {}
    if extra.get("boxes"):
        boxes = jax.random.uniform(jax.random.PRNGKey(2), (2, 5, 4))
        kwargs["boxes"] = boxes.at[..., 2:].add(boxes[..., :2])
    if extra.get("language_signals"):
        kwargs["language_signals"] = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 32))
    params = mha.init(rng, x, x, x, attention_bias=bias, **kwargs)
    out = mha.apply(params, x, x, x, attention_bias=bias, **kwargs)
    assert out.shape == (2, 5, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_masked_positions_do_not_affect_output():
    """Changing fully-masked key content must not change attention output."""
    from openvivqa_tpu.models.modules.attentions import MultiHeadAttention

    mha = MultiHeadAttention(_attn_config())
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 32))
    kv = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 32))
    bias = jnp.concatenate(
        [jnp.zeros((1, 1, 1, 4)), jnp.full((1, 1, 1, 2), MASK_VALUE)], axis=-1
    )
    params = mha.init(jax.random.PRNGKey(2), q, kv, kv, attention_bias=bias)
    out1 = mha.apply(params, q, kv, kv, attention_bias=bias)
    kv2 = kv.at[:, 4:].set(99.0)
    out2 = mha.apply(params, q, kv2, kv2, attention_bias=bias)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def _decoder_cfg():
    attn = {
        "ARCHITECTURE": "ScaledDotProductAttention",
        "HEAD": 4, "D_MODEL": 32, "D_KEY": 8, "D_VALUE": 8, "D_FF": 64,
        "USE_AOA": False, "DROPOUT": 0.0,
    }
    return ConfigNode(
        {
            "ARCHITECTURE": "Decoder",
            "D_MODEL": 32,
            "LAYERS": 2,
            "ATTENTION": {
                "SELF_ATTENTION": dict(attn, CAN_BE_STATEFUL=True),
                "ENC_ATTENTION": dict(attn, CAN_BE_STATEFUL=False),
            },
            "TEXT_EMBEDDING": {
                "ARCHITECTURE": "UsualEmbedding",
                "D_MODEL": 32,
                "D_EMBEDDING": 32,
                "WORD_EMBEDDING": None,
                "DROPOUT": 0.0,
            },
        }
    )


class _TinyVocab:
    padding_idx, bos_idx, eos_idx, unk_idx = 0, 1, 2, 3
    max_answer_length = 8

    def __len__(self):
        return 11


def test_decoder_step_matches_forward():
    """KV-cache decode must produce the same next-token logits as the full
    teacher-forcing forward on the same prefix."""
    from openvivqa_tpu.builders import populate
    from openvivqa_tpu.models.modules.decoders import Decoder

    populate()
    vocab = _TinyVocab()
    decoder = Decoder(_decoder_cfg(), vocab)

    enc = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 32))
    enc_bias = jnp.zeros((2, 1, 1, 7))
    tokens = jnp.array([[1, 5, 6, 4], [1, 7, 8, 9]], dtype=jnp.int32)

    variables = decoder.init(jax.random.PRNGKey(1), tokens, enc, enc_bias)
    full = decoder.apply(variables, tokens, enc, enc_bias)  # (2, 4, V)

    cache = {}
    step_outs = []
    for t in range(tokens.shape[1]):
        token_t = tokens[:, t : t + 1]
        inputs = {"params": variables["params"], **({"cache": cache} if cache else {})}
        out, mutated = decoder.apply(
            inputs, token_t, enc, enc_bias, method=Decoder.step, mutable=["cache"]
        )
        cache = mutated["cache"]
        step_outs.append(out[:, 0])
    stepped = jnp.stack(step_outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(stepped), atol=2e-5)


def test_encoder_shapes():
    from openvivqa_tpu.builders import populate
    from openvivqa_tpu.models.modules.encoders import Encoder, GuidedAttentionEncoder

    populate()
    attn = {
        "ARCHITECTURE": "ScaledDotProductAttention",
        "HEAD": 4, "D_MODEL": 32, "D_KEY": 8, "D_VALUE": 8, "D_FF": 64,
        "USE_AOA": False, "CAN_BE_STATEFUL": False, "DROPOUT": 0.0,
    }
    enc = Encoder(ConfigNode({"D_MODEL": 32, "LAYERS": 2, "SELF_ATTENTION": attn}))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 32))
    bias = jnp.zeros((2, 1, 1, 5))
    params = enc.init(jax.random.PRNGKey(1), x, bias)
    out = enc.apply(params, x, bias)
    assert out.shape == (2, 5, 32)

    genc = GuidedAttentionEncoder(
        ConfigNode({"D_MODEL": 32, "LAYERS": 2, "GUIDED_ATTENTION": attn})
    )
    lang = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 32))
    lbias = jnp.zeros((2, 1, 1, 4))
    gparams = genc.init(jax.random.PRNGKey(3), x, bias, lang, lbias)
    gout = genc.apply(gparams, x, bias, lang, lbias)
    assert gout.shape == (2, 5, 32)


@pytest.mark.parametrize(
    "head,d_key,d_value,d_model",
    [
        (4, 8, 4, 32),   # D_KEY != D_VALUE (pre-round-3 cache layout bug)
        (4, 16, 16, 32), # HEAD*D_KEY != D_MODEL
    ],
)
def test_stateful_decode_odd_projection_widths(head, d_key, d_value, d_model):
    """The packed decode cache must size K/V buffers from the PROJECTION
    widths (h*d_k / h*d_v), which the schema allows to differ from d_model
    and from each other (round-3 review finding: both were sized from one
    width and crashed these configs)."""
    import jax
    import numpy as np

    from openvivqa_tpu.models.modules.attentions import MultiHeadAttention

    cfg = ConfigNode({
        "ARCHITECTURE": "ScaledDotProductAttention",
        "HEAD": head, "D_MODEL": d_model, "D_KEY": d_key,
        "D_VALUE": d_value, "D_FF": 64,
        "USE_AOA": False, "CAN_BE_STATEFUL": True, "DROPOUT": 0.0,
    })
    mha = MultiHeadAttention(config=cfg)
    rng = np.random.default_rng(0)
    bs, max_len = 2, 5
    x = jnp.asarray(rng.normal(size=(bs, 1, d_model)).astype(np.float32))

    variables = mha.init(
        jax.random.PRNGKey(0), x, x, x, None,
        decode=True, max_decode_len=max_len,
    )
    cache = variables["cache"]
    out = None
    for _ in range(3):
        out, mutated = mha.apply(
            {"params": variables["params"], "cache": cache},
            x, x, x, None,
            decode=True, max_decode_len=max_len, mutable=["cache"],
        )
        cache = mutated["cache"]
    assert out.shape == (bs, 1, d_model)
    assert np.isfinite(np.asarray(out)).all()


def test_bert_stack_decode_guards():
    """BertEncoderStack latent-trap guards: cross-attention stacks cannot
    use the self-only stack decode_step (they must drive layers with
    cross_kv — models/mmf_variants.py), and the mutually-destructive
    return_all+return_layer_inputs combination raises instead of silently
    dropping all_states."""
    import jax
    import jax.numpy as jnp
    import pytest

    from openvivqa_tpu.models.modules.bert import BertEncoderStack

    x = jnp.zeros((2, 5, 16), jnp.float32)

    cross = BertEncoderStack(
        hidden_size=16, num_layers=1, num_heads=2, cross_attention=True
    )
    cvars = jax.jit(
        lambda r, a: cross.init(
            r, a, encoder_states=a, encoder_bias=None, train=False
        )
    )(jax.random.PRNGKey(0), x)
    caches = (
        (jnp.zeros((2, 8, 16), jnp.float32), jnp.zeros((2, 8, 16), jnp.float32)),
    )
    with pytest.raises(NotImplementedError, match="cross_kv"):
        cross.apply(
            cvars, x[:, :1], caches, jnp.int32(0), None,
            method="decode_step",
        )

    plain = BertEncoderStack(hidden_size=16, num_layers=1, num_heads=2)
    pvars = jax.jit(lambda r, a: plain.init(r, a))(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="mutually exclusive"):
        plain.apply(pvars, x, return_all=True, return_layer_inputs=True)


def test_bert_stack_decode_step_matches_full_forward():
    """Direct stack-level pin of the incremental path: encoding [ctx|tokens]
    with __call__ equals project_context + init_decode_caches + step-by-step
    decode_step when the bias exposes keys causally (the fallback XLA
    attention body is shared between both paths)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from openvivqa_tpu.models.modules.bert import BertEncoderStack
    from openvivqa_tpu.models.modules.masks import MASK_VALUE

    bs, C, T, h = 2, 6, 3, 16
    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.normal(size=(bs, C, h)).astype(np.float32))
    toks = jnp.asarray(rng.normal(size=(bs, T, h)).astype(np.float32))

    stack = BertEncoderStack(hidden_size=h, num_layers=2, num_heads=2)
    variables = jax.jit(lambda r, a: stack.init(r, a))(
        jax.random.PRNGKey(1), ctx
    )

    # full forward over [ctx | toks] with context blind to the tokens and
    # causal masking among tokens (the incremental decode's premise)
    total = C + T
    bias = np.zeros((bs, 1, total, total), np.float32)
    bias[:, :, :C, C:] = MASK_VALUE  # context cannot see decoder slots
    for i in range(T):
        bias[:, :, C + i, C + i + 1:] = MASK_VALUE  # causal among tokens
    full = stack.apply(
        variables, jnp.concatenate([ctx, toks], axis=1),
        attention_bias=jnp.asarray(bias),
    )[:, C:]

    # incremental: context encoded once, tokens stepped one at a time
    ctx_bias = jnp.asarray(bias[:, :, :C, :C])
    _, layer_inputs = stack.apply(
        variables, ctx, attention_bias=ctx_bias, return_layer_inputs=True
    )
    ctx_kv = stack.apply(variables, layer_inputs, method="project_context")
    caches = stack.init_decode_caches(ctx_kv, T)
    outs = []
    positions = jnp.arange(total)
    for i in range(T):
        step_bias = jnp.broadcast_to(
            jnp.where(positions <= C + i, 0.0, MASK_VALUE)[None, None, None],
            (bs, 1, 1, total),
        )
        out, caches = stack.apply(
            variables, toks[:, i:i + 1], caches, jnp.int32(C + i), step_bias,
            method="decode_step",
        )
        outs.append(out)
    inc = jnp.concatenate(outs, axis=1)

    np.testing.assert_allclose(np.asarray(full), np.asarray(inc), atol=1e-5)
