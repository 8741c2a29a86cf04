"""HF BERT weight conversion: our flax stack with converted weights matches
torch transformers.BertModel outputs on shared inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from openvivqa_tpu.models.modules.bert import BertEmbeddings, BertEncoderStack
from openvivqa_tpu.models.modules.hf_conversion import convert_bert_weights
from openvivqa_tpu.models.modules.masks import padding_bias


def test_bert_conversion_matches_torch():
    config = transformers.BertConfig(
        vocab_size=120,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=40,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.BertModel(config, add_pooling_layer=False)
    hf.eval()

    rng = np.random.default_rng(0)
    tokens = rng.integers(4, 120, size=(2, 9)).astype(np.int64)
    tokens[:, -2:] = 0  # pad

    attn_mask = (tokens != 0).astype(np.float32)
    with torch.no_grad():
        # HF extended mask: (1-mask) * large negative, like the framework's
        ext = (1.0 - torch.tensor(attn_mask)[:, None, None, :]) * -10e4
        want = hf(
            input_ids=torch.tensor(tokens),
            attention_mask=torch.tensor(attn_mask),
        ).last_hidden_state.numpy()

    params = convert_bert_weights(hf.state_dict(), num_layers=2)

    embeddings = BertEmbeddings(
        vocab_size=120, hidden_size=32, max_position_embeddings=40, dropout=0.0
    )
    encoder = BertEncoderStack(
        hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
        dropout=0.0,
    )
    tokens_j = jnp.asarray(tokens.astype(np.int32))
    bias = padding_bias(tokens_j, padding_idx=0)
    embedded = embeddings.apply({"params": params["embeddings"]}, tokens_j)
    out = encoder.apply(
        {"params": params["encoder"]}, embedded, attention_bias=bias
    )
    got = np.asarray(out)

    # compare only non-padded positions (HF computes padded rows too but
    # they are meaningless)
    valid = attn_mask.astype(bool)
    np.testing.assert_allclose(got[valid], want[valid], atol=5e-5)


def test_roberta_conversion_matches_torch():
    """Converted RobertaModel weights reproduce torch last_hidden_state
    through our stack (positions re-based from RoBERTa's +2 offset)."""
    from openvivqa_tpu.models.modules.hf_conversion import (
        convert_roberta_weights,
    )

    config = transformers.RobertaConfig(
        vocab_size=120,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=42,  # 40 usable + offset 2
        type_vocab_size=1,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        pad_token_id=1,
    )
    torch.manual_seed(2)
    hf = transformers.RobertaModel(config, add_pooling_layer=False)
    hf.eval()

    rng = np.random.default_rng(2)
    tokens = rng.integers(4, 120, size=(2, 9)).astype(np.int64)

    with torch.no_grad():
        want = hf(input_ids=torch.tensor(tokens)).last_hidden_state.numpy()

    params = convert_roberta_weights(hf.state_dict(), num_layers=2)
    embeddings = BertEmbeddings(
        vocab_size=120, hidden_size=32, max_position_embeddings=40, dropout=0.0
    )
    encoder = BertEncoderStack(
        hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
        dropout=0.0,
    )
    tokens_j = jnp.asarray(tokens.astype(np.int32))
    embedded = embeddings.apply({"params": params["embeddings"]}, tokens_j)
    got = np.asarray(
        encoder.apply({"params": params["encoder"]}, embedded)
    )
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_seed_text_backbone_wrapper():
    """seed_text_backbone grafts converted weights into the registered
    text-wrapper param tree (vocab/position tables padded to wrapper
    sizes); the seeded wrapper reproduces torch through its projection."""
    from openvivqa_tpu.builders import build_text_embedding, populate
    from openvivqa_tpu.config import ConfigNode
    from openvivqa_tpu.models.modules.hf_conversion import (
        convert_roberta_weights,
        seed_text_backbone,
    )

    populate()
    config = transformers.RobertaConfig(
        vocab_size=130, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=192,
        max_position_embeddings=34, type_vocab_size=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        pad_token_id=1,
    )
    torch.manual_seed(4)
    hf = transformers.RobertaModel(config, add_pooling_layer=False)
    hf.eval()

    class V:
        padding_idx = 0

        def __len__(self):
            return 130

    wrapper = build_text_embedding(
        ConfigNode(
            {"ARCHITECTURE": "XLMRobertaEmbedding", "D_MODEL": 24,
             "D_PRETRAINED_FEATURE": 48, "PRETRAINED_LAYERS": 2,
             "DROPOUT": 0.0}
        ),
        V(),
    )
    tokens = np.random.default_rng(4).integers(4, 130, (2, 8)).astype(np.int32)
    variables = jax.jit(wrapper.init)(jax.random.PRNGKey(0), jnp.asarray(tokens))
    params = seed_text_backbone(
        dict(variables["params"]),
        convert_roberta_weights(hf.state_dict(), num_layers=2),
    )
    out, _ = wrapper.apply(
        {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(tokens)
    )

    with torch.no_grad():
        lhs = hf(input_ids=torch.tensor(tokens.astype(np.int64))).last_hidden_state
    kernel = np.asarray(params["Dense_0"]["kernel"])
    bias = np.asarray(params["Dense_0"]["bias"])
    want = jax.nn.gelu(jnp.asarray(lhs.numpy()) @ kernel + bias, approximate=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-3)


def test_vit_conversion_matches_torch():
    """ViTEmbedding's raw-pixel path with converted HF ViTModel weights
    reproduces torch end-to-end (backbone last_hidden_state -> proj ->
    GELU), the reference's frozen-ViT front-end
    (vision_embeddings.py:86-111)."""
    from openvivqa_tpu.config import ConfigNode
    from openvivqa_tpu.models.modules.hf_conversion import convert_vit_weights
    from openvivqa_tpu.models.modules.pretrained_embeddings import ViTEmbedding

    config = transformers.ViTConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        image_size=32,
        patch_size=16,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(1)
    hf = transformers.ViTModel(config, add_pooling_layer=False)
    hf.eval()
    proj = torch.nn.Linear(32, 24)

    rng = np.random.default_rng(1)
    pixels = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        features = hf(
            pixel_values=torch.tensor(pixels.transpose(0, 3, 1, 2))
        ).last_hidden_state
        want = torch.nn.functional.gelu(proj(features)).numpy()

    model = ViTEmbedding(
        ConfigNode(
            {
                "D_MODEL": 24,
                "D_PRETRAINED_FEATURE": 32,
                "PATCH_SIZE": 16,
                "PRETRAINED_LAYERS": 2,
                "PRETRAINED_HEADS": 4,
                "PRETRAINED_INTERMEDIATE_SIZE": 64,
                "DROPOUT": 0.0,
            }
        )
    )
    params = convert_vit_weights(hf.state_dict(), num_layers=2)
    params["Dense_0"] = {
        "kernel": proj.weight.detach().numpy().T,
        "bias": proj.bias.detach().numpy(),
    }
    out, bias = model.apply(
        {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(pixels)
    )
    np.testing.assert_allclose(np.asarray(out), want, atol=5e-5)
    assert bias.shape == (2, 1, 1, want.shape[1])


def test_t5_conversion_matches_torch():
    """Converted MT5EncoderModel weights through our T5EncoderStack match
    torch last_hidden_state at real mT5-small block dims (d_kv*heads !=
    d_model, gated-gelu)."""
    from openvivqa_tpu.models.modules.hf_conversion import (
        convert_t5_encoder_weights,
    )
    from openvivqa_tpu.models.modules.t5 import T5EncoderStack

    config = transformers.MT5Config(
        vocab_size=220,
        d_model=64,
        d_kv=16,
        d_ff=128,
        num_layers=3,
        num_heads=6,  # 6*16=96 != 64, the mT5 inner-dim quirk
        dropout_rate=0.0,
    )
    torch.manual_seed(3)
    hf = transformers.MT5EncoderModel(config)
    hf.eval()

    rng = np.random.default_rng(3)
    tokens = rng.integers(4, 220, size=(2, 11)).astype(np.int64)
    tokens[0, -3:] = 0  # pad (T5 pad id 0)
    attn_mask = (tokens != 0).astype(np.float32)

    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(tokens),
            attention_mask=torch.tensor(attn_mask),
        ).last_hidden_state.numpy()

    params = convert_t5_encoder_weights(hf.state_dict(), num_layers=3)
    stack = T5EncoderStack(
        vocab_size=220, d_model=64, num_layers=3, num_heads=6, d_kv=16,
        d_ff=128, dropout=0.0,
    )
    bias = padding_bias(jnp.asarray(tokens.astype(np.int32)), padding_idx=0)
    got = np.asarray(
        stack.apply(
            {"params": params},
            jnp.asarray(tokens.astype(np.int32)),
            attention_bias=bias,
        )
    )
    valid = attn_mask.astype(bool)
    np.testing.assert_allclose(got[valid], want[valid], atol=5e-5)


def test_t5_v1_ungated_conversion():
    """Plain T5 (v1.0: relu, ungated) converts too."""
    from openvivqa_tpu.models.modules.hf_conversion import (
        convert_t5_encoder_weights,
    )
    from openvivqa_tpu.models.modules.t5 import T5EncoderStack

    config = transformers.T5Config(
        vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, dropout_rate=0.0, feed_forward_proj="relu",
    )
    torch.manual_seed(4)
    hf = transformers.T5EncoderModel(config)
    hf.eval()
    rng = np.random.default_rng(4)
    tokens = rng.integers(4, 100, size=(2, 7)).astype(np.int64)
    with torch.no_grad():
        want = hf(input_ids=torch.tensor(tokens)).last_hidden_state.numpy()
    params = convert_t5_encoder_weights(hf.state_dict(), num_layers=2)
    stack = T5EncoderStack(
        vocab_size=100, d_model=32, num_layers=2, num_heads=4, d_kv=8,
        d_ff=64, dropout=0.0, gated_act=False, act_fn="relu",
    )
    got = np.asarray(
        stack.apply({"params": params}, jnp.asarray(tokens.astype(np.int32)))
    )
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_albert_conversion_matches_torch():
    """Converted AlbertModel weights through AlbertEncoderStack match torch
    last_hidden_state (factorised 16-dim embeddings, layer sharing x4)."""
    from openvivqa_tpu.models.modules.albert import AlbertEncoderStack
    from openvivqa_tpu.models.modules.hf_conversion import (
        convert_albert_weights,
    )

    config = transformers.AlbertConfig(
        vocab_size=150,
        embedding_size=16,
        hidden_size=32,
        num_hidden_layers=4,
        num_hidden_groups=1,
        inner_group_num=1,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=40,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        classifier_dropout_prob=0.0,
    )
    torch.manual_seed(5)
    hf = transformers.AlbertModel(config, add_pooling_layer=False)
    hf.eval()

    rng = np.random.default_rng(5)
    tokens = rng.integers(4, 150, size=(2, 9)).astype(np.int64)
    tokens[1, -2:] = 0
    attn_mask = (tokens != 0).astype(np.float32)
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(tokens),
            attention_mask=torch.tensor(attn_mask),
        ).last_hidden_state.numpy()

    params = convert_albert_weights(hf.state_dict())
    stack = AlbertEncoderStack(
        vocab_size=150, hidden_size=32, num_layers=4, num_heads=4,
        embedding_size=16, intermediate_size=64, max_position_embeddings=40,
    )
    bias = padding_bias(jnp.asarray(tokens.astype(np.int32)), padding_idx=0)
    got = np.asarray(
        stack.apply(
            {"params": params},
            jnp.asarray(tokens.astype(np.int32)),
            attention_bias=bias,
        )
    )
    valid = attn_mask.astype(bool)
    np.testing.assert_allclose(got[valid], want[valid], atol=5e-5)


def test_albert_multi_group_conversion():
    """num_hidden_groups=2 layer->group mapping matches HF."""
    from openvivqa_tpu.models.modules.albert import AlbertEncoderStack
    from openvivqa_tpu.models.modules.hf_conversion import (
        convert_albert_weights,
    )

    config = transformers.AlbertConfig(
        vocab_size=90, embedding_size=12, hidden_size=24,
        num_hidden_layers=4, num_hidden_groups=2, inner_group_num=2,
        num_attention_heads=3, intermediate_size=48,
        max_position_embeddings=32, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(6)
    hf = transformers.AlbertModel(config, add_pooling_layer=False)
    hf.eval()
    rng = np.random.default_rng(6)
    tokens = rng.integers(4, 90, size=(2, 7)).astype(np.int64)
    with torch.no_grad():
        want = hf(input_ids=torch.tensor(tokens)).last_hidden_state.numpy()
    params = convert_albert_weights(
        hf.state_dict(), num_groups=2, inner_group_num=2
    )
    stack = AlbertEncoderStack(
        vocab_size=90, hidden_size=24, num_layers=4, num_heads=3,
        embedding_size=12, intermediate_size=48, num_groups=2,
        inner_group_num=2, max_position_embeddings=32,
    )
    got = np.asarray(
        stack.apply({"params": params}, jnp.asarray(tokens.astype(np.int32)))
    )
    np.testing.assert_allclose(got, want, atol=5e-5)


def _deberta_case(config, seed, stack_kwargs):
    from openvivqa_tpu.models.modules.deberta import DebertaV2EncoderStack
    from openvivqa_tpu.models.modules.hf_conversion import (
        convert_deberta_v2_weights,
    )

    torch.manual_seed(seed)
    hf = transformers.DebertaV2Model(config)
    hf.eval()
    rng = np.random.default_rng(seed)
    tokens = rng.integers(4, config.vocab_size, size=(2, 10)).astype(np.int64)
    tokens[0, -3:] = 0
    attn_mask = (tokens != 0).astype(np.float32)
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(tokens),
            attention_mask=torch.tensor(attn_mask),
        ).last_hidden_state.numpy()
    params = convert_deberta_v2_weights(
        hf.state_dict(), num_layers=config.num_hidden_layers
    )
    stack = DebertaV2EncoderStack(
        vocab_size=config.vocab_size,
        hidden_size=config.hidden_size,
        num_layers=config.num_hidden_layers,
        num_heads=config.num_attention_heads,
        intermediate_size=config.intermediate_size,
        max_position_embeddings=config.max_position_embeddings,
        **stack_kwargs,
    )
    bias = padding_bias(jnp.asarray(tokens.astype(np.int32)), padding_idx=0)
    got = np.asarray(
        stack.apply(
            {"params": params},
            jnp.asarray(tokens.astype(np.int32)),
            attention_bias=bias,
        )
    )
    valid = attn_mask.astype(bool)
    np.testing.assert_allclose(got[valid], want[valid], atol=5e-5)


def test_deberta_v2_v3_style_conversion_matches_torch():
    """v3-style: shared att key, log buckets, LN'd rel embeddings, no abs
    positions beyond biased input, type_vocab_size 0."""
    config = transformers.DebertaV2Config(
        vocab_size=160,
        hidden_size=32,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=40,
        relative_attention=True,
        position_buckets=8,
        pos_att_type=["p2c", "c2p"],
        share_att_key=True,
        norm_rel_ebd="layer_norm",
        type_vocab_size=0,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        pad_token_id=0,
    )
    _deberta_case(
        config, 7,
        dict(
            relative_attention=True, position_buckets=8,
            pos_att_type=("p2c", "c2p"), share_att_key=True,
            norm_rel_ebd="layer_norm",
        ),
    )


def test_deberta_v2_xlarge_style_conversion_matches_torch():
    """v2-xlarge-style: conv layer after block 0, dedicated pos projections,
    no buckets (span = max_position_embeddings)."""
    config = transformers.DebertaV2Config(
        vocab_size=140,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=24,
        relative_attention=True,
        position_buckets=-1,
        pos_att_type=["p2c", "c2p"],
        share_att_key=False,
        norm_rel_ebd="none",
        conv_kernel_size=3,
        conv_groups=1,
        type_vocab_size=0,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        pad_token_id=0,
    )
    _deberta_case(
        config, 8,
        dict(
            relative_attention=True, position_buckets=-1,
            pos_att_type=("p2c", "c2p"), share_att_key=False,
            norm_rel_ebd="none", conv_kernel_size=3, conv_groups=1,
        ),
    )


def test_deberta_v2_plain_config_matches_torch():
    """The reference builds DebertaV2Config(...) with defaults
    (relative_attention=False) when not loading pretrained weights
    (text_embeddings.py:487-491) — cover that shape too."""
    config = transformers.DebertaV2Config(
        vocab_size=120,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=32,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        pad_token_id=0,
    )
    _deberta_case(
        config, 9,
        dict(relative_attention=False, pos_att_type=()),
    )


def test_load_into_wrapper_t5():
    """load_into_wrapper grafts a converted mT5 backbone into the
    T5Embedding wrapper, padding the vocab table to the wrapper's larger
    row count; the grafted backbone reproduces torch outputs."""
    from openvivqa_tpu.builders import build_text_embedding
    from openvivqa_tpu.config import ConfigNode
    from openvivqa_tpu.models.modules.hf_conversion import (
        convert_t5_encoder_weights,
        load_into_wrapper,
    )

    config = transformers.MT5Config(
        vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, dropout_rate=0.0,
    )
    torch.manual_seed(10)
    hf = transformers.MT5EncoderModel(config)
    hf.eval()
    converted = convert_t5_encoder_weights(hf.state_dict(), num_layers=2)

    class _Vocab:
        padding_idx = 0

        def __len__(self):
            return 140  # larger than the checkpoint vocab -> padding

    wrapper_cfg = ConfigNode(
        {
            "ARCHITECTURE": "T5Embedding", "D_MODEL": 16, "DROPOUT": 0.0,
            "D_PRETRAINED_FEATURE": 32, "PRETRAINED_LAYERS": 2,
            "NUM_ATTENTION_HEADS": 4, "PRETRAINED_VOCAB_SIZE": 100,
            "PRETRAINED_D_KV": 8, "PRETRAINED_D_FF": 64,
        }
    )
    vocab = _Vocab()
    module = build_text_embedding(wrapper_cfg, vocab)
    # override the non-table dims the spec table would default
    tokens = jnp.asarray(
        np.random.default_rng(10).integers(1, 100, (2, 6)), jnp.int32
    )
    variables = jax.jit(module.init)(jax.random.PRNGKey(0), tokens)
    params = load_into_wrapper(variables["params"], converted)
    assert np.asarray(params["backbone"]["token_embed"]["embedding"]).shape[0] == 140

    # grafted wrapper runs; its backbone matches torch on ids < 100
    from openvivqa_tpu.models.modules.t5 import T5EncoderStack

    stack = T5EncoderStack(
        vocab_size=140, d_model=32, num_layers=2, num_heads=4, d_kv=8,
        d_ff=64, dropout=0.0,
    )
    got = np.asarray(
        stack.apply({"params": params["backbone"]}, tokens)
    )
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(np.asarray(tokens).astype(np.int64))
        ).last_hidden_state.numpy()
    np.testing.assert_allclose(got, want, atol=5e-5)

    out, bias = module.apply({"params": params}, tokens)
    assert out.shape == (2, 6, 16)


def test_backbone_wrappers_build_at_spec_dims():
    """T5Embedding/AlbertEmbedding/DebertaEmbedding build from the registry
    and trace at their real PRETRAINED_NAME spec dims (eval_shape: no
    compute)."""
    from openvivqa_tpu.builders import build_text_embedding
    from openvivqa_tpu.config import ConfigNode
    from openvivqa_tpu.models.modules.pretrained_embeddings import (
        BACKBONE_SPECS,
        resolve_backbone_spec,
    )

    class _Vocab:
        padding_idx = 0

        def __len__(self):
            return 50

    cases = [
        ("T5Embedding", "google/mt5-small", "t5"),
        ("AlbertEmbedding", "albert-base-v2", "albert"),
        ("DebertaEmbedding", "microsoft/deberta-v3-base", "deberta"),
    ]
    for arch, name, family in cases:
        cfg = ConfigNode(
            {
                "ARCHITECTURE": arch, "D_MODEL": 64, "DROPOUT": 0.1,
                "PRETRAINED_NAME": name,
            }
        )
        spec = resolve_backbone_spec(cfg, family, _Vocab())
        assert spec["hidden"] == BACKBONE_SPECS[name]["hidden"]
        assert spec["layers"] == BACKBONE_SPECS[name]["layers"]
        module = build_text_embedding(cfg, _Vocab())
        tokens = jnp.zeros((2, 7), jnp.int32)
        shapes = jax.eval_shape(
            lambda r, m=module, t=tokens: m.init({"params": r, "dropout": r}, t),
            jax.random.PRNGKey(0),
        )
        assert "backbone" in shapes["params"]
