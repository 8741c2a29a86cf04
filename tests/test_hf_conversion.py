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
