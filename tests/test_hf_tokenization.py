"""Host-side HF tokenisation: RawQuestion datasets emit real backbone ids
(`question_backbone_tokens`) when HF_TOKENIZER points at local tokenizer
files, and the converted-backbone wrapper fed those ids matches the torch
reference path (tokenizer -> frozen HF encoder) on raw strings
(text_embeddings.py:303-345)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from openvivqa_tpu.builders import build_dataset, build_vocab, populate
from openvivqa_tpu.config import ConfigNode

populate()


@pytest.fixture(scope="module")
def local_tokenizer_dir(tmp_path_factory):
    """A saved BertTokenizer usable fully offline."""
    root = tmp_path_factory.mktemp("hf_tok")
    vocab_tokens = (
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
        + ["what", "color", "is", "the", "how", "many", "a", "an", "?"]
        + [f"w{i}" for i in range(40)]
        + ["##a", "##b", "##s"]
    )
    vocab_file = root / "vocab.txt"
    vocab_file.write_text("\n".join(vocab_tokens))
    tok = transformers.BertTokenizer(vocab_file=str(vocab_file))
    out = root / "tokenizer"
    tok.save_pretrained(str(out))
    return str(out)


def _vocab_config(paths):
    return ConfigNode(
        {
            "TYPE": "Vocab",
            "TOKENIZER": None,
            "MIN_FREQ": 1,
            "WORD_EMBEDDING": None,
            "WORD_EMBEDDING_CACHE": None,
            "PAD_TOKEN": "<pad>", "BOS_TOKEN": "<bos>",
            "EOS_TOKEN": "<eos>", "UNK_TOKEN": "<unk>",
            "JSON_PATH": {
                "TRAIN": paths["train"], "DEV": paths["dev"],
                "TEST": paths["test"],
            },
        }
    )


def test_raw_question_dataset_emits_backbone_tokens(
    synthetic_data, local_tokenizer_dir
):
    vocab = build_vocab(_vocab_config(synthetic_data))
    config = ConfigNode(
        {
            "TYPE": "RawQuestionFeatureDataset",
            "BATCH_SIZE": 4,
            "MAX_REGIONS": 36,
            "FEATURE_PATH": {"FEATURES": synthetic_data["features"]},
            "HF_TOKENIZER": local_tokenizer_dir,
        }
    )
    dataset = build_dataset(synthetic_data["train"], vocab, config)
    items = [dataset[i] for i in range(3)]
    tok = transformers.BertTokenizer.from_pretrained(local_tokenizer_dir)

    lengths = {item["question_backbone_tokens"].shape[0] for item in items}
    assert len(lengths) == 1, "backbone ids must share a static length"

    for item in items:
        ids = item["question_backbone_tokens"]
        mask = item["question_backbone_mask"]
        assert ids.dtype == np.int32
        want = tok(item["question"])["input_ids"]
        np.testing.assert_array_equal(ids[: len(want)], want)
        assert (ids[len(want):] == tok.pad_token_id).all()
        # validity mask derived from the tokenizer's REAL pad id — models
        # must use it instead of guessing a pad index (RoBERTa pads with 1)
        np.testing.assert_array_equal(
            mask, (ids != tok.pad_token_id).astype(np.float32)
        )


def test_missing_local_tokenizer_hard_fails(synthetic_data):
    vocab = build_vocab(_vocab_config(synthetic_data))
    config = ConfigNode(
        {
            "TYPE": "RawQuestionFeatureDataset",
            "BATCH_SIZE": 4,
            "MAX_REGIONS": 36,
            "FEATURE_PATH": {"FEATURES": synthetic_data["features"]},
            "HF_TOKENIZER": "definitely/not-a-local-model",
        }
    )
    dataset = build_dataset(synthetic_data["train"], vocab, config)
    with pytest.raises(FileNotFoundError, match="HF_TOKENIZER"):
        dataset[0]


def test_backbone_ids_through_converted_bert_match_torch(
    synthetic_data, local_tokenizer_dir
):
    """Full fidelity chain: raw strings -> local HF tokenizer (pipeline) ->
    BertEmbedding wrapper with converted weights == torch tokenizer+BertModel
    (the reference wrapper's forward, text_embeddings.py:329-336)."""
    from openvivqa_tpu.builders import build_text_embedding
    from openvivqa_tpu.models.modules.hf_conversion import (
        convert_bert_weights,
        seed_text_backbone,
    )

    tok = transformers.BertTokenizer.from_pretrained(local_tokenizer_dir)
    bert_config = transformers.BertConfig(
        vocab_size=tok.vocab_size,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=32,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(11)
    hf = transformers.BertModel(bert_config, add_pooling_layer=False)
    hf.eval()

    questions = ["what color is the w3 ?", "how many w7 w8", "is a an w1 ?"]
    enc = tok(questions, padding=True, return_tensors="pt")
    with torch.no_grad():
        want = hf(
            input_ids=enc.input_ids, attention_mask=enc.attention_mask
        ).last_hidden_state.numpy()

    class _Vocab:
        padding_idx = 0

        def __len__(self):
            return 10

    wrapper_cfg = ConfigNode(
        {
            "ARCHITECTURE": "BertEmbedding", "D_MODEL": 16, "DROPOUT": 0.0,
            "D_PRETRAINED_FEATURE": 32, "PRETRAINED_LAYERS": 2,
            "PRETRAINED_VOCAB_SIZE": tok.vocab_size,
            "PRETRAINED_INTERMEDIATE_SIZE": 64,
        }
    )
    module = build_text_embedding(wrapper_cfg, _Vocab())
    ids = jnp.asarray(enc.input_ids.numpy().astype(np.int32))
    variables = jax.jit(
        lambda r: module.init({"params": r, "dropout": r}, ids, padding_idx=0)
    )(jax.random.PRNGKey(0))
    converted = convert_bert_weights(hf.state_dict(), num_layers=2)
    params = seed_text_backbone(variables["params"], converted)

    # peel the trainable proj/GELU tail: compare the frozen backbone output
    # by re-applying the seeded BertEmbeddings+BertEncoderStack directly
    from openvivqa_tpu.models.modules.bert import (
        BertEmbeddings,
        BertEncoderStack,
    )
    from openvivqa_tpu.models.modules.masks import padding_bias

    embedded = BertEmbeddings(
        vocab_size=tok.vocab_size, hidden_size=32, dropout=0.0
    ).apply({"params": params["BertEmbeddings_0"]}, ids)
    got = np.asarray(
        BertEncoderStack(
            hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
            dropout=0.0,
        ).apply(
            {"params": params["BertEncoderStack_0"]},
            embedded,
            attention_bias=padding_bias(ids, padding_idx=0),
        )
    )
    valid = enc.attention_mask.numpy().astype(bool)
    np.testing.assert_allclose(got[valid], want[valid], atol=5e-5)

    # and the wrapper itself runs end to end on those ids
    out, bias = module.apply({"params": params}, ids, padding_idx=0)
    assert out.shape == (3, ids.shape[1], 16)


def test_wrapper_padding_mask_overrides_pad_id():
    """A RoBERTa-style tokenizer pads with id 1 (a live id in other
    spaces); the wrapper must honour the explicit validity mask rather
    than a guessed pad index."""
    from openvivqa_tpu.builders import build_text_embedding
    from openvivqa_tpu.config import ConfigNode

    class _Vocab:
        padding_idx = 0

        def __len__(self):
            return 20

    cfg = ConfigNode(
        {
            "ARCHITECTURE": "BertEmbedding", "D_MODEL": 8, "DROPOUT": 0.0,
            "D_PRETRAINED_FEATURE": 16, "PRETRAINED_LAYERS": 1,
            "PRETRAINED_VOCAB_SIZE": 32,
        }
    )
    module = build_text_embedding(cfg, _Vocab())
    tokens = jnp.asarray([[5, 6, 7, 1, 1]], jnp.int32)  # pads are id 1
    mask = jnp.asarray([[1.0, 1.0, 1.0, 0.0, 0.0]], jnp.float32)
    variables = jax.jit(
        lambda r: module.init(
            {"params": r, "dropout": r}, tokens, padding_mask=mask
        )
    )(jax.random.PRNGKey(0))
    _, bias = module.apply(variables, tokens, padding_mask=mask)
    np.testing.assert_array_equal(
        np.asarray(bias[0, 0, 0]), np.asarray([0.0, 0.0, 0.0, -10e4, -10e4])
    )
    # without the mask, pad id 0 would (wrongly) mask nothing here
    _, bias_guess = module.apply(variables, tokens, padding_idx=0)
    assert float(np.asarray(bias_guess).min()) == 0.0
