"""Pretrained word-embedding path: vocab table load, frozen collection
threading, and the cache-only WordEmbedding loader."""

import jax
import jax.numpy as jnp
import numpy as np

from openvivqa_tpu.builders import build_vocab, populate
from openvivqa_tpu.config import ConfigNode
from openvivqa_tpu.data.word_embedding import PhoW2VWord300, WordEmbedding

populate()


def test_word_embedding_cache_loader(tmp_path):
    # a tiny .vec-style table in the cache directory
    path = tmp_path / "word2vec_vi_words_100dims.txt"
    path.write_text("mèo 1.0 2.0\nchó 3.0 4.0\n")
    emb = WordEmbedding("word2vec_vi_words_100dims.txt", cache=str(tmp_path))
    assert emb.dim == 2
    np.testing.assert_allclose(emb["mèo"], [1.0, 2.0])
    np.testing.assert_allclose(emb["<pad>"], [0.0, 0.0])
    # npz cache was produced
    assert (tmp_path / "word2vec_vi_words_100dims.txt.npz").exists()


def test_pseudo_random_fallback_is_deterministic():
    emb = PhoW2VWord300(cache=None)
    a, b = emb["mèo"], emb["mèo"]
    np.testing.assert_array_equal(a, b)
    assert emb["mèo"].shape == (300,)
    assert not np.allclose(emb["mèo"], emb["chó"])


def test_frozen_embedding_collection(synthetic_data):
    vocab = build_vocab(
        ConfigNode(
            {
                "TYPE": "Vocab", "TOKENIZER": None, "MIN_FREQ": 1,
                "WORD_EMBEDDING": "PhoW2VWord300",
                "WORD_EMBEDDING_CACHE": None,
                "PAD_TOKEN": "<pad>", "BOS_TOKEN": "<bos>",
                "EOS_TOKEN": "<eos>", "UNK_TOKEN": "<unk>",
                "JSON_PATH": {
                    "TRAIN": synthetic_data["train"],
                    "DEV": synthetic_data["dev"],
                    "TEST": synthetic_data["test"],
                },
            }
        )
    )
    assert vocab.word_embeddings is not None
    assert vocab.word_embeddings.shape == (len(vocab), 300)

    from openvivqa_tpu.models.modules.text_embeddings import UsualEmbedding

    emb = UsualEmbedding(
        ConfigNode(
            {"ARCHITECTURE": "UsualEmbedding", "D_MODEL": 16,
             "D_EMBEDDING": 300, "DROPOUT": 0.0,
             "WORD_EMBEDDING": "PhoW2VWord300"}
        ),
        vocab,
    )
    tokens = jnp.asarray([[1, 4, 5, 0]], jnp.int32)
    variables = emb.init(jax.random.PRNGKey(0), tokens)
    assert "frozen" in variables  # pretrained table lives outside params
    out, (bias, _) = emb.apply(variables, tokens)
    assert out.shape == (1, 4, 16)
    # the frozen table must not receive gradients (it is not in params)
    flat_params = jax.tree_util.tree_leaves(variables["params"])
    assert all(p.shape != (len(vocab), 300) for p in flat_params)


def test_missing_cache_hard_fails_without_opt_in(monkeypatch, tmp_path):
    """A configured-but-missing embedding cache must raise, not silently
    train a different model (VERDICT r1); the env opt-in restores the
    documented pseudo-random fallback."""
    import pytest

    monkeypatch.delenv("OPENVIVQA_ALLOW_RANDOM_EMBEDDINGS", raising=False)
    with pytest.raises(FileNotFoundError, match="OPENVIVQA_ALLOW_RANDOM"):
        WordEmbedding("word2vec_vi_words_100dims.txt", cache=str(tmp_path))

    monkeypatch.setenv("OPENVIVQA_ALLOW_RANDOM_EMBEDDINGS", "1")
    emb = WordEmbedding(
        "word2vec_vi_words_100dims.txt", cache=str(tmp_path), dim=100
    )
    assert emb["mèo"].shape == (100,)
