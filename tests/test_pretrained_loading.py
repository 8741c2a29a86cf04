"""Runtime pretrained-backbone policy: configs naming weights must resolve
local checkpoints (converted and grafted in one call) or hard-fail unless
OPENVIVQA_ALLOW_RANDOM_BACKBONE=1 — the offline equivalent of the
reference's unconditional hub load (text_embeddings.py:303-337)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvivqa_tpu.builders import populate
from openvivqa_tpu.config import ConfigNode
from openvivqa_tpu.models.modules.pretrained_loading import (
    apply_pretrained_policy,
    collect_pretrained_requirements,
    find_wrapper_sites,
    load_converted_file,
)

populate()

torch = pytest.importorskip("torch")


class _Vocab:
    padding_idx, bos_idx, eos_idx, unk_idx = 0, 1, 2, 3

    def __len__(self):
        return 50


def _wrapper_params(hidden=32, layers=2, heads=2, vocab_rows=50):
    from openvivqa_tpu.models.modules.pretrained_embeddings import BertEmbedding

    config = ConfigNode(
        {
            "ARCHITECTURE": "BertEmbedding",
            "D_MODEL": 16,
            "DROPOUT": 0.0,
            "D_PRETRAINED_FEATURE": hidden,
            "PRETRAINED_LAYERS": layers,
            "NUM_ATTENTION_HEADS": heads,
            "PRETRAINED_VOCAB_SIZE": vocab_rows,
            "PRETRAINED_NAME": "missing-everywhere/not-a-model",
        }
    )
    module = BertEmbedding(config, _Vocab())
    tokens = jnp.zeros((2, 5), jnp.int32)
    variables = jax.jit(module.init)(jax.random.PRNGKey(0), tokens)
    return config, variables["params"]


def _tiny_bert_checkpoint(tmp_path, hidden=32, layers=2, heads=2, vocab=50):
    from transformers import BertConfig, BertModel

    cfg = BertConfig(
        vocab_size=vocab, hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=heads, intermediate_size=hidden * 4,
        max_position_embeddings=64,
    )
    torch.manual_seed(0)
    model = BertModel(cfg)
    path = tmp_path / "tiny-bert"
    model.save_pretrained(str(path))
    return model, str(path)


def test_collect_requirements_respects_load_pretrained_flag():
    model_cfg = ConfigNode(
        {
            "ARCHITECTURE": "MMF_M4C",
            "TEXT_BERT": {
                "LOAD_PRETRAINED": False,
                "PRETRAINED_NAME": "bert-base-uncased",
            },
            "TEXT_EMBEDDING": {
                "ARCHITECTURE": "BertEmbedding",
                "PRETRAINED_NAME": "bert-base-multilingual-uncased",
            },
        }
    )
    reqs = collect_pretrained_requirements(model_cfg)
    assert [r.arch for r in reqs] == ["BertEmbedding"]

    model_cfg2 = ConfigNode(
        {
            "ARCHITECTURE": "MMF_M4C",
            "TEXT_BERT": {
                "LOAD_PRETRAINED": True,
                "PRETRAINED_NAME": "bert-base-uncased",
            },
            "TEXT_EMBEDDING": {
                "ARCHITECTURE": "BertEmbedding",
                "PRETRAINED_NAME": "bert-base-multilingual-uncased",
            },
        }
    )
    reqs = collect_pretrained_requirements(model_cfg2)
    assert sorted(r.arch for r in reqs) == ["BertEmbedding", "TextBert"]


def test_unresolvable_backbone_hard_fails(monkeypatch):
    monkeypatch.delenv("OPENVIVQA_ALLOW_RANDOM_BACKBONE", raising=False)
    config, params = _wrapper_params()
    model_cfg = ConfigNode({"TEXT_EMBEDDING": dict(config)})
    with pytest.raises(FileNotFoundError, match="RANDOM"):
        apply_pretrained_policy(model_cfg, params)


def test_opt_in_env_allows_random(monkeypatch):
    monkeypatch.setenv("OPENVIVQA_ALLOW_RANDOM_BACKBONE", "1")
    config, params = _wrapper_params()
    model_cfg = ConfigNode({"TEXT_EMBEDDING": dict(config)})
    out, report = apply_pretrained_policy(model_cfg, params)
    assert [status for _, status in report] == ["random"]
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(out)[0]),
        np.asarray(jax.tree.leaves(params)[0]),
    )


def test_requirement_without_site_is_skipped(monkeypatch):
    monkeypatch.delenv("OPENVIVQA_ALLOW_RANDOM_BACKBONE", raising=False)
    # ViTEmbedding on pre-extracted features creates no backbone params:
    # nothing random to guard, so the policy must not fail
    model_cfg = ConfigNode(
        {
            "VISION_EMBEDDING": {
                "ARCHITECTURE": "ViTEmbedding",
                "PRETRAINED_NAME": "google/vit-base-patch16-224-in21k",
            }
        }
    )
    params = {"proj": {"kernel": np.zeros((4, 4), np.float32)}}
    out, report = apply_pretrained_policy(model_cfg, params)
    assert [status for _, status in report] == ["no-site"]


def test_seed_from_local_hf_checkpoint(tmp_path, monkeypatch):
    monkeypatch.delenv("OPENVIVQA_ALLOW_RANDOM_BACKBONE", raising=False)
    hf_model, ckpt = _tiny_bert_checkpoint(tmp_path)
    config, params = _wrapper_params()
    node = dict(config)
    node["PRETRAINED_NAME"] = ckpt
    model_cfg = ConfigNode({"TEXT_EMBEDDING": node})

    seeded, report = apply_pretrained_policy(model_cfg, params)
    assert report[0][1].startswith("hf_local:")

    sites = find_wrapper_sites(seeded)
    assert len(sites) == 1
    path, family = sites[0]
    assert family == "bert_layout"
    node = seeded
    for key in path:
        node = node[key]
    got = np.asarray(node["BertEmbeddings_0"]["Embed_0"]["embedding"])
    want = hf_model.embeddings.word_embeddings.weight.detach().numpy()
    np.testing.assert_allclose(got[: want.shape[0]], want, atol=1e-6)
    # encoder weights landed too
    got_q = np.asarray(
        node["BertEncoderStack_0"]["layer_0"]["BertSelfAttention_0"]["Dense_0"][
            "kernel"
        ]
    )
    want_q = (
        hf_model.encoder.layer[0].attention.self.query.weight.detach().numpy().T
    )
    np.testing.assert_allclose(got_q, want_q, atol=1e-6)


def test_seed_from_converted_msgpack(tmp_path, monkeypatch):
    monkeypatch.delenv("OPENVIVQA_ALLOW_RANDOM_BACKBONE", raising=False)
    from flax import serialization

    from openvivqa_tpu.models.modules.hf_conversion import convert_bert_weights

    hf_model, _ = _tiny_bert_checkpoint(tmp_path)
    converted = convert_bert_weights(hf_model.state_dict(), 2)
    out_path = tmp_path / "backbone.msgpack"
    out_path.write_bytes(serialization.msgpack_serialize(converted))

    config, params = _wrapper_params()
    node = dict(config)
    node["CONVERTED_WEIGHTS"] = str(out_path)
    model_cfg = ConfigNode({"TEXT_EMBEDDING": node})
    seeded, report = apply_pretrained_policy(model_cfg, params)
    assert report[0][1].startswith("converted:")

    roundtrip = load_converted_file(str(out_path))
    np.testing.assert_allclose(
        np.asarray(roundtrip["encoder"]["layer_1"]["Dense_0"]["kernel"]),
        np.asarray(converted["encoder"]["layer_1"]["Dense_0"]["kernel"]),
    )


def test_missing_converted_file_always_fails(monkeypatch):
    monkeypatch.setenv("OPENVIVQA_ALLOW_RANDOM_BACKBONE", "1")
    config, params = _wrapper_params()
    node = dict(config)
    node["CONVERTED_WEIGHTS"] = "/nonexistent/backbone.msgpack"
    model_cfg = ConfigNode({"TEXT_EMBEDDING": node})
    with pytest.raises(FileNotFoundError, match="does not exist"):
        apply_pretrained_policy(model_cfg, params)
