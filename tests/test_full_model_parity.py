"""Flagship end-to-end parity: the reference's full IterativeMCAN (torch)
vs ours with converted weights — teacher-forcing log-probs match to f32
tolerance, hence identical NLL losses and greedy decisions on real data."""

import importlib.util
import sys
import types
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvivqa_tpu.builders import populate
from openvivqa_tpu.config import ConfigNode

populate()
torch = pytest.importorskip("torch")

D, H, DK, DV, FF, LAYERS, VOCAB, MAXA = 32, 4, 8, 8, 64, 2, 40, 7


class RefVocab:
    padding_idx, bos_idx, eos_idx, unk_idx = 0, 1, 2, 3
    max_answer_length = MAXA
    word_embeddings = None

    def __len__(self):
        return VOCAB


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    module = importlib.util.module_from_spec(spec)
    sys.modules[name] = module
    spec.loader.exec_module(module)
    return module


@pytest.fixture(scope="module")
def ref():
    """Assemble the reference IterativeMCAN from its module files with the
    builder machinery stubbed to direct construction."""
    class FakeRegistry:
        def register(self, obj=None, **kw):
            return (lambda cls: cls) if obj is None else obj

    # shared stub modules
    for name in ("builders", "data_utils", "models", "models.modules", "utils"):
        sys.modules.setdefault(name, types.ModuleType(name))
    fake_types = types.ModuleType("data_utils.types")
    fake_types.TensorOrSequence = object
    fake_types.TensorOrNone = object
    sys.modules["data_utils.types"] = fake_types

    utils_mod = _load("models.utils", "/root/reference/models/utils.py")

    def registry_mod(modname, **attrs):
        mod = types.ModuleType(modname)
        for key, value in attrs.items():
            setattr(mod, key, value)
        sys.modules[modname] = mod
        return mod

    registry_mod("builders.attention_builder", META_ATTENTION=FakeRegistry(),
                 build_attention=None)
    containers = _load(
        "models.modules.containers", "/root/reference/models/modules/containers.py"
    )
    attentions = _load(
        "models.modules.attentions", "/root/reference/models/modules/attentions.py"
    )
    attentions.build_attention = (
        lambda config: attentions.ScaledDotProductAttention(config)
    )
    sys.modules["models.modules.attentions"] = attentions
    pwff = _load(
        "models.modules.positionwise_feed_forward",
        "/root/reference/models/modules/positionwise_feed_forward.py",
    )
    # pos embeddings (encoders import SinusoidPositionalEmbedding)
    pos = _load(
        "models.modules.pos_embeddings",
        "/root/reference/models/modules/pos_embeddings.py",
    )
    encoder_builder = registry_mod(
        "builders.encoder_builder", META_ENCODER=FakeRegistry()
    )
    encoders = _load(
        "models.modules.encoders", "/root/reference/models/modules/encoders.py"
    )
    encoder_builder.build_encoder = lambda config: (
        encoders.Encoder(config)
        if config.ARCHITECTURE == "Encoder"
        else encoders.GuidedAttentionEncoder(config)
    )

    # text/vision embeddings needed: UsualEmbedding + FeatureEmbedding only;
    # the reference files import transformers — define minimal equivalents
    # faithful to text_embeddings.py:56-80 / vision_embeddings.py:10-25
    import torch.nn as nn
    import torch.nn.functional as F

    class RefUsualEmbedding(nn.Module):
        def __init__(self, config, vocab):
            super().__init__()
            self.padding_idx = vocab.padding_idx
            self.components = nn.Embedding(len(vocab), config.D_MODEL,
                                           vocab.padding_idx)

        def forward(self, tokens):
            padding_masks = utils_mod.generate_padding_mask(
                tokens, self.padding_idx
            )
            seq_masks = utils_mod.generate_sequential_mask(tokens.shape[-1])
            return self.components(tokens), (padding_masks, seq_masks)

    class RefFeatureEmbedding(nn.Module):
        def __init__(self, config):
            super().__init__()
            self.proj = nn.Linear(config.D_FEATURE, config.D_MODEL)
            self.dropout = nn.Dropout(config.DROPOUT)

        def forward(self, features):
            masks = utils_mod.generate_padding_mask(features, 0)
            return self.dropout(F.gelu(self.proj(features))), masks

    registry_mod(
        "builders.text_embedding_builder",
        META_TEXT_EMBEDDING=FakeRegistry(),
        build_text_embedding=lambda config, vocab=None: RefUsualEmbedding(
            config, vocab
        ),
    )
    registry_mod(
        "builders.pretrained_language_model_builder",
        META_PRETRAINED_LANGUAGE_MODEL=FakeRegistry(),
        build_pretrained_language_model=None,
    )
    decoder_builder = registry_mod(
        "builders.decoder_builder", META_DECODER=FakeRegistry()
    )
    decoders = _load(
        "models.modules.decoders", "/root/reference/models/modules/decoders.py"
    )
    decoder_builder.build_decoder = (
        lambda config, vocab: decoders.Decoder(config, vocab)
    )
    registry_mod(
        "builders.vision_embedding_builder",
        META_VISION_EMBEDDING=FakeRegistry(),
        build_vision_embedding=lambda config: RefFeatureEmbedding(config),
    )
    registry_mod("builders.model_builder", META_ARCHITECTURE=FakeRegistry())

    # Instance/beam machinery for base_transformer
    instance_mod = types.ModuleType("utils.instance")

    class Instance(dict):
        def __getattr__(self, k):
            return self[k]

    instance_mod.Instance = Instance
    sys.modules["utils.instance"] = instance_mod
    beam = _load(
        "models.modules.beam_search", "/root/reference/models/modules/beam_search.py"
    )
    base_tr = _load(
        "models.base_transformer", "/root/reference/models/base_transformer.py"
    )
    sys.modules["models.base_transformer"] = base_tr
    ffn_mod = types.ModuleType("models.modules.positionwise_feed_forward")
    ffn_mod.PositionWiseFeedForward = pwff.PositionWiseFeedForward
    sys.modules["models.modules.positionwise_feed_forward"] = ffn_mod
    itmcan = _load(
        "models.iterative_mcan", "/root/reference/models/iterative_mcan.py"
    )

    # builders used inside iterative_mcan
    itmcan.build_encoder = lambda config: (
        encoders.Encoder(config)
        if config.ARCHITECTURE == "Encoder"
        else encoders.GuidedAttentionEncoder(config)
    )
    itmcan.build_decoder = lambda config, vocab: decoders.Decoder(config, vocab)
    itmcan.build_text_embedding = (
        lambda config, vocab: RefUsualEmbedding(config, vocab)
    )
    itmcan.build_vision_embedding = lambda config: RefFeatureEmbedding(config)
    return SimpleNamespace(itmcan=itmcan, Instance=Instance)


def _attn(stateful=False):
    return dict(
        ARCHITECTURE="ScaledDotProductAttention",
        HEAD=H, D_MODEL=D, D_KEY=DK, D_VALUE=DV, D_FF=FF,
        USE_AOA=False, CAN_BE_STATEFUL=stateful, DROPOUT=0.0,
    )


def _ns(d):
    if isinstance(d, dict):
        return SimpleNamespace(**{k: _ns(v) for k, v in d.items()})
    return d


def _model_config():
    return {
        "ARCHITECTURE": "IterativeMCAN", "DEVICE": "cpu", "D_MODEL": D,
        "VISION_EMBEDDING": {"ARCHITECTURE": "FeatureEmbedding",
                             "D_FEATURE": 24, "D_MODEL": D, "DROPOUT": 0.0},
        "TEXT_EMBEDDING": {"ARCHITECTURE": "UsualEmbedding", "D_MODEL": D,
                           "D_EMBEDDING": D, "DROPOUT": 0.0,
                           "WORD_EMBEDDING": None},
        "SELF_ENCODER": {"ARCHITECTURE": "Encoder", "D_MODEL": D,
                         "LAYERS": LAYERS, "SELF_ATTENTION": _attn()},
        "GUIDED_ENCODER": {"ARCHITECTURE": "GuidedAttentionEncoder",
                           "D_MODEL": D, "LAYERS": LAYERS,
                           "SELF_ATTENTION": _attn(),
                           "GUIDED_ATTENTION": _attn()},
        "MULTIMODAL_FUSION": {"D_MODEL": D, "D_FF": FF, "DROPOUT": 0.0},
        "DECODER": {"ARCHITECTURE": "Decoder", "D_MODEL": D, "LAYERS": LAYERS,
                    "ATTENTION": {"SELF_ATTENTION": _attn(True),
                                  "ENC_ATTENTION": _attn()},
                    "TEXT_EMBEDDING": {"ARCHITECTURE": "UsualEmbedding",
                                       "D_MODEL": D, "D_EMBEDDING": D,
                                       "DROPOUT": 0.0, "WORD_EMBEDDING": None}},
    }


def test_iterative_mcan_full_parity(ref):
    torch.manual_seed(0)
    vocab = RefVocab()
    ref_model = ref.itmcan.IterativeMCAN(_ns(_model_config()), vocab)
    ref_model.eval()

    from openvivqa_tpu.models.iterative_mcan import IterativeMCAN

    ours = IterativeMCAN(ConfigNode(_model_config()), vocab)

    rng = np.random.default_rng(0)
    bs, n_regions, qlen = 3, 6, 5
    region_features = rng.normal(size=(bs, n_regions, 24)).astype(np.float32)
    region_features[0, -2:] = 0.0  # padded regions
    question_tokens = rng.integers(4, VOCAB, (bs, qlen)).astype(np.int64)
    question_tokens[:, -1] = 0  # pad
    answer_tokens = rng.integers(4, VOCAB, (bs, MAXA)).astype(np.int64)
    answer_tokens[:, -2:] = 0

    # --- convert via the user-facing migration tool --------------------------
    from openvivqa_tpu.models.modules.torch_conversion import (
        convert_reference_checkpoint,
    )

    params = convert_reference_checkpoint(
        {"state_dict": ref_model.state_dict()}, ConfigNode(_model_config())
    )

    params = jax.tree.map(jnp.asarray, params)
    batch = {
        "region_features": jnp.asarray(region_features),
        "question_tokens": jnp.asarray(question_tokens.astype(np.int32)),
        "answer_tokens": jnp.asarray(answer_tokens.astype(np.int32)),
    }
    out = ours.apply({"params": params}, batch, train=False)

    items = ref.Instance(
        region_features=torch.tensor(region_features),
        question_tokens=torch.tensor(question_tokens),
        answer_tokens=torch.tensor(answer_tokens),
    )
    with torch.no_grad():
        want = ref_model(items).numpy()

    got = np.asarray(out)
    np.testing.assert_allclose(got, want, atol=2e-4)
    # greedy decisions identical everywhere
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))
