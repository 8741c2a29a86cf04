"""MMF_LoRRA parity: the reference's torch LoRRA (mmf_lorra.py:12-163 —
runnable as checked out, its mask plumbing is the correct additive kind)
vs ours with weights migrated through convert_reference_checkpoint."""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvivqa_tpu.builders import populate
from openvivqa_tpu.config import ConfigNode

populate()
torch = pytest.importorskip("torch")

D, VOCAB, N_OBJ, N_OCR, QLEN = 32, 25, 4, 3, 6
D_OBJ = 20
MAX_SCENE_TEXT = N_OCR


class RefVocab:
    padding_idx, bos_idx, eos_idx, unk_idx = 0, 1, 2, 3
    total_answers = 15
    max_answer_length = 5

    def __len__(self):
        return VOCAB


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    module = importlib.util.module_from_spec(spec)
    sys.modules[name] = module
    spec.loader.exec_module(module)
    return module


def _ensure_module(name, **attrs):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for key, value in attrs.items():
        setattr(mod, key, value)
    return mod


@pytest.fixture(scope="module")
def ref_lorra():
    """Load reference mmf_lorra with its registry imports stubbed and its
    REAL attention + text-embedding modules loaded from the reference."""
    import logging

    class FakeRegistry:
        def register(self, obj=None, **kw):
            return (lambda cls: cls) if obj is None else obj

    _ensure_module("utils")
    _ensure_module(
        "utils.logging_utils", setup_logger=lambda *a, **k: logging.getLogger("r")
    )
    _ensure_module("builders")
    _ensure_module("builders.model_builder", META_ARCHITECTURE=FakeRegistry())
    _ensure_module(
        "builders.attention_builder",
        META_ATTENTION=FakeRegistry(),
        build_attention=lambda *a: None,
    )
    _ensure_module(
        "builders.text_embedding_builder",
        META_TEXT_EMBEDDING=FakeRegistry(),
        build_text_embedding=lambda *a: None,
        build_word_embedding=lambda *a: None,
    )
    _ensure_module(
        "builders.word_embedding_builder", build_word_embedding=lambda *a: None
    )
    _ensure_module("models")
    _ensure_module("models.modules")
    _ensure_module("data_utils")
    _ensure_module(
        "data_utils.types", TensorOrSequence=object, TensorOrNone=object
    )
    if "models.utils" not in sys.modules:
        _load("models.utils", "/root/reference/models/utils.py")
    _load("models.modules.containers", "/root/reference/models/modules/containers.py")
    ref_attn = _load(
        "ref_attentions", "/root/reference/models/modules/attentions.py"
    )
    ref_te = _load(
        "ref_text_embeddings_lorra",
        "/root/reference/models/modules/text_embeddings.py",
    )
    module = _load("models.mmf_lorra", "/root/reference/models/mmf_lorra.py")
    module.build_attention = lambda cfg: ref_attn.ScaledDotProductAttention(cfg)
    module.build_text_embedding = lambda cfg, vocab: ref_te.UsualEmbedding(cfg, vocab)
    return module


def _ns(d):
    from types import SimpleNamespace

    if isinstance(d, dict):
        return SimpleNamespace(**{k: _ns(v) for k, v in d.items()})
    return d


def _attn_node():
    return {
        "ARCHITECTURE": "ScaledDotProductAttention",
        "HEAD": 1, "D_MODEL": D, "D_KEY": 16, "D_VALUE": 16,
        "USE_AOA": False, "CAN_BE_STATEFUL": False, "DROPOUT": 0.0,
    }


def _config():
    return {
        "ARCHITECTURE": "MMF_LoRRA",
        "DEVICE": "cpu",
        "D_MODEL": D,
        "MAX_SCENE_TEXT": MAX_SCENE_TEXT,
        "TEXT_EMBEDDING": {
            "ARCHITECTURE": "UsualEmbedding", "D_MODEL": D, "D_EMBEDDING": D,
            "DROPOUT": 0.0, "WORD_EMBEDDING": None, "WORD_EMBEDDING_CACHE": None,
        },
        "OBJECT_EMBEDDING": {"D_FEATURE": D_OBJ, "DROPOUT": 0.0},
        "OCR_EMBEDDING": {"D_FEATURE": 300, "DROPOUT": 0.0},
        "SELF_ATTENTION": _attn_node(),
        "SPATIAL_ATTENTION": _attn_node(),
        "CONTEXT_ATTENTION": _attn_node(),
    }


class Items:
    def __init__(self, d):
        self.__dict__.update(d)
        self.batch_size = next(iter(d.values())).shape[0]


def _inputs():
    rng = np.random.default_rng(9)
    bs = 3
    question_tokens = rng.integers(4, VOCAB, (bs, QLEN)).astype(np.int64)
    question_tokens[:, -2:] = 0  # padded question positions
    region_features = rng.normal(size=(bs, N_OBJ, D_OBJ)).astype(np.float32)
    region_features[1, -1] = 0.0  # padded region
    ocr_fasttext = rng.normal(size=(bs, N_OCR, 300)).astype(np.float32)
    ocr_fasttext[2, -1] = 0.0  # padded OCR token
    return dict(
        question_tokens=question_tokens,
        region_features=region_features,
        ocr_fasttext_features=ocr_fasttext,
    )


def test_mmf_lorra_full_parity(ref_lorra):
    torch.manual_seed(0)
    vocab = RefVocab()
    ref_model = ref_lorra.MMF_LoRRA(_ns(_config()), vocab)
    ref_model.eval()

    from openvivqa_tpu.models.mmf_lorra import MMF_LoRRA
    from openvivqa_tpu.models.modules.torch_conversion import (
        convert_reference_checkpoint,
    )

    config = ConfigNode(_config())
    ours = MMF_LoRRA(config, vocab)
    params = jax.tree.map(
        jnp.asarray,
        convert_reference_checkpoint(ref_model.state_dict(), config),
    )

    inputs = _inputs()
    items = Items({k: torch.tensor(v) for k, v in inputs.items()})
    batch = {
        k: jnp.asarray(v.astype(np.int32) if v.dtype == np.int64 else v)
        for k, v in inputs.items()
    }

    with torch.no_grad():
        want = ref_model(items)["scores"].numpy()
    got = np.asarray(ours.apply({"params": params}, batch, train=False)["scores"])
    np.testing.assert_allclose(got, want, atol=2e-4)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_mmf_lorra_converter_structure_complete(ref_lorra):
    torch.manual_seed(1)
    vocab = RefVocab()
    ref_model = ref_lorra.MMF_LoRRA(_ns(_config()), vocab)

    from openvivqa_tpu.models.mmf_lorra import MMF_LoRRA
    from openvivqa_tpu.models.modules.torch_conversion import (
        convert_reference_checkpoint,
    )

    config = ConfigNode(_config())
    ours = MMF_LoRRA(config, vocab)
    params = jax.tree.map(
        jnp.asarray,
        convert_reference_checkpoint(ref_model.state_dict(), config),
    )
    inputs = _inputs()
    batch = {
        k: jnp.asarray(v.astype(np.int32) if v.dtype == np.int64 else v)
        for k, v in inputs.items()
    }
    init_params = jax.jit(lambda r, b: ours.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch
    )["params"]
    assert jax.tree.structure(init_params) == jax.tree.structure(params)

    def check(w, g):
        assert w.shape == g.shape, (w.shape, g.shape)

    jax.tree.map(check, init_params, params)
