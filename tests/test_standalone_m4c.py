"""Standalone-M4C parity: the reference's own M4C (m4c.py:35-235, torch)
vs ours with weights migrated through convert_reference_checkpoint.

The reference's mask arithmetic is sign-broken (generate_padding_mask
already returns -10e4-scaled additive masks, models/utils.py:56, and
m4c.py rescales them AGAIN at :146 and :169-171, flipping them to +1e9).
To compare against the architecture the code plainly intends, the loaded
reference module's mask generators are patched to emit 0/1 indicator
masks, so the reference's own rescaling produces correct additive masks
— weights are untouched, so this validates exactly what the converter
migrates."""

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

H, HEADS, VOCAB, MAXA = 32, 4, 25, 5
N_OBJ, N_OCR, QLEN = 4, 3, 6
D_OBJ, D_DET, D_REC, D_FT = 20, 16, 12, 10


class RefVocab:
    padding_idx, bos_idx, eos_idx, unk_idx = 0, 1, 2, 3
    max_answer_length = MAXA

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
def ref_m4c():
    """Load reference m4c.py + its FixedVocabDynamicEmbedding with non-model
    imports stubbed; patch the mask generators to 0/1 indicators (see module
    docstring)."""
    from transformers.models.bert import modeling_bert as hf_bert

    class FakeRegistry:
        def register(self, obj=None, **kw):
            return (lambda cls: cls) if obj is None else obj

    # the reference builds BertEncoder from a raw BertConfig (not through
    # BertPreTrainedModel), which leaves _attn_implementation unset in
    # modern transformers — pin the eager path
    class _EagerBertConfig(hf_bert.BertConfig):
        def __init__(self, *args, **kwargs):
            super().__init__(*args, **kwargs)
            self._attn_implementation = "eager"

    pt_bert = _ensure_module(
        "pytorch_transformers.modeling_bert",
        BertConfig=_EagerBertConfig,
        BertEncoder=hf_bert.BertEncoder,
        BertEmbeddings=hf_bert.BertEmbeddings,
        BertPreTrainedModel=hf_bert.BertPreTrainedModel,
    )
    _ensure_module("pytorch_transformers", modeling_bert=pt_bert)
    _ensure_module("utils")
    _ensure_module("utils.instance", InstanceList=object)
    _ensure_module("builders")
    _ensure_module("builders.model_builder", META_ARCHITECTURE=FakeRegistry())
    _ensure_module(
        "builders.word_embedding_builder", build_word_embedding=lambda *a: None
    )
    _ensure_module("models")
    _ensure_module("data_utils")
    _ensure_module(
        "data_utils.types", TensorOrSequence=object, TensorOrNone=object
    )
    if "models.utils" not in sys.modules:
        _load("models.utils", "/root/reference/models/utils.py")
    ref_utils = sys.modules["models.utils"]

    def indicator_padding_mask(sequences, padding_idx):
        if sequences is None:
            return None
        seq = sequences.unsqueeze(-1) if sequences.dim() == 2 else sequences
        # bool: m4c.py:31 masked_fill REQUIRES a bool mask — with the real
        # generate_padding_mask's float -10e4 values the reference crashes
        # there (RuntimeError), further evidence its mask plumbing never ran
        mask = torch.sum(seq, dim=-1) == (padding_idx * seq.shape[-1])
        return mask.unsqueeze(1).unsqueeze(1)

    def indicator_sequential_mask(seq_len):
        return (
            torch.triu(torch.ones((seq_len, seq_len)), diagonal=1)
            .unsqueeze(0)
            .unsqueeze(0)
        )

    _ensure_module(
        "builders.text_embedding_builder",
        META_TEXT_EMBEDDING=FakeRegistry(),
        build_word_embedding=lambda *a: None,
        # placeholder for m4c.py's import; rebound on the module below
        build_text_embedding=lambda *a: None,
    )
    ref_te = _load(
        "ref_text_embeddings",
        "/root/reference/models/modules/text_embeddings.py",
    )
    # m4c.py does `from .utils import ...` — load it as a `models` submodule
    # so the relative import resolves against the already-loaded models.utils
    module = _load("models.m4c", "/root/reference/models/m4c.py")
    # patch mask semantics in every namespace the forward reads them from
    for mod in (module, ref_te, ref_utils):
        mod.generate_padding_mask = indicator_padding_mask
        if hasattr(mod, "generate_sequential_mask"):
            mod.generate_sequential_mask = indicator_sequential_mask

    def build_dynamic(cfg, vocab):
        return ref_te.FixedVocabDynamicEmbedding(cfg, vocab)

    module.build_text_embedding = build_dynamic
    return module


def _ns(d):
    from types import SimpleNamespace

    if isinstance(d, dict):
        return SimpleNamespace(**{k: _ns(v) for k, v in d.items()})
    return d


def _config():
    return {
        "ARCHITECTURE": "M4C",
        "DEVICE": "cpu",
        "D_MODEL": H,
        "OBJECT_EMBEDDING": {"D_FEATURE": D_OBJ, "DROPOUT": 0.0},
        "OCR_EMBEDDING": {"D_FEATURE": D_DET + D_REC + D_FT, "DROPOUT": 0.0},
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


class Items:
    """Attribute-style batch like the reference's InstanceList."""

    def __init__(self, d):
        self.__dict__.update(d)
        self.batch_size = next(iter(d.values())).shape[0]


def _inputs():
    rng = np.random.default_rng(11)
    bs = 3
    question_tokens = rng.integers(4, VOCAB, (bs, QLEN)).astype(np.int64)
    question_tokens[:, -2:] = 0  # padded question positions
    region_features = rng.normal(size=(bs, N_OBJ, D_OBJ)).astype(np.float32)
    region_features[1, -1] = 0.0  # padded region
    region_boxes = rng.uniform(size=(bs, N_OBJ, 4)).astype(np.float32)
    # all OCR tokens valid: the reference pointer masks padded keys with
    # -inf while we use additive -10e4, so padded-OCR columns differ by
    # design (standalone_m4c.py divergence note) — greedy argmax is
    # unaffected; keep OCR unpadded so scores compare bit-near
    ocr_det = rng.normal(size=(bs, N_OCR, D_DET)).astype(np.float32)
    ocr_rec = rng.normal(size=(bs, N_OCR, D_REC)).astype(np.float32)
    ocr_fasttext = rng.normal(size=(bs, N_OCR, D_FT)).astype(np.float32)
    ocr_boxes = rng.uniform(size=(bs, N_OCR, 4)).astype(np.float32)
    answer_tokens = rng.integers(4, VOCAB + N_OCR, (bs, MAXA)).astype(np.int64)
    answer_tokens[:, 0] = 1
    answer_tokens[2, -1] = 0  # padded answer position
    return dict(
        question_tokens=question_tokens,
        region_features=region_features,
        region_boxes=region_boxes,
        ocr_det_features=ocr_det,
        ocr_rec_features=ocr_rec,
        ocr_fasttext_features=ocr_fasttext,
        ocr_boxes=ocr_boxes,
        answer_tokens=answer_tokens,
    )


def _build_pair(ref_m4c):
    torch.manual_seed(0)
    vocab = RefVocab()
    ref_model = ref_m4c.M4C(_ns(_config()), vocab)
    ref_model.eval()

    from openvivqa_tpu.models.standalone_m4c import M4C
    from openvivqa_tpu.models.modules.torch_conversion import (
        convert_reference_checkpoint,
    )

    config = ConfigNode(_config())
    ours = M4C(config, vocab)
    params = jax.tree.map(
        jnp.asarray,
        convert_reference_checkpoint(ref_model.state_dict(), config),
    )
    return ref_model, ours, params, vocab


def test_standalone_m4c_teacher_forced_parity(ref_m4c):
    ref_model, ours, params, _ = _build_pair(ref_m4c)
    inputs = _inputs()
    items = Items({k: torch.tensor(v) for k, v in inputs.items()})
    batch = {
        k: jnp.asarray(v.astype(np.int32) if v.dtype == np.int64 else v)
        for k, v in inputs.items()
    }

    with torch.no_grad():
        dec_out, ocr_out, ocr_mask = ref_model.forward_mmt(items)
        items.decoder_outputs = dec_out
        items.ocr_encoder_outputs = ocr_out
        items.ocr_padding_mask = ocr_mask
        want = ref_model.forward_output(items).numpy()

    got = np.asarray(ours.apply({"params": params}, batch, train=False)["scores"])
    np.testing.assert_allclose(got, want, atol=2e-4)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_standalone_m4c_greedy_trajectory_parity(ref_m4c):
    ref_model, ours, params, vocab = _build_pair(ref_m4c)
    inputs = _inputs()
    items = Items({k: torch.tensor(v) for k, v in inputs.items()})
    batch = {
        k: jnp.asarray(v.astype(np.int32) if v.dtype == np.int64 else v)
        for k, v in inputs.items()
    }

    # reference greedy loop (m4c.py:216-235) without the early-exit break
    with torch.no_grad():
        prev = torch.full((3, MAXA), vocab.padding_idx, dtype=torch.long)
        prev[:, 0] = vocab.bos_idx
        items.answer_tokens = prev
        for _ in range(MAXA):
            dec_out, ocr_out, ocr_mask = ref_model.forward_mmt(items)
            items.decoder_outputs = dec_out
            items.ocr_encoder_outputs = ocr_out
            items.ocr_padding_mask = ocr_mask
            scores = ref_model.forward_output(items)
            argmax = scores.argmax(dim=-1)
            items.answer_tokens[:, 1:] = argmax[:, :-1]
        want_inds = items.answer_tokens.numpy()

    got = ours.apply({"params": params}, batch, method="greedy_decode")
    np.testing.assert_array_equal(np.asarray(got["prev_inds"]), want_inds)


def test_standalone_m4c_converter_is_structure_complete(ref_m4c):
    """The converted tree has exactly the structure our init produces, and
    every reference weight except the documented dead ones is consumed."""
    ref_model, ours, params, _ = _build_pair(ref_m4c)
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
