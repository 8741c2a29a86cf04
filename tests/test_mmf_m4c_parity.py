"""M4C-family end-to-end parity: the reference's full MMF_M4C (torch,
HF-BERT-based) vs ours with weights migrated through
convert_reference_checkpoint — teacher-forced scores and the complete
greedy decode trajectory match."""

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
D_OBJ, D_DET = 20, 16  # fasttext/rec dims are asserted 300/256 by the reference


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
def ref_mmf():
    """Load the reference mmf_m4c module with its non-model imports stubbed
    (logging, registry); transformers BERT pieces are the real library."""
    import logging

    class FakeRegistry:
        def register(self, obj=None, **kw):
            return (lambda cls: cls) if obj is None else obj

    _ensure_module("utils")
    _ensure_module(
        "utils.logging_utils", setup_logger=lambda *a, **k: logging.getLogger("ref")
    )
    _ensure_module("builders")
    _ensure_module("builders.model_builder", META_ARCHITECTURE=FakeRegistry())
    _ensure_module("models")
    _ensure_module("data_utils")
    _ensure_module(
        "data_utils.types", TensorOrSequence=object, TensorOrNone=object
    )
    if "models.utils" not in sys.modules:
        _load("models.utils", "/root/reference/models/utils.py")
    return _load("ref_mmf_m4c", "/root/reference/models/mmf_m4c.py")


def _ns(d):
    from types import SimpleNamespace

    if isinstance(d, dict):
        return SimpleNamespace(**{k: _ns(v) for k, v in d.items()})
    return d


def _config():
    # INTERMEDIATE_SIZE pins the HF BertConfig default (3072) so small test
    # dims match the reference architecture exactly
    return {
        "ARCHITECTURE": "MMF_M4C",
        "DEVICE": "cpu",
        "D_MODEL": H,
        "MMT": {
            "HIDDEN_SIZE": H,
            "NUM_HIDDEN_LAYERS": 2,
            "NUM_ATTENTION_HEADS": HEADS,
            "INTERMEDIATE_SIZE": 3072,
        },
        "TEXT_BERT": {
            "HIDDEN_SIZE": H,
            "NUM_HIDDEN_LAYERS": 1,
            "LOAD_PRETRAINED": False,
            "PRETRAINED_NAME": None,
            "INTERMEDIATE_SIZE": 3072,
        },
        "OBJECT_EMBEDDING": {"D_FEATURE": D_OBJ, "DROPOUT": 0.0},
        "OCR_EMBEDDING": {"D_FEATURE": 300 + 256 + D_DET, "DROPOUT": 0.0},
        "OCR_PTR_NET": {"HIDDEN_SIZE": H, "QUERY_KEY_SIZE": 16},
    }


class Items(dict):
    def __getattr__(self, key):
        return self[key]


def _inputs():
    rng = np.random.default_rng(7)
    bs = 3
    question_tokens = rng.integers(4, VOCAB, (bs, QLEN)).astype(np.int64)
    question_tokens[:, -2:] = 0  # padded question positions
    region_features = rng.normal(size=(bs, N_OBJ, D_OBJ)).astype(np.float32)
    region_features[1, -1] = 0.0  # padded region
    region_boxes = rng.uniform(size=(bs, N_OBJ, 4)).astype(np.float32)
    ocr_fasttext = rng.normal(size=(bs, N_OCR, 300)).astype(np.float32)
    ocr_rec = rng.normal(size=(bs, N_OCR, 256)).astype(np.float32)
    ocr_det = rng.normal(size=(bs, N_OCR, D_DET)).astype(np.float32)
    for arr in (ocr_fasttext, ocr_rec, ocr_det):
        arr[2, -1] = 0.0  # padded OCR token
    ocr_boxes = rng.uniform(size=(bs, N_OCR, 4)).astype(np.float32)
    # answer indices span fixed vocab AND the OCR pointer space [VOCAB, VOCAB+K)
    answer_tokens = rng.integers(4, VOCAB + N_OCR, (bs, MAXA)).astype(np.int64)
    answer_tokens[:, 0] = 1
    return dict(
        question_tokens=question_tokens,
        region_features=region_features,
        region_boxes=region_boxes,
        ocr_fasttext_features=ocr_fasttext,
        ocr_rec_features=ocr_rec,
        ocr_det_features=ocr_det,
        ocr_boxes=ocr_boxes,
        answer_tokens=answer_tokens,
    )


def test_mmf_m4c_full_parity(ref_mmf):
    torch.manual_seed(0)
    vocab = RefVocab()
    ref_model = ref_mmf.MMF_M4C(_ns(_config()), vocab)
    ref_model.eval()

    from openvivqa_tpu.models.mmf_m4c import MMF_M4C
    from openvivqa_tpu.models.modules.torch_conversion import (
        convert_reference_checkpoint,
    )

    config = ConfigNode(_config())
    ours = MMF_M4C(config, vocab)
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

    # --- teacher forcing (training path, eval-mode determinism) --------------
    with torch.no_grad():
        fwd = {}
        ref_model._forward_txt_encoding(items, fwd)
        ref_model._forward_obj_encoding(items, fwd)
        ref_model._forward_ocr_encoding(items, fwd)
        fwd["prev_inds"] = items.answer_tokens.clone()
        ref_model._forward_mmt(items, fwd)
        ref_model._forward_output(items, fwd)
        want_tf = fwd["scores"].numpy()

    got_tf = np.asarray(
        ours.apply({"params": params}, batch, train=False)["scores"]
    )
    np.testing.assert_allclose(got_tf, want_tf, atol=2e-4)
    np.testing.assert_array_equal(got_tf.argmax(-1), want_tf.argmax(-1))

    # --- greedy decode: identical trajectory over all MAXA re-encodes --------
    with torch.no_grad():
        fwd = {}
        ref_model._forward_txt_encoding(items, fwd)
        ref_model._forward_obj_encoding(items, fwd)
        ref_model._forward_ocr_encoding(items, fwd)
        prev = torch.zeros((3, MAXA), dtype=torch.long)
        prev[:, 0] = vocab.bos_idx
        fwd["prev_inds"] = prev
        for _ in range(MAXA):
            ref_model._forward_mmt(items, fwd)
            ref_model._forward_output(items, fwd)
            argmax = fwd["scores"].argmax(dim=-1)
            fwd["prev_inds"][:, 1:] = argmax[:, :-1]
        want_greedy_scores = fwd["scores"].numpy()
        want_greedy_inds = fwd["prev_inds"].numpy()

    out = ours.apply({"params": params}, batch, method="greedy_decode")
    np.testing.assert_array_equal(np.asarray(out["prev_inds"]), want_greedy_inds)
    np.testing.assert_allclose(
        np.asarray(out["scores"]), want_greedy_scores, atol=5e-4
    )
