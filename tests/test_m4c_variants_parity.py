"""M4C-variant checkpoint conversion parity.

* MMF_IterativeM4C: full numerical parity vs the reference torch model on
  pad-free inputs (the reference feeds raw 0/1 masks to TextBert as
  additive biases, mmf_iterative_m4c.py:116-123 — a constant column bias
  that softmax cancels when nothing is padded).  The reference file also
  uses _get_mask/_get_causal_mask it never defines (NameError as checked
  out); faithful copies are injected here to make it runnable.
* MMF_REGIONAL_M4C: the reference's forward is unrunnable AND mixes mask
  conventions (mmf_regional_m4c.py:187-197), so the converter is validated
  structurally: converted tree leaf-for-leaf matches our model init and the
  migrated model runs teacher-forcing + incremental greedy.
"""

import importlib
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

H, HEADS, VOCAB, MAXA = 32, 4, 25, 5
N_OBJ, N_OCR, N_GRID, QLEN = 4, 3, 5, 6


class RefVocab:
    padding_idx, bos_idx, eos_idx, unk_idx = 0, 1, 2, 3
    max_answer_length = MAXA

    def __len__(self):
        return VOCAB


def _ns(d):
    if isinstance(d, dict):
        return SimpleNamespace(**{k: _ns(v) for k, v in d.items()})
    return d


def _ref_get_mask(nums, max_num):
    batch_size = nums.size(0)
    arange = torch.arange(0, max_num).unsqueeze(0).expand(batch_size, -1)
    return arange.to(nums.device).lt(nums.unsqueeze(-1)).float()


def _ref_get_causal_mask(seq_length, device):
    return torch.tril(torch.ones(seq_length, seq_length, device=device))


@pytest.fixture(scope="module")
def refpkg():
    """Import reference model files as a package so their relative imports
    resolve; stub the registry/logging; inject the missing mask helpers."""
    import logging

    class FakeRegistry:
        def register(self, obj=None, **kw):
            return (lambda cls: cls) if obj is None else obj

    def ensure(name, **attrs):
        mod = sys.modules.get(name) or types.ModuleType(name)
        for key, value in attrs.items():
            setattr(mod, key, value)
        sys.modules[name] = mod

    ensure("utils")
    ensure("utils.logging_utils",
           setup_logger=lambda *a, **k: logging.getLogger("ref"))
    ensure("builders")
    ensure("builders.model_builder", META_ARCHITECTURE=FakeRegistry())
    ensure("models")
    ensure("data_utils")
    ensure("data_utils.types", TensorOrSequence=object, TensorOrNone=object)
    if "models.utils" not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            "models.utils", "/root/reference/models/utils.py"
        )
        module = importlib.util.module_from_spec(spec)
        sys.modules["models.utils"] = module
        spec.loader.exec_module(module)

    pkg = types.ModuleType("refpkg")
    pkg.__path__ = ["/root/reference/models"]
    sys.modules["refpkg"] = pkg
    iterative = importlib.import_module("refpkg.mmf_iterative_m4c")
    regional = sys.modules["refpkg.mmf_regional_m4c"]
    for mod in (iterative, regional):
        mod._get_mask = _ref_get_mask
        mod._get_causal_mask = _ref_get_causal_mask
    # TextBert is used but never imported in mmf_iterative_m4c.py (another
    # NameError as checked out).  The file also feeds the raw (bs, L) 0/1
    # mask to BertEncoder as the extended additive mask, which cannot
    # broadcast in any transformers version — keep the 0/1-as-additive quirk
    # but reshape to (bs, 1, 1, L) so it runs (constant column bias, which
    # softmax cancels on the pad-free inputs used here).
    class _RunnableTextBert(sys.modules["refpkg.mmf_m4c"].TextBert):
        def forward(self, txt_inds, txt_mask):
            return super().forward(txt_inds, txt_mask[:, None, None, :])

    iterative.TextBert = _RunnableTextBert

    # same story for the pointer net: the file passes the (bs, K) 0/1 mask
    # where OcrPtrNet expects (bs, 1, K) — unrunnable as checked out.  The
    # minimal shim preserves the file's quirk of ADDING the 0/1 values to
    # the raw pointer logits (+1 on every valid OCR score).
    class _RunnableOcrPtrNet(sys.modules["refpkg.mmf_m4c"].OcrPtrNet):
        def forward(self, query_inputs, key_inputs, attention_mask):
            return super().forward(
                query_inputs, key_inputs, attention_mask[:, None, None, :]
            )

    iterative.OcrPtrNet = _RunnableOcrPtrNet

    # the reference builds BertEncoder from a raw BertConfig (not through
    # BertPreTrainedModel), which leaves _attn_implementation unset in
    # modern transformers — pin the eager path
    from transformers.models.bert.modeling_bert import BertConfig

    class _EagerBertConfig(BertConfig):
        def __init__(self, *args, **kwargs):
            super().__init__(*args, **kwargs)
            self._attn_implementation = "eager"

    iterative.BertConfig = _EagerBertConfig
    return SimpleNamespace(iterative=iterative, regional=regional)


def _iterative_config():
    return {
        "ARCHITECTURE": "MMF_IterativeM4C",
        "DEVICE": "cpu",
        "D_MODEL": H,
        "DROPOUT": 0.0,
        "HIDDEN_SIZE": H,
        "MMT": {"HIDDEN_SIZE": H, "NUM_ATTENTION_HEADS": HEADS},
        "ENCODER": {"D_MODEL": H, "HEAD": HEADS, "LAYERS": 2,
                    "DROPOUT": 0.0, "INTERMEDIATE_SIZE": 3072},
        "DECODER": {"D_MODEL": H, "HEAD": HEADS, "LAYERS": 2, "DROPOUT": 0.0,
                    "INTERMEDIATE_SIZE": 3072},
        "TEXT_BERT": {"HIDDEN_SIZE": H, "NUM_HIDDEN_LAYERS": 1,
                      "NUM_ATTENTION_HEADS": HEADS, "LOAD_PRETRAINED": False,
                      "INTERMEDIATE_SIZE": 3072},
        # the reference's _build_*_encoding reads D_MODEL/DROPOUT from the
        # sub-node (mmf_iterative_m4c.py:40-65)
        "OBJECT_EMBEDDING": {"D_FEATURE": 20, "D_MODEL": H, "DROPOUT": 0.0},
        "OCR_EMBEDDING": {"D_FEATURE": 300 + 256 + 16, "D_MODEL": H,
                          "DROPOUT": 0.0},
        "OCR_PTR_NET": {"HIDDEN_SIZE": H, "QUERY_KEY_SIZE": 16},
    }


class Items(dict):
    def __getattr__(self, key):
        return self[key]


def _padfree_inputs():
    rng = np.random.default_rng(17)
    bs = 2
    return dict(
        question_tokens=rng.integers(4, VOCAB, (bs, QLEN)).astype(np.int64),
        region_features=rng.normal(size=(bs, N_OBJ, 20)).astype(np.float32),
        region_boxes=rng.uniform(size=(bs, N_OBJ, 4)).astype(np.float32),
        ocr_fasttext_features=rng.normal(size=(bs, N_OCR, 300)).astype(np.float32),
        ocr_rec_features=rng.normal(size=(bs, N_OCR, 256)).astype(np.float32),
        ocr_det_features=rng.normal(size=(bs, N_OCR, 16)).astype(np.float32),
        ocr_boxes=rng.uniform(size=(bs, N_OCR, 4)).astype(np.float32),
        grid_features=rng.normal(size=(bs, N_GRID, 24)).astype(np.float32),
        grid_boxes=rng.uniform(size=(bs, N_GRID, 4)).astype(np.float32),
        answer_tokens=rng.integers(4, VOCAB + N_OCR, (bs, MAXA)).astype(np.int64),
    )


def test_iterative_m4c_conversion_parity(refpkg):
    torch.manual_seed(11)
    vocab = RefVocab()
    ref_model = refpkg.iterative.MMF_IterativeM4C(
        _ns(_iterative_config()), vocab
    )
    ref_model.eval()

    from openvivqa_tpu.models.mmf_variants import MMF_IterativeM4C
    from openvivqa_tpu.models.modules.torch_conversion import (
        convert_reference_checkpoint,
    )

    config = ConfigNode(_iterative_config())
    ours = MMF_IterativeM4C(config, vocab)
    params = jax.tree.map(
        jnp.asarray,
        convert_reference_checkpoint(ref_model.state_dict(), config),
    )

    inputs = _padfree_inputs()
    items = Items({k: torch.tensor(v) for k, v in inputs.items()})
    batch = {
        k: jnp.asarray(v.astype(np.int32) if v.dtype == np.int64 else v)
        for k, v in inputs.items()
    }

    # teacher-forced path, eval mode (train() would enable the HF-default
    # attention dropout and break determinism)
    with torch.no_grad():
        fwd = {}
        ref_model._forward_txt_encoding(items, fwd)
        ref_model._forward_obj_encoding(items, fwd)
        ref_model._forward_ocr_encoding(items, fwd)
        ref_model._forward_encoder(items, fwd)
        fwd["fixed_ans_emb"] = ref_model.classifier.weight
        fwd["prev_inds"] = items.answer_tokens.clone()
        ref_model._forward_decoder(items, fwd)
        ref_model._forward_output(items, fwd)
        want = fwd["scores"].numpy()
    got = np.asarray(
        ours.apply({"params": params}, batch, train=False)["scores"]
    )
    # fixed-vocab scores match exactly; the reference's dynamic scores carry
    # its +1-on-valid pointer quirk (see fixture) — ours differ by that
    # constant and nothing else
    np.testing.assert_allclose(got[..., :VOCAB], want[..., :VOCAB], atol=3e-4)
    np.testing.assert_allclose(
        got[..., VOCAB:], want[..., VOCAB:] - 1.0, atol=3e-4
    )

    # our incremental KV-cached greedy is exact vs our quadratic greedy for
    # this topology (the encoder never sees decoder tokens)
    incremental = MMF_IterativeM4C(
        config.merged({"DECODING_MODE": "incremental"}), vocab
    )
    quadratic = MMF_IterativeM4C(config, vocab)
    inc = incremental.apply({"params": params}, batch, method="greedy_decode")
    quad = quadratic.apply({"params": params}, batch, method="greedy_decode")
    np.testing.assert_array_equal(
        np.asarray(inc["prev_inds"]), np.asarray(quad["prev_inds"])
    )


def test_regional_m4c_conversion_structural(refpkg):
    """REGIONAL: reference forward is broken as checked out, so validate the
    converted tree leaf-for-leaf against our init and run our forward."""
    torch.manual_seed(12)
    vocab = RefVocab()
    config_dict = {
        "ARCHITECTURE": "MMF_REGIONAL_M4C",
        "DEVICE": "cpu",
        "D_MODEL": H,
        "MMT": {"HIDDEN_SIZE": H, "NUM_HIDDEN_LAYERS": 2,
                "NUM_ATTENTION_HEADS": HEADS, "INTERMEDIATE_SIZE": 3072},
        "TEXT_BERT": {"HIDDEN_SIZE": H, "NUM_HIDDEN_LAYERS": 1,
                      "LOAD_PRETRAINED": False, "INTERMEDIATE_SIZE": 3072},
        "OBJECT_EMBEDDING": {"D_FEATURE": 20, "DROPOUT": 0.0},
        "REGION_EMBEDDING": {"D_FEATURE": 24, "DROPOUT": 0.0},
        "OCR_EMBEDDING": {"D_FEATURE": 300 + 256 + 16, "DROPOUT": 0.0},
        "OCR_PTR_NET": {"HIDDEN_SIZE": H, "QUERY_KEY_SIZE": 16},
    }
    ref_model = refpkg.regional.MMF_REGIONAL_M4C(_ns(config_dict), vocab)

    from openvivqa_tpu.models.mmf_variants import MMF_REGIONAL_M4C
    from openvivqa_tpu.models.modules.torch_conversion import (
        convert_reference_checkpoint,
    )

    config = ConfigNode(config_dict).merged({"DECODING_MODE": "incremental"})
    ours = MMF_REGIONAL_M4C(config, vocab)
    converted = convert_reference_checkpoint(ref_model.state_dict(), config)

    inputs = _padfree_inputs()
    batch = {
        k: jnp.asarray(v.astype(np.int32) if v.dtype == np.int64 else v)
        for k, v in inputs.items()
    }
    shapes = jax.eval_shape(
        lambda r: ours.init({"params": r, "dropout": r}, batch, train=False),
        jax.random.PRNGKey(0),
    )["params"]
    want = {
        jax.tree_util.keystr(p): leaf.shape
        for p, leaf in jax.tree_util.tree_leaves_with_path(shapes)
    }
    got = {
        jax.tree_util.keystr(p): np.asarray(leaf).shape
        for p, leaf in jax.tree_util.tree_leaves_with_path(converted)
    }
    assert want == got

    params = jax.tree.map(jnp.asarray, converted)
    scores = ours.apply({"params": params}, batch, train=False)["scores"]
    assert np.isfinite(np.asarray(scores)).all()
    out = ours.apply({"params": params}, batch, method="greedy_decode")
    assert out["prev_inds"].shape == (2, MAXA)


def test_language_adaptive_text_path_matches_torch():
    """MMF_LanguageAdaptiveM4C's question path (frozen multilingual
    backbone -> projection -> trainable fine-tune encoder,
    mmf_language_adaptive_m4c.py:204-251) reproduces the torch composition
    under converted weights."""
    import numpy as np
    import pytest

    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    import jax
    import jax.numpy as jnp

    from openvivqa_tpu.builders import META_ARCHITECTURE, populate
    from openvivqa_tpu.config import ConfigNode
    from openvivqa_tpu.models.modules.hf_conversion import (
        convert_roberta_weights,
    )
    from openvivqa_tpu.models.modules.torch_conversion import (
        StateDict,
        hf_bert_encoder,
        linear,
    )

    populate()
    D_LANG, HID, HEADS = 32, 24, 2

    class Vocab:
        padding_idx, bos_idx, eos_idx, unk_idx = 0, 1, 2, 3
        max_answer_length = 5

        def __len__(self):
            return 30

    cfg = ConfigNode(
        {
            "ARCHITECTURE": "MMF_LanguageAdaptiveM4C", "D_MODEL": HID,
            "MMT": {"HIDDEN_SIZE": HID, "NUM_HIDDEN_LAYERS": 1,
                    "NUM_ATTENTION_HEADS": HEADS},
            "TEXT_BERT": {
                "HIDDEN_SIZE": HID, "NUM_HIDDEN_LAYERS": 2,
                "D_LANGUAGE": D_LANG, "PRETRAINED_LAYERS": 2,
                "PRETRAINED_VOCAB_SIZE": 120, "PRETRAINED_PAD_ID": 1,
                "PRETRAINED_NAME": "vinai/phobert-base",
                "INTERMEDIATE_SIZE": 48,
                "PRETRAINED_INTERMEDIATE_SIZE": 64, "PRETRAINED_HEADS": 2,
            },
            "OBJECT_EMBEDDING": {"D_FEATURE": 8, "DROPOUT": 0.0},
            "OCR_EMBEDDING": {"D_FEATURE": 12, "DROPOUT": 0.0},
            "OCR_PTR_NET": {"HIDDEN_SIZE": HID, "QUERY_KEY_SIZE": HID},
        }
    )
    model = META_ARCHITECTURE.get("MMF_LanguageAdaptiveM4C")(cfg, Vocab())

    # torch composition mirroring the reference layout
    torch.manual_seed(21)
    rob_cfg = transformers.RobertaConfig(
        vocab_size=120, hidden_size=D_LANG, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=42, type_vocab_size=1, pad_token_id=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    backbone = transformers.RobertaModel(rob_cfg, add_pooling_layer=False)
    backbone.eval()
    proj = torch.nn.Linear(D_LANG, HID)
    fine_cfg = transformers.BertConfig(
        hidden_size=HID, num_hidden_layers=2, num_attention_heads=HEADS,
        intermediate_size=48, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    from transformers.models.bert.modeling_bert import BertEncoder

    fine_cfg._attn_implementation = "eager"  # standalone BertEncoder build
    fine = BertEncoder(fine_cfg)
    fine.eval()

    rng = np.random.default_rng(21)
    tokens = rng.integers(4, 120, size=(2, 7)).astype(np.int64)
    tokens[0, -2:] = 1  # roberta pad id
    attn = (tokens != 1).astype(np.float32)
    with torch.no_grad():
        hidden = backbone(
            input_ids=torch.tensor(tokens),
            attention_mask=torch.tensor(attn),
        ).last_hidden_state
        hidden = proj(hidden)
        ext = (1.0 - torch.tensor(attn)[:, None, None, :]) * -10e4
        want = fine(hidden, attention_mask=ext).last_hidden_state.numpy()

    # convert via the migration-tool building blocks
    converted = convert_roberta_weights(backbone.state_dict(), 2)
    sd = StateDict(
        {
            **{f"text_bert.text_bert_out_linear.{k}": v
               for k, v in proj.state_dict().items()},
            **{f"text_bert.encoder.{k}": v for k, v in fine.state_dict().items()},
        }
    )

    batch = {
        "question_backbone_tokens": jnp.asarray(tokens.astype(np.int32)),
        "question_tokens": jnp.asarray(tokens.astype(np.int32)),
        "region_features": jnp.zeros((2, 3, 8), jnp.float32),
        "region_boxes": jnp.zeros((2, 3, 4), jnp.float32),
        "ocr_fasttext_features": jnp.zeros((2, 2, 4), jnp.float32),
        "ocr_rec_features": jnp.zeros((2, 2, 4), jnp.float32),
        "ocr_det_features": jnp.zeros((2, 2, 4), jnp.float32),
        "ocr_boxes": jnp.zeros((2, 2, 4), jnp.float32),
        "answer_tokens": jnp.ones((2, 5), jnp.int32),
    }
    variables = jax.jit(
        lambda r, b: model.init({"params": r, "dropout": r}, b, train=False)
    )(jax.random.PRNGKey(0), batch)
    from openvivqa_tpu.models.modules.hf_conversion import graft_with_padding

    params = dict(variables["params"])
    params["language_embeddings"] = graft_with_padding(
        params["language_embeddings"], converted["embeddings"]
    )
    params["language_backbone"] = converted["encoder"]
    params["language_proj"] = linear(sd, "text_bert.text_bert_out_linear")
    params["finetune_encoder"] = hf_bert_encoder(sd, "text_bert.encoder", 2)

    got, _ = model.apply(
        {"params": params}, batch, False, method=model._txt
    )
    valid = attn.astype(bool)
    np.testing.assert_allclose(
        np.asarray(got)[valid], want[valid], atol=5e-5
    )


def test_language_adaptive_full_converter_structural(refpkg):
    """convert_mmf_language_adaptive on a reference-layout checkpoint.

    A real MMF_LanguageAdaptiveM4C checkpoint has NO text_bert.embeddings.*
    keys — its question stream is a frozen AutoModel under
    text_bert.embedding.* plus a projection and fine-tune encoder
    (mmf_language_adaptive_m4c.py:204-251).  The converter must skip the
    standard TextBert scope (it used to KeyError there) and produce a tree
    that matches our model's init structure leaf-for-leaf and runs."""
    import transformers
    from transformers.models.bert.modeling_bert import BertEncoder

    from openvivqa_tpu.builders import META_ARCHITECTURE
    from openvivqa_tpu.models.modules.torch_conversion import (
        convert_mmf_language_adaptive,
    )

    D_LANG = 16
    body_cfg = {
        "ARCHITECTURE": "MMF_M4C",
        "DEVICE": "cpu",
        "D_MODEL": H,
        "MMT": {
            "HIDDEN_SIZE": H, "NUM_HIDDEN_LAYERS": 2,
            "NUM_ATTENTION_HEADS": HEADS, "INTERMEDIATE_SIZE": 3072,
        },
        "TEXT_BERT": {
            "HIDDEN_SIZE": H, "NUM_HIDDEN_LAYERS": 1,
            "LOAD_PRETRAINED": False, "PRETRAINED_NAME": None,
            "INTERMEDIATE_SIZE": 3072,
        },
        "OBJECT_EMBEDDING": {"D_FEATURE": 8, "DROPOUT": 0.0},
        "OCR_EMBEDDING": {"D_FEATURE": 300 + 256 + 12, "DROPOUT": 0.0},
        "OCR_PTR_NET": {"HIDDEN_SIZE": H, "QUERY_KEY_SIZE": 16},
    }
    torch.manual_seed(3)
    ref_body = sys.modules["refpkg.mmf_m4c"].MMF_M4C(_ns(body_cfg), RefVocab())
    sd = {
        k: v
        for k, v in ref_body.state_dict().items()
        if not k.startswith("text_bert.")
    }

    # the adaptive trio, exactly as the reference lays it out
    bb_cfg = transformers.BertConfig(
        vocab_size=120, hidden_size=D_LANG, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    backbone = transformers.BertModel(bb_cfg, add_pooling_layer=False)
    proj = torch.nn.Linear(D_LANG, H)
    fine_cfg = transformers.BertConfig(
        hidden_size=H, num_hidden_layers=1, num_attention_heads=HEADS,
        intermediate_size=3072, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    fine_cfg._attn_implementation = "eager"
    fine = BertEncoder(fine_cfg)
    sd.update({f"text_bert.embedding.{k}": v
               for k, v in backbone.state_dict().items()})
    sd.update({f"text_bert.text_bert_out_linear.{k}": v
               for k, v in proj.state_dict().items()})
    sd.update({f"text_bert.encoder.{k}": v
               for k, v in fine.state_dict().items()})

    cfg = ConfigNode(body_cfg).merged(
        {
            "ARCHITECTURE": "MMF_LanguageAdaptiveM4C",
            "DECODING_MODE": "incremental",
            "TEXT_BERT": {
                "D_LANGUAGE": D_LANG, "PRETRAINED_LAYERS": 1,
                "PRETRAINED_VOCAB_SIZE": 120, "PRETRAINED_HEADS": 2,
                "PRETRAINED_INTERMEDIATE_SIZE": 32,
                "PRETRAINED_NAME": "test-tiny-bert",
            },
        }
    )
    converted = convert_mmf_language_adaptive(sd, cfg)

    ours = META_ARCHITECTURE.get("MMF_LanguageAdaptiveM4C")(cfg, RefVocab())
    rng = np.random.default_rng(9)
    batch = {
        "question_tokens": jnp.asarray(
            rng.integers(4, 120, (2, QLEN)).astype(np.int32)
        ),
        "region_features": jnp.asarray(
            rng.normal(size=(2, N_OBJ, 8)).astype(np.float32)
        ),
        "region_boxes": jnp.zeros((2, N_OBJ, 4), jnp.float32),
        "ocr_fasttext_features": jnp.asarray(
            rng.normal(size=(2, N_OCR, 300)).astype(np.float32)
        ),
        "ocr_rec_features": jnp.zeros((2, N_OCR, 256), jnp.float32),
        "ocr_det_features": jnp.zeros((2, N_OCR, 12), jnp.float32),
        "ocr_boxes": jnp.zeros((2, N_OCR, 4), jnp.float32),
        "answer_tokens": jnp.ones((2, MAXA), jnp.int32),
    }
    shapes = jax.eval_shape(
        lambda r: ours.init({"params": r, "dropout": r}, batch, train=False),
        jax.random.PRNGKey(0),
    )["params"]
    want = {
        jax.tree_util.keystr(p): leaf.shape
        for p, leaf in jax.tree_util.tree_leaves_with_path(shapes)
    }
    got = {
        jax.tree_util.keystr(p): np.asarray(leaf).shape
        for p, leaf in jax.tree_util.tree_leaves_with_path(converted)
    }
    assert want == got

    params = jax.tree.map(jnp.asarray, converted)
    scores = ours.apply({"params": params}, batch, train=False)["scores"]
    assert np.isfinite(np.asarray(scores)).all()
