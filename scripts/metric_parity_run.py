#!/usr/bin/env python
"""End-to-end metric-parity runs: torch reference vs this framework.

The round-1 north star (BASELINE.md / SURVEY.md §6) is metric parity on
full training trajectories, not just module-level forward parity.  This
script runs BOTH frameworks end to end on byte-identical synthetic data
across eight protocols spanning every reference task class:

* `iterative_mcan` — generative VQA: XE teacher forcing + beam-search
  evaluation over all 8 metrics (tasks/open_ended_task.py:128-169);
* `mcan` / `saaa` — ViVQA classification: NLL over answer classes, argmax
  decode (tasks/classification_task.py:95-135); saaa needs a reference-side
  question-pooling shim (its CoAttention crashes on 3-D questions,
  saaa.py:23);
* `mmf_m4c` — OCR-copy M4C: NLL on log_softmax(scores), greedy in-forward
  decode against per-sample OCR tables (tasks/training_mmf_task.py:71-116);
* `m4c` — the standalone M4C (models/m4c.py:35-235) under the TrainingM4C
  protocol (tasks/training_m4c_task.py:17-185), reference masks patched to
  the intended additive semantics (see apply_m4c_mask_patches);
* `mmf_lorra` — LoRRA classification over vocab+OCR choices with
  multi-label BCE (tasks/mmf_classification_task.py:33-240);
* `joint_transformer` — single-stream generative over the multilingual
  datasets;
* `vlsp_evjvqa` — the EVJVQA 4-split contest protocol
  (tasks/vlsp_evjvqa_task.py:22-383): per-epoch dev beam metrics plus
  final-model public/private test predictions + scores.

Shared per case: one synthetic dataset read by both frameworks, asserted
vocab equality, initial weights converted from the torch init with the
user-facing migration converter, plain Adam(lr, betas=(0.9, 0.98)),
dropout off (every torch Dropout module's p zeroed while keeping train()
mode — MMF_M4C branches on self.training for teacher forcing), shuffle
off.

Known, documented nondeterminisms handled here:
* the reference ClassificationVocab assigns class ids by Python *set*
  iteration order (classification_vocab.py:34 — PYTHONHASHSEED-dependent
  even across reference runs); the reference's mapping is transplanted
  into our vocab for the comparison;
* OcrVocab answer encoding draws np.random.choice among fixed-vocab/OCR
  matches (ocr_vocab.py:84-100); both sides reseed np.random identically
  before every epoch;
* the reference METEOR jar is stripped upstream (its wrapper is broken as
  checked out) — both sides score METEOR with this repo's implementation;
* the reference OcrFeatureDataset never emits the ocr_fasttext_features
  its own MMF_M4C reads (mmf_m4c.py:167 — broken as checked out); the
  reference side gets a thin dataset subclass passing the stored
  fasttext_features through, mirroring this framework's documented fix.

Writes PARITY_RUN.json at the repo root and prints per-case summaries.

Run:  python scripts/metric_parity_run.py [--epochs 3] [--cases a,b,c]
"""

import argparse
import itertools
import json
import os
import sys
import tempfile
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

D, H, DK, DV, FF, LAYERS = 64, 4, 16, 16, 128, 2
BATCH, EVAL_BATCH, BEAM, LR = 8, 4, 2, 1e-3
MAX_SCENE_TEXT = 10


# --------------------------------------------------------------------------
# shared plumbing
# --------------------------------------------------------------------------
def _purge_stale_reference_modules():
    """Parity tests assemble the reference from hand-loaded files and park
    fake non-package ``builders``/``models``/... modules in sys.modules;
    if one leaks into this process, ``import builders.vocab_builder`` below
    resolves against the fake and dies with "'builders' is not a package"
    (VERDICT r2 weak #2).  Drop every module in the reference's top-level
    namespaces that was not actually imported from /root/reference."""
    for name in list(sys.modules):
        top = name.split(".", 1)[0]
        if top not in (
            "builders", "models", "data_utils", "utils", "tasks",
            "evaluation", "refpkg",
        ):
            continue
        file = getattr(sys.modules[name], "__file__", None) or ""
        if not file.startswith("/root/reference"):
            del sys.modules[name]


def install_stubs():
    _purge_stale_reference_modules()

    class CfgNode(dict):
        def __getattr__(self, k):
            try:
                v = self[k]
            except KeyError:
                raise AttributeError(k)
            return (
                CfgNode(v)
                if isinstance(v, dict) and not isinstance(v, CfgNode)
                else v
            )

        def __setattr__(self, k, v):
            self[k] = v

        def get(self, k, default=None):
            v = super().get(k, default)
            return (
                CfgNode(v)
                if isinstance(v, dict) and not isinstance(v, CfgNode)
                else v
            )

    yacs = types.ModuleType("yacs")
    yacs_config = types.ModuleType("yacs.config")
    yacs_config.CfgNode = CfgNode
    yacs.config = yacs_config
    sys.modules["yacs"] = yacs
    sys.modules["yacs.config"] = yacs_config

    from transformers.models.bert import modeling_bert as hf_bert

    pt = types.ModuleType("pytorch_transformers")
    pt_bert = types.ModuleType("pytorch_transformers.modeling_bert")
    for name in ("BertConfig", "BertEncoder", "BertPreTrainedModel", "BertEmbeddings"):
        if hasattr(hf_bert, name):
            setattr(pt_bert, name, getattr(hf_bert, name))

    class _EagerBertConfig(hf_bert.BertConfig):
        """A bare HF BertConfig leaves _attn_implementation None (it is
        normally autoset by PreTrainedModel); the reference's standalone
        BertEncoder builds (m4c.py:81-94) then crash on the attention-class
        lookup.  The era the reference targets (pytorch_transformers) had
        eager attention only."""

        def __init__(self, *args, **kwargs):
            super().__init__(*args, **kwargs)
            self._attn_implementation = "eager"

    pt_bert.BertConfig = _EagerBertConfig
    pt.modeling_bert = pt_bert
    sys.modules["pytorch_transformers"] = pt
    sys.modules["pytorch_transformers.modeling_bert"] = pt_bert

    eval_utils = types.ModuleType("evaluation.utils")
    eval_utils.download_from_url = lambda *a, **k: None
    sys.modules["evaluation.utils"] = eval_utils
    return CfgNode


def patch_reference_meteor():
    import evaluation as ref_eval

    from openvivqa_tpu.evaluation import Meteor as OurMeteor

    class MeteorAdapter:
        def __str__(self):
            return "METEOR"

        def compute_score(self, gts, gens):
            return OurMeteor().compute_score(gts, gens)

    ref_eval.Meteor = MeteorAdapter
    ref_eval.compute_scores.__globals__["Meteor"] = MeteorAdapter
    return ref_eval


def clean_scores(scores):
    return {
        k: (list(map(float, v)) if isinstance(v, (list, tuple)) else float(v))
        for k, v in scores.items()
    }


def flatten_scores(scores):
    out = {}
    for key, value in scores.items():
        if isinstance(value, list):
            for n, v in enumerate(value, start=1):
                out[f"{key}-{n}"] = v
        else:
            out[key] = value
    return out


def attn_cfg(stateful=False):
    return {
        "ARCHITECTURE": "ScaledDotProductAttention",
        "HEAD": H, "D_MODEL": D, "D_KEY": DK, "D_VALUE": DV, "D_FF": FF,
        "USE_AOA": False, "CAN_BE_STATEFUL": stateful, "DROPOUT": 0.0,
    }


def base_vocab_cfg(paths, extra=None):
    cfg = {
        "TYPE": "Vocab", "TOKENIZER": None, "MIN_FREQ": 1,
        "WORD_EMBEDDING": None, "WORD_EMBEDDING_CACHE": None,
        "PAD_TOKEN": "<pad>", "BOS_TOKEN": "<bos>", "EOS_TOKEN": "<eos>",
        "UNK_TOKEN": "<unk>",
        "JSON_PATH": {
            "TRAIN": paths["train"], "DEV": paths["dev"], "TEST": paths["test"],
        },
    }
    cfg.update(extra or {})
    return cfg


def iterative_mcan_cfg():
    return {
        "ARCHITECTURE": "IterativeMCAN", "NAME": "parity", "DEVICE": "cpu",
        "D_MODEL": D,
        "VISION_EMBEDDING": {
            "ARCHITECTURE": "FeatureEmbedding",
            "D_FEATURE": 1024, "D_MODEL": D, "DROPOUT": 0.0,
        },
        "TEXT_EMBEDDING": {
            "ARCHITECTURE": "UsualEmbedding", "D_MODEL": D, "D_EMBEDDING": D,
            "DROPOUT": 0.0, "WORD_EMBEDDING": None, "WORD_EMBEDDING_CACHE": None,
        },
        "SELF_ENCODER": {
            "ARCHITECTURE": "Encoder", "D_MODEL": D, "LAYERS": LAYERS,
            "SELF_ATTENTION": attn_cfg(),
        },
        "GUIDED_ENCODER": {
            "ARCHITECTURE": "GuidedAttentionEncoder", "D_MODEL": D,
            "LAYERS": LAYERS, "SELF_ATTENTION": attn_cfg(),
            "GUIDED_ATTENTION": attn_cfg(),
        },
        "MULTIMODAL_FUSION": {"D_MODEL": D, "D_FF": FF, "DROPOUT": 0.0},
        "DECODER": {
            "ARCHITECTURE": "Decoder", "D_MODEL": D, "LAYERS": LAYERS,
            "ATTENTION": {
                "SELF_ATTENTION": attn_cfg(True),
                "ENC_ATTENTION": attn_cfg(),
            },
            "TEXT_EMBEDDING": {
                "ARCHITECTURE": "UsualEmbedding", "D_MODEL": D,
                "D_EMBEDDING": D, "DROPOUT": 0.0, "WORD_EMBEDDING": None,
                "WORD_EMBEDDING_CACHE": None,
            },
        },
    }


def mcan_cfg():
    return {
        "ARCHITECTURE": "MCAN", "NAME": "parity_mcan", "DEVICE": "cpu",
        "D_MODEL": D,
        "VISION_EMBEDDING": {
            "ARCHITECTURE": "FeatureEmbedding",
            "D_FEATURE": 1024, "D_MODEL": D, "DROPOUT": 0.0,
        },
        "TEXT_EMBEDDING": {
            "ARCHITECTURE": "LSTMTextEmbedding", "D_MODEL": D,
            "D_EMBEDDING": D, "DROPOUT": 0.0, "WORD_EMBEDDING": None,
            "WORD_EMBEDDING_CACHE": None,
        },
        "SELF_ENCODER": {
            "ARCHITECTURE": "Encoder", "D_MODEL": D, "LAYERS": LAYERS,
            "SELF_ATTENTION": attn_cfg(),
        },
        "GUIDED_ENCODER": {
            "ARCHITECTURE": "GuidedAttentionEncoder", "D_MODEL": D,
            "LAYERS": LAYERS, "SELF_ATTENTION": attn_cfg(),
            "GUIDED_ATTENTION": attn_cfg(),
        },
        "VISION_ATTR_REDUCE": {"D_MODEL": D, "DROPOUT": 0.0},
        "TEXT_ATTR_REDUCE": {"D_MODEL": D, "DROPOUT": 0.0},
    }


def joint_transformer_cfg():
    return {
        "ARCHITECTURE": "JointTransformer", "NAME": "parity_joint",
        "DEVICE": "cpu", "D_MODEL": D,
        "REGION_EMBEDDING": {"ARCHITECTURE": "FeatureEmbedding",
                             "D_FEATURE": 1024, "D_MODEL": D, "DROPOUT": 0.0},
        "GRID_EMBEDDING": {"ARCHITECTURE": "FeatureEmbedding",
                           "D_FEATURE": 2048, "D_MODEL": D, "DROPOUT": 0.0},
        "BOX_EMBEDDING": {"ARCHITECTURE": "FeatureEmbedding",
                          "D_FEATURE": 4, "D_MODEL": D, "DROPOUT": 0.0},
        "TEXT_EMBEDDING": {"ARCHITECTURE": "UsualEmbedding", "D_MODEL": D,
                           "D_EMBEDDING": D, "DROPOUT": 0.0,
                           "WORD_EMBEDDING": None, "WORD_EMBEDDING_CACHE": None},
        "ENCODER": {"ARCHITECTURE": "Encoder", "D_MODEL": D, "LAYERS": LAYERS,
                    "SELF_ATTENTION": attn_cfg()},
        "DECODER": {
            "ARCHITECTURE": "Decoder", "D_MODEL": D, "LAYERS": LAYERS,
            "ATTENTION": {
                "SELF_ATTENTION": attn_cfg(True),
                "ENC_ATTENTION": attn_cfg(),
            },
            "TEXT_EMBEDDING": {
                "ARCHITECTURE": "UsualEmbedding", "D_MODEL": D,
                "D_EMBEDDING": D, "DROPOUT": 0.0, "WORD_EMBEDDING": None,
                "WORD_EMBEDDING_CACHE": None,
            },
        },
    }


def saaa_cfg():
    return {
        "ARCHITECTURE": "SAAA", "NAME": "parity_saaa", "DEVICE": "cpu",
        "D_MODEL": D,
        "VISION_PROCESSOR": {
            "ARCHITECTURE": "FeatureEmbedding",
            "D_FEATURE": 1024, "D_MODEL": D, "DROPOUT": 0.0,
        },
        "TEXT_PROCESSOR": {
            "ARCHITECTURE": "LSTMTextEmbedding", "D_MODEL": D,
            "D_EMBEDDING": D, "DROPOUT": 0.0, "WORD_EMBEDDING": None,
            "WORD_EMBEDDING_CACHE": None,
        },
        "ATTENTION": {
            "D_VISION": D, "D_LANGUAGE": D, "D_MODEL": D,
            "DROPOUT": 0.0, "GLIMPSES": 2,
        },
    }


def mmf_lorra_cfg():
    # single-head attention: the reference's squeeze(1) of the attention
    # weights only works at HEAD=1 (mmf_lorra.py:134,145), as its own
    # config ships (configs/mmf_lorra.yaml:84)
    attn1 = {
        "ARCHITECTURE": "ScaledDotProductAttention",
        "HEAD": 1, "D_MODEL": D, "D_KEY": 16, "D_VALUE": 16, "D_FF": FF,
        "USE_AOA": False, "CAN_BE_STATEFUL": False, "DROPOUT": 0.0,
    }
    return {
        "ARCHITECTURE": "MMF_LoRRA", "NAME": "parity_lorra", "DEVICE": "cpu",
        "D_MODEL": D, "MAX_SCENE_TEXT": MAX_SCENE_TEXT,
        "OBJECT_EMBEDDING": {"D_FEATURE": 1024, "DROPOUT": 0.0},
        "OCR_EMBEDDING": {"D_FEATURE": 300, "DROPOUT": 0.0},
        "TEXT_EMBEDDING": {
            "ARCHITECTURE": "UsualEmbedding", "D_EMBEDDING": D, "D_MODEL": D,
            "DROPOUT": 0.0, "WORD_EMBEDDING": None,
            "WORD_EMBEDDING_CACHE": None,
        },
        "SELF_ATTENTION": attn1,
        "SPATIAL_ATTENTION": attn1,
        "CONTEXT_ATTENTION": attn1,
    }


def m4c_cfg():
    # standalone M4C (m4c.py:35-98): BertEmbeddings+BertEncoder question
    # stream, one joint BertEncoder, FixedVocabDynamicEmbedding answers
    return {
        "ARCHITECTURE": "M4C", "NAME": "parity_m4c", "DEVICE": "cpu",
        "D_MODEL": D,
        "OBJECT_EMBEDDING": {"D_FEATURE": 1024, "DROPOUT": 0.0},
        "OCR_EMBEDDING": {"D_FEATURE": 812, "DROPOUT": 0.0},
        "DYNAMIC_EMBEDDING": {
            "ARCHITECTURE": "FixedVocabDynamicEmbedding",
            "D_MODEL": D, "DROPOUT": 0.0,
        },
        "MMT": {
            "HIDDEN_SIZE": D, "NUM_HIDDEN_LAYERS": 2,
            "NUM_ATTENTION_HEADS": H,
        },
        "TEXT_BERT": {"HIDDEN_SIZE": D, "NUM_HIDDEN_LAYERS": 1},
        "ENCODER": {
            "ARCHITECTURE": "MultiModalEncoder", "D_MODEL": D, "LAYERS": 2,
            "SELF_ATTENTION": {"D_MODEL": D, "HEAD": H},
        },
    }


def multimodal_vocab_extra():
    return {
        "TYPE": "VlspVqaMultiModalVocab",
        "IMG_TOKEN": "<img>", "FEAT_TOKEN": "<feat>", "BOX_TOKEN": "<box>",
        "QUESTION_TOKEN": "<question>", "ANSWER_TOKEN": "<answer>",
    }


def mmf_m4c_cfg():
    return {
        "ARCHITECTURE": "MMF_M4C", "NAME": "parity_mmf", "DEVICE": "cpu",
        "D_MODEL": D,
        "OBJECT_EMBEDDING": {"D_FEATURE": 1024, "DROPOUT": 0.0},
        "BOX_EMBEDDING": {
            "ARCHITECTURE": "FeatureEmbedding", "D_FEATURE": 4,
            "D_MODEL": D, "DROPOUT": 0.0,
        },
        "OCR_TEXT_EMBEDDING": {"WORD_EMBEDDING": None, "WORD_EMBEDDING_CACHE": None},
        "OCR_EMBEDDING": {"D_FEATURE": 812, "DROPOUT": 0.0},
        "OCR_PTR_NET": {
            "HIDDEN_SIZE": D, "QUERY_KEY_SIZE": D, "OCR_MAX_NUM": MAX_SCENE_TEXT,
        },
        "CLASSIFIER": {"OCR_MAX_NUM": MAX_SCENE_TEXT},
        # the reference's BertConfig keeps intermediate_size=3072 whatever
        # the hidden size (mmf_m4c.py:47-50); pin ours to match
        "MMT": {
            "HIDDEN_SIZE": D, "NUM_HIDDEN_LAYERS": 2,
            "NUM_ATTENTION_HEADS": H, "INTERMEDIATE_SIZE": 3072,
        },
        "TEXT_BERT": {
            "HIDDEN_SIZE": D, "NUM_HIDDEN_LAYERS": 2,
            "NUM_ATTENTION_HEADS": H, "D_MODEL": D, "DROPOUT": 0.0,
            "INTERMEDIATE_SIZE": 3072,
            "LOAD_PRETRAINED": False, "FREEZE_WEIGHTS": False,
            "PRETRAINED_NAME": "bert-base-uncased",
        },
        "TEXT_EMBEDDING": {
            "ARCHITECTURE": "UsualEmbedding", "D_EMBEDDING": D, "D_MODEL": D,
            "DROPOUT": 0.0, "WORD_EMBEDDING": None, "WORD_EMBEDDING_CACHE": None,
        },
    }


def ocr_vocab_extra():
    return {
        "TYPE": "OcrVocab",
        "IMG_TOKEN": "<img>", "FEAT_TOKEN": "<feat>", "BOX_TOKEN": "<box>",
        "OCR_TOKEN": "<ocr>", "OCR_DET_TOKEN": "<ocr_det>",
        "OCR_REC_TOKEN": "<ocr_rec>", "QUESTION_TOKEN": "<question>",
        "ANSWER_TOKEN": "<answer>",
    }


def ocr_classification_vocab_extra():
    return {"TYPE": "OcrClassificationVocab", "MAX_SCENE_TEXT": MAX_SCENE_TEXT}


# m4c reference-side mask patches: the reference's standalone M4C rescales
# generate_padding_mask's ALREADY -10e4-scaled additive masks again
# (m4c.py:146 `* -10e4`, :169-171 `.long() * -10000`), flipping them to
# +1e9, and its pointer masked_fill needs a BOOL mask (m4c.py:31) — broken
# as checked out (same analysis as tests/test_standalone_m4c.py).  To run
# the architecture the code plainly intends, the m4c/text-embedding module
# namespaces get 0/1 indicator mask generators for the duration of the
# reference run; weights are untouched.
def apply_m4c_mask_patches():
    import torch

    import models.m4c as ref_m4c_mod
    import models.modules.text_embeddings as ref_te_mod
    import models.utils as ref_utils_mod

    def indicator_padding_mask(sequences, padding_idx):
        if sequences is None:
            return None
        seq = sequences.unsqueeze(-1) if sequences.dim() == 2 else sequences
        mask = torch.sum(seq, dim=-1) == (padding_idx * seq.shape[-1])
        return mask.unsqueeze(1).unsqueeze(1)

    def indicator_sequential_mask(seq_len):
        return (
            torch.triu(torch.ones((seq_len, seq_len)), diagonal=1)
            .unsqueeze(0)
            .unsqueeze(0)
        )

    saved = []
    for mod in (ref_m4c_mod, ref_te_mod, ref_utils_mod):
        saved.append(
            (mod, mod.generate_padding_mask,
             getattr(mod, "generate_sequential_mask", None))
        )
        mod.generate_padding_mask = indicator_padding_mask
        if hasattr(mod, "generate_sequential_mask"):
            mod.generate_sequential_mask = indicator_sequential_mask
    return saved


def restore_m4c_mask_patches(saved):
    for mod, pad_fn, seq_fn in saved:
        mod.generate_padding_mask = pad_fn
        if seq_fn is not None:
            mod.generate_sequential_mask = seq_fn


# --------------------------------------------------------------------------
# reference side
# --------------------------------------------------------------------------
def ref_setup(paths, CfgNode, case):
    import torch

    torch.manual_seed(0)
    import builders  # noqa: F401
    from builders.model_builder import META_ARCHITECTURE
    from builders.vocab_builder import META_VOCAB
    from data_utils.utils import collate_fn
    from torch.utils.data import DataLoader as TorchLoader

    ref_eval = patch_reference_meteor()

    if case in ("mmf_m4c", "m4c"):
        vocab = META_VOCAB.get("OcrVocab")(
            CfgNode(base_vocab_cfg(paths, ocr_vocab_extra()))
        )
    elif case == "mmf_lorra":
        vocab = META_VOCAB.get("OcrClassificationVocab")(
            CfgNode(base_vocab_cfg(paths, ocr_classification_vocab_extra()))
        )
    elif case in ("joint_transformer", "vlsp_evjvqa"):
        # the reference's multimodal vocabs read config.VOCAB.* while its
        # builder passes the VOCAB node itself (vocab_builder.py:6 vs
        # multimodal_vocab.py:16 — broken as checked out); construct the
        # class directly with the node shape it expects
        node = base_vocab_cfg(paths, multimodal_vocab_extra())
        vocab = META_VOCAB.get("VlspVqaMultiModalVocab")(
            CfgNode({"VOCAB": node, "JSON_PATH": node["JSON_PATH"],
                     "MIN_FREQ": node["MIN_FREQ"]})
        )
    elif case in ("mcan", "saaa"):
        vocab = META_VOCAB.get("ClassificationVocab")(
            CfgNode(base_vocab_cfg(paths, {"TYPE": "ClassificationVocab"}))
        )
    else:
        vocab = META_VOCAB.get("Vocab")(CfgNode(base_vocab_cfg(paths)))

    ds_cfg = CfgNode(
        {
            "FEATURE_PATH": {
                "FEATURES": paths["features"],
                "SCENE_TEXT": paths["scene_text"],
            },
            "SCENE_TEXT_THRESHOLD": 0.0,
            "MAX_SCENE_TEXT": MAX_SCENE_TEXT,
        }
    )

    extra_loaders = {}
    if case in ("mmf_m4c", "m4c"):
        from data_utils.datasets.ocr_datasets import (
            OcrDictionaryDataset,
            OcrFeatureDataset,
        )

        # the reference's own MMF_M4C reads items.ocr_fasttext_features but
        # its dataset never emits them (mmf_m4c.py:167 vs ocr_datasets.py:
        # 56-62 — broken as checked out); pass the stored features through
        class _FasttextPassthrough:
            def load_scene_text_features(self, image_id):
                out = super().load_scene_text_features(image_id)
                raw = np.load(
                    os.path.join(
                        self.scene_text_features_path, f"{image_id}.npy"
                    ),
                    allow_pickle=True,
                )[()]
                import torch as _t

                keep = np.asarray(raw["scores"]) >= self.scene_text_threshold
                ft = np.asarray(raw["fasttext_features"])[keep]
                out["ocr_fasttext_features"] = _t.tensor(ft)
                # variable-length 1-D fields crash the reference's
                # InstanceList.pad_values (instance.py:165-166 builds a 2-D
                # pad for them — broken as checked out); the model never
                # reads ocr_scores
                out.pop("ocr_scores", None)
                return out

        class FixedOcrFeatureDataset(_FasttextPassthrough, OcrFeatureDataset):
            pass

        class FixedOcrDictionaryDataset(
            _FasttextPassthrough, OcrDictionaryDataset
        ):
            pass

        train_set = FixedOcrFeatureDataset(paths["train"], vocab, ds_cfg)
        dev_set = FixedOcrDictionaryDataset(paths["dev"], vocab, ds_cfg)
    elif case in ("mcan", "saaa"):
        from data_utils.datasets.feature_classification_dataset import (
            FeatureClassificationDataset,
        )

        train_set = FeatureClassificationDataset(paths["train"], vocab, ds_cfg)
        dev_set = FeatureClassificationDataset(paths["dev"], vocab, ds_cfg)
    elif case == "mmf_lorra":
        from data_utils.datasets.ocr_classification_dataset import (
            OcrClassificationDataset,
        )

        # two reference breaks shimmed (documented, as for mmf_m4c above):
        # (a) LoRRA reads items.ocr_fasttext_features but its dataset never
        # emits them (mmf_lorra.py:105 vs ocr_classification_dataset.py:
        # 118-124); (b) the dataset's pad path crashes before ever running —
        # pad_tensor builds a 2-D pad for the 1-D scores tensor even when
        # ZERO pad rows are needed (ocr_classification_dataset.py:70-73),
        # so its written fill value (1.) is unreachable as checked out.
        # LoRRA's pooling SUMS over the ocr axis unmasked
        # (mmf_lorra.py:149-151), so the padded row set is part of the
        # model function: with no runnable reference semantics to match,
        # both sides adopt this framework's static zero-fill padding to
        # MAX_SCENE_TEXT (texts padded with the padding token, exactly the
        # repo _SceneTextMixin contract) so the summed row sets are
        # byte-identical.  ocr_scores is unread by the model.
        class FixedOcrClassificationDataset(OcrClassificationDataset):
            def load_scene_text_features(self, image_id):
                import torch as _t

                raw = np.load(
                    os.path.join(
                        self.scene_text_features_path, f"{image_id}.npy"
                    ),
                    allow_pickle=True,
                )[()]
                keep = np.asarray(raw["scores"]) >= self.scene_text_threshold
                k = self.max_scene_text

                def pad_rows(value):
                    value = np.asarray(value, np.float32)[keep]
                    out = np.zeros((k,) + value.shape[1:], np.float32)
                    out[: value.shape[0]] = value
                    return _t.tensor(out)

                texts = [t for t, kp in zip(raw["texts"], keep) if kp]
                texts += [self.vocab.padding_token] * (k - len(texts))
                return {
                    "ocr_det_features": pad_rows(raw["det_features"]),
                    "ocr_rec_features": pad_rows(raw["rec_features"]),
                    "ocr_fasttext_features": pad_rows(
                        raw["fasttext_features"]
                    ),
                    "ocr_texts": texts,
                    "ocr_boxes": pad_rows(raw["boxes"]),
                }

        train_set = FixedOcrClassificationDataset(paths["train"], vocab, ds_cfg)
        dev_set = FixedOcrClassificationDataset(paths["dev"], vocab, ds_cfg)
    elif case in ("joint_transformer", "vlsp_evjvqa"):
        from data_utils.datasets.multilingual_datasets import (
            MultilingualDictionaryDataset,
            MultilingualFeatureDataset,
        )
        from data_utils.utils import preprocess_sentence as ref_preprocess

        # the reference dictionary dataset stores the RAW question string
        # and encode_question then iterates its characters
        # (multilingual_datasets.py:51, dictionary_dataset.py:41-42 —
        # broken as checked out); tokenise at load like this framework does
        class FixedMultilingualDictionaryDataset(MultilingualDictionaryDataset):
            def load_annotations(self, json_data):
                annotations = super().load_annotations(json_data)
                for ann in annotations:
                    if isinstance(ann["question"], str):
                        ann["question"] = ref_preprocess(
                            ann["question"], self.vocab.tokenizer
                        )
                return annotations

        train_set = MultilingualFeatureDataset(paths["train"], vocab, ds_cfg)
        dev_set = FixedMultilingualDictionaryDataset(paths["dev"], vocab, ds_cfg)
        if case == "vlsp_evjvqa":
            # the 4-split EVJVQA protocol (vlsp_evjvqa_task.py:30-48):
            # beam-decode predictions + metrics over both test splits
            for split in ("public_test", "private_test"):
                split_set = FixedMultilingualDictionaryDataset(
                    paths[split], vocab, ds_cfg
                )
                extra_loaders[split] = TorchLoader(
                    split_set, batch_size=EVAL_BATCH, shuffle=False,
                    collate_fn=collate_fn,
                )
    else:
        from data_utils.datasets.dictionary_dataset import DictionaryDataset
        from data_utils.datasets.feature_dataset import FeatureDataset

        train_set = FeatureDataset(paths["train"], vocab, ds_cfg)
        dev_set = DictionaryDataset(paths["dev"], vocab, ds_cfg)

    train_loader = TorchLoader(
        train_set, batch_size=BATCH, shuffle=False, collate_fn=collate_fn
    )
    dev_loader = TorchLoader(
        dev_set, batch_size=EVAL_BATCH, shuffle=False, collate_fn=collate_fn
    )

    cfg_map = {
        "iterative_mcan": iterative_mcan_cfg,
        "mcan": mcan_cfg,
        "saaa": saaa_cfg,
        "mmf_m4c": mmf_m4c_cfg,
        "m4c": m4c_cfg,
        "mmf_lorra": mmf_lorra_cfg,
        "joint_transformer": joint_transformer_cfg,
        "vlsp_evjvqa": joint_transformer_cfg,
    }
    model = META_ARCHITECTURE.get(cfg_map[case]()["ARCHITECTURE"])(
        CfgNode(cfg_map[case]()), vocab
    ).to("cpu")

    if case == "saaa":
        # the reference SAAA feeds the LSTM's full output SEQUENCE where a
        # pooled vector is required — CoAttention's q.unsqueeze(1)
        # .expand_as(v) crashes on 3-D q (saaa.py:23 — broken as checked
        # out).  Pool the question to its last valid timestep, the
        # architecture its commented-out TextProcessor implements
        # (saaa.py:29-57) and what models/saaa.py documents; the rest of
        # the forward is the reference's own math verbatim.
        import torch.nn.functional as _F

        def saaa_forward(items, _model=model):
            m = _model
            v, _ = m.vision(items.region_features)
            q_seq, _ = m.text(items.question_tokens)
            lengths = (items.question_tokens != vocab.padding_idx).sum(-1)
            last = lengths.clamp(min=1).sub(1).clamp(max=q_seq.shape[1] - 1)
            q = q_seq[torch.arange(q_seq.shape[0]), last]
            v = v / (v.norm(p=2, dim=1, keepdim=True).expand_as(v) + 1e-8)
            a = m.attention(v, q)
            v = m.apply_attention(v, a)
            combined = torch.cat([v, q], dim=1)
            out = m.classifier(combined)
            return _F.log_softmax(out, dim=-1)

        model.forward = saaa_forward

    if case in ("joint_transformer", "vlsp_evjvqa"):
        # the reference wraps its own encoder/decoder calls in Instance
        # objects their positional signatures cannot unpack
        # (joint_transformer.py:28-35,77-80 vs encoders.py:112,
        # decoders.py:49 — TypeError as checked out); shim the two
        # methods to call the modules directly, preserving the math
        def encoder_forward(items, _model=model):
            m = _model
            feats, mask = [], []
            region, region_mask = m.region_embedding(items.region_features)
            tag = lambda t, idx: t + m.text_embedding(
                torch.full(t.shape[:2], idx, dtype=torch.long)
            )[0]
            region = tag(region, vocab.feat_idx)
            rboxes, rboxes_mask = m.box_embedding(items.region_boxes)
            rboxes = tag(rboxes, vocab.box_idx)
            grid, grid_mask = m.grid_embedding(items.grid_features)
            grid = tag(grid, vocab.feat_idx)
            gboxes, gboxes_mask = m.box_embedding(items.grid_boxes)
            gboxes = tag(gboxes, vocab.box_idx)
            text, (text_mask, _) = m.text_embedding(items.question_tokens)
            text = tag(text, vocab.question_idx)
            joint = torch.cat([region, rboxes, grid, gboxes, text], dim=1)
            joint_mask = torch.cat(
                [region_mask, rboxes_mask, grid_mask, gboxes_mask, text_mask],
                dim=-1,
            )
            encoded = m.encoder(joint, joint_mask)
            return encoded, joint_mask

        def forward(items, _model=model):
            feats, mask = encoder_forward(items)
            return _model.decoder(
                answer_tokens=items.answer_tokens,
                encoder_features=feats,
                encoder_attention_mask=mask,
            )

        model.encoder_forward = encoder_forward
        model.forward = forward
    return types.SimpleNamespace(
        torch=torch, vocab=vocab, train_loader=train_loader,
        dev_loader=dev_loader, model=model, ref_eval=ref_eval,
        extra_loaders=extra_loaders,
    )


def run_reference(paths, epochs, CfgNode, case):
    sys.path.insert(0, "/root/reference")
    env = ref_setup(paths, CfgNode, case)
    torch, model, vocab = env.torch, env.model, env.vocab

    initial_state = {k: v.detach().clone() for k, v in model.state_dict().items()}
    optim = torch.optim.Adam(model.parameters(), lr=LR, betas=(0.9, 0.98))
    loss_fn = torch.nn.NLLLoss(ignore_index=vocab.padding_idx)
    import torch.nn.functional as F

    # dropout off, gradients on: zero every Dropout module's p while
    # keeping train() mode — MMF_M4C branches on self.training for teacher
    # forcing vs greedy decode (mmf_m4c.py:237-241)
    for module in model.modules():
        if isinstance(module, torch.nn.Dropout):
            module.p = 0.0

    def ref_greedy_m4c(items):
        """Reference standalone-M4C greedy (m4c.py:216-235) driven without
        the `last_ids.mean() == eos` early exit — mean-of-mixed-ids can
        equal eos spuriously (e.g. ids 1 and 3), truncating rows that are
        still refining; our fixed-length scan runs all steps, and when the
        reference's exit is genuine both decode identically."""
        prev = torch.full(
            (items.batch_size, vocab.max_answer_length),
            vocab.padding_idx, dtype=torch.long,
        )
        prev[:, 0] = vocab.bos_idx
        items.answer_tokens = prev
        for _ in range(vocab.max_answer_length):
            dec_out, ocr_out, ocr_mask = model.forward_mmt(items)
            items.decoder_outputs = dec_out
            items.ocr_encoder_outputs = ocr_out
            items.ocr_padding_mask = ocr_mask
            scores = model.forward_output(items)
            items.answer_tokens[:, 1:] = scores.argmax(dim=-1)[:, :-1]
        return scores.argmax(dim=-1)

    def ref_bce_loss(scores, target):
        # mmf_classification_task.py:20-31: scatter one-hot + BCEWithLogits
        scattered = torch.zeros_like(scores)
        scattered.scatter_(
            dim=-1, index=target.view(-1, 1), src=torch.ones_like(scores)
        )
        return F.binary_cross_entropy_with_logits(
            scores, scattered, reduction="mean"
        )

    def eval_split(loader):
        model.eval()
        gens, gts = {}, {}
        for it, items in enumerate(loader):
            items = items.to("cpu")
            with torch.no_grad():
                if case == "mmf_m4c":  # training_mmf_task.py:71-94
                    outs = model(items)["scores"].argmax(dim=-1)
                    answers_gen = vocab.decode_answer(
                        outs.contiguous(), items.ocr_tokens, join_words=False
                    )
                    answers_gt = items.answers
                elif case == "m4c":  # training_m4c_task.py:44-66 protocol
                    outs = ref_greedy_m4c(items)
                    answers_gen = vocab.decode_answer(
                        outs.contiguous(), items.ocr_tokens, join_words=False
                    )
                    answers_gt = items.answers
                elif case in ("mcan", "saaa"):  # classification_task.py:99-118
                    outs = model(items).contiguous()
                    answers_gen = vocab.decode_answer(
                        outs.argmax(dim=-1), join_word=True
                    )
                    answers_gt = vocab.decode_answer(
                        items.answer.squeeze(-1), join_word=True
                    )
                elif case == "mmf_lorra":  # mmf_classification_task.py:102-117
                    outs = model(items)["scores"].contiguous()
                    answers_gen = vocab.decode_answer(
                        outs.argmax(dim=-1), items.ocr_tokens, join_word=True
                    )
                    answers_gt = vocab.decode_answer(
                        items.answer.squeeze(-1), items.ocr_tokens,
                        join_word=True,
                    )
                else:  # open_ended_task.py:128-148
                    outs, _ = model.beam_search(
                        items, batch_size=items.batch_size, beam_size=BEAM,
                        out_size=1,
                    )
                    answers_gen = vocab.decode_answer(
                        outs.contiguous().view(-1, vocab.max_answer_length),
                        join_words=False,
                    )
                    answers_gt = items.answers
            for i, (gts_i, gen_i) in enumerate(zip(answers_gt, answers_gen)):
                if isinstance(gen_i, list):
                    gen_i = " ".join(k for k, _ in itertools.groupby(gen_i))
                gens[f"{it}_{i}"] = [gen_i]
                gts[f"{it}_{i}"] = gts_i if isinstance(gts_i, list) else [gts_i]
            del items
        return gens, gts

    saved_masks = apply_m4c_mask_patches() if case == "m4c" else None
    try:
        history, gens = [], {}
        for epoch in range(epochs):
            model.train()
            np.random.seed(1000 + epoch)  # OcrVocab.match_text_to_indices
            losses = []
            for items in env.train_loader:
                items = items.to("cpu")
                optim.zero_grad()
                if case in ("mmf_m4c", "m4c"):
                    # training_mmf_task.py:95-116.  The m4c case mirrors it:
                    # TrainingM4C's own loss call crashes as checked out
                    # (training_m4c_task.py:75 .contiguous() on the model's
                    # {"scores"} dict of raw logits)
                    out = F.log_softmax(
                        model(items)["scores"].contiguous(), dim=-1
                    )
                    loss = loss_fn(
                        out.view(-1, out.shape[-1]),
                        items.shifted_right_answer_tokens.view(-1),
                    )
                elif case in ("mcan", "saaa"):  # classification_task.py:113-135
                    out = model(items).contiguous()
                    loss = loss_fn(
                        out.view(-1, vocab.total_answers), items.answer.view(-1)
                    )
                elif case == "mmf_lorra":  # mmf_classification_task.py:79-100
                    out = model(items)["scores"].contiguous()
                    loss = ref_bce_loss(
                        out.view(-1, vocab.num_choices), items.answer
                    )
                else:  # open_ended_task.py:150-169
                    out = model(items).contiguous()
                    loss = loss_fn(
                        out.view(-1, out.shape[-1]),
                        items.shifted_right_answer_tokens.view(-1),
                    )
                loss.backward()
                optim.step()
                losses.append(float(loss.item()))

            np.random.seed(5000 + epoch)
            gens, gts = eval_split(env.dev_loader)
            scores, _ = env.ref_eval.compute_scores(gts, gens)
            history.append(
                {"loss": float(np.mean(losses)), "scores": clean_scores(scores)}
            )

        extras = {}
        if case in ("mcan", "saaa", "mmf_lorra"):
            extras["itoa"] = dict(env.vocab.itoa)
        if env.extra_loaders:
            # VLSP 4-split protocol: final-model predictions + metrics over
            # public/private test (vlsp_evjvqa_task.py:295-383)
            split_scores = {}
            for split, loader in env.extra_loaders.items():
                np.random.seed(9000)
                split_gens, split_gts = eval_split(loader)
                s, _ = env.ref_eval.compute_scores(split_gts, split_gens)
                split_scores[split] = clean_scores(s)
            extras["split_scores"] = split_scores
    finally:
        if saved_masks is not None:
            restore_m4c_mask_patches(saved_masks)
    return {
        "vocab_stoi": dict(vocab.stoi),
        "initial_state": initial_state,
        "history": history,
        "gens_last": gens,
        **extras,
    }


# --------------------------------------------------------------------------
# framework side
# --------------------------------------------------------------------------
def run_ours(paths, epochs, case, ref):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from openvivqa_tpu.builders import build_dataset, build_vocab, populate
    from openvivqa_tpu.config import ConfigNode
    from openvivqa_tpu.data.loader import DataLoader
    from openvivqa_tpu.evaluation import compute_scores
    from openvivqa_tpu.models.modules.torch_conversion import (
        convert_reference_checkpoint,
    )
    from openvivqa_tpu.training.decode import generate
    from openvivqa_tpu.training.train_state import bce_with_logits_loss, nll_loss

    populate()
    if case in ("mmf_m4c", "m4c"):
        vocab = build_vocab(
            ConfigNode(base_vocab_cfg(paths, ocr_vocab_extra()))
        )
    elif case in ("joint_transformer", "vlsp_evjvqa"):
        vocab = build_vocab(
            ConfigNode(base_vocab_cfg(paths, multimodal_vocab_extra()))
        )
    elif case in ("mcan", "saaa", "mmf_lorra"):
        extra = (
            ocr_classification_vocab_extra()
            if case == "mmf_lorra"
            else {"TYPE": "ClassificationVocab"}
        )
        vocab = build_vocab(ConfigNode(base_vocab_cfg(paths, extra)))
        # the reference assigns class ids by SET iteration order
        # (classification_vocab.py:34, PYTHONHASHSEED-dependent): transplant
        assert set(vocab.atoi) == set(ref["itoa"].values())
        vocab.itoa = {int(k): v for k, v in ref["itoa"].items()}
        vocab.atoi = {v: int(k) for k, v in ref["itoa"].items()}
    else:
        vocab = build_vocab(ConfigNode(base_vocab_cfg(paths)))
    assert dict(vocab.stoi) == ref["vocab_stoi"], "vocabularies diverge"

    ds_type = {
        "iterative_mcan": ("FeatureDataset", "DictionaryDataset"),
        "mcan": ("FeatureClassificationDataset", "FeatureClassificationDataset"),
        "saaa": ("FeatureClassificationDataset", "FeatureClassificationDataset"),
        "mmf_lorra": ("OcrClassificationDataset", "OcrClassificationDataset"),
        "mmf_m4c": ("OcrFeatureDataset", "OcrDictionaryDataset"),
        "m4c": ("OcrFeatureDataset", "OcrDictionaryDataset"),
        "joint_transformer": (
            "MultilingualFeatureDataset", "MultilingualDictionaryDataset"
        ),
        "vlsp_evjvqa": (
            "MultilingualFeatureDataset", "MultilingualDictionaryDataset"
        ),
    }[case]
    common = {
        "FEATURE_PATH": {
            "FEATURES": paths["features"], "SCENE_TEXT": paths["scene_text"],
        },
        # 36 = the synthetic stores' real region count: the reference MCAN's
        # attention-reduce softmax is UNMASKED over regions (mcan.py:71-74),
        # so its output depends on the padded width — match it exactly
        "MAX_REGIONS": 36,
        "SCENE_TEXT_THRESHOLD": 0.0,
        "MAX_SCENE_TEXT": MAX_SCENE_TEXT,
        "BATCH_SIZE": BATCH,
    }
    train_set = build_dataset(
        paths["train"], vocab, ConfigNode({**common, "TYPE": ds_type[0]})
    )
    dev_set = build_dataset(
        paths["dev"], vocab, ConfigNode({**common, "TYPE": ds_type[1]})
    )
    train_loader = DataLoader(
        train_set, batch_size=BATCH, shuffle=False, num_workers=1,
        pad_last_batch=True,
    )
    dev_loader = DataLoader(
        dev_set, batch_size=EVAL_BATCH, shuffle=False, num_workers=1,
        pad_last_batch=True,
    )
    extra_loaders = {}
    if case == "vlsp_evjvqa":
        for split in ("public_test", "private_test"):
            split_set = build_dataset(
                paths[split], vocab, ConfigNode({**common, "TYPE": ds_type[1]})
            )
            extra_loaders[split] = DataLoader(
                split_set, batch_size=EVAL_BATCH, shuffle=False,
                num_workers=1, pad_last_batch=True,
            )

    cfg_map = {
        "iterative_mcan": iterative_mcan_cfg,
        "mcan": mcan_cfg,
        "saaa": saaa_cfg,
        "mmf_m4c": mmf_m4c_cfg,
        "m4c": m4c_cfg,
        "mmf_lorra": mmf_lorra_cfg,
        "joint_transformer": joint_transformer_cfg,
        "vlsp_evjvqa": joint_transformer_cfg,
    }
    config = ConfigNode(cfg_map[case]())
    from openvivqa_tpu.builders import META_ARCHITECTURE

    model = META_ARCHITECTURE.get(config.ARCHITECTURE)(config, vocab)
    params = convert_reference_checkpoint(
        {"state_dict": ref["initial_state"]}, config
    )
    params = jax.tree.map(jnp.asarray, params)

    tx = optax.adam(learning_rate=LR, b1=0.9, b2=0.98)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, batch):
        def loss_fn(p):
            out = model.apply({"params": p}, batch, train=False)  # dropout off
            if case == "mmf_lorra":
                # BCE over one-hot choices (mmf_classification_task.py:20-39)
                return bce_with_logits_loss(
                    out["scores"], batch["answer"].reshape(-1),
                    weights=batch["sample_valid"],
                )
            if case in ("mmf_m4c", "m4c"):
                out = jax.nn.log_softmax(out["scores"], axis=-1)
                targets = batch["shifted_right_answer_tokens"]
            elif case in ("mcan", "saaa"):
                targets = batch["answer"]
            else:
                targets = batch["shifted_right_answer_tokens"]
            weights = jnp.broadcast_to(
                batch["sample_valid"].reshape(
                    (-1,) + (1,) * (targets.ndim - 1)
                ),
                targets.shape,
            ).astype(out.dtype)
            return nll_loss(
                out.reshape(-1, out.shape[-1]), targets.reshape(-1),
                vocab.padding_idx, weights=weights.reshape(-1),
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    if case in ("mmf_m4c", "m4c"):
        greedy = jax.jit(
            lambda p, batch: model.apply(
                {"params": p}, batch, method=model.greedy_decode
            )
        )
    elif case in ("iterative_mcan", "joint_transformer", "vlsp_evjvqa"):
        gen_jit = jax.jit(
            lambda p, batch: generate(
                model, {"params": p}, batch, batch_size=EVAL_BATCH,
                beam_size=BEAM, out_size=1,
            )
        )
    elif case == "mmf_lorra":
        eval_jit = jax.jit(
            lambda p, batch: jnp.argmax(
                model.apply({"params": p}, batch, train=False)["scores"],
                axis=-1,
            )
        )
    else:
        eval_jit = jax.jit(
            lambda p, batch: jnp.argmax(
                model.apply({"params": p}, batch, train=False), axis=-1
            )
        )

    def to_device(batch):
        return {k: jnp.asarray(v) for k, v in batch.arrays().items()}

    def eval_split(loader):
        gens, gts = {}, {}
        for it, batch in enumerate(loader):
            arrays = to_device(batch)
            if case in ("mmf_m4c", "m4c"):
                results = greedy(params, arrays)
                ids = np.argmax(np.asarray(results["scores"]), axis=-1)
                n = ids.shape[0]
                ocr_tokens = list(batch["ocr_tokens"])
                ocr_tokens += [ocr_tokens[-1]] * (n - len(ocr_tokens))
                answers_gen = vocab.decode_answer(
                    ids, ocr_tokens, join_words=False
                )
                answers_gt = batch["answers"]
            elif case in ("mcan", "saaa"):
                preds = np.asarray(eval_jit(params, arrays))
                answers_gen = vocab.decode_answer(preds, join_word=True)
                answers_gt = vocab.decode_answer(
                    np.asarray(batch["answer"]).reshape(-1), join_word=True
                )
            elif case == "mmf_lorra":
                preds = np.asarray(eval_jit(params, arrays))
                n = preds.shape[0]
                ocr_tokens = list(batch["ocr_tokens"])
                ocr_tokens += [ocr_tokens[-1]] * (n - len(ocr_tokens))
                answers_gen = vocab.decode_answer(
                    preds, ocr_tokens, join_word=True
                )
                answers_gt = vocab.decode_answer(
                    np.asarray(batch["answer"]).reshape(-1), ocr_tokens,
                    join_word=True,
                )
            else:
                outs, _ = gen_jit(params, arrays)
                answers_gen = vocab.decode_answer(
                    np.asarray(outs).reshape(-1, vocab.max_answer_length),
                    join_words=False,
                )
                answers_gt = batch["answers"]
            for i, (gts_i, gen_i) in enumerate(zip(answers_gt, answers_gen)):
                if not batch["sample_valid"][i]:
                    continue
                if isinstance(gen_i, list):
                    gen_i = " ".join(k for k, _ in itertools.groupby(gen_i))
                gens[f"{it}_{i}"] = [gen_i]
                gts[f"{it}_{i}"] = gts_i if isinstance(gts_i, list) else [gts_i]
        return gens, gts

    history, gens = [], {}
    for epoch in range(epochs):
        np.random.seed(1000 + epoch)  # align OcrVocab np.random draws
        losses = []
        for batch in train_loader:
            arrays = to_device(batch)
            params, opt_state, loss = train_step(params, opt_state, arrays)
            losses.append(float(loss))

        np.random.seed(5000 + epoch)
        gens, gts = eval_split(dev_loader)
        scores, _ = compute_scores(gts, gens)
        history.append(
            {"loss": float(np.mean(losses)), "scores": clean_scores(scores)}
        )

    out = {"history": history, "gens_last": gens}
    if extra_loaders:
        split_scores = {}
        for split, loader in extra_loaders.items():
            np.random.seed(9000)
            split_gens, split_gts = eval_split(loader)
            s, _ = compute_scores(split_gts, split_gens)
            split_scores[split] = clean_scores(s)
        out["split_scores"] = split_scores
    return out


def compare(case, ref, ours, epochs):
    epochs_report = []
    for e, (r, o) in enumerate(zip(ref["history"], ours["history"])):
        r_scores, o_scores = flatten_scores(r["scores"]), flatten_scores(o["scores"])
        deltas = {
            k: abs(r_scores[k] - o_scores[k]) for k in r_scores if k in o_scores
        }
        epochs_report.append(
            {
                "epoch": e,
                "loss_ref": r["loss"], "loss_jax": o["loss"],
                "loss_abs_delta": abs(r["loss"] - o["loss"]),
                "scores_ref": r_scores, "scores_jax": o_scores,
                "score_abs_deltas": deltas,
                "max_score_delta": max(deltas.values()) if deltas else 0.0,
            }
        )
    shared = set(ref["gens_last"]) & set(ours["gens_last"])
    agree = sum(1 for k in shared if ref["gens_last"][k] == ours["gens_last"][k])
    report = {
        "case": case,
        "epochs": epochs_report,
        "final_generation_agreement": {
            "n": len(shared), "identical": agree,
            "fraction": agree / max(len(shared), 1),
        },
        "max_loss_delta": max(e["loss_abs_delta"] for e in epochs_report),
        "max_score_delta": max(e["max_score_delta"] for e in epochs_report),
    }
    if "split_scores" in ref or "split_scores" in ours:
        # VLSP 4-split protocol: final-model public/private test scores
        splits = {}
        for split in sorted(ref.get("split_scores", {})):
            r_scores = flatten_scores(ref["split_scores"][split])
            o_scores = flatten_scores(
                ours.get("split_scores", {}).get(split, {})
            )
            deltas = {
                k: abs(r_scores[k] - o_scores[k])
                for k in r_scores
                if k in o_scores
            }
            splits[split] = {
                "scores_ref": r_scores, "scores_jax": o_scores,
                "score_abs_deltas": deltas,
                "max_score_delta": max(deltas.values()) if deltas else 0.0,
            }
        report["split_scores"] = splits
        report["max_score_delta"] = max(
            [report["max_score_delta"]]
            + [s["max_score_delta"] for s in splits.values()]
        )
    return report


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument(
        "--cases",
        default=(
            "iterative_mcan,mcan,saaa,mmf_m4c,m4c,mmf_lorra,"
            "joint_transformer,vlsp_evjvqa"
        ),
        help="comma list of the eight supported case names",
    )
    parser.add_argument("--out", default=os.path.join(REPO, "PARITY_RUN.json"))
    args = parser.parse_args()

    CfgNode = install_stubs()
    from openvivqa_tpu.data.synthetic import generate_synthetic_dataset

    data_dir = tempfile.mkdtemp(prefix="parity_data_")
    paths = generate_synthetic_dataset(
        data_dir, n_images=10, n_questions_per_image=4,
        max_scene_text=MAX_SCENE_TEXT, seed=7,
    )
    # the EVJVQA contest protocol is 4-split (vlsp_evjvqa_task.py:30-48)
    vlsp_dir = tempfile.mkdtemp(prefix="parity_data_vlsp_")
    vlsp_paths = generate_synthetic_dataset(
        vlsp_dir, n_images=12, n_questions_per_image=4,
        max_scene_text=MAX_SCENE_TEXT, seed=11,
        splits={"train": 0.5, "dev": 0.2, "public_test": 0.15,
                "private_test": 0.15},
    )
    # the multimodal vocab builds from TRAIN+DEV only
    # (vlsp_vqa_multimodal_vocab.py:21-24); TEST is unread but the shared
    # vocab-config shape wants the key
    vlsp_paths["test"] = vlsp_paths["public_test"]

    results = {
        "protocol": {
            "epochs": args.epochs, "batch_size": BATCH, "beam_size": BEAM,
            "lr": LR, "optimizer": "Adam(0.9,0.98)", "dropout": "off",
            "shuffle": False, "d_model": D, "layers": LAYERS,
            "initial_weights": "converted from the torch init via "
            "convert_reference_checkpoint",
            "data": "shared synthetic (10 images x 4 questions, seed 7)",
            "notes": [
                "reference METEOR jar stripped upstream; both sides use "
                "this repo's METEOR",
                "reference ClassificationVocab class ids are set-iteration-"
                "ordered; reference mapping transplanted",
                "reference OcrFeatureDataset never emits "
                "ocr_fasttext_features (broken as checked out); thin "
                "passthrough subclass used on the reference side",
            ],
        },
        "cases": {},
    }
    for case in args.cases.split(","):
        case = case.strip()
        case_paths = vlsp_paths if case == "vlsp_evjvqa" else paths
        print(f"== case {case}: reference (torch CPU) ==", flush=True)
        ref = run_reference(case_paths, args.epochs, CfgNode, case)
        print(f"== case {case}: openvivqa_tpu (jax CPU) ==", flush=True)
        ours = run_ours(case_paths, args.epochs, case, ref)
        report = compare(case, ref, ours, args.epochs)
        results["cases"][case] = report
        for e in report["epochs"]:
            print(
                f"  epoch {e['epoch']}: loss ref={e['loss_ref']:.6f} "
                f"jax={e['loss_jax']:.6f} |d|={e['loss_abs_delta']:.2e} "
                f"max|d score|={e['max_score_delta']:.2e}"
            )
        agreement = report["final_generation_agreement"]
        print(
            f"  generations identical: {agreement['identical']}/{agreement['n']}"
        )
        for split, s in report.get("split_scores", {}).items():
            print(f"  {split}: max|d score|={s['max_score_delta']:.2e}")

    with open(args.out, "w") as handle:
        json.dump(results, handle, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
