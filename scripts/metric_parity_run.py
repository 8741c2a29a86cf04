#!/usr/bin/env python
"""End-to-end metric-parity runs: torch reference vs this framework.

The round-1 north star (BASELINE.md / SURVEY.md §6) is metric parity on
full training trajectories, not just module-level forward parity.  This
script runs BOTH frameworks end to end on byte-identical synthetic data
across three flagship protocols:

* `iterative_mcan` — generative VQA: XE teacher forcing + beam-search
  evaluation over all 8 metrics (tasks/open_ended_task.py:128-169);
* `mcan` — ViVQA classification: NLL over answer classes, argmax decode
  (tasks/classification_task.py:95-135);
* `mmf_m4c` — OCR-copy M4C: NLL on log_softmax(scores), greedy in-forward
  decode against per-sample OCR tables (tasks/training_mmf_task.py:71-116).

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

    if case == "mmf_m4c":
        vocab = META_VOCAB.get("OcrVocab")(
            CfgNode(base_vocab_cfg(paths, ocr_vocab_extra()))
        )
    elif case == "joint_transformer":
        # the reference's multimodal vocabs read config.VOCAB.* while its
        # builder passes the VOCAB node itself (vocab_builder.py:6 vs
        # multimodal_vocab.py:16 — broken as checked out); construct the
        # class directly with the node shape it expects
        node = base_vocab_cfg(paths, multimodal_vocab_extra())
        vocab = META_VOCAB.get("VlspVqaMultiModalVocab")(
            CfgNode({"VOCAB": node, "JSON_PATH": node["JSON_PATH"],
                     "MIN_FREQ": node["MIN_FREQ"]})
        )
    elif case == "mcan":
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

    if case == "mmf_m4c":
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
    elif case == "mcan":
        from data_utils.datasets.feature_classification_dataset import (
            FeatureClassificationDataset,
        )

        train_set = FeatureClassificationDataset(paths["train"], vocab, ds_cfg)
        dev_set = FeatureClassificationDataset(paths["dev"], vocab, ds_cfg)
    elif case == "joint_transformer":
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
        "mmf_m4c": mmf_m4c_cfg,
        "joint_transformer": joint_transformer_cfg,
    }
    model = META_ARCHITECTURE.get(cfg_map[case]()["ARCHITECTURE"])(
        CfgNode(cfg_map[case]()), vocab
    ).to("cpu")

    if case == "joint_transformer":
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

    history, gens = [], {}
    for epoch in range(epochs):
        model.train()
        np.random.seed(1000 + epoch)  # OcrVocab.match_text_to_indices draws
        losses = []
        for items in env.train_loader:
            items = items.to("cpu")
            optim.zero_grad()
            if case == "mmf_m4c":  # training_mmf_task.py:95-116
                out = F.log_softmax(
                    model(items)["scores"].contiguous(), dim=-1
                )
                loss = loss_fn(
                    out.view(-1, out.shape[-1]),
                    items.shifted_right_answer_tokens.view(-1),
                )
            elif case == "mcan":  # classification_task.py:113-135
                out = model(items).contiguous()
                loss = loss_fn(
                    out.view(-1, vocab.total_answers), items.answer.view(-1)
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

        model.eval()
        np.random.seed(5000 + epoch)
        gens, gts = {}, {}
        for it, items in enumerate(env.dev_loader):
            items = items.to("cpu")
            with torch.no_grad():
                if case == "mmf_m4c":  # training_mmf_task.py:71-94
                    outs = model(items)["scores"].argmax(dim=-1)
                    answers_gen = vocab.decode_answer(
                        outs.contiguous(), items.ocr_tokens, join_words=False
                    )
                    answers_gt = items.answers
                elif case == "mcan":  # classification_task.py:99-118
                    outs = model(items).contiguous()
                    answers_gen = vocab.decode_answer(
                        outs.argmax(dim=-1), join_word=True
                    )
                    answers_gt = vocab.decode_answer(
                        items.answer.squeeze(-1), join_word=True
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
        scores, _ = env.ref_eval.compute_scores(gts, gens)
        history.append(
            {"loss": float(np.mean(losses)), "scores": clean_scores(scores)}
        )

    extras = {}
    if case == "mcan":
        extras["itoa"] = dict(env.vocab.itoa)
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
    from openvivqa_tpu.training.train_state import nll_loss

    populate()
    if case == "mmf_m4c":
        vocab = build_vocab(
            ConfigNode(base_vocab_cfg(paths, ocr_vocab_extra()))
        )
    elif case == "joint_transformer":
        vocab = build_vocab(
            ConfigNode(base_vocab_cfg(paths, multimodal_vocab_extra()))
        )
    elif case == "mcan":
        vocab = build_vocab(
            ConfigNode(base_vocab_cfg(paths, {"TYPE": "ClassificationVocab"}))
        )
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
        "mmf_m4c": ("OcrFeatureDataset", "OcrDictionaryDataset"),
        "joint_transformer": (
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

    cfg_map = {
        "iterative_mcan": iterative_mcan_cfg,
        "mcan": mcan_cfg,
        "mmf_m4c": mmf_m4c_cfg,
        "joint_transformer": joint_transformer_cfg,
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
            if case == "mmf_m4c":
                out = jax.nn.log_softmax(out["scores"], axis=-1)
                targets = batch["shifted_right_answer_tokens"]
            elif case == "mcan":
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

    if case == "mmf_m4c":
        greedy = jax.jit(
            lambda p, batch: model.apply(
                {"params": p}, batch, method=model.greedy_decode
            )
        )
    elif case in ("iterative_mcan", "joint_transformer"):
        gen_jit = jax.jit(
            lambda p, batch: generate(
                model, {"params": p}, batch, batch_size=EVAL_BATCH,
                beam_size=BEAM, out_size=1,
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

    history, gens = [], {}
    for epoch in range(epochs):
        np.random.seed(1000 + epoch)  # align OcrVocab np.random draws
        losses = []
        for batch in train_loader:
            arrays = to_device(batch)
            params, opt_state, loss = train_step(params, opt_state, arrays)
            losses.append(float(loss))

        np.random.seed(5000 + epoch)
        gens, gts = {}, {}
        for it, batch in enumerate(dev_loader):
            arrays = to_device(batch)
            if case == "mmf_m4c":
                results = greedy(params, arrays)
                ids = np.argmax(np.asarray(results["scores"]), axis=-1)
                n = ids.shape[0]
                ocr_tokens = list(batch["ocr_tokens"])
                ocr_tokens += [ocr_tokens[-1]] * (n - len(ocr_tokens))
                answers_gen = vocab.decode_answer(
                    ids, ocr_tokens, join_words=False
                )
                answers_gt = batch["answers"]
            elif case == "mcan":
                preds = np.asarray(eval_jit(params, arrays))
                answers_gen = vocab.decode_answer(preds, join_word=True)
                answers_gt = vocab.decode_answer(
                    np.asarray(batch["answer"]).reshape(-1), join_word=True
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
        scores, _ = compute_scores(gts, gens)
        history.append(
            {"loss": float(np.mean(losses)), "scores": clean_scores(scores)}
        )

    return {"history": history, "gens_last": gens}


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
    return {
        "case": case,
        "epochs": epochs_report,
        "final_generation_agreement": {
            "n": len(shared), "identical": agree,
            "fraction": agree / max(len(shared), 1),
        },
        "max_loss_delta": max(e["loss_abs_delta"] for e in epochs_report),
        "max_score_delta": max(e["max_score_delta"] for e in epochs_report),
    }


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument(
        "--cases", default="iterative_mcan,mcan,mmf_m4c,joint_transformer",
        help="comma list of iterative_mcan,mcan,mmf_m4c,joint_transformer",
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
        print(f"== case {case}: reference (torch CPU) ==", flush=True)
        ref = run_reference(paths, args.epochs, CfgNode, case)
        print(f"== case {case}: openvivqa_tpu (jax CPU) ==", flush=True)
        ours = run_ours(paths, args.epochs, case, ref)
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

    with open(args.out, "w") as handle:
        json.dump(results, handle, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
