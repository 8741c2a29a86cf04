#!/usr/bin/env python
"""Measure the PyTorch reference's CPU throughput (the comparison anchor,
BASELINE.md: baselines must be produced, not quoted).

Loads the reference package from /root/reference with stub modules for its
missing deps (yacs, pytorch_transformers), builds its MCAN at the
mcan.yaml dims (D_MODEL=512, 3 SA + 3 GA layers, LSTM text embedding, 1024-d
region features), and times eval forward and train step on CPU.

Merges results into BASELINE_MEASURED.json at the repo root (other anchors
in the file are preserved).  Run once:
    python scripts/measure_reference_baseline.py [--only mcan|mmf_greedy]

Anchors produced:
  mcan_eval_samples_per_sec / mcan_train_samples_per_sec — MCAN @ mcan.yaml
    dims (the bench.py eval/train headline anchor);
  mmf_greedy_samples_per_sec — MMF_M4C greedy decode (the reference's
    in-forward eval loop, /root/reference/models/mmf_m4c.py:236-256) at the
    scripts/bench_m4c_decode.py dims (768h / 4-layer MMT / 3-layer TextBert,
    bs 32, obj 100 + ocr 100 + question 20, max_iter 12);
  mmt_train_samples_per_sec — Adam train step on the HF BertEncoder the
    reference's MMT wraps (/root/reference/models/mmf_m4c.py:263,287) at
    the bench.py mmt_train dims (4 layers, 768h, 8 heads, bs 32, len 512,
    dropout 0.1, masked 40-key tail).
"""

import argparse
import json
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def install_stubs():
    # yacs.config.CfgNode stub (attribute-dict)
    class CfgNode(dict):
        def __getattr__(self, k):
            try:
                v = self[k]
            except KeyError:
                raise AttributeError(k)
            return CfgNode(v) if isinstance(v, dict) and not isinstance(v, CfgNode) else v

        def __setattr__(self, k, v):
            self[k] = v

    yacs = types.ModuleType("yacs")
    yacs_config = types.ModuleType("yacs.config")
    yacs_config.CfgNode = CfgNode
    yacs.config = yacs_config
    sys.modules["yacs"] = yacs
    sys.modules["yacs.config"] = yacs_config

    # pytorch_transformers stub backed by transformers
    from transformers.models.bert import modeling_bert as hf_bert

    pt = types.ModuleType("pytorch_transformers")
    pt_bert = types.ModuleType("pytorch_transformers.modeling_bert")
    for name in ("BertConfig", "BertEncoder", "BertPreTrainedModel", "BertEmbeddings"):
        if hasattr(hf_bert, name):
            setattr(pt_bert, name, getattr(hf_bert, name))
    pt.modeling_bert = pt_bert
    sys.modules["pytorch_transformers"] = pt
    sys.modules["pytorch_transformers.modeling_bert"] = pt_bert

    # the reference's evaluation.utils is missing from the checkout
    # (meteor.py:8 imports it); pre-register a stub so import succeeds
    eval_utils = types.ModuleType("evaluation.utils")
    eval_utils.download_from_url = lambda *a, **k: None
    sys.modules["evaluation.utils"] = eval_utils
    return CfgNode


class TinyVocab:
    """Duck-typed vocab for reference model construction."""

    def __init__(self, n_tokens=1000, n_answers=300, max_q=16, max_a=12):
        self.padding_idx, self.bos_idx, self.eos_idx, self.unk_idx = 0, 1, 2, 3
        self.total_answers = n_answers
        self.max_question_length = max_q
        self.max_answer_length = max_a
        self.word_embeddings = None
        self._n = n_tokens

    def __len__(self):
        return self._n


def mcan_config(CfgNode):
    attn = {
        "ARCHITECTURE": "ScaledDotProductAttention",
        "HEAD": 8, "D_MODEL": 512, "D_KEY": 64, "D_VALUE": 64, "D_FF": 2048,
        "D_FEATURE": 2048, "USE_AOA": False, "CAN_BE_STATEFUL": False,
        "DROPOUT": 0.1,
    }
    return CfgNode(
        {
            "ARCHITECTURE": "MCAN",
            "NAME": "mcan_baseline",
            "DEVICE": "cpu",
            "D_MODEL": 512,
            "VISION_EMBEDDING": {
                "ARCHITECTURE": "FeatureEmbedding",
                "D_FEATURE": 1024, "D_MODEL": 512, "DROPOUT": 0.1,
            },
            "TEXT_EMBEDDING": {
                "ARCHITECTURE": "LSTMTextEmbedding",
                "D_MODEL": 512, "D_EMBEDDING": 300, "DROPOUT": 0.1,
                "WORD_EMBEDDING": None, "WORD_EMBEDDING_CACHE": None,
            },
            "SELF_ENCODER": {
                "ARCHITECTURE": "Encoder", "D_MODEL": 512, "LAYERS": 3,
                "SELF_ATTENTION": dict(attn),
            },
            "GUIDED_ENCODER": {
                "ARCHITECTURE": "GuidedAttentionEncoder", "D_MODEL": 512,
                "LAYERS": 3, "SELF_ATTENTION": dict(attn),
                "GUIDED_ATTENTION": dict(attn),
            },
            "VISION_ATTR_REDUCE": {"D_MODEL": 512, "DROPOUT": 0.1},
            "TEXT_ATTR_REDUCE": {"D_MODEL": 512, "DROPOUT": 0.1},
        }
    )


def mmf_config(CfgNode):
    """MMF_M4C at the scripts/bench_m4c_decode.py dims (mmf_m4c.yaml
    hidden sizes; 3-layer TextBert keeps the constant encode cost small
    on both sides, same as the JAX bench)."""
    return CfgNode(
        {
            "ARCHITECTURE": "MMF_M4C",
            "NAME": "mmf_baseline",
            "DEVICE": "cpu",
            "MMT": {
                "HIDDEN_SIZE": 768, "NUM_HIDDEN_LAYERS": 4,
                "NUM_ATTENTION_HEADS": 8,
            },
            "TEXT_BERT": {
                "HIDDEN_SIZE": 768, "NUM_HIDDEN_LAYERS": 3,
                "LOAD_PRETRAINED": False,
                "PRETRAINED_NAME": "bert-base-uncased",
            },
            "OBJECT_EMBEDDING": {"D_FEATURE": 1024, "DROPOUT": 0.1},
            "OCR_EMBEDDING": {"D_FEATURE": 812, "DROPOUT": 0.1},
            "OCR_PTR_NET": {"HIDDEN_SIZE": 768, "QUERY_KEY_SIZE": 768},
        }
    )


def measure_mmf_greedy(CfgNode) -> dict:
    """Time the reference's greedy decode: eval-mode forward runs max_iter
    FULL MMT re-encodes (mmf_m4c.py:243-256 — one per emitted token)."""
    import torch

    torch.manual_seed(0)
    from builders.model_builder import META_ARCHITECTURE
    from utils.instance import InstanceList

    bs, n_obj, n_ocr, qlen, max_a = 32, 100, 100, 20, 12
    vocab = TinyVocab(n_tokens=5000, max_q=qlen, max_a=max_a)
    model = META_ARCHITECTURE.get("MMF_M4C")(mmf_config(CfgNode), vocab)
    model = model.to("cpu").eval()

    rng = np.random.default_rng(7)

    def feats(*shape):
        return torch.tensor(rng.normal(size=shape).astype(np.float32))

    q = rng.integers(4, len(vocab), (bs, qlen)).astype(np.int64)
    q[:, -4:] = 0  # padding tail, same as the JAX bench batch
    items = InstanceList()
    items.question_tokens = torch.tensor(q)
    items.region_features = feats(bs, n_obj, 1024)
    items.region_boxes = feats(bs, n_obj, 4)
    items.ocr_fasttext_features = feats(bs, n_ocr, 300)
    items.ocr_rec_features = feats(bs, n_ocr, 256)
    items.ocr_det_features = feats(bs, n_ocr, 256)
    items.ocr_boxes = feats(bs, n_ocr, 4)

    with torch.no_grad():
        # warm the thread pools with one training-mode forward (1 MMT pass
        # instead of max_iter) before timing the real greedy loop
        model.train()
        items.answer_tokens = torch.tensor(
            rng.integers(4, len(vocab), (bs, max_a)).astype(np.int64)
        )
        model(items)
        model.eval()

        n_iters = 2
        start = time.perf_counter()
        for _ in range(n_iters):
            model(items)
        elapsed = time.perf_counter() - start

    sps = bs * n_iters / elapsed
    return {
        "mmf_greedy_samples_per_sec": sps,
        "mmf_greedy_dims": (
            "MMF_M4C 768h/4L MMT + 3L TextBert, bs 32, obj 100 + ocr 100 + "
            "q 20, vocab 5000, max_iter 12 (bench_m4c_decode.py dims)"
        ),
    }


def iterative_config(CfgNode):
    """MMF_IterativeM4C at the scripts/bench_m4c_decode.py dims (768h,
    4-layer encoder + 4-layer decoder, 3-layer TextBert)."""
    return CfgNode(
        {
            "ARCHITECTURE": "MMF_IterativeM4C",
            "NAME": "iterative_baseline",
            "DEVICE": "cpu",
            "D_MODEL": 768,
            "TEXT_BERT": {
                "HIDDEN_SIZE": 768, "NUM_HIDDEN_LAYERS": 3,
                "NUM_ATTENTION_HEADS": 8,
            },
            "OBJECT_EMBEDDING": {
                "D_FEATURE": 1024, "D_MODEL": 768, "DROPOUT": 0.1,
            },
            "OCR_EMBEDDING": {
                "D_FEATURE": 812, "D_MODEL": 768, "DROPOUT": 0.1,
            },
            "ENCODER": {
                "D_MODEL": 768, "HEAD": 8, "LAYERS": 4, "DROPOUT": 0.1,
            },
            "DECODER": {
                "D_MODEL": 768, "HEAD": 8, "LAYERS": 4, "DROPOUT": 0.1,
            },
            "OCR_PTR_NET": {"HIDDEN_SIZE": 768, "QUERY_KEY_SIZE": 768},
        }
    )


def measure_iterative_greedy(CfgNode) -> dict:
    """Time the reference's MMF_IterativeM4C greedy decode: eval-mode
    forward runs max_iter FULL decoder re-runs (one 12-token causal +
    cross-attention decoder pass per emitted token,
    mmf_iterative_m4c.py:253-270).

    The reference file is NameError-broken as checked out — it uses
    TextBert, _get_mask and _get_causal_mask without importing or defining
    them (mmf_iterative_m4c.py:36,117,219) — so the matching versions from
    experimental_mmf_m4c (whose TextBert extends the binary (bs, seq)
    _get_mask convention this file uses; mmf_m4c's TextBert expects the
    other, pre-extended convention) are patched into the module namespace
    before building.
    """
    import torch

    torch.manual_seed(0)
    import models.mmf_iterative_m4c as it_mod
    from models.experimental_mmf_m4c import (
        OcrPtrNet,
        TextBert,
        _get_causal_mask,
        _get_mask,
    )

    it_mod.TextBert = TextBert
    it_mod._get_mask = _get_mask
    it_mod._get_causal_mask = _get_causal_mask
    # the file imports mmf_m4c.OcrPtrNet, which squeezes a pre-extended
    # (bs,1,1,S) additive mask — but this model hands it the binary
    # (bs,S) _get_mask convention; experimental_mmf_m4c's OcrPtrNet is
    # the matching one
    it_mod.OcrPtrNet = OcrPtrNet

    # the iterative model wraps standalone BertEncoder(config) instances
    # (mmf_iterative_m4c.py:86,98) which miss PreTrainedModel's attention
    # dispatch setup on modern transformers — same fix as measure_mmt_train
    from transformers.models.bert.modeling_bert import BertConfig

    class _EagerBertConfig(BertConfig):
        def __init__(self, *args, **kwargs):
            super().__init__(*args, **kwargs)
            self._attn_implementation = "eager"

    it_mod.BertConfig = _EagerBertConfig

    from builders.model_builder import META_ARCHITECTURE
    from utils.instance import InstanceList

    bs, n_obj, n_ocr, qlen, max_a = 32, 100, 100, 20, 12
    vocab = TinyVocab(n_tokens=5000, max_q=qlen, max_a=max_a)
    model = META_ARCHITECTURE.get("MMF_IterativeM4C")(
        iterative_config(CfgNode), vocab
    )
    model = model.to("cpu").eval()

    rng = np.random.default_rng(7)

    def feats(*shape):
        return torch.tensor(rng.normal(size=shape).astype(np.float32))

    q = rng.integers(4, len(vocab), (bs, qlen)).astype(np.int64)
    q[:, -4:] = 0  # padding tail, same as the JAX bench batch
    items = InstanceList()
    items.question_tokens = torch.tensor(q)
    items.region_features = feats(bs, n_obj, 1024)
    items.region_boxes = feats(bs, n_obj, 4)
    items.ocr_fasttext_features = feats(bs, n_ocr, 300)
    items.ocr_rec_features = feats(bs, n_ocr, 256)
    items.ocr_det_features = feats(bs, n_ocr, 256)
    items.ocr_boxes = feats(bs, n_ocr, 4)

    with torch.no_grad():
        # warm the thread pools with one training-mode forward (1 decoder
        # pass instead of max_iter) before timing the real greedy loop
        model.train()
        items.answer_tokens = torch.tensor(
            rng.integers(4, len(vocab), (bs, max_a)).astype(np.int64)
        )
        model(items)
        model.eval()

        n_iters = 2
        start = time.perf_counter()
        for _ in range(n_iters):
            model(items)
        elapsed = time.perf_counter() - start

    sps = bs * n_iters / elapsed
    return {
        "iterative_greedy_samples_per_sec": sps,
        "iterative_greedy_dims": (
            "MMF_IterativeM4C 768h/4L enc + 4L dec + 3L TextBert, bs 32, "
            "obj 100 + ocr 100 + q 20, vocab 5000, max_iter 12 "
            "(bench_m4c_decode.py dims; TextBert/_get_mask patched in — "
            "the reference file is NameError-broken as checked out)"
        ),
    }


def measure_mmt_train() -> dict:
    """Adam train step on the exact encoder class the reference's MMT wraps
    (HF BertEncoder — /root/reference/models/mmf_m4c.py:263,287) at the
    bench.py mmt_train dims: 4 layers, 768 hidden, 8 heads, bs 32, len 512,
    dropout 0.1, additive mask over the last 40 keys, MSE-style loss."""
    import torch
    from transformers.models.bert.modeling_bert import BertConfig, BertEncoder

    torch.manual_seed(0)
    bs, length, hidden = 32, 512, 768
    config = BertConfig(
        hidden_size=hidden, num_hidden_layers=4, num_attention_heads=8,
        intermediate_size=4 * hidden, hidden_dropout_prob=0.1,
        attention_probs_dropout_prob=0.1,
    )
    # standalone BertEncoder misses PreTrainedModel's attn dispatch setup
    config._attn_implementation = "eager"
    encoder = BertEncoder(config)
    encoder.train()

    rng = np.random.default_rng(3)
    x = torch.tensor(rng.normal(size=(bs, length, hidden)).astype(np.float32))
    # extended additive mask, last 40 keys masked (same as the JAX bench)
    mask = torch.zeros((bs, 1, 1, length))
    mask[:, :, :, length - 40:] = -10000.0

    optim = torch.optim.Adam(encoder.parameters(), lr=1e-4)

    def step():
        optim.zero_grad()
        out = encoder(x, attention_mask=mask).last_hidden_state
        loss = (out ** 2).mean()
        loss.backward()
        optim.step()

    step()  # warmup
    n_train = 2
    start = time.perf_counter()
    for _ in range(n_train):
        step()
    elapsed = time.perf_counter() - start
    return {
        "mmt_train_samples_per_sec": bs * n_train / elapsed,
        "mmt_train_dims": (
            "HF BertEncoder (the reference MMT's encoder class) 4L/768h/8hd, "
            "bs 32, len 512, dropout 0.1, Adam (bench.py mmt_train dims)"
        ),
    }


def measure_mcan(CfgNode) -> dict:
    import torch

    torch.manual_seed(0)

    from builders.model_builder import META_ARCHITECTURE
    from utils.instance import InstanceList

    vocab = TinyVocab()
    config = mcan_config(CfgNode)
    model = META_ARCHITECTURE.get("MCAN")(config, vocab)
    model = model.to("cpu")

    batch_size, n_regions, max_q = 64, 100, vocab.max_question_length
    rng = np.random.default_rng(0)
    features = torch.tensor(
        rng.normal(size=(batch_size, n_regions, 1024)).astype(np.float32)
    )
    questions = torch.tensor(
        rng.integers(4, len(vocab), size=(batch_size, max_q)).astype(np.int64)
    )
    answers = torch.tensor(
        rng.integers(0, vocab.total_answers, size=(batch_size, 1)).astype(np.int64)
    )
    items = InstanceList()
    items.region_features = features
    items.question_tokens = questions
    items.answer = answers

    # eval throughput
    model.eval()
    with torch.no_grad():
        model(items)  # warmup
        n_iters = 10
        start = time.perf_counter()
        for _ in range(n_iters):
            model(items)
        eval_elapsed = time.perf_counter() - start
    eval_sps = batch_size * n_iters / eval_elapsed

    # train throughput
    model.train()
    optim = torch.optim.Adam(model.parameters(), lr=1e-4, betas=(0.9, 0.98))
    loss_fn = torch.nn.NLLLoss(ignore_index=0)

    def step():
        optim.zero_grad()
        out = model(items)
        loss = loss_fn(out.view(-1, vocab.total_answers), answers.view(-1))
        loss.backward()
        optim.step()

    step()  # warmup
    n_train = 5
    start = time.perf_counter()
    for _ in range(n_train):
        step()
    train_elapsed = time.perf_counter() - start
    train_sps = batch_size * n_train / train_elapsed

    return {
        "reference": "hieunghia-pat/OpenViVQA @ /root/reference",
        "hardware": "CPU (torch " + torch.__version__ + ")",
        "model": "MCAN (mcan.yaml dims: d_model=512, 3 SA + 3 GA layers)",
        "batch_size": batch_size,
        "n_regions": n_regions,
        "mcan_eval_samples_per_sec": eval_sps,
        "mcan_train_samples_per_sec": train_sps,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--only",
        choices=("mcan", "mmf_greedy", "iterative_greedy", "mmt_train"),
        default=None,
        help="measure a single anchor (default: all)",
    )
    args = parser.parse_args()

    CfgNode = install_stubs()
    sys.path.insert(0, "/root/reference")
    import builders  # noqa: F401  (populates reference registries)

    out_path = os.path.join(REPO, "BASELINE_MEASURED.json")
    result = {}
    if os.path.isfile(out_path):  # merge: keep anchors measured elsewhere
        with open(out_path) as handle:
            result = json.load(handle)

    if args.only in (None, "mcan"):
        result.update(measure_mcan(CfgNode))
    if args.only in (None, "mmf_greedy"):
        result.update(measure_mmf_greedy(CfgNode))
    if args.only in (None, "iterative_greedy"):
        result.update(measure_iterative_greedy(CfgNode))
    if args.only in (None, "mmt_train"):
        result.update(measure_mmt_train())

    with open(out_path, "w") as handle:
        json.dump(result, handle, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
