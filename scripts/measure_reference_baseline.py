#!/usr/bin/env python
"""Measure the PyTorch reference's CPU throughput (the comparison anchor,
BASELINE.md: baselines must be produced, not quoted).

Loads the reference package from /root/reference with stub modules for its
missing deps (yacs, pytorch_transformers), builds its MCAN at the
mcan.yaml dims (D_MODEL=512, 3 SA + 3 GA layers, LSTM text embedding, 1024-d
region features), and times eval forward and train step on CPU.

Writes BASELINE_MEASURED.json at the repo root.  Run once:
    python scripts/measure_reference_baseline.py
"""

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


def main():
    CfgNode = install_stubs()
    sys.path.insert(0, "/root/reference")
    import torch

    torch.manual_seed(0)

    import builders  # noqa: F401  (populates reference registries)
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

    result = {
        "reference": "hieunghia-pat/OpenViVQA @ /root/reference",
        "hardware": "CPU (torch " + torch.__version__ + ")",
        "model": "MCAN (mcan.yaml dims: d_model=512, 3 SA + 3 GA layers)",
        "batch_size": batch_size,
        "n_regions": n_regions,
        "mcan_eval_samples_per_sec": eval_sps,
        "mcan_train_samples_per_sec": train_sps,
    }
    out_path = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(out_path, "w") as handle:
        json.dump(result, handle, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
