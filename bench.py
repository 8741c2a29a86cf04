#!/usr/bin/env python
"""Headline benchmark: MCAN eval throughput (samples/sec/chip).

Matches the north-star metric in BASELINE.md (driver-defined: VQA eval
samples/sec/chip, target >= 10x the reference CPU eval throughput).  The
reference anchor was measured with scripts/measure_reference_baseline.py on
the same dims (MCAN @ mcan.yaml: d_model=512, 3 SA + 3 GA layers, batch 64,
100 regions x 1024-d features) and stored in BASELINE_MEASURED.json.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline = our samples/sec / reference CPU samples/sec  (>=10 is target).
"""

import json
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))


def main():
    import jax
    import jax.numpy as jnp

    from openvivqa_tpu.builders import populate
    from openvivqa_tpu.config import ConfigNode
    from openvivqa_tpu.models.mcan import MCAN

    populate()

    class BenchVocab:
        padding_idx, bos_idx, eos_idx, unk_idx = 0, 1, 2, 3
        total_answers = 300
        max_question_length = 16
        max_answer_length = 12
        word_embeddings = None

        def __len__(self):
            return 1000

    attn = {
        "ARCHITECTURE": "ScaledDotProductAttention",
        "HEAD": 8, "D_MODEL": 512, "D_KEY": 64, "D_VALUE": 64, "D_FF": 2048,
        "USE_AOA": False, "CAN_BE_STATEFUL": False, "DROPOUT": 0.1,
    }
    config = ConfigNode(
        {
            "ARCHITECTURE": "MCAN",
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
                "SELF_ATTENTION": attn,
            },
            "GUIDED_ENCODER": {
                "ARCHITECTURE": "GuidedAttentionEncoder", "D_MODEL": 512,
                "LAYERS": 3, "SELF_ATTENTION": attn, "GUIDED_ATTENTION": attn,
            },
            "VISION_ATTR_REDUCE": {"D_MODEL": 512, "DROPOUT": 0.1},
            "TEXT_ATTR_REDUCE": {"D_MODEL": 512, "DROPOUT": 0.1},
        }
    )
    vocab = BenchVocab()
    model = MCAN(config, vocab)

    batch_size, n_regions, max_q = 64, 100, vocab.max_question_length
    rng = np.random.default_rng(0)
    batch = {
        "region_features": jnp.asarray(
            rng.normal(size=(batch_size, n_regions, 1024)).astype(np.float32)
        ),
        "question_tokens": jnp.asarray(
            rng.integers(4, len(vocab), size=(batch_size, max_q)).astype(np.int32)
        ),
    }

    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch
    )
    params = variables["params"]

    # NOTE on methodology: over the axon tunnel, repeated identical dispatches
    # can be deduplicated and block_until_ready is unreliable, so we chain N
    # forwards inside one XLA program (each iteration perturbs the input with
    # the previous output's mean, forcing real sequential execution) and time
    # a host fetch of the final scalar.
    from functools import partial

    @partial(jax.jit, static_argnames="n")
    def eval_chain(params, batch, n):
        def body(carry, _):
            feats = batch["region_features"] + carry
            out = model.apply(
                {"params": params},
                {**batch, "region_features": feats},
                train=False,
            )
            return jnp.mean(out) * 1e-12, None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return carry

    float(eval_chain(params, batch, 2))  # compile small chain (warmup)
    # 200 chained batches amortize the one dispatch+fetch round trip (~20ms
    # over the tunnel) to noise: measured 2.79 ms/iter at n=30 vs 2.00 at
    # n=200 — the latter is the true steady-state device throughput
    n_iters = 200
    float(eval_chain(params, batch, n_iters))  # compile the timed chain
    start = time.perf_counter()
    float(eval_chain(params, batch, n_iters))
    elapsed = time.perf_counter() - start
    sps = batch_size * n_iters / elapsed

    baseline_path = os.path.join(REPO, "BASELINE_MEASURED.json")
    vs_baseline = None
    if os.path.isfile(baseline_path):
        with open(baseline_path) as handle:
            anchor = json.load(handle)
        ref = anchor.get("mcan_eval_samples_per_sec")
        if ref:
            vs_baseline = sps / ref

    print(
        json.dumps(
            {
                "metric": "mcan_eval_samples_per_sec_per_chip",
                "value": round(sps, 2),
                "unit": "samples/sec/chip",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
