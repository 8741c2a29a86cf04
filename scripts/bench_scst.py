"""On-chip SCST throughput at IterativeMCAN bench dims (VERDICT r4 item 8
— SCST was the only training mode with zero recorded perf data; its
host-synced reward loop is exactly the shape the tunnel round trips
punish).

Measures the full generate -> host CIDEr reward -> policy-gradient step
loop (training/tasks/open_ended_task.py:228-317, parity with
/root/reference/tasks/open_ended_task.py:171-208) over a synthetic
dataset at the bench model dims (d512 / 3+3 encoder layers / 2048 FF /
beam 3), plus a per-phase attribution of one batch: beam sample, host
decode+CIDEr, jitted PG step.

Usage: python scripts/bench_scst.py [--bs 64] [--images 64] [--epochs 2]
Run on a real TPU.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from openvivqa_tpu.builders import build_task, populate
from openvivqa_tpu.config import ConfigNode
from openvivqa_tpu.data.synthetic import generate_synthetic_dataset

D_MODEL, LAYERS, D_FF, HEADS = 512, 3, 2048, 8


def _attn(stateful=False):
    return {
        "ARCHITECTURE": "ScaledDotProductAttention",
        "HEAD": HEADS, "D_MODEL": D_MODEL, "D_KEY": 64, "D_VALUE": 64,
        "D_FF": D_FF, "USE_AOA": False, "CAN_BE_STATEFUL": stateful,
        "DROPOUT": 0.1,
    }


def _config(paths, ckpt_dir, bs):
    dataset = {
        "FEATURE_DATASET": {
            "TYPE": "FeatureDataset", "BATCH_SIZE": bs, "WORKERS": 2,
            "MAX_REGIONS": 36,
            "FEATURE_PATH": {"FEATURES": paths["features"]},
        },
        "DICT_DATASET": {
            "TYPE": "DictionaryDataset", "BATCH_SIZE": bs, "WORKERS": 2,
            "MAX_REGIONS": 36,
            "FEATURE_PATH": {"FEATURES": paths["features"]},
        },
        "VOCAB": {
            "TYPE": "Vocab", "TOKENIZER": None, "MIN_FREQ": 1,
            "WORD_EMBEDDING": None, "WORD_EMBEDDING_CACHE": None,
            "PAD_TOKEN": "<pad>", "BOS_TOKEN": "<bos>",
            "EOS_TOKEN": "<eos>", "UNK_TOKEN": "<unk>",
            "JSON_PATH": {
                "TRAIN": paths["train"], "DEV": paths["dev"],
                "TEST": paths["test"],
            },
        },
        "JSON_PATH": {
            "TRAIN": paths["train"], "DEV": paths["dev"],
            "TEST": paths["test"],
        },
    }
    return ConfigNode(
        {
            "TASK": "OpenEndedTask",
            "DATASET": dataset,
            "TRAINING": {
                "CHECKPOINT_PATH": ckpt_dir,
                "LEARNING_RATE": 1.0,
                "RL_LEARNING_RATE": 5e-6,
                "WARMUP": 100,
                "SCORE": "CIDEr",
                "TRAINING_BEAM_SIZE": 3,
                "EVALUATING_BEAM_SIZE": 3,
                "PATIENCE": 2,
                "MAX_EPOCHS": 1,
                "SEED": 11,
            },
            "MODEL": {
                "NAME": "scst_bench",
                "ARCHITECTURE": "IterativeMCAN",
                "DEVICE": "cuda",
                "D_MODEL": D_MODEL,
                "VISION_EMBEDDING": {
                    "ARCHITECTURE": "FeatureEmbedding",
                    "D_FEATURE": 1024, "D_MODEL": D_MODEL, "DROPOUT": 0.1,
                },
                "TEXT_EMBEDDING": {
                    "ARCHITECTURE": "UsualEmbedding",
                    "D_MODEL": D_MODEL, "D_EMBEDDING": D_MODEL,
                    "DROPOUT": 0.1, "WORD_EMBEDDING": None,
                    "WORD_EMBEDDING_CACHE": None,
                },
                "SELF_ENCODER": {
                    "ARCHITECTURE": "Encoder", "D_MODEL": D_MODEL,
                    "LAYERS": LAYERS, "SELF_ATTENTION": _attn(),
                },
                "GUIDED_ENCODER": {
                    "ARCHITECTURE": "GuidedAttentionEncoder",
                    "D_MODEL": D_MODEL, "LAYERS": LAYERS,
                    "SELF_ATTENTION": _attn(), "GUIDED_ATTENTION": _attn(),
                },
                "MULTIMODAL_FUSION": {
                    "D_MODEL": D_MODEL, "D_FF": D_FF, "DROPOUT": 0.1,
                },
                "DECODER": {
                    "ARCHITECTURE": "Decoder", "D_MODEL": D_MODEL,
                    "LAYERS": LAYERS,
                    "ATTENTION": {
                        "SELF_ATTENTION": _attn(stateful=True),
                        "ENC_ATTENTION": _attn(),
                    },
                    "TEXT_EMBEDDING": {
                        "ARCHITECTURE": "UsualEmbedding",
                        "D_MODEL": D_MODEL, "D_EMBEDDING": D_MODEL,
                        "DROPOUT": 0.1, "WORD_EMBEDDING": None,
                        "WORD_EMBEDDING_CACHE": None,
                    },
                },
            },
        }
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args()

    populate()
    with tempfile.TemporaryDirectory() as tmp:
        paths = generate_synthetic_dataset(
            os.path.join(tmp, "data"),
            n_images=args.images, n_questions_per_image=4, seed=5,
        )
        task = build_task(_config(paths, os.path.join(tmp, "ckpt"), args.bs))
        n_samples = len(task.train_dataset)
        task._switch_to_scst()

        t0 = time.perf_counter()
        task.train_scst()  # compile epoch (beam program + PG step)
        compile_epoch = time.perf_counter() - t0

        t0 = time.perf_counter()
        for _ in range(args.epochs):
            task.epoch += 1
            task.train_scst()
        warm = (time.perf_counter() - t0) / args.epochs

        import jax

        print(
            f"device={jax.devices()[0].device_kind} bs={args.bs} "
            f"beam={task.training_beam_size} d={D_MODEL} "
            f"n={n_samples} samples/epoch"
        )
        print(f"compile epoch: {compile_epoch:.1f}s; warm epoch: {warm:.2f}s")
        print(f"scst_samples_per_sec: {n_samples / warm:,.1f}")


if __name__ == "__main__":
    main()
