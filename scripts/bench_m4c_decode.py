"""Benchmark MMF_M4C greedy decode (quadratic vs incremental) at the
reference dims (configs/mmf_m4c.yaml: 768h / 4-layer MMT / 8 heads,
question 20 + obj 100 + ocr 100 joint stream — the decode loop the
reference runs per eval batch, /root/reference/models/mmf_m4c.py:236-256).

Timing follows the bench.py tunnel rules (CLAUDE.md): chain N dependent
decodes inside ONE jitted program and time a host fetch.

Usage: python scripts/bench_m4c_decode.py [--bs 32] [--t 12] [--chain 8]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from openvivqa_tpu.builders import META_ARCHITECTURE, populate
from openvivqa_tpu.config import ConfigNode

H, HEADS, LAYERS = 768, 8, 4
VOCAB = 5000
N_OBJ, N_OCR, QLEN = 100, 100, 20


class _Vocab:
    padding_idx, bos_idx, eos_idx, unk_idx = 0, 1, 2, 3

    def __init__(self, max_answer_length):
        self.max_answer_length = max_answer_length

    def __len__(self):
        return VOCAB


def _config(**extra):
    return ConfigNode(
        {
            "ARCHITECTURE": "MMF_M4C",
            "D_MODEL": H,
            "MMT": {
                "HIDDEN_SIZE": H,
                "NUM_HIDDEN_LAYERS": LAYERS,
                "NUM_ATTENTION_HEADS": HEADS,
            },
            # 3-layer text bert keeps compile fast while preserving the
            # decode-side shapes (the 12-layer reference TextBert adds the
            # same constant encode cost to both decode modes)
            "TEXT_BERT": {"HIDDEN_SIZE": H, "NUM_HIDDEN_LAYERS": 3},
            "OBJECT_EMBEDDING": {"D_FEATURE": 1024, "DROPOUT": 0.1},
            "OCR_EMBEDDING": {"D_FEATURE": 812, "DROPOUT": 0.1},
            "OCR_PTR_NET": {"HIDDEN_SIZE": H, "QUERY_KEY_SIZE": 768},
            **extra,
        }
    )


def _batch(bs, maxa, seed=7):
    rng = np.random.default_rng(seed)

    def feats(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32))

    q = rng.integers(4, VOCAB, (bs, QLEN)).astype(np.int32)
    q[:, -4:] = 0
    return {
        "question_tokens": jnp.asarray(q),
        "region_features": feats(bs, N_OBJ, 1024),
        "region_boxes": feats(bs, N_OBJ, 4),
        "ocr_fasttext_features": feats(bs, N_OCR, 300),
        "ocr_rec_features": feats(bs, N_OCR, 256),
        "ocr_det_features": feats(bs, N_OCR, 256),
        "ocr_boxes": feats(bs, N_OCR, 4),
        "answer_tokens": jnp.asarray(
            rng.integers(4, VOCAB + N_OCR, (bs, maxa)).astype(np.int32)
        ),
    }


def _time_decode(model, params, batch, chain):
    @jax.jit
    def decode_chain(params, batch):
        def body(carry, _):
            # feed the previous iteration's tokens back through the features
            # so XLA cannot dedupe iterations
            b = dict(batch)
            b["region_features"] = batch["region_features"] + (
                carry[:, :1, None].astype(jnp.float32) * 1e-6
            )
            out = model.apply({"params": params}, b, method="greedy_decode")
            return out["prev_inds"][:, -1:], out["prev_inds"][:, -1]

        final, _ = jax.lax.scan(
            body,
            jnp.zeros((batch["question_tokens"].shape[0], 1), jnp.int32),
            None,
            length=chain,
        )
        return final

    np.asarray(decode_chain(params, batch))  # compile + warm
    start = time.perf_counter()
    np.asarray(decode_chain(params, batch))
    elapsed = time.perf_counter() - start
    return elapsed / chain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--t", type=int, default=12)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--skip-quadratic", action="store_true")
    ap.add_argument(
        "--arch",
        default="MMF_M4C",
        help="any registered M4C-family architecture (e.g. "
        "MMF_IterativeM4C, MMF_Iterative_Multilevel_M4C)",
    )
    args = ap.parse_args()

    populate()
    build = META_ARCHITECTURE.get(args.arch)
    vocab = _Vocab(args.t)
    batch = _batch(args.bs, args.t)

    inc = build(config=_config(DECODING_MODE="incremental"), vocab=vocab)
    variables = jax.jit(
        lambda r, b: inc.init({"params": r, "dropout": r}, b, train=False)
    )(jax.random.PRNGKey(0), batch)
    params = variables["params"]

    results = {}
    per_batch = _time_decode(inc, params, batch, args.chain)
    results["incremental"] = args.bs / per_batch
    print(
        f"incremental greedy  bs={args.bs} T={args.t}: "
        f"{per_batch*1e3:.2f} ms/batch = {args.bs/per_batch:,.0f} samples/s"
    )

    if not args.skip_quadratic:
        # for MMF_M4C the comparable quadratic needs CONTEXT_BLIND (the
        # masking regime incremental implies); the Iterative family's
        # default config IS that regime already
        quad_cfg = (
            _config(CONTEXT_BLIND=True)
            if args.arch == "MMF_M4C"
            else _config()
        )
        quad = build(config=quad_cfg, vocab=vocab)
        per_batch = _time_decode(quad, params, batch, args.chain)
        results["quadratic"] = args.bs / per_batch
        print(
            f"quadratic greedy    bs={args.bs} T={args.t}: "
            f"{per_batch*1e3:.2f} ms/batch = {args.bs/per_batch:,.0f} samples/s"
        )

    if "quadratic" in results:
        print(f"speedup: {results['incremental']/results['quadratic']:.2f}x")


if __name__ == "__main__":
    main()
