"""Attribute the TextBert question-encode cost at MMF bench dims
(knockout showed 4.49 ms of the 12.46 ms MMF greedy batch in `txt`):
embeddings vs per-layer encoder cost vs the raw gather primitive.

Usage: python scripts/profile_textbert.py [--bs 32] [--chain 16]
"""

from __future__ import annotations

import argparse
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from openvivqa_tpu.models.modules.bert import BertEmbeddings, BertEncoderStack
from openvivqa_tpu.models.modules.masks import padding_bias

H, HEADS, QLEN, VOCAB = 768, 8, 20, 30522


def _time(fn, *args, chain=16):
    @jax.jit
    def chained(*a):
        def body(carry, _):
            out = fn(carry, *a[1:])
            # feed a scalar of the output back so XLA cannot dedupe
            return carry * 0 + (
                a[0] + jnp.mean(out).astype(a[0].dtype) * 0
                if jnp.issubdtype(a[0].dtype, jnp.floating)
                else a[0]
            ), jnp.mean(out)

        _, outs = jax.lax.scan(body, a[0], None, length=chain)
        return jnp.sum(outs)

    np.asarray(chained(*args))
    start = time.perf_counter()
    np.asarray(chained(*args))
    return (time.perf_counter() - start) / chain * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--chain", type=int, default=16)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, 5000, (args.bs, QLEN)).astype(np.int32))
    bias = padding_bias(ids, 0)
    x = jnp.asarray(rng.normal(size=(args.bs, QLEN, H)).astype(np.float32))

    emb = BertEmbeddings(vocab_size=VOCAB, hidden_size=H)
    ev = jax.jit(emb.init)(jax.random.PRNGKey(0), ids)

    def emb_fn(ids_, v):
        return emb.apply(v, ids_)

    ms = _time(emb_fn, ids, ev, chain=args.chain)
    print(f"BertEmbeddings (3 nn.Embed + LN): {ms:.3f} ms")

    for layers in (1, 3):
        enc = BertEncoderStack(hidden_size=H, num_layers=layers, num_heads=HEADS)
        v = jax.jit(enc.init)(jax.random.PRNGKey(0), x, attention_bias=bias)

        def enc_fn(x_, v_):
            return enc.apply(v_, x_, attention_bias=bias)

        ms = _time(enc_fn, x, v, chain=args.chain)
        print(f"BertEncoderStack x{layers} @(bs,{QLEN},{H}): {ms:.3f} ms")

    # raw primitive comparison: gather vs one-hot matmul for the word table
    table = jnp.asarray(rng.normal(size=(VOCAB, H)).astype(np.float32))
    flat = ids.reshape(-1)

    def take_fn(f, t):
        return jnp.take(t, f, axis=0)

    ms = _time(take_fn, flat, table, chain=args.chain)
    print(f"jnp.take {flat.shape[0]} rows of ({VOCAB},{H}): {ms:.3f} ms")

    def onehot_fn(f, t):
        oh = jax.nn.one_hot(f, VOCAB, dtype=jnp.float32)
        return jax.lax.dot_general(
            oh, t, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )

    ms = _time(onehot_fn, flat, table, chain=args.chain)
    print(f"one-hot HIGHEST matmul same lookup: {ms:.3f} ms")

    from openvivqa_tpu.ops.gather import take_rows_shared

    def trs_fn(i, t):
        return take_rows_shared(t, i)

    ms = _time(trs_fn, ids, table, chain=args.chain)
    print(f"ops.gather.take_rows_shared same lookup: {ms:.3f} ms")


if __name__ == "__main__":
    main()
