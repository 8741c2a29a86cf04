"""Knockout attribution of the MMF_M4C incremental-greedy pipeline at
reference dims — answers 'context encode now dominates; what inside it?'
(ROADMAP, MMF greedy 2,378 samples/s with per-step decode cost at 0.42 ms).

Stages timed as nested prefixes (same chained-dependent-iterations
methodology as bench.py; deltas between consecutive prefixes attribute
cost to the added stage):

  txt         TextBert question encode (+ output proj)
  streams     + obj/ocr FeatureBoxEncoding
  context     + MMT joint 220-token encode + per-layer K/V projection
  caches      + decode-cache init + LayerNormed gather table
  full        + T single-token decode steps + classifier/ptr-net heads

Usage: python scripts/profile_m4c_context.py [--bs 32] [--t 12] [--chain 8]
Run on a real TPU (CPU numbers do not transfer).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys

sys.path.insert(0, ".")
from scripts.bench_m4c_decode import _Vocab, _batch, _config  # noqa: E402


def _leafsum(tree):
    total = jnp.float32(0.0)
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            total = total + jnp.sum(leaf).astype(jnp.float32)
    return total


def _stage_fns(model):
    def txt(mdl, b):
        return mdl._txt(b, False)

    def streams(mdl, b):
        return mdl._mmt_streams(b, False)

    def context(mdl, b):
        s = mdl._mmt_streams(b, False)
        return mdl.mmt.encode_context(
            *s["txt"], *s["obj"], *s["ocr"],
            pre_ocr_streams=s["pre_ocr"], extra_streams=s["extra"],
        )

    def caches(mdl, b):
        s = mdl._mmt_streams(b, False)
        ctx = mdl.mmt.encode_context(
            *s["txt"], *s["obj"], *s["ocr"],
            pre_ocr_streams=s["pre_ocr"], extra_streams=s["extra"],
        )
        dc, bias_base = mdl.mmt.init_decode_caches(
            ctx, mdl.vocab.max_answer_length
        )
        table = mdl.mmt.build_dec_table(mdl._fixed_ans_emb(), s["ocr"][0])
        return dc, bias_base, table

    def full(mdl, b):
        return mdl.greedy_decode(b)

    return {
        "txt": txt,
        "streams": streams,
        "context": context,
        "caches": caches,
        "full": full,
    }


def _time_stage(model, params, batch, stage_fn, chain):
    @jax.jit
    def chain_fn(params, batch):
        def body(carry, _):
            b = dict(batch)
            # the carry must reach EVERY stage's inputs or XLA may hoist
            # the iteration as loop-invariant: float stages read
            # region_features; the txt stage reads only question_tokens,
            # so roll the batch rows by a carry-derived shift (keeps token
            # content/padding valid while forcing the data dependence)
            b["region_features"] = batch["region_features"] + carry * 1e-9
            shift = (carry * 1e12).astype(jnp.int32) % (
                batch["question_tokens"].shape[0]
            )
            b["question_tokens"] = jnp.roll(
                batch["question_tokens"], shift, axis=0
            )
            out = model.apply(
                {"params": params}, b, method=stage_fn, mutable=["cache"]
            )[0]
            return _leafsum(out) * 1e-12, None

        final, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=chain)
        return final

    float(chain_fn(params, batch))  # compile + warm
    t0 = time.perf_counter()
    float(chain_fn(params, batch))
    return (time.perf_counter() - t0) / chain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--t", type=int, default=12)
    ap.add_argument("--chain", type=int, default=8)
    args = ap.parse_args()

    from openvivqa_tpu.builders import populate
    from openvivqa_tpu.models.mmf_m4c import MMF_M4C

    populate()
    vocab = _Vocab(args.t)
    batch = _batch(args.bs, args.t)
    model = MMF_M4C(_config(DECODING_MODE="incremental"), vocab)
    variables = jax.jit(
        lambda r, b: model.init({"params": r, "dropout": r}, b, train=False)
    )(jax.random.PRNGKey(0), batch)
    params = variables["params"]

    prev = 0.0
    rows = []
    for name, fn in _stage_fns(model).items():
        per_batch = _time_stage(model, params, batch, fn, args.chain)
        rows.append((name, per_batch, per_batch - prev))
        prev = per_batch
    full_ms = rows[-1][1]
    print(f"bs={args.bs} T={args.t} chain={args.chain}  ({jax.devices()[0].device_kind})")
    print(f"{'stage':<10}{'cum ms':>10}{'delta ms':>10}{'share':>8}")
    for name, cum, delta in rows:
        print(
            f"{name:<10}{cum*1e3:>10.2f}{delta*1e3:>10.2f}"
            f"{delta/full_ms:>8.1%}"
        )
    print(f"throughput: {args.bs/full_ms:,.0f} samples/s")


if __name__ == "__main__":
    main()
