"""Interleaved A/B of kernel F (fused encoder self-attention sublayer,
ops/encoder_layer.py) on the MMF_M4C incremental greedy pipeline at
reference dims — the VERDICT r4 item-2 lever (TextBert question encode =
40.6 % of the batch, MMT context encode = 34.3 %, both op-latency-bound).

Builds TWO separately-traced greedy chains (env flags are read at trace
time), then times them interleaved A/B/A/B — tunnel throughput drifts
~25 % between sessions, so only interleaved pairs are comparable
(CLAUDE.md measured facts).  Also knocks out the `txt` and `context`
prefix stages under both flags to attribute where the delta lands.

Usage: python scripts/bench_encode_attn.py [--bs 32] [--t 12] [--chain 8]
        [--rounds 3] [--stages]
Run on a real TPU.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from openvivqa_tpu.builders import populate
from scripts.bench_m4c_decode import _Vocab, _batch, _config  # noqa: E402
from scripts.profile_m4c_context import _leafsum, _stage_fns  # noqa: E402


def _build_chain(model, stage_fn, batch, chain):
    """One jitted chained-stage program (traced under the CURRENT env)."""

    @jax.jit
    def chain_fn(params, batch):
        def body(carry, _):
            b = dict(batch)
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

    return chain_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--t", type=int, default=12)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument(
        "--stages", action="store_true",
        help="also A/B the txt and context knockout prefixes",
    )
    args = ap.parse_args()

    populate()
    from openvivqa_tpu.models.mmf_m4c import MMF_M4C

    vocab = _Vocab(args.t)
    batch = _batch(args.bs, args.t)
    model = MMF_M4C(_config(DECODING_MODE="incremental"), vocab)
    variables = jax.jit(
        lambda r, b: model.init({"params": r, "dropout": r}, b, train=False)
    )(jax.random.PRNGKey(0), batch)
    params = variables["params"]

    stage_fns = _stage_fns(model)
    stages = ["txt", "context", "full"] if args.stages else ["full"]

    programs = {}
    for flag, label in (("1", "on"), ("0", "off")):
        os.environ["OPENVIVQA_ENCODE_ATTN"] = flag
        for stage in stages:
            fn = _build_chain(model, stage_fns[stage], batch, args.chain)
            float(fn(params, batch))  # compile + warm under this env
            programs[(stage, label)] = fn
    os.environ.pop("OPENVIVQA_ENCODE_ATTN", None)

    times = {key: [] for key in programs}
    for _ in range(args.rounds):
        for key, fn in programs.items():
            t0 = time.perf_counter()
            float(fn(params, batch))
            times[key].append((time.perf_counter() - t0) / args.chain * 1e3)

    print(
        f"bs={args.bs} T={args.t} chain={args.chain} rounds={args.rounds}"
        f"  ({jax.devices()[0].device_kind})"
    )
    for stage in stages:
        on = statistics.median(times[(stage, "on")])
        off = statistics.median(times[(stage, "off")])
        print(
            f"{stage:<10} fused {on:7.2f} ms/batch   xla {off:7.2f} ms/batch"
            f"   {off/on:5.2f}x   ({args.bs/on*1e3:,.0f} samples/s fused)"
        )


if __name__ == "__main__":
    main()
