"""Attribute the MMT 220-token context-encode cost at MMF bench dims
(knockout at chain=64: `context` = 4.67 ms of the 9.13 ms MMF greedy
batch, the largest stage — VERDICT r4 item 3): attention sublayer vs FFN
sublayer vs the per-layer K/V projections, plus the fused-FFN-kernel
candidate (fused_ffn_step on flattened (bs*S, h) rows with bf16 weights).

Usage: python scripts/profile_mmt_encode.py [--bs 32] [--s 220] [--chain 64]
Run on a real TPU (CPU numbers do not transfer).  Set
OPENVIVQA_FUSED_ATTENTION=0 to A/B the packed attention kernel off.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from openvivqa_tpu.models.modules.bert import (
    LN_EPS,
    BertEncoderStack,
    BertSelfAttention,
)
from openvivqa_tpu.models.modules.masks import MASK_VALUE

H, HEADS, LAYERS = 768, 8, 4


def _time(fn, x, *rest, chain=64):
    @jax.jit
    def chained(x, *rest):
        def body(carry, _):
            out = fn(x + carry * 1e-9, *rest)
            return jnp.mean(out).astype(jnp.float32), None

        final, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=chain)
        return final

    float(chained(x, *rest))
    start = time.perf_counter()
    float(chained(x, *rest))
    return (time.perf_counter() - start) / chain * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--s", type=int, default=220)
    ap.add_argument("--chain", type=int, default=64)
    args = ap.parse_args()
    bs, s = args.bs, args.s
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(bs, s, H)).astype(np.float32))
    cb = np.zeros((bs, 1, 1, s), np.float32)
    cb[:, :, :, s - 20:] = MASK_VALUE
    col_bias = jnp.asarray(cb)

    stack = BertEncoderStack(hidden_size=H, num_layers=LAYERS, num_heads=HEADS)
    sv = jax.jit(stack.init)(jax.random.PRNGKey(0), x, attention_bias=col_bias)

    def full(x_, v):
        return stack.apply(v, x_, attention_bias=col_bias)

    ms_full = _time(full, x, sv, chain=args.chain)
    print(f"BertEncoderStack x{LAYERS} @({bs},{s},{H}): {ms_full:.3f} ms")

    def ctx(x_, v):
        out, layer_inputs = stack.apply(
            v, x_, attention_bias=col_bias, return_layer_inputs=True
        )
        kvs = stack.apply(v, layer_inputs, method="project_context")
        total = jnp.mean(out)
        for k, v_ in kvs:
            total = total + jnp.mean(k) + jnp.mean(v_)
        return total

    ms_ctx = _time(ctx, x, sv, chain=args.chain)
    print(
        f"+ project_context (8 K/V proj): {ms_ctx:.3f} ms "
        f"(delta {ms_ctx - ms_full:.3f})"
    )

    # single sublayers (one layer's worth; multiply by LAYERS mentally)
    attn = BertSelfAttention(hidden_size=H, num_heads=HEADS)
    av = jax.jit(attn.init)(jax.random.PRNGKey(0), x, attention_bias=col_bias)

    def attn_fn(x_, v):
        return attn.apply(v, x_, attention_bias=col_bias)

    ms = _time(attn_fn, x, av, chain=args.chain)
    print(f"BertSelfAttention x1: {ms:.3f} ms  (x{LAYERS} = {ms*LAYERS:.3f})")

    from flax import linen as nn

    class _FFNOnly(nn.Module):
        @nn.compact
        def __call__(self, x_):
            h = jax.nn.gelu(
                nn.Dense(4 * H, name="Dense_0")(x_), approximate=False
            )
            o = nn.Dense(H, name="Dense_1")(h)
            return nn.LayerNorm(epsilon=LN_EPS, name="LayerNorm_0")(x_ + o)

    ffn = _FFNOnly()
    fv = jax.jit(ffn.init)(jax.random.PRNGKey(0), x)

    def ffn_fn(x_, v):
        return ffn.apply(v, x_)

    ms = _time(ffn_fn, x, fv, chain=args.chain)
    print(f"XLA FFN sublayer x1: {ms:.3f} ms  (x{LAYERS} = {ms*LAYERS:.3f})")

    # fused-FFN-kernel candidate: flatten rows, bf16 weights hoisted
    from openvivqa_tpu.ops.decode_step import ffn_step_viable, fused_ffn_step

    p = fv["params"]
    w1 = p["Dense_0"]["kernel"].astype(jnp.bfloat16)
    b1 = p["Dense_0"]["bias"]
    w2 = p["Dense_1"]["kernel"].astype(jnp.bfloat16)
    b2 = p["Dense_1"]["bias"]
    g, b = p["LayerNorm_0"]["scale"], p["LayerNorm_0"]["bias"]
    blk = ffn_step_viable(bs * s, H, 4 * H, 2)
    print(f"ffn_step_viable({bs*s}, {H}, {4*H}, bf16) -> blk={blk}")
    if blk is not None:

        def ffn_kernel(x_, w1, b1, w2, b2, g, b):
            flat = x_.reshape(-1, H)
            return fused_ffn_step(flat, w1, b1, w2, b2, g, b, eps=LN_EPS)

        ms = _time(ffn_kernel, x, w1, b1, w2, b2, g, b, chain=args.chain)
        print(f"fused_ffn_step same shape: {ms:.3f} ms  (x{LAYERS} = {ms*LAYERS:.3f})")


if __name__ == "__main__":
    main()
