"""Pallas TPU fused encoder self-attention sublayer (kernel F).

Round 4's knockout put the TextBert question encode at "5.06 ms = 40.6 %"
of the MMF-greedy batch (scripts/profile_m4c_context.py at chain=8) — a
number this round showed was ~60 % tunnel-dispatch floor: the fixed
~24 ms per program invocation (CLAUDE.md) lands ~3 ms/iter on chain-8
prefixes, and the floor-free (chain=64) TextBert cost after the round-4
FFN fusion is ~0.7 ms.  The structural diagnosis still held: ~15 tiny
XLA ops per attention sublayer (3 projections, head split, logits,
softmax, context, merge, out projection, residual, LayerNorm), each
paying op latency on a 20x768 operand, and the same chain one level up
in the MMT 220-token context encode around its packed-attention call.

Kernel F collapses the WHOLE sublayer into one pallas_call per layer:
q/k/v projections, per-head softmax attention with the key-padding bias,
output projection, residual + LayerNorm.  Combined with the fused FFN
that is 2 pallas_calls per BertLayer encode instead of ~25 XLA ops.
MEASURED interleaved on v5e at MMF bench dims (bs 32, chain=64):
TextBert 0.70 -> 0.64 ms (1.09x; marginal per-layer cost ~45 us),
cumulative context prefix 4.08 -> 4.00 ms, full greedy batch neutral —
the prefix wins are real but the decode stages dominate the batch.  Kept
on by default for the prefix wins and for encode-heavy callers (deeper
stacks / longer streams scale with the per-layer op-count cut); greedy
equivalence pinned on-chip (100 % token agreement, |score diff| <=
7.5e-3).

Layout: the (b, S, h*d) input is padded to S_pad = ceil(S / 8) * 8 rows
per sample (Mosaic's second-to-last block dim must be divisible by 8 or
equal the full array dim — a bare 220-row block is illegal at b > 1) and
flattened to (b * S_pad, h*d) rows; the grid cells take `blk` samples
each as a (blk * S_pad, h*d) block.  Samples are isolated by a
block-diagonal additive mask built in-kernel from iota (row // S_pad ==
col // S_pad keeps the key bias, everything else MASK_VALUE), so multiple
20-token questions batch into one 192-row MXU matmul instead of eight
20-row ones.  Padded rows carry MASK_VALUE key bias: their weights
underflow to exactly 0.0 in f32, matching the XLA path's masked rows, and
their (garbage) output rows are sliced away by the caller.

Attention/projection dots use bf16 operands with f32 accumulation on
hardware (identical numerics to XLA's default matmul precision — the MXU
rounds f32 operands to bf16 anyway, CLAUDE.md measured facts); interpret
mode keeps f32 operands so the CPU equivalence tests compare against
true-f32 XLA dots.  Softmax and LayerNorm stay f32 on both.

Reference parity target: the HF BertLayer attention sublayer the
reference's M4C family delegates to (/root/reference/models/mmf_m4c.py
:258-280 TextBert, :282-364 MMT; pytorch_transformers BertSelfAttention +
BertSelfOutput).  Eval-only: training keeps the AD-capable XLA/packed
paths (this kernel has no VJP).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_step import _layer_norm

# keep equal to modules/masks.py MASK_VALUE (ops cannot import models)
MASK_VALUE = -10e4
_VMEM_BUDGET = 12 * 1024 * 1024


def _enc_attn_kernel(
    x_ref, bias_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
    wo_ref, bo_ref, g_ref, b_ref, y_ref, ctx_scr,
    *, scale, h, d, s, eps, interpret,
):
    x = x_ref[:]  # (R, hd) f32, R = blk * s
    rows = x.shape[0]

    def dot_w(a, w_ref, b_ref_):
        return (
            jnp.dot(
                a.astype(w_ref.dtype), w_ref[:],
                preferred_element_type=jnp.float32,
            )
            + b_ref_[0]
        )

    qp = dot_w(x, wq_ref, bq_ref)
    kp = dot_w(x, wk_ref, bk_ref)
    vp = dot_w(x, wv_ref, bv_ref)

    # block-diagonal sample isolation + key-padding bias: rows of sample i
    # may only attend keys of sample i (MASK_VALUE elsewhere, exp -> 0.0)
    kb = bias_ref[0, 0]  # (R,) f32 additive key bias
    row_s = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0) // s
    col_s = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1) // s
    bias_mat = jnp.where(row_s == col_s, kb[None, :], MASK_VALUE)

    op_dtype = jnp.float32 if interpret else jnp.bfloat16
    for i in range(h):
        q = qp[:, i * d:(i + 1) * d].astype(op_dtype)
        k = kp[:, i * d:(i + 1) * d].astype(op_dtype)
        v = vp[:, i * d:(i + 1) * d].astype(op_dtype)
        logits = (
            jax.lax.dot_general(
                q, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
            + bias_mat
        )
        row_max = jnp.max(logits, axis=-1, keepdims=True)
        unnorm = jnp.exp(logits - row_max)
        weights = (
            unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)
        ).astype(op_dtype)
        ctx_scr[:, i * d:(i + 1) * d] = jax.lax.dot_general(
            weights, v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    o = dot_w(ctx_scr[:], wo_ref, bo_ref)
    y_ref[:] = _layer_norm(x + o, g_ref[0], b_ref[0], eps)


@functools.partial(
    jax.jit, static_argnames=("scale", "h", "s", "blk", "eps", "interpret")
)
def _enc_attn_call(
    x, bias, wq, bq, wk, bk, wv, bv, wo, bo, g, b,
    scale: float, h: int, s: int, blk: int, eps: float, interpret: bool,
):
    n_rows, hd = x.shape  # (b * s, hd)
    d = hd // h
    rows = blk * s
    nb = n_rows // rows

    row_spec = pl.BlockSpec(
        (rows, hd), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    def w_spec(shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    return pl.pallas_call(
        functools.partial(
            _enc_attn_kernel,
            scale=scale, h=h, d=d, s=s, eps=eps, interpret=interpret,
        ),
        grid=(nb,),
        in_specs=[
            row_spec,
            # (nb, 1, rows) layout: a (1, rows) window of a (nb, rows) row
            # would break Mosaic's second-to-last-block-dim rule (1 is
            # neither divisible by 8 nor the full dim); the singleton
            # middle dim makes the block (1, 1, rows) trivially legal
            pl.BlockSpec(
                (1, 1, rows), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            w_spec(wq.shape), w_spec(bq.shape),
            w_spec(wk.shape), w_spec(bk.shape),
            w_spec(wv.shape), w_spec(bv.shape),
            w_spec(wo.shape), w_spec(bo.shape),
            w_spec(g.shape), w_spec(b.shape),
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, hd), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows, hd), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_rows * hd * (4 * hd + 2 * rows),
            bytes_accessed=2 * n_rows * hd * 4 + 4 * hd * hd * 4,
            transcendentals=n_rows * rows * h,
        ),
        interpret=interpret,
    )(x, bias, wq, bq, wk, bk, wv, bv, wo, bo, g, b)


def _cell_bytes(blk: int, s_pad: int, hd: int, weight_bytes: int) -> int:
    rows = blk * s_pad
    return (
        (4 * hd * hd) * weight_bytes + 6 * hd * 4  # weights (single-buffered)
        + 4 * rows * hd * 4  # x, y (double-buffered in + out)
        + 3 * rows * hd * 4  # qp/kp/vp f32 temps
        + rows * hd * 4  # ctx scratch
        + 2 * rows * 4  # key-bias block (double-buffered)
        + 4 * rows * rows * 4  # bias_mat + logits/exp/weights temps
    )


def encoder_attention_plan(
    b: int, s: int, hd: int, weight_bytes: int = 2
) -> Optional[Tuple[int, int]]:
    """(samples per grid cell, padded per-sample length) for kernel F, or
    None when no legal cell fits VMEM.  s_pad is the next multiple of 8
    (Mosaic second-to-last block dim rule); larger blk preferred — it
    turns 20-row projections into 160-row MXU matmuls."""
    s_pad = -(-s // 8) * 8
    for blk in (8, 4, 2, 1):
        if b % blk:
            continue
        if _cell_bytes(blk, s_pad, hd, weight_bytes) <= _VMEM_BUDGET:
            return blk, s_pad
    return None


def fused_encoder_self_attention(
    x, w: dict, key_bias, scale: float, h: int, eps: float,
    interpret: bool = False,
):
    """One BERT self-attention sublayer over a full sequence, fused:
    q/k/v projections, per-head softmax attention with an additive
    key-padding bias, out projection, residual + LayerNorm — ONE
    pallas_call.  x (b, S, hd) f32; key_bias (b, S) additive f32
    (0 / MASK_VALUE); w: wq,bq,wk,bk,wv,bv,wo,bo,ln_scale,ln_bias with
    matrices pre-cast to bf16 on hardware.  Returns (b, S, hd) f32.
    Shards over the data axis under a registered mesh (ops/sharding.py)."""
    from .sharding import BATCH, REP, data_shard_map, kernel_mesh

    mesh = kernel_mesh(x.shape[0])
    if mesh is not None:
        return data_shard_map(
            lambda x_, kb_, w_: fused_encoder_self_attention(
                x_, w_, kb_, scale, h, eps, interpret
            ),
            mesh,
            in_specs=(BATCH, BATCH, REP),
            out_specs=BATCH,
        )(x, key_bias, w)
    b, s, hd = x.shape
    wb = 2 if w["wq"].dtype == jnp.bfloat16 else 4
    plan = encoder_attention_plan(b, s, hd, wb)
    assert plan is not None, "guard with encoder_attention_plan"
    blk, s_pad = plan
    pad = s_pad - s
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        key_bias = jnp.pad(
            key_bias, ((0, 0), (0, pad)), constant_values=MASK_VALUE
        )
    rows = blk * s_pad
    y = _enc_attn_call(
        x.reshape(b * s_pad, hd).astype(jnp.float32),
        key_bias.reshape(b * s_pad // rows, 1, rows).astype(jnp.float32),
        w["wq"], w["bq"].reshape(1, -1),
        w["wk"], w["bk"].reshape(1, -1),
        w["wv"], w["bv"].reshape(1, -1),
        w["wo"], w["bo"].reshape(1, -1),
        w["ln_scale"].reshape(1, -1), w["ln_bias"].reshape(1, -1),
        scale, h, s_pad, blk, eps, interpret,
    )
    y = y.reshape(b, s_pad, hd)
    return y[:, :s] if pad else y
