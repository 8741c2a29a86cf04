"""Pallas TPU fused attention kernel.

The hot op of every model in this framework is softmax(QK^T/sqrt(d)+bias)V
over short-to-medium sequences (16..~600 tokens, d_head 64; SURVEY.md §2.4).
XLA materialises the (bs, h, q, k) logits in HBM between the two matmuls;
this kernel keeps the whole tile pipeline in VMEM: for each (batch, head,
q-block) grid cell it loads the full K/V rows (they fit VMEM at these
lengths), computes logits + additive bias, a numerically-stable softmax and
the PV product in one pass, writing only the (bq, d) output block.

Masking is the framework-wide additive 0/-10e4 bias, broadcast over any of
(bs, h, q); sequence lengths are padded to tile multiples inside the wrapper
with -10e4 key-padding so results are exact.

Use `use_fused_attention()` to check availability (TPU backend + supported
shapes); the MultiHeadAttention cores call through `fused_attention` with
automatic XLA fallback.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -10e4

_BLOCK_Q = 128
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def use_fused_attention() -> bool:
    """Opt-in (OPENVIVQA_FUSED_ATTENTION=1).

    Measured on v5e MCAN eval (batch 64, 100 regions, d_head 64): the XLA
    path runs 23.1k samples/s vs 12.3k with this kernel — at these short,
    unaligned sequence lengths the tile padding (100->128 keys, 64->128
    head dim) costs more than the saved HBM logits round-trip, and XLA's
    fusion is already near-roofline.  The kernel exists for long-sequence
    workloads (512+ keys, d_head 128) where the balance flips.
    """
    flag = os.environ.get("OPENVIVQA_FUSED_ATTENTION", "0").lower()
    return flag in ("1", "on", "true")


def _attention_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale):
    q = q_ref[0, 0].astype(jnp.float32)  # (bq, d)
    k = k_ref[0, 0].astype(jnp.float32)  # (Sk, d)
    v = v_ref[0, 0].astype(jnp.float32)  # (Sk, d)
    bias = bias_ref[0, 0].astype(jnp.float32)  # (bq, Sk)

    logits = (
        jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
        + bias
    )
    row_max = jnp.max(logits, axis=-1, keepdims=True)
    unnormalised = jnp.exp(logits - row_max)
    denom = jnp.sum(unnormalised, axis=-1, keepdims=True)
    weights = unnormalised / denom
    out = jax.lax.dot_general(
        weights, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0, 0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def _fused_attention_padded(q, k, v, bias, scale: float):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q = min(_BLOCK_Q, sq)
    grid = (b, h, sq // block_q)

    def q_index(bi, hi, qi):
        return (bi, hi, qi, 0)

    def kv_index(bi, hi, qi):
        return (bi, hi, 0, 0)

    bias_b = 0 if bias.shape[0] == 1 else None
    bias_h = 0 if bias.shape[1] == 1 else None
    bias_q = 0 if bias.shape[2] == 1 else None

    def bias_index(bi, hi, qi):
        return (
            0 if bias_b == 0 else bi,
            0 if bias_h == 0 else hi,
            0 if bias_q == 0 else qi,
            0,
        )

    bias_block_q = 1 if bias.shape[2] == 1 else block_q

    return pl.pallas_call(
        functools.partial(_attention_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), q_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk, d), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk, d), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, bias_block_q, sk), bias_index, memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), q_index, memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d,
            bytes_accessed=(q.size + k.size + v.size + b * h * sq * d) * 4,
            transcendentals=b * h * sq * sk,
        ),
    )(q, k, v, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    scale: float,
) -> jnp.ndarray:
    """softmax(q k^T * scale + bias) v with VMEM-resident fusion.

    q: (b, h, Sq, d); k, v: (b, h, Sk, d); bias broadcastable to
    (b, h, Sq, Sk) using the additive 0/-10e4 convention (or None).
    Pads Sq/Sk/d to tile multiples; exact w.r.t. the XLA reference.
    Differentiable: the backward pass recomputes the softmax with XLA ops
    and applies the analytic attention gradients (custom VJP — Pallas
    forward, XLA backward).
    """
    return _fused_attention_impl(q, k, v, bias, scale)


def _fused_attention_impl(q, k, v, bias, scale):
    b, h, sq, d = q.shape
    sk = k.shape[2]

    sq_pad = _round_up(max(sq, 8), 8 if sq <= _BLOCK_Q else _BLOCK_Q)
    if sq_pad > _BLOCK_Q:
        sq_pad = _round_up(sq, _BLOCK_Q)
    sk_pad = _round_up(sk, _LANE)
    d_pad = _round_up(d, _LANE)

    if bias is None:
        bias = jnp.zeros((1, 1, 1, sk), q.dtype)
    bias = bias.astype(jnp.float32)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, sk_pad - sk), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, sk_pad - sk), (0, d_pad - d)))
    # padded keys must never win the softmax
    biasp = jnp.pad(
        bias,
        (
            (0, 0), (0, 0),
            (0, (sq_pad - sq) if bias.shape[2] > 1 else 0),
            (0, sk_pad - sk),
        ),
        constant_values=MASK_VALUE,
    )

    out = _fused_attention_padded(qp, kp, vp, biasp, scale)
    return out[:, :, :sq, :d]


def _softmax_probs(q, k, bias, scale):
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        logits = logits + bias
    return jax.nn.softmax(logits, axis=-1)


def _fused_attention_fwd(q, k, v, bias, scale):
    return _fused_attention_impl(q, k, v, bias, scale), (q, k, v, bias)


def _fused_attention_bwd(scale, residuals, g):
    q, k, v, bias = residuals
    probs = _softmax_probs(q, k, bias, scale)  # (b,h,q,k)
    g = g.astype(probs.dtype)
    dv = jnp.einsum("bhqk,bhqd->bhkd", probs, g)
    dprobs = jnp.einsum("bhqd,bhkd->bhqk", g, v)
    dlogits = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", dlogits, k) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", dlogits, q) * scale
    if bias is None:
        dbias = None
    else:
        dbias = dlogits
        for axis in range(4):
            if bias.shape[axis] == 1 and dlogits.shape[axis] != 1:
                dbias = jnp.sum(dbias, axis=axis, keepdims=True)
        dbias = dbias.astype(bias.dtype)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), dbias


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)
