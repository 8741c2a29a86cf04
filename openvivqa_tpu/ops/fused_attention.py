"""Pallas TPU fused attention kernels.

The hot op of every model in this framework is softmax(QK^T/sqrt(d)+bias)V
(SURVEY.md §2.4).  XLA materialises the (bs, h, q, k) logits tensor in HBM
between the two matmuls; these kernels keep the whole pipeline in VMEM.

Two kernels, tuned on a real v5e (scripts/bench_attention_shapes.py):

* `fused_attention_packed` — the production path.  Consumes the RAW dense
  projection outputs in (b, S, h*d) layout (zero host-side
  transposes/reshapes), grid over (batch, q-block), all heads per grid
  cell as static in-kernel slices, K/V blocks revisited across q-blocks so
  they are DMA'd once per batch row.  Measured vs XLA:
      ViT stream   (b64 h12 197 keys, d64):   1.46x
      BERT stream  (b64 h12 256 keys, d64):   1.38x
      MMT joint    (b64 h8  384 keys, d96):   1.82x
      MMT joint    (b32 h8  512 keys, d96):   1.74x
      MCAN region  (b64 h8  100 keys, d64):   0.79x  (XLA keeps it)
  `should_use_fused` encodes the measured ~192-key crossover; call sites
  consult it by default (OPENVIVQA_FUSED_ATTENTION=0/1 forces off/on).

* `fused_attention` — (b, h, S, d) layout compatibility wrapper: grid over
  the flattened batch*head dim, whole sequence per cell.  Useful when the
  caller already holds split-head tensors; slower than packed because the
  caller paid the split transpose.

Shared kernel rules (all measured, see git history for the losing
variants):
* NO explicit operand padding — Mosaic tracks logical shapes for native
  head dims (64/96) and odd sequence lengths (197); padding to 128 doubled
  input traffic and was why the v1 kernel lost everywhere;
* bf16 dot operands with f32 accumulation — identical numerics to XLA's
  default matmul precision (the MXU rounds f32 operands to bf16 anyway,
  CLAUDE.md measured facts) at full MXU rate;
* backward = analytic XLA gradients via custom_vjp (Pallas forward only).
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

# measured crossover vs XLA (v5e): ViT's 197-key stream wins, MCAN's
# 100-key stream does not
_MIN_WINNING_KEYS = 192
# VMEM plan budget (double-buffered blocks + logits scratch); the chip has
# ~16 MB of VMEM and Mosaic needs headroom
_VMEM_BUDGET = 12 * 1024 * 1024


def use_fused_attention() -> Optional[bool]:
    """Tri-state override: None (shape heuristic decides, the default),
    True (force on wherever supported), False (force off)."""
    flag = os.environ.get("OPENVIVQA_FUSED_ATTENTION", "").lower()
    if flag in ("1", "on", "true"):
        return True
    if flag in ("0", "off", "false"):
        return False
    return None


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False


def plan_q_block(sq: int, sk: int, hd: int, full_bias: bool) -> Optional[int]:
    """Largest q-block (whole sq preferred) whose double-buffered blocks +
    logits scratch fit the VMEM budget; None when no block works."""
    candidates = [sq] + [b for b in (512, 384, 256, 128, 64, 32, 16, 8) if sq % b == 0]
    for qblk in candidates:
        kv_bytes = 2 * sk * hd * 4 * 2
        q_bytes = 2 * qblk * hd * 4 * 2
        bias_bytes = (qblk if full_bias else 1) * sk * 4 * 2
        logits_bytes = 2 * qblk * sk * 4  # per-head scratch (+ exp temp)
        if kv_bytes + q_bytes + bias_bytes + logits_bytes <= _VMEM_BUDGET:
            return qblk
    return None


def fused_attention_wins(sq: int, sk: int, d: int) -> bool:
    """Measured decision rule: the kernel beats XLA once the key length
    clears the crossover."""
    return sk >= _MIN_WINNING_KEYS and d <= 256


def should_use_fused(sq: int, sk: int, d: int) -> bool:
    if not _on_tpu():
        return False  # Mosaic kernels only lower on the TPU backend
    override = use_fused_attention()
    if override is False:
        return False
    if override is True:
        return d <= 256
    return fused_attention_wins(sq, sk, d)


# ---------------------------------------------------------------------------
# packed kernel: (b, S, h*d) layout, all heads per grid cell
# ---------------------------------------------------------------------------
def _packed_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale, h, d):
    bias = bias_ref[0].astype(jnp.float32)  # (bq, Sk), bq in {1, qblk}
    for i in range(h):
        q = q_ref[0, :, i * d:(i + 1) * d].astype(jnp.bfloat16)
        k = k_ref[0, :, i * d:(i + 1) * d].astype(jnp.bfloat16)
        v = v_ref[0, :, i * d:(i + 1) * d].astype(jnp.bfloat16)
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
        weights = (
            unnormalised / jnp.sum(unnormalised, axis=-1, keepdims=True)
        ).astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            weights, v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, :, i * d:(i + 1) * d] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "num_heads", "q_block"))
def _packed_call(q, k, v, biasf, scale: float, num_heads: int, q_block: int):
    b, sq, hd = q.shape
    sk = k.shape[1]
    d = hd // num_heads
    bq = biasf.shape[1]
    bias_qblk = q_block if bq > 1 else 1
    nq = sq // q_block

    return pl.pallas_call(
        functools.partial(_packed_kernel, scale=scale, h=num_heads, d=d),
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec(
                (1, q_block, hd), lambda bi, qi: (bi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            # K/V index maps ignore qi: consecutive q-blocks revisit the
            # same block, so Mosaic skips the re-fetch
            pl.BlockSpec(
                (1, sk, hd), lambda bi, qi: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, sk, hd), lambda bi, qi: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bias_qblk, sk),
                (lambda bi, qi: (bi, qi, 0))
                if bias_qblk > 1
                else (lambda bi, qi: (bi, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, q_block, hd), lambda bi, qi: (bi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, sq, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * sq * sk * d,
            bytes_accessed=(q.size + k.size + v.size + q.size) * 4,
            transcendentals=b * num_heads * sq * sk,
        ),
    )(q, k, v, biasf)


def _normalise_bias_packed(bias, b: int, sq: int, sk: int):
    """(b?, 1, bq?, sk) additive bias -> (b, bq, sk) with bq in {1, sq}.
    Per-head biases are not supported by the packed kernel (the geometry/
    memory attention variants keep the XLA path)."""
    if bias is None:
        return jnp.zeros((1, 1, sk), jnp.float32), False
    if bias.ndim != 4 or bias.shape[1] != 1:
        raise ValueError(
            f"packed fused attention needs a head-shared (b,1,q,k) bias, "
            f"got {bias.shape}"
        )
    bias = bias.astype(jnp.float32)
    bb, _, bq, bk = bias.shape
    if bk != sk or (bq not in (1, sq)):
        bias = jnp.broadcast_to(bias, (bb, 1, sq, sk))
        bq = sq
    if bb == 1 and bq == 1:
        return bias[:, 0], False
    if bb != b:
        bias = jnp.broadcast_to(bias, (b, 1, bq, sk))
    return bias[:, 0], bq > 1


def packed_attention_viable(sq: int, sk: int, hd: int, num_heads: int) -> bool:
    return (
        hd % num_heads == 0
        and plan_q_block(sq, sk, hd, full_bias=True) is not None
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_attention_packed(q, k, v, bias, scale: float, num_heads: int):
    """softmax over packed projections: q (b, Sq, h*d), k/v (b, Sk, h*d),
    bias broadcastable to (b, 1, Sq, Sk) (head-shared) or None.  Returns
    (b, Sq, h*d) — the layout the output projection consumes directly."""
    return _fused_packed_impl(q, k, v, bias, scale, num_heads)


def _fused_packed_impl(q, k, v, bias, scale, num_heads):
    b, sq, hd = q.shape
    sk = k.shape[1]
    biasf, full_bias = _normalise_bias_packed(bias, b, sq, sk)
    q_block = plan_q_block(sq, sk, hd, full_bias)
    if q_block is None:
        raise ValueError(
            f"no viable q-block for packed attention (sq={sq}, sk={sk}, "
            f"hd={hd}) — guard calls with packed_attention_viable"
        )
    if biasf.shape[0] == 1 and b > 1:
        biasf = jnp.broadcast_to(biasf, (b,) + biasf.shape[1:])
    return _packed_call(q, k, v, biasf, scale, num_heads, q_block)


def _xla_packed(q, k, v, bias, scale, num_heads):
    b, sq, hd = q.shape
    sk = k.shape[1]
    d = hd // num_heads
    qh = q.reshape(b, sq, num_heads, d)
    kh = k.reshape(b, sk, num_heads, d)
    vh = v.reshape(b, sk, num_heads, d)
    logits = (
        jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32)
        * scale
    )
    if bias is not None:
        logits = logits + bias
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, vh)
    return out.reshape(b, sq, hd), weights


def _packed_fwd(q, k, v, bias, scale, num_heads):
    return _fused_packed_impl(q, k, v, bias, scale, num_heads), (q, k, v, bias)


def _packed_bwd(scale, num_heads, residuals, g):
    q, k, v, bias = residuals
    b, sq, hd = q.shape
    sk = k.shape[1]
    d = hd // num_heads
    _, weights = _xla_packed(q, k, v, bias, scale, num_heads)
    gh = g.reshape(b, sq, num_heads, d)
    vh = v.reshape(b, sk, num_heads, d)
    qh = q.reshape(b, sq, num_heads, d)
    kh = k.reshape(b, sk, num_heads, d)

    dv = jnp.einsum("bhqk,bqhd->bkhd", weights, gh)
    dw = jnp.einsum("bqhd,bkhd->bhqk", gh, vh)
    dlogits = weights * (dw - jnp.sum(dw * weights, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", dlogits, kh) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", dlogits, qh) * scale

    dbias = None
    if bias is not None:
        dbias = dlogits
        for axis, (bdim, ldim) in enumerate(zip(bias.shape, dlogits.shape)):
            if bdim == 1 and ldim != 1:
                dbias = jnp.sum(dbias, axis=axis, keepdims=True)
        dbias = dbias.astype(bias.dtype)
    return (
        dq.reshape(b, sq, hd),
        dk.reshape(b, sk, hd),
        dv.reshape(b, sk, hd),
        dbias,
    )


fused_attention_packed.defvjp(_packed_fwd, _packed_bwd)


# ---------------------------------------------------------------------------
# (b, h, S, d) layout wrapper: grid over batch*head, whole sequence per cell
# ---------------------------------------------------------------------------
def _flat_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale):
    q = q_ref[0].astype(jnp.bfloat16)  # (Sq, d)
    k = k_ref[0].astype(jnp.bfloat16)  # (Sk, d)
    v = v_ref[0].astype(jnp.bfloat16)  # (Sk, d)
    bias = bias_ref[0].astype(jnp.float32)  # (bq, Sk)

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
    weights = (
        unnormalised / jnp.sum(unnormalised, axis=-1, keepdims=True)
    ).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        weights, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "heads"))
def _fused_attention_flat(qf, kf, vf, biasf, scale: float, heads: int):
    """qf/kf/vf: (b*h, S, d); biasf: (n_bias, bq, sk) where n_bias is
    1 (constant), b (per-batch, index i//h) or b*h (per-head, index i)."""
    bh, sq, d = qf.shape
    sk = kf.shape[1]
    n_bias, bq, _ = biasf.shape

    if n_bias == 1:
        bias_index = lambda i: (0, 0, 0)  # noqa: E731
    elif n_bias == bh:
        bias_index = lambda i: (i, 0, 0)  # noqa: E731
    else:
        bias_index = lambda i: (i // heads, 0, 0)  # noqa: E731

    return pl.pallas_call(
        functools.partial(_flat_kernel, scale=scale),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, sq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, sk), bias_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, sq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), qf.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq * sk * d,
            bytes_accessed=(qf.size + kf.size + vf.size + bh * sq * d) * 4,
            transcendentals=bh * sq * sk,
        ),
    )(qf, kf, vf, biasf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    scale: float,
) -> jnp.ndarray:
    """softmax(q k^T * scale + bias) v for split-head layout.

    q: (b, h, Sq, d); k, v: (b, h, Sk, d); bias broadcastable to
    (b, h, Sq, Sk) using the additive 0/-10e4 convention (or None).
    Exact w.r.t. the XLA reference at default matmul precision.
    """
    return _fused_attention_impl(q, k, v, bias, scale)


def _fused_attention_impl(q, k, v, bias, scale):
    b, h, sq, d = q.shape
    sk = k.shape[2]

    qf = q.reshape(b * h, sq, d)
    kf = k.reshape(b * h, sk, d)
    vf = v.reshape(b * h, sk, d)

    if bias is None:
        biasf = jnp.zeros((1, 1, sk), jnp.float32)
    else:
        bias = bias.astype(jnp.float32)
        bb, bh_, bq, bk = bias.shape
        if bk != sk:
            bias = jnp.broadcast_to(bias, (bb, bh_, bq, sk))
        if bh_ > 1:  # per-head bias (geometry/memory variants)
            full = jnp.broadcast_to(bias, (b, h, bq, sk))
            biasf = full.reshape(b * h, bq, sk)
        else:
            biasf = bias[:, 0]

    out = _fused_attention_flat(qf, kf, vf, biasf, scale, h)
    return out.reshape(b, h, sq, d)


def _fwd(q, k, v, bias, scale):
    return _fused_attention_impl(q, k, v, bias, scale), (q, k, v, bias)


def _bwd(scale, residuals, g):
    q, k, v, bias = residuals
    logits = (
        jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        * scale
    )
    if bias is not None:
        logits = logits + bias
    weights = jax.nn.softmax(logits, axis=-1)

    dv = jnp.einsum("bhqk,bhqd->bhkd", weights, g)
    dw = jnp.einsum("bhqd,bhkd->bhqk", g, v)
    dlogits = weights * (dw - jnp.sum(dw * weights, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", dlogits, k) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", dlogits, q) * scale

    dbias = None
    if bias is not None:
        dbias = dlogits
        for axis, (bdim, ldim) in enumerate(zip(bias.shape, dlogits.shape)):
            if bdim == 1 and ldim != 1:
                dbias = jnp.sum(dbias, axis=axis, keepdims=True)
        dbias = dbias.astype(bias.dtype)
    return (dq, dk, dv, dbias)


fused_attention.defvjp(_fwd, _bwd)
