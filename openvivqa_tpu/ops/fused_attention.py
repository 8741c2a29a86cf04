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

* `fused_attention_packed_dropout` — the packed kernel with IN-KERNEL
  attention-weights dropout for training: masks come from the TPU hardware
  PRNG in fixed 64-row q-tiles seeded by absolute (batch, head, q-tile)
  coordinates, so the Pallas backward regenerates bit-identical masks from
  the same seed under a DIFFERENT q-block partition (fwd blocks large, bwd
  blocks small + bf16 inputs to fit the scoped-vmem stack).  No
  (b, h, q, k) mask tensor ever touches HBM.  Measured on v5e at the MMT
  train shape (b32 h8 512 keys d96, rate 0.1): 1.82x over the XLA
  dropout-attention fwd+bwd, 1.46x on the full 4-layer MMT train step.
  Gradient correctness: directional finite differences on hardware
  (scripts/validate_dropout_kernel.py; CPU interpret mode stubs the PRNG).

* `fused_attention_packed_streamed` — flash-style key streaming for
  sequences whose full-key blocks exceed VMEM (>~640 keys at hd 768):
  online softmax over (q-block, k-block) grid cells with running
  (max, sum, acc) scratch carried across the innermost key dimension.
  Measured vs XLA on v5e (scripts/bench_streamed_attention.py):
      joint 768  (b16 h12 hd768):  1.38x
      joint 1024 (b16 h12 hd768):  1.68x   (packed not viable)
      joint 1024 (b16 h8  hd512):  1.74x
      joint 1536 (b8  h12 hd768):  1.77x
      cross 512q/2048k (h12 hd768): 1.53x
  Call sites fall through packed -> streamed -> XLA via the
  `*_viable` guards (attentions.py).

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

# keep equal to modules/masks.py MASK_VALUE (and the copy in
# ops/decode_step.py) — ops cannot import from models without a cycle
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


def flat_attention_viable(sq: int, sk: int, d: int) -> bool:
    """The (b*h,) flat kernel holds the whole (Sq, Sk) logits tile plus
    three (S, d) operands in one grid cell — guard the per-cell VMEM."""
    cell = (sq * sk * 4) * 2 + (sq + 2 * sk) * d * 4 * 2 + sq * d * 4
    return cell <= 8 * 1024 * 1024


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


def _bias_index_map_2d(bias_b: int, bias_qblk: int):
    """Packed-kernel bias index map over grid (b, nq): batch-shared biases
    (bias_b == 1) clamp the batch index instead of being broadcast to
    (b, ...) in HBM before the call (round-3 review finding)."""
    if bias_b > 1:
        return (
            (lambda bi, qi: (bi, qi, 0))
            if bias_qblk > 1
            else (lambda bi, qi: (bi, 0, 0))
        )
    return (
        (lambda bi, qi: (0, qi, 0))
        if bias_qblk > 1
        else (lambda bi, qi: (0, 0, 0))
    )


def _bias_index_map_3d(bias_b: int, bias_qblk: int):
    """Streaming-kernel bias index map over grid (b, nq, nk)."""
    if bias_b > 1:
        return (
            (lambda bi, qi, ki: (bi, qi, ki))
            if bias_qblk > 1
            else (lambda bi, qi, ki: (bi, 0, ki))
        )
    return (
        (lambda bi, qi, ki: (0, qi, ki))
        if bias_qblk > 1
        else (lambda bi, qi, ki: (0, 0, ki))
    )


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
                _bias_index_map_2d(biasf.shape[0], bias_qblk),
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
    """(b?, 1, bq?, sk) additive bias -> (bb, bq, sk) with bb in {1, b} and
    bq in {1, sq}.  The BATCH dim is deliberately NOT broadcast: the kernel
    BlockSpec index maps clamp the batch index for batch-shared biases
    (`_bias_index_map_2d`/`_3d`), so a shared causal/prefix mask never
    materialises (b, sq, sk) in HBM.  Per-head biases are not supported by
    the packed kernel (the geometry/memory attention variants keep the XLA
    path)."""
    if bias is None:
        return jnp.zeros((1, 1, sk), jnp.float32), False
    if bias.ndim != 4 or bias.shape[1] != 1:
        raise ValueError(
            f"packed fused attention needs a head-shared (b,1,q,k) bias, "
            f"got {bias.shape}"
        )
    bias = bias.astype(jnp.float32)
    bb, _, bq, bk = bias.shape
    if bb not in (1, b):
        raise ValueError(
            f"bias batch dim {bb} is neither 1 nor the batch size {b}"
        )
    if bk != sk or (bq not in (1, sq)):
        bias = jnp.broadcast_to(bias, (bb, 1, sq, sk))
        bq = sq
    return bias[:, 0], bq > 1


def packed_attention_viable(sq: int, sk: int, hd: int, num_heads: int) -> bool:
    return (
        hd % num_heads == 0
        and plan_q_block(sq, sk, hd, full_bias=True) is not None
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused_attention_packed_core(q, k, v, bias, scale: float, num_heads: int):
    return _fused_packed_impl(q, k, v, bias, scale, num_heads)


def fused_attention_packed(q, k, v, bias, scale: float, num_heads: int):
    """softmax over packed projections: q (b, Sq, h*d), k/v (b, Sk, h*d),
    bias broadcastable to (b, 1, Sq, Sk) (head-shared) or None.  Returns
    (b, Sq, h*d) — the layout the output projection consumes directly.

    Under a registered multi-device mesh (ops/sharding.py) the call routes
    through shard_map over the data axis — each chip runs the kernel on
    its batch shard; GSPMD would otherwise treat the pallas_call as opaque
    and replicate the full batch onto every chip (VERDICT r4 item 4)."""
    from .sharding import BATCH, REP, data_shard_map, kernel_mesh

    mesh = kernel_mesh(q.shape[0])
    if mesh is not None:
        bias_spec = (
            BATCH
            if bias is not None and bias.shape[0] == q.shape[0]
            else REP
        )
        # statics bound via closure: custom_vjp nondiff args must stay
        # positional
        return data_shard_map(
            lambda q_, k_, v_, b_: _fused_attention_packed_core(
                q_, k_, v_, b_, scale, num_heads
            ),
            mesh,
            in_specs=(BATCH, BATCH, BATCH, bias_spec),
            out_specs=BATCH,
        )(q, k, v, bias)
    return _fused_attention_packed_core(q, k, v, bias, scale, num_heads)


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
        dq.reshape(b, sq, hd).astype(q.dtype),
        dk.reshape(b, sk, hd).astype(k.dtype),
        dv.reshape(b, sk, hd).astype(v.dtype),
        dbias,
    )


_fused_attention_packed_core.defvjp(_packed_fwd, _packed_bwd)


# ---------------------------------------------------------------------------
# key-streaming (flash-style) packed kernel: online-softmax over key blocks
# for sequences whose full-key blocks exceed VMEM (>~640 keys at hd 768 —
# ROADMAP's named remaining kernel gap / VERDICT r2 item 9).  Running
# (max, sum, acc) live in scratch that persists across the innermost key
# grid dimension; the output block is finalised on the last key block.
# ---------------------------------------------------------------------------
def _streamed_kernel(
    q_ref, k_ref, v_ref, bias_ref, out_ref, m_s, l_s, acc_s,
    *, scale, h, d,
):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    bias = bias_ref[0].astype(jnp.float32)  # (bq, kblk)

    @pl.when(ki == 0)
    def _init():
        m_s[:] = jnp.full_like(m_s, -1e30)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

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
        m_old = m_s[:, i:i + 1]
        m_new = jnp.maximum(m_old, jnp.max(logits, axis=-1, keepdims=True))
        correction = jnp.exp(m_old - m_new)
        p = jnp.exp(logits - m_new)
        l_new = l_s[:, i:i + 1] * correction + jnp.sum(
            p, axis=-1, keepdims=True
        )
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_s[:, i * d:(i + 1) * d] = (
            acc_s[:, i * d:(i + 1) * d] * correction + pv
        )
        m_s[:, i:i + 1] = m_new
        l_s[:, i:i + 1] = l_new

    @pl.when(ki == nk - 1)
    def _finalise():
        for i in range(h):
            out_ref[0, :, i * d:(i + 1) * d] = (
                acc_s[:, i * d:(i + 1) * d] / l_s[:, i:i + 1]
            ).astype(out_ref.dtype)


def plan_streamed_blocks(sq: int, sk: int, hd: int, h: int):
    """(q_block, k_block) whose resident buffers fit VMEM, or None.  Key
    blocks must divide sk (no masking of ragged tails in-kernel)."""
    for qblk in [b for b in (256, 128, 64, 32, 16, 8) if sq % b == 0] or [sq]:
        for kblk in (512, 384, 256, 128, 64):
            if sk % kblk or sk <= kblk:
                continue
            kv_bytes = 2 * kblk * hd * 4 * 2
            q_bytes = 2 * qblk * hd * 4 * 2
            bias_bytes = qblk * kblk * 4 * 2
            scratch = (2 * h * qblk + qblk * hd + 2 * qblk * kblk) * 4
            if kv_bytes + q_bytes + bias_bytes + scratch <= _VMEM_BUDGET:
                return qblk, kblk
    return None


def streamed_attention_viable(sq: int, sk: int, hd: int, h: int) -> bool:
    return hd % h == 0 and plan_streamed_blocks(sq, sk, hd, h) is not None


@functools.partial(
    jax.jit, static_argnames=("scale", "num_heads", "q_block", "k_block")
)
def _streamed_call(q, k, v, biasf, scale, num_heads, q_block, k_block):
    b, sq, hd = q.shape
    sk = k.shape[1]
    d = hd // num_heads
    bq = biasf.shape[1]
    bias_qblk = q_block if bq > 1 else 1
    grid = (b, sq // q_block, sk // k_block)

    return pl.pallas_call(
        functools.partial(_streamed_kernel, scale=scale, h=num_heads, d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, q_block, hd), lambda bi, qi, ki: (bi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, k_block, hd), lambda bi, qi, ki: (bi, ki, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, k_block, hd), lambda bi, qi, ki: (bi, ki, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bias_qblk, k_block),
                _bias_index_map_3d(biasf.shape[0], bias_qblk),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, q_block, hd), lambda bi, qi, ki: (bi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, sq, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((q_block, num_heads), jnp.float32),
            pltpu.VMEM((q_block, num_heads), jnp.float32),
            pltpu.VMEM((q_block, hd), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * sq * sk * d,
            bytes_accessed=(q.size + k.size + v.size + q.size) * 4,
            transcendentals=b * num_heads * sq * sk,
        ),
    )(q, k, v, biasf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused_attention_packed_streamed_core(
    q, k, v, bias, scale: float, num_heads: int
):
    return _streamed_impl(q, k, v, bias, scale, num_heads)


def fused_attention_packed_streamed(q, k, v, bias, scale: float, num_heads: int):
    """Flash-style packed attention for long key streams: same contract as
    `fused_attention_packed` but keys/values stream through VMEM in blocks
    with online softmax, so sk is unbounded by the VMEM budget.  Shards
    over the data axis under a registered mesh (see
    fused_attention_packed)."""
    from .sharding import BATCH, REP, data_shard_map, kernel_mesh

    mesh = kernel_mesh(q.shape[0])
    if mesh is not None:
        bias_spec = (
            BATCH
            if bias is not None and bias.shape[0] == q.shape[0]
            else REP
        )
        return data_shard_map(
            lambda q_, k_, v_, b_: _fused_attention_packed_streamed_core(
                q_, k_, v_, b_, scale, num_heads
            ),
            mesh,
            in_specs=(BATCH, BATCH, BATCH, bias_spec),
            out_specs=BATCH,
        )(q, k, v, bias)
    return _fused_attention_packed_streamed_core(
        q, k, v, bias, scale, num_heads
    )


def _streamed_impl(q, k, v, bias, scale, num_heads):
    b, sq, hd = q.shape
    sk = k.shape[1]
    biasf, _ = _normalise_bias_packed(bias, b, sq, sk)
    plan = plan_streamed_blocks(sq, sk, hd, num_heads)
    if plan is None:
        raise ValueError(
            f"no viable streaming plan (sq={sq}, sk={sk}, hd={hd}) — guard "
            "with streamed_attention_viable"
        )
    return _streamed_call(q, k, v, biasf, scale, num_heads, *plan)


# -- streaming backward: analytic XLA, MEASURED as the right choice -------
# A full flash-style Pallas backward (lse residuals, dkv kernel streaming
# q, dq/dbias kernel streaming k) was built and measured on v5e
# (2026-08-17): it TIES the analytic XLA backward at
# b8/s2048 (5.97 vs 5.88 ms hybrid fwd+bwd) and LOSES at scale
# (b32/s2048: 19.4 vs 11.8 ms; b64/s2048: 35.9 vs 21.7 ms).  XLA's fused
# softmax-grad schedule never pathologically materialises the weights
# even at 12.8 GB logical size, while the kernel pair pays two extra
# logit+exp recomputation passes.  So the VJP is the hybrid: Pallas
# streamed forward + the packed analytic XLA backward.
def _streamed_fwd(q, k, v, bias, scale, num_heads):
    return _streamed_impl(q, k, v, bias, scale, num_heads), (q, k, v, bias)


_fused_attention_packed_streamed_core.defvjp(_streamed_fwd, _packed_bwd)


# ---------------------------------------------------------------------------
# packed kernel with an ADDITIONAL per-head bias (T5 relative-position /
# DeBERTa disentangled terms) — VERDICT r2 item 5: these frozen-backbone
# stacks run at 197-256 keys, squarely in the regime where the BERT-layout
# packed kernel already wins 1.38-1.46x, but their biases are per-head so
# they could not route through the head-shared bias operand.
# ---------------------------------------------------------------------------
def _packed_2bias_kernel(
    q_ref, k_ref, v_ref, bias_ref, hbias_ref, out_ref, *, scale, h, d
):
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
            + hbias_ref[0, i].astype(jnp.float32)
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


def plan_q_block_2bias(sq: int, sk: int, hd: int, h: int) -> Optional[int]:
    """q-block plan with the (h, qblk, sk) per-head bias block added."""
    candidates = [sq] + [
        b for b in (512, 384, 256, 128, 64, 32, 16, 8) if sq % b == 0
    ]
    for qblk in candidates:
        kv_bytes = 2 * sk * hd * 4 * 2
        q_bytes = 2 * qblk * hd * 4 * 2
        bias_bytes = qblk * sk * 4 * 2
        hbias_bytes = h * qblk * sk * 4 * 2
        logits_bytes = 2 * qblk * sk * 4
        if (
            kv_bytes + q_bytes + bias_bytes + hbias_bytes + logits_bytes
            <= _VMEM_BUDGET
        ):
            return qblk
    return None


def packed_2bias_viable(sq: int, sk: int, hd: int, num_heads: int) -> bool:
    return hd % num_heads == 0 and plan_q_block_2bias(sq, sk, hd, num_heads) is not None


@functools.partial(
    jax.jit, static_argnames=("scale", "num_heads", "q_block")
)
def _packed_2bias_call(q, k, v, biasf, hbias, scale, num_heads, q_block):
    b, sq, hd = q.shape
    sk = k.shape[1]
    d = hd // num_heads
    bq = biasf.shape[1]
    bias_qblk = q_block if bq > 1 else 1
    nq = sq // q_block
    hb_b = hbias.shape[0]  # 1 (batch-shared table) or b (per-batch terms)

    return pl.pallas_call(
        functools.partial(
            _packed_2bias_kernel, scale=scale, h=num_heads, d=d
        ),
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, q_block, hd), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, hd), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, hd), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, bias_qblk, sk),
                _bias_index_map_2d(biasf.shape[0], bias_qblk),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, num_heads, q_block, sk),
                (lambda bi, qi: (bi, 0, qi, 0))
                if hb_b > 1
                else (lambda bi, qi: (0, 0, qi, 0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((1, q_block, hd), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, sq, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * sq * sk * d,
            bytes_accessed=(q.size + k.size + v.size + q.size + hbias.size) * 4,
            transcendentals=b * num_heads * sq * sk,
        ),
    )(q, k, v, biasf, hbias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_attention_packed_2bias_core(
    q, k, v, bias, head_bias, scale: float, num_heads: int
):
    return _fused_packed_2bias_impl(q, k, v, bias, head_bias, scale, num_heads)


def fused_attention_packed_2bias(q, k, v, bias, head_bias, scale: float, num_heads: int):
    """Packed attention with BOTH a head-shared bias (b,1,*,Sk or None) and
    a per-head bias (B,h,Sq,Sk) with B in {1, b} — e.g. T5's relative
    position table (batch-shared) or DeBERTa's disentangled c2p+p2c terms
    (per-batch).  q/k/v in (b, S, h*d) packed layout.  Shards over the
    data axis under a registered mesh (see fused_attention_packed)."""
    from .sharding import BATCH, REP, data_shard_map, kernel_mesh

    mesh = kernel_mesh(q.shape[0])
    if mesh is not None:
        bias_spec = (
            BATCH
            if bias is not None and bias.shape[0] == q.shape[0]
            else REP
        )
        hb_spec = BATCH if head_bias.shape[0] == q.shape[0] else REP
        return data_shard_map(
            lambda q_, k_, v_, b_, hb_: _fused_attention_packed_2bias_core(
                q_, k_, v_, b_, hb_, scale, num_heads
            ),
            mesh,
            in_specs=(BATCH, BATCH, BATCH, bias_spec, hb_spec),
            out_specs=BATCH,
        )(q, k, v, bias, head_bias)
    return _fused_attention_packed_2bias_core(
        q, k, v, bias, head_bias, scale, num_heads
    )


def _fused_packed_2bias_impl(q, k, v, bias, head_bias, scale, num_heads):
    b, sq, hd = q.shape
    sk = k.shape[1]
    biasf, _ = _normalise_bias_packed(bias, b, sq, sk)
    head_bias = head_bias.astype(jnp.float32)
    if head_bias.shape[2] != sq or head_bias.shape[3] != sk:
        head_bias = jnp.broadcast_to(
            head_bias, head_bias.shape[:2] + (sq, sk)
        )
    q_block = plan_q_block_2bias(sq, sk, hd, num_heads)
    if q_block is None:
        raise ValueError(
            f"no viable q-block for 2-bias packed attention (sq={sq}, "
            f"sk={sk}, hd={hd}, h={num_heads}) — guard with packed_2bias_viable"
        )
    return _packed_2bias_call(q, k, v, biasf, head_bias, scale, num_heads, q_block)


def _packed_2bias_fwd(q, k, v, bias, head_bias, scale, num_heads):
    out = _fused_packed_2bias_impl(q, k, v, bias, head_bias, scale, num_heads)
    return out, (q, k, v, bias, head_bias)


def _packed_2bias_bwd(scale, num_heads, residuals, g):
    q, k, v, bias, head_bias = residuals
    combined = head_bias if bias is None else bias + head_bias
    dq, dk, dv, dcombined = _packed_bwd(
        scale, num_heads, (q, k, v, combined), g
    )
    dbias = None
    dhead = dcombined
    if bias is not None:
        dbias = dcombined
        for axis, (bdim, ldim) in enumerate(zip(bias.shape, dcombined.shape)):
            if bdim == 1 and ldim != 1:
                dbias = jnp.sum(dbias, axis=axis, keepdims=True)
        dbias = dbias.astype(bias.dtype)
    for axis, (bdim, ldim) in enumerate(zip(head_bias.shape, dcombined.shape)):
        if bdim == 1 and ldim != 1:
            dhead = jnp.sum(dhead, axis=axis, keepdims=True)
    return dq, dk, dv, dbias, dhead.astype(head_bias.dtype)


_fused_attention_packed_2bias_core.defvjp(_packed_2bias_fwd, _packed_2bias_bwd)


# ---------------------------------------------------------------------------
# packed kernel with in-kernel attention-weights dropout (training path)
# ---------------------------------------------------------------------------
# The dropout mask is generated with the TPU PRNG from a per-(batch,
# q-block) seed, heads drawn sequentially — the backward kernel reseeds the
# same way and regenerates bit-identical masks, so no (b, h, q, k) mask
# tensor ever touches HBM.  Forward and backward MUST share the q-block
# plan (a different partition would change the random streams), so the
# dropout plan uses the backward pass's tighter VMEM budget.

def _dropout_threshold(rate: float) -> int:
    # drop when (bits >> 9) < rate * 2^23 — the shift keeps the compare in
    # non-negative int32 territory (uint32 comparisons are not reliably
    # unsigned through every lowering)
    return min(int(rate * (1 << 23)), (1 << 23) - 1)


_MASK_TILE = 64  # fixed q-tile for mask generation (partition-independent)


def _dropout_keep(seed_ref, qblk, sk, head, n_heads, sq, threshold):
    """(qblk, sk) keep mask for the current grid cell at `head`.

    Bits are generated in fixed _MASK_TILE-row tiles, each re-seeded from
    the tile's ABSOLUTE (batch, head, q-tile) coordinates — the mask is
    identical under any q-block partition whose block is a multiple of
    _MASK_TILE, letting forward and backward pick different block sizes
    while regenerating bit-identical masks."""
    if qblk % _MASK_TILE or sq % _MASK_TILE:
        # non-tile-aligned lengths only occur as a SINGLE block covering
        # the whole sequence (qblk == sq, enforced by the planners), so
        # partition-independence is trivial — generate ceil tiles and
        # slice the tail
        assert qblk == sq
        base = seed_ref[0] + (pl.program_id(0) * n_heads + head) * (
            (sq + _MASK_TILE - 1) // _MASK_TILE
        )
        rows = []
        for t in range((sq + _MASK_TILE - 1) // _MASK_TILE):
            pltpu.prng_seed(base + t)
            bits = jax.lax.shift_right_logical(
                pltpu.bitcast(
                    pltpu.prng_random_bits((min(_MASK_TILE, sq), sk)),
                    jnp.int32,
                ),
                9,
            )
            rows.append(bits >= threshold)
        full = jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]
        return full[:qblk]
    n_q_tiles = sq // _MASK_TILE
    base = seed_ref[0] + (
        (pl.program_id(0) * n_heads + head) * n_q_tiles
    )
    first_tile = pl.program_id(1) * (qblk // _MASK_TILE)
    rows = []
    for t in range(qblk // _MASK_TILE):
        pltpu.prng_seed(base + first_tile + t)
        bits = jax.lax.shift_right_logical(
            pltpu.bitcast(
                pltpu.prng_random_bits((_MASK_TILE, sk)), jnp.int32
            ),
            9,
        )
        rows.append(bits >= threshold)
    return jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]


def _packed_dropout_kernel(
    seed_ref, q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale, h, d, rate, sq
):
    threshold = _dropout_threshold(rate)
    keep_scale = 1.0 / (1.0 - rate)
    bias = bias_ref[0].astype(jnp.float32)
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
        weights = unnormalised / jnp.sum(unnormalised, axis=-1, keepdims=True)
        keep = _dropout_keep(
            seed_ref, weights.shape[0], weights.shape[1], i, h, sq, threshold
        )
        weights = jnp.where(keep, weights * keep_scale, 0.0).astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            weights, v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, :, i * d:(i + 1) * d] = out.astype(out_ref.dtype)


def _packed_dropout_bwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, bias_ref, g_ref,
    dq_ref, dk_ref, dv_ref, *, scale, h, d, rate, sq
):
    """Recomputes softmax + the SAME dropout mask; emits dq for this
    q-block and accumulates dk/dv across q-blocks (their output blocks
    revisit the same index, zero-initialised at the first q-block)."""
    threshold = _dropout_threshold(rate)
    keep_scale = 1.0 / (1.0 - rate)
    bias = bias_ref[0].astype(jnp.float32)

    @pl.when(pl.program_id(1) == 0)
    def _zero_init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    for i in range(h):
        # inputs arrive pre-cast to bf16 (halves the resident buffers ->
        # a 2x larger q-block fits the scoped-vmem stack)
        q = q_ref[0, :, i * d:(i + 1) * d]
        k = k_ref[0, :, i * d:(i + 1) * d]
        v = v_ref[0, :, i * d:(i + 1) * d]
        g = g_ref[0, :, i * d:(i + 1) * d]
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
        weights = unnormalised / jnp.sum(unnormalised, axis=-1, keepdims=True)
        keep = _dropout_keep(
            seed_ref, weights.shape[0], weights.shape[1], i, h, sq, threshold
        ).astype(jnp.float32) * keep_scale
        dropped = (weights * keep).astype(jnp.bfloat16)

        # dv += dropped^T g
        dv = jax.lax.dot_general(
            dropped, g,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dv_ref[0, :, i * d:(i + 1) * d] += dv.astype(dv_ref.dtype)

        # dw (w.r.t. pre-dropout weights) = (g v^T) * keep
        dw = (
            jax.lax.dot_general(
                g, v,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * keep
        )
        dlogits = weights * (dw - jnp.sum(dw * weights, axis=-1, keepdims=True))
        dlogits_bf = dlogits.astype(jnp.bfloat16)

        dq = jax.lax.dot_general(
            dlogits_bf, k,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dq_ref[0, :, i * d:(i + 1) * d] = dq.astype(dq_ref.dtype)

        dk = jax.lax.dot_general(
            dlogits_bf, q,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dk_ref[0, :, i * d:(i + 1) * d] += dk.astype(dk_ref.dtype)


def _mask_tile_candidates(sq: int):
    # dropout masks are generated in fixed _MASK_TILE-row tiles, so any
    # q-block must be a multiple of _MASK_TILE (and sq itself tiled)
    if sq % _MASK_TILE:
        # arbitrary lengths (e.g. M4C joint streams) are supported as a
        # single whole-sequence block; splitting would cut a mask tile
        return [sq]
    return [sq] + [
        b for b in (512, 384, 256, 128, 64) if b % _MASK_TILE == 0 and sq % b == 0
    ]


def plan_dropout_fwd_q_block(sq: int, sk: int, hd: int) -> Optional[int]:
    """Forward q-block: same budget shape as the plain kernel, restricted
    to mask-tile multiples (fwd and bwd may differ — the mask generation is
    partition-independent)."""
    for qblk in _mask_tile_candidates(sq):
        kv_bytes = 2 * sk * hd * 4 * 2
        q_bytes = 2 * qblk * hd * 4 * 2
        bias_bytes = qblk * sk * 4 * 2
        logits_bytes = 2 * qblk * sk * 4
        if kv_bytes + q_bytes + bias_bytes + logits_bytes <= _VMEM_BUDGET:
            return qblk
    return None


def plan_dropout_q_block(sq: int, sk: int, hd: int) -> Optional[int]:
    """Backward q-block: q/g/dq blocks + k/v/dk/dv full rows + f32
    scratch for logits/weights/dw; tighter budget than the forward — the
    backward's scoped-vmem stack (measured on v5e) has less headroom."""
    for qblk in _mask_tile_candidates(sq):
        # k/v (bf16) in + dk/dv (f32) out revisit the same block index, so
        # Mosaic keeps ONE resident buffer each
        kv_bytes = 2 * sk * hd * 2 + 2 * sk * hd * 4
        # q, g in (bf16, double-buffered) + dq out (f32, double-buffered)
        q_bytes = 2 * qblk * hd * 2 * 2 + qblk * hd * 4 * 2
        bias_bytes = qblk * sk * 4 * 2
        scratch = 4 * qblk * sk * 4  # logits/weights/keep/dw f32 temporaries
        if kv_bytes + q_bytes + bias_bytes + scratch <= 9 * 1024 * 1024:
            return qblk
    return None


@functools.partial(
    jax.jit, static_argnames=("scale", "num_heads", "rate", "q_block")
)
def _packed_dropout_fwd_call(
    seed, q, k, v, biasf, scale, num_heads, rate, q_block
):
    b, sq, hd = q.shape
    sk = k.shape[1]
    d = hd // num_heads
    bq = biasf.shape[1]
    bias_qblk = q_block if bq > 1 else 1
    nq = sq // q_block

    return pl.pallas_call(
        functools.partial(
            _packed_dropout_kernel,
            scale=scale, h=num_heads, d=d, rate=rate, sq=sq,
        ),
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, q_block, hd), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, hd), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, hd), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, bias_qblk, sk),
                _bias_index_map_2d(biasf.shape[0], bias_qblk),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((1, q_block, hd), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, sq, hd), q.dtype),
    )(seed, q, k, v, biasf)


@functools.partial(
    jax.jit, static_argnames=("scale", "num_heads", "rate", "q_block")
)
def _packed_dropout_bwd_call(
    seed, q, k, v, biasf, g, scale, num_heads, rate, q_block
):
    b, sq, hd = q.shape
    sk = k.shape[1]
    d = hd // num_heads
    bq = biasf.shape[1]
    bias_qblk = q_block if bq > 1 else 1
    nq = sq // q_block

    qblock_spec = pl.BlockSpec(
        (1, q_block, hd), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM
    )
    full_spec = pl.BlockSpec(
        (1, sk, hd), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(
            _packed_dropout_bwd_kernel,
            scale=scale, h=num_heads, d=d, rate=rate, sq=sq,
        ),
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            qblock_spec, full_spec, full_spec,
            pl.BlockSpec(
                (1, bias_qblk, sk),
                _bias_index_map_2d(biasf.shape[0], bias_qblk),
                memory_space=pltpu.VMEM,
            ),
            qblock_spec,
        ],
        out_specs=[qblock_spec, full_spec, full_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq, hd), jnp.float32),
            jax.ShapeDtypeStruct((b, sk, hd), jnp.float32),
            jax.ShapeDtypeStruct((b, sk, hd), jnp.float32),
        ],
    )(seed, q, k, v, biasf, g)


def dropout_attention_viable(sq: int, sk: int, hd: int, num_heads: int) -> bool:
    return (
        hd % num_heads == 0
        and plan_dropout_fwd_q_block(sq, sk, hd) is not None
        and plan_dropout_q_block(sq, sk, hd) is not None
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused_attention_packed_dropout_core(
    q, k, v, bias, seed, scale: float, num_heads: int, rate: float
):
    biasf, _ = _normalise_bias_packed(bias, q.shape[0], q.shape[1], k.shape[1])
    q_block = plan_dropout_fwd_q_block(q.shape[1], k.shape[1], q.shape[2])
    if q_block is None:  # same explicit guard as every sibling entry point
        raise ValueError(
            "no VMEM plan for dropout-attention forward at "
            f"sq={q.shape[1]} sk={k.shape[1]} hd={q.shape[2]}; guard calls "
            "with dropout_attention_viable"
        )
    return _packed_dropout_fwd_call(
        seed, q, k, v, biasf, scale, num_heads, rate, q_block
    )


def fused_attention_packed_dropout(
    q, k, v, bias, seed, scale: float, num_heads: int, rate: float
):
    """Packed attention with in-kernel attention-weights dropout.

    seed: (1,) int32 (derive from the flax 'dropout' RNG per call).  The
    dropout pattern differs from the XLA path's jax.random draws (TPU
    hardware PRNG) — statistically equivalent, deterministic per seed.
    bias is treated as non-differentiable (all framework biases are mask
    constants).

    Under a registered multi-device mesh the call shard_maps over the
    data axis (see fused_attention_packed); each shard folds its data
    axis index into the seed so shards draw DISTINCT dropout masks (the
    in-kernel PRNG is seeded per (batch, head, tile) relative to the
    shard-local batch, which would otherwise repeat across shards)."""
    from .sharding import BATCH, REP, data_shard_map, kernel_mesh

    mesh = kernel_mesh(q.shape[0])
    if mesh is not None:
        from .sharding import DATA_AXIS

        bias_spec = (
            BATCH
            if bias is not None and bias.shape[0] == q.shape[0]
            else REP
        )

        def body(q_, k_, v_, b_, seed_):
            shard_seed = seed_ + jax.lax.axis_index(DATA_AXIS).astype(
                seed_.dtype
            ) * jnp.asarray(7919, seed_.dtype)
            return _fused_attention_packed_dropout_core(
                q_, k_, v_, b_, shard_seed, scale, num_heads, rate
            )

        return data_shard_map(
            body, mesh,
            in_specs=(BATCH, BATCH, BATCH, bias_spec, REP),
            out_specs=BATCH,
        )(q, k, v, bias, seed)
    return _fused_attention_packed_dropout_core(
        q, k, v, bias, seed, scale, num_heads, rate
    )


def _packed_dropout_fwd(q, k, v, bias, seed, scale, num_heads, rate):
    out = _fused_attention_packed_dropout_core(
        q, k, v, bias, seed, scale, num_heads, rate
    )
    return out, (q, k, v, bias, seed)


def _packed_dropout_bwd(scale, num_heads, rate, residuals, g):
    import numpy as np

    q, k, v, bias, seed = residuals
    biasf, _ = _normalise_bias_packed(bias, q.shape[0], q.shape[1], k.shape[1])
    q_block = plan_dropout_q_block(q.shape[1], k.shape[1], q.shape[2])
    if q_block is None:
        # fail at trace time with the guard's name, not a NoneType '//'
        # deep inside the jitted bwd at the first grad step
        raise ValueError(
            "no VMEM plan for dropout-attention backward at "
            f"sq={q.shape[1]} sk={k.shape[1]} hd={q.shape[2]}; guard calls "
            "with dropout_attention_viable"
        )
    dq, dk, dv = _packed_dropout_bwd_call(
        seed,
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), biasf, g.astype(jnp.bfloat16),
        scale, num_heads, rate, q_block,
    )
    dq = dq.astype(q.dtype)
    dk = dk.astype(k.dtype)
    dv = dv.astype(v.dtype)
    dbias = jnp.zeros_like(bias) if bias is not None else None
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return (dq, dk, dv, dbias, dseed)


_fused_attention_packed_dropout_core.defvjp(
    _packed_dropout_fwd, _packed_dropout_bwd
)


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
def _fused_attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    scale: float,
) -> jnp.ndarray:
    return _fused_attention_impl(q, k, v, bias, scale)


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
    Shards over the data axis under a registered mesh (see
    fused_attention_packed).
    """
    from .sharding import BATCH, REP, data_shard_map, kernel_mesh

    mesh = kernel_mesh(q.shape[0])
    if mesh is not None:
        bias_spec = (
            BATCH
            if bias is not None and bias.shape[0] == q.shape[0]
            else REP
        )
        return data_shard_map(
            lambda q_, k_, v_, b_: _fused_attention_core(
                q_, k_, v_, b_, scale
            ),
            mesh,
            in_specs=(BATCH, BATCH, BATCH, bias_spec),
            out_specs=BATCH,
        )(q, k, v, bias)
    return _fused_attention_core(q, k, v, bias, scale)


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
    return (
        dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), dbias
    )


_fused_attention_core.defvjp(_fwd, _bwd)
