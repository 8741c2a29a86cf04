"""Pallas TPU decode-step megakernels.

The beam-decode hot loop (/root/reference/models/modules/beam_search.py:94-95
is the loop these kernels replace the body of) was measured op-LATENCY-bound:
~650 us per step spread over ~150 tiny XLA ops at the bench config (ROADMAP
profile: >half small-tensor movement; bf16 measured useless because the step
is not bandwidth-bound).  The only lever is op-count reduction, so each
decoder-layer decode step collapses into THREE pallas_calls:

* `fused_self_attention_step` — the stateful block: q/k/v projections of the
  current token, ring-append of packed K/V + step bias into the static cache
  (in-place via input_output_aliases), future-masked single-query attention
  over the cached prefix, output projection, residual + LayerNorm.  Replaces
  ~15 XLA ops per layer.
* `fused_cross_attention_step` — q projection, attention over the packed
  cached encoder K/V (projected once per sequence), output projection,
  residual + LayerNorm.
* `fused_ffn_step` — Dense -> erf-GELU -> Dense -> residual + LayerNorm.

Layout: caches are PACKED (bs, T, h*d) — full 512-lane rows, per-head work
as static lane slices (the technique of ops/fused_attention._packed_kernel).
Attention math uses broadcast-multiply + reductions on the VPU: at decode
shapes (1 query, T<=~40 keys) the FLOPs are trivial and the MXU would be
latency-bound anyway; what matters is one kernel instead of fifteen.

All dots keep f32 operands (decode is latency-bound — the bf16-operand
speedup of the training kernels buys nothing here, and f32 keeps interpret
mode numerically aligned with the XLA fallback for the equivalence tests).

Dispatch: `decode_kernel_mode()` — on TPU the kernels engage when the VMEM
plan fits; `OPENVIVQA_DECODE_KERNEL=0` forces off, `=interpret` runs them
in interpreter mode (CPU equivalence tests).
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
# ops/fused_attention.py) — ops cannot import from models without a cycle,
# but the kernels mask the same additive biases callers build there
MASK_VALUE = -10e4
_LN_EPS = 1e-6  # flax nn.LayerNorm default

# Scoped-VMEM budget for one grid cell.  Mosaic double-buffers every
# batch-blocked operand (constant-index-map weights are revisited and kept
# single-buffered, same as the packed kernel's K/V revisit) — the per-row
# costs below already carry the x2.
_VMEM_BUDGET = 12 * 1024 * 1024


def decode_kernel_mode() -> str:
    """'on' | 'off' | 'interpret'."""
    flag = os.environ.get("OPENVIVQA_DECODE_KERNEL", "").lower()
    if flag in ("0", "off", "false"):
        return "off"
    if flag == "interpret":
        return "interpret"
    try:
        backend = jax.default_backend()
    except Exception:  # noqa: BLE001
        return "off"
    return "on" if backend == "tpu" else "off"


def decode_kernel_parts() -> frozenset:
    """Which fused stages engage: subset of {layer, self, cross, ffn}.
    'layer' is the whole-decoder-layer megakernel (the production path);
    the stage kernels exist for attribution benchmarks.  Default: layer."""
    parts = os.environ.get("OPENVIVQA_DECODE_KERNEL_PARTS", "")
    if not parts:
        return frozenset({"layer"})
    chosen = frozenset(p.strip().lower() for p in parts.split(",") if p.strip())
    unknown = chosen - {"layer", "self", "cross", "ffn", "none"}
    if unknown:
        # a typo'd value would otherwise silently disable every fused
        # kernel and the 1.42x beam speedup with it
        raise ValueError(
            f"OPENVIVQA_DECODE_KERNEL_PARTS: unknown part(s) {sorted(unknown)}; "
            "expected comma-separated subset of layer,self,cross,ffn,none"
        )
    return chosen


def _plan_batch_block(bs: int, fixed_bytes: int, per_row_bytes: int) -> Optional[int]:
    """Largest divisor of bs whose cell (fixed weights + per-row buffers)
    fits the VMEM budget."""
    for blk in [bs] + [b for b in (64, 48, 32, 24, 16, 8, 4, 2, 1) if b < bs]:
        if bs % blk:
            continue
        if fixed_bytes + blk * per_row_bytes <= _VMEM_BUDGET:
            return blk
    return None


def _layer_norm(x, scale, bias):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + _LN_EPS) * scale + bias


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _heads_attend(q, k_cache, v_cache, bias_row, scale, h, d, out_ref):
    """Single-query multi-head attention on packed layouts.

    q (blk, h*d); k_cache/v_cache (blk, S, h*d); bias_row (blk, S) additive.
    Writes the packed context vector into out_ref[:, :] (blk, h*d).

    All heads at once: the per-head d-lane segment sums run as ONE MXU
    matmul against a block-diagonal 0/1 head-selector (hd, h), and the
    head->lane expansion of the weights as its transpose — full-lane VPU
    elementwise plus two tiny matmuls instead of h loops of narrow
    cross-lane reductions (the per-head variant measured 1.2 ms/batch
    SLOWER than XLA at 48 keys)."""
    blk, S, hd = k_cache.shape
    seg = (
        jax.lax.broadcasted_iota(jnp.int32, (hd, h), 0) // d
        == jax.lax.broadcasted_iota(jnp.int32, (hd, h), 1)
    ).astype(jnp.float32)

    prod = q[:, None, :] * k_cache  # (blk, S, hd) full-lane
    logits = jax.lax.dot_general(
        prod.reshape(blk * S, hd), seg,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(blk, S, h)
    logits = logits * scale + bias_row[:, :, None]

    row_max = jnp.max(logits, axis=1, keepdims=True)
    unnorm = jnp.exp(logits - row_max)
    weights = unnorm / jnp.sum(unnorm, axis=1, keepdims=True)  # (blk, S, h)

    w_full = jax.lax.dot_general(
        weights.reshape(blk * S, h), seg,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(blk, S, hd)
    out_ref[:, :] = jnp.sum(w_full * v_cache, axis=1)


# ---------------------------------------------------------------------------
# kernel A: stateful self-attention decode step
# ---------------------------------------------------------------------------
def _self_attn_kernel(
    t_ref, x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
    wo_ref, bo_ref, g_ref, b_ref, sb_ref, ck_ref, cv_ref, cb_ref,
    y_ref, ck_out, cv_out, cb_out, attn_scratch,
    *, scale, h, d,
):
    # clamp like the XLA path's dynamic_update_slice: a t >= max_len
    # overrun overwrites the last slot on BOTH paths instead of silently
    # dropping the token only when the kernel is on
    t = jnp.minimum(t_ref[0], ck_ref.shape[1] - 1)
    x = x_ref[:]

    k_new = _dot(x, wk_ref[:]) + bk_ref[0]
    v_new = _dot(x, wv_ref[:]) + bv_ref[0]
    q = _dot(x, wq_ref[:]) + bq_ref[0]

    # ring-append as position-mask selects: Mosaic restricts dynamic-offset
    # vector stores to 128-aligned lanes, and a full-array select over these
    # tiny buffers is pure VPU work anyway
    max_len = ck_ref.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], max_len), 1)
    # 3-D mask via 3-D iota: Mosaic cannot minor-dim-reshape i1 vectors
    pos3 = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], max_len, 1), 1)
    at_t = pos3 == t
    ck_out[:] = jnp.where(at_t, k_new[:, None, :], ck_ref[:])
    cv_out[:] = jnp.where(at_t, v_new[:, None, :], cv_ref[:])
    cb_out[:] = jnp.where(pos == t, sb_ref[:], cb_ref[:])

    bias_row = cb_out[:] + jnp.where(pos > t, MASK_VALUE, 0.0)

    _heads_attend(q, ck_out[:], cv_out[:], bias_row, scale, h, d, attn_scratch)

    o = _dot(attn_scratch[:], wo_ref[:]) + bo_ref[0]
    y_ref[:] = _layer_norm(x + o, g_ref[0], b_ref[0])


@functools.partial(
    jax.jit, static_argnames=("scale", "h", "blk", "interpret")
)
def _self_attn_call(
    t, x, wq, bq, wk, bk, wv, bv, wo, bo, g, b, sb, ck, cv, cb,
    scale: float, h: int, blk: int, interpret: bool,
):
    bs, hd = x.shape
    max_len = ck.shape[1]
    d = hd // h
    nb = bs // blk

    row_spec = pl.BlockSpec((blk, hd), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cache_spec = pl.BlockSpec(
        (blk, max_len, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    cbias_spec = pl.BlockSpec(
        (blk, max_len), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    def w_spec(shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    y, ck2, cv2, cb2 = pl.pallas_call(
        functools.partial(_self_attn_kernel, scale=scale, h=h, d=d),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            row_spec,
            w_spec(wq.shape), w_spec(bq.shape),
            w_spec(wk.shape), w_spec(bk.shape),
            w_spec(wv.shape), w_spec(bv.shape),
            w_spec(wo.shape), w_spec(bo.shape),
            w_spec(g.shape), w_spec(b.shape),
            pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            cache_spec, cache_spec, cbias_spec,
        ],
        out_specs=(row_spec, cache_spec, cache_spec, cbias_spec),
        out_shape=(
            jax.ShapeDtypeStruct((bs, hd), jnp.float32),
            jax.ShapeDtypeStruct(ck.shape, ck.dtype),
            jax.ShapeDtypeStruct(cv.shape, cv.dtype),
            jax.ShapeDtypeStruct(cb.shape, cb.dtype),
        ),
        input_output_aliases={13: 1, 14: 2, 15: 3},
        scratch_shapes=[pltpu.VMEM((blk, hd), jnp.float32)],
        interpret=interpret,
    )(t, x, wq, bq, wk, bk, wv, bv, wo, bo, g, b, sb, ck, cv, cb)
    return y, ck2, cv2, cb2


def self_attention_step_viable(bs: int, max_len: int, hd: int) -> Optional[int]:
    fixed = (4 * hd * hd + 6 * hd) * 4
    # double-buffered: x, y, cache k/v in+out, cache bias in+out, step bias;
    # single: attn scratch
    per_row = (2 * (2 * hd + 4 * max_len * hd + 2 * max_len + 1) + hd) * 4
    return _plan_batch_block(bs, fixed, per_row)


def fused_self_attention_step(
    x, wq, bq, wk, bk, wv, bv, wo, bo, ln_scale, ln_bias,
    step_bias, t, cache_k, cache_v, cache_bias, scale: float, h: int,
    interpret: bool = False,
):
    """One stateful decode step.  x (bs, hd); caches (bs, T, hd)/(bs, T);
    step_bias (bs,); t scalar int32.  Returns (y_post_ln, new_k, new_v,
    new_bias)."""
    bs, hd = x.shape
    blk = self_attention_step_viable(bs, cache_k.shape[1], hd)
    assert blk is not None, "guard with self_attention_step_viable"
    return _self_attn_call(
        t.reshape(1).astype(jnp.int32), x,
        wq, bq.reshape(1, -1), wk, bk.reshape(1, -1),
        wv, bv.reshape(1, -1), wo, bo.reshape(1, -1),
        ln_scale.reshape(1, -1), ln_bias.reshape(1, -1),
        step_bias.reshape(-1, 1).astype(cache_bias.dtype),
        cache_k, cache_v, cache_bias,
        scale, h, blk, interpret,
    )


# ---------------------------------------------------------------------------
# the whole-decoder-layer megakernel: self-attn step + cross-attn + FFN in
# ONE pallas_call (3 calls per decode step instead of ~40 XLA ops x 3
# layers).  Weights and the cached encoder K/V arrive pre-cast to bf16 on
# hardware (matmul-operand rounding XLA's default precision already applies;
# accumulations, softmax, LN stay f32) so the whole cell fits VMEM.
# ---------------------------------------------------------------------------
_LAYER_VMEM_BUDGET = 14 * 1024 * 1024


def _layer_kernel(
    t_ref, x_ref,
    swq, sbq, swk, sbk, swv, sbv, swo, sbo, sg, sln_b,
    cwq, cbq, cwo, cbo, cg, cln_b,
    fw1, fb1, fw2, fb2, fg, fln_b,
    stepb_ref, ck_ref, cv_ref, cb_ref, ek_ref, ev_ref, eb_ref,
    y_ref, ck_out, cv_out, cb_out, attn_s,
    *, scale, h, d,
):
    # clamp like the XLA path's dynamic_update_slice (see _self_attn_kernel)
    t = jnp.minimum(t_ref[0], ck_ref.shape[1] - 1)
    x = x_ref[:]

    def dot_w(a, w_ref, b_ref):
        return (
            jnp.dot(
                a.astype(w_ref.dtype), w_ref[:],
                preferred_element_type=jnp.float32,
            )
            + b_ref[0]
        )

    # ---- stateful self-attention + ring append --------------------------
    k_new = dot_w(x, swk, sbk)
    v_new = dot_w(x, swv, sbv)
    q = dot_w(x, swq, sbq)

    max_len = ck_ref.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], max_len), 1)
    pos3 = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], max_len, 1), 1)
    at_t = pos3 == t
    ck_out[:] = jnp.where(at_t, k_new[:, None, :], ck_ref[:])
    cv_out[:] = jnp.where(at_t, v_new[:, None, :], cv_ref[:])
    cb_out[:] = jnp.where(pos == t, stepb_ref[:], cb_ref[:])
    bias_row = cb_out[:] + jnp.where(pos > t, MASK_VALUE, 0.0)

    _heads_attend(q, ck_out[:], cv_out[:], bias_row, scale, h, d, attn_s)
    y1 = _layer_norm(x + dot_w(attn_s[:], swo, sbo), sg[0], sln_b[0])

    # ---- cross-attention over the cached encoder K/V --------------------
    q2 = dot_w(y1, cwq, cbq)
    _heads_attend(
        q2,
        ek_ref[:].astype(jnp.float32),
        ev_ref[:].astype(jnp.float32),
        eb_ref[:], scale, h, d, attn_s,
    )
    y2 = _layer_norm(y1 + dot_w(attn_s[:], cwo, cbo), cg[0], cln_b[0])

    # ---- position-wise FFN ----------------------------------------------
    hidden = _gelu_exact(dot_w(y2, fw1, fb1))
    y_ref[:] = _layer_norm(y2 + dot_w(hidden, fw2, fb2), fg[0], fln_b[0])


@functools.partial(
    jax.jit, static_argnames=("scale", "h", "blk", "interpret")
)
def _layer_call(
    t, x,
    swq, sbq, swk, sbk, swv, sbv, swo, sbo, sg, sln_b,
    cwq, cbq, cwo, cbo, cg, cln_b,
    fw1, fb1, fw2, fb2, fg, fln_b,
    sb, ck, cv, cb, ek, ev, eb,
    scale: float, h: int, blk: int, interpret: bool,
):
    bs, hd = x.shape
    max_len = ck.shape[1]
    sk = ek.shape[1]
    d = hd // h
    nb = bs // blk

    row_spec = pl.BlockSpec((blk, hd), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cache_spec = pl.BlockSpec(
        (blk, max_len, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    cbias_spec = pl.BlockSpec(
        (blk, max_len), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    enc_spec = pl.BlockSpec(
        (blk, sk, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    def w_spec(shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    weights = (
        swq, sbq, swk, sbk, swv, sbv, swo, sbo, sg, sln_b,
        cwq, cbq, cwo, cbo, cg, cln_b,
        fw1, fb1, fw2, fb2, fg, fln_b,
    )
    y, ck2, cv2, cb2 = pl.pallas_call(
        functools.partial(_layer_kernel, scale=scale, h=h, d=d),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            row_spec,
            *[w_spec(w.shape) for w in weights],
            pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            cache_spec, cache_spec, cbias_spec,
            enc_spec, enc_spec,
            pl.BlockSpec((blk, sk), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(row_spec, cache_spec, cache_spec, cbias_spec),
        out_shape=(
            jax.ShapeDtypeStruct((bs, hd), jnp.float32),
            jax.ShapeDtypeStruct(ck.shape, ck.dtype),
            jax.ShapeDtypeStruct(cv.shape, cv.dtype),
            jax.ShapeDtypeStruct(cb.shape, cb.dtype),
        ),
        input_output_aliases={25: 1, 26: 2, 27: 3},
        scratch_shapes=[pltpu.VMEM((blk, hd), jnp.float32)],
        interpret=interpret,
    )(t, x, *weights, sb, ck, cv, cb, ek, ev, eb)
    return y, ck2, cv2, cb2


def decoder_layer_step_viable(
    bs: int, max_len: int, sk: int, hd: int, d_ff: int,
    weight_bytes: int = 2,
) -> Optional[int]:
    fixed = (6 * hd * hd + 2 * hd * d_ff) * weight_bytes + 10 * hd * 4
    per_row = (
        2 * (2 * hd * 4 + 4 * max_len * hd * 4 + 2 * max_len * 4 + 4)
        + 2 * (2 * sk * hd * weight_bytes + sk * 4)
        + (hd + d_ff) * 4  # attn scratch + ffn hidden stack temp
    )
    for blk in [bs] + [b for b in (48, 32, 24, 16, 12, 8, 4, 2, 1) if b < bs]:
        if bs % blk:
            continue
        if fixed + blk * per_row <= _LAYER_VMEM_BUDGET:
            return blk
    return None


def fused_decoder_layer_step(
    x, self_w: dict, cross_w: dict, ffn_w: dict,
    step_bias, t, cache_k, cache_v, cache_bias,
    enc_k, enc_v, enc_bias,
    scale: float, h: int, interpret: bool = False,
):
    """One whole decoder-layer decode step (DecoderLayer semantics,
    decoders.py:38-70) as a single kernel.  Weight dicts:
      self_w:  wq,bq,wk,bk,wv,bv,wo,bo,ln_scale,ln_bias
      cross_w: wq,bq,wo,bo,ln_scale,ln_bias
      ffn_w:   w1,b1,w2,b2,ln_scale,ln_bias
    On hardware, pass weight matrices and enc_k/enc_v pre-cast to bf16
    (keeps numerics at XLA's default matmul precision and the cell in
    VMEM); interpret mode takes f32 for exact CPU equivalence tests."""
    bs, hd = x.shape
    wb = 2 if enc_k.dtype == jnp.bfloat16 else 4
    blk = decoder_layer_step_viable(
        bs, cache_k.shape[1], enc_k.shape[1], hd, ffn_w["w1"].shape[1], wb
    )
    assert blk is not None, "guard with decoder_layer_step_viable"

    def vec(v_):
        return v_.reshape(1, -1)

    return _layer_call(
        t.reshape(1).astype(jnp.int32), x,
        self_w["wq"], vec(self_w["bq"]), self_w["wk"], vec(self_w["bk"]),
        self_w["wv"], vec(self_w["bv"]), self_w["wo"], vec(self_w["bo"]),
        vec(self_w["ln_scale"]), vec(self_w["ln_bias"]),
        cross_w["wq"], vec(cross_w["bq"]), cross_w["wo"], vec(cross_w["bo"]),
        vec(cross_w["ln_scale"]), vec(cross_w["ln_bias"]),
        ffn_w["w1"], vec(ffn_w["b1"]), ffn_w["w2"], vec(ffn_w["b2"]),
        vec(ffn_w["ln_scale"]), vec(ffn_w["ln_bias"]),
        step_bias.reshape(-1, 1).astype(cache_bias.dtype),
        cache_k, cache_v, cache_bias,
        enc_k, enc_v, enc_bias.astype(jnp.float32),
        scale, h, blk, interpret,
    )


# ---------------------------------------------------------------------------
# kernel B: cross-attention decode step (static packed encoder K/V)
# ---------------------------------------------------------------------------
def _cross_attn_kernel(
    x_ref, wq_ref, bq_ref, wo_ref, bo_ref, g_ref, b_ref,
    ek_ref, ev_ref, eb_ref, y_ref, attn_scratch, *, scale, h, d,
):
    x = x_ref[:]
    q = _dot(x, wq_ref[:]) + bq_ref[0]
    _heads_attend(q, ek_ref[:], ev_ref[:], eb_ref[:], scale, h, d, attn_scratch)
    o = _dot(attn_scratch[:], wo_ref[:]) + bo_ref[0]
    y_ref[:] = _layer_norm(x + o, g_ref[0], b_ref[0])


@functools.partial(jax.jit, static_argnames=("scale", "h", "blk", "interpret"))
def _cross_attn_call(x, wq, bq, wo, bo, g, b, ek, ev, eb,
                     scale: float, h: int, blk: int, interpret: bool):
    bs, hd = x.shape
    sk = ek.shape[1]
    d = hd // h
    nb = bs // blk

    row_spec = pl.BlockSpec((blk, hd), lambda i: (i, 0), memory_space=pltpu.VMEM)
    enc_spec = pl.BlockSpec(
        (blk, sk, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    def w_spec(shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    return pl.pallas_call(
        functools.partial(_cross_attn_kernel, scale=scale, h=h, d=d),
        grid=(nb,),
        in_specs=[
            row_spec,
            w_spec(wq.shape), w_spec(bq.shape),
            w_spec(wo.shape), w_spec(bo.shape),
            w_spec(g.shape), w_spec(b.shape),
            enc_spec, enc_spec,
            pl.BlockSpec((blk, sk), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((bs, hd), jnp.float32),
        scratch_shapes=[pltpu.VMEM((blk, hd), jnp.float32)],
        interpret=interpret,
    )(x, wq, bq, wo, bo, g, b, ek, ev, eb)


def cross_attention_step_viable(bs: int, sk: int, hd: int) -> Optional[int]:
    fixed = (2 * hd * hd + 4 * hd) * 4
    # double-buffered: x, y, enc k/v, enc bias; single: attn scratch
    per_row = (2 * (2 * hd + 2 * sk * hd + sk) + hd) * 4
    return _plan_batch_block(bs, fixed, per_row)


def fused_cross_attention_step(
    x, wq, bq, wo, bo, ln_scale, ln_bias, enc_k, enc_v, enc_bias,
    scale: float, h: int, interpret: bool = False,
):
    """Cross-attention decode step.  x (bs, hd); enc_k/enc_v (bs, Sk, hd)
    packed cached projections; enc_bias (bs, Sk) additive.  Returns the
    post-LN hidden (bs, hd)."""
    bs, hd = x.shape
    blk = cross_attention_step_viable(bs, enc_k.shape[1], hd)
    assert blk is not None, "guard with cross_attention_step_viable"
    return _cross_attn_call(
        x, wq, bq.reshape(1, -1), wo, bo.reshape(1, -1),
        ln_scale.reshape(1, -1), ln_bias.reshape(1, -1),
        enc_k, enc_v, enc_bias.astype(jnp.float32),
        scale, h, blk, interpret,
    )


# ---------------------------------------------------------------------------
# kernel C: position-wise FFN decode step
# ---------------------------------------------------------------------------
def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational approximation (max abs error
    1.5e-7 ~ f32 eps).  Mosaic has no erf/erfc primitive, so the exact-GELU
    decode step evaluates this instead — numerically indistinguishable from
    XLA's erf at f32 next to the bf16-pass matmuls around it."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, b_ref, y_ref):
    x = x_ref[:]
    hidden = _dot(x, w1_ref[:]) + b1_ref[0]
    hidden = _gelu_exact(hidden)  # erf GELU (torch parity)
    o = _dot(hidden, w2_ref[:]) + b2_ref[0]
    y_ref[:] = _layer_norm(x + o, g_ref[0], b_ref[0])


@functools.partial(jax.jit, static_argnames=("blk", "interpret"))
def _ffn_call(x, w1, b1, w2, b2, g, b, blk: int, interpret: bool):
    bs, hd = x.shape
    d_ff = w1.shape[1]
    nb = bs // blk
    row_spec = pl.BlockSpec((blk, hd), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def w_spec(shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    return pl.pallas_call(
        _ffn_kernel,
        grid=(nb,),
        in_specs=[
            row_spec,
            w_spec(w1.shape), w_spec(b1.shape),
            w_spec(w2.shape), w_spec(b2.shape),
            w_spec(g.shape), w_spec(b.shape),
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((bs, hd), jnp.float32),
        interpret=interpret,
    )(x, w1, b1, w2, b2, g, b)


def ffn_step_viable(bs: int, hd: int, d_ff: int) -> Optional[int]:
    fixed = (2 * hd * d_ff + 2 * d_ff + 4 * hd) * 4
    # double-buffered: x, y; single: the (blk, d_ff) hidden stack temp
    per_row = (2 * 2 * hd + 2 * d_ff) * 4
    return _plan_batch_block(bs, fixed, per_row)


def fused_ffn_step(x, w1, b1, w2, b2, ln_scale, ln_bias,
                   interpret: bool = False):
    """Dense -> erf-GELU -> Dense -> residual LayerNorm on (bs, hd) rows."""
    bs, hd = x.shape
    blk = ffn_step_viable(bs, hd, w1.shape[1])
    assert blk is not None, "guard with ffn_step_viable"
    return _ffn_call(
        x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
        ln_scale.reshape(1, -1), ln_bias.reshape(1, -1), blk, interpret,
    )
