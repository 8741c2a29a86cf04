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
from typing import Optional, Tuple

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
    fits the VMEM budget.  Mosaic requires the second-to-last block dim of
    the (blk, hd) row blocks to be divisible by 8 OR equal to the full
    array dim, so sub-8 blocks are only legal as blk == bs (BENCH_r04
    post-mortem: a blk=2 plan crashed lowering at MMF dims)."""
    for blk in [bs] + [b for b in (64, 48, 32, 24, 16, 8) if b < bs]:
        if bs % blk:
            continue
        if fixed_bytes + blk * per_row_bytes <= _VMEM_BUDGET:
            return blk
    return None


def _layer_norm(x, scale, bias, eps=_LN_EPS):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


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
    *, scale, h, d, eps=_LN_EPS,
):
    # clamp like the XLA path's dynamic_update_slice: a t >= max_len
    # overrun overwrites the last slot on BOTH paths instead of silently
    # dropping the token only when the kernel is on
    t = jnp.minimum(t_ref[0], ck_ref.shape[1] - 1)
    x = x_ref[:]

    def dot_w(a, w_ref, b_ref_):
        return (
            jnp.dot(
                a.astype(w_ref.dtype), w_ref[:],
                preferred_element_type=jnp.float32,
            )
            + b_ref_[0]
        )

    k_new = dot_w(x, wk_ref, bk_ref).astype(ck_ref.dtype)
    v_new = dot_w(x, wv_ref, bv_ref).astype(cv_ref.dtype)
    q = dot_w(x, wq_ref, bq_ref)

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

    _heads_attend(
        q, ck_out[:].astype(jnp.float32), cv_out[:].astype(jnp.float32),
        bias_row, scale, h, d, attn_scratch,
    )

    o = dot_w(attn_scratch[:], wo_ref, bo_ref)
    y_ref[:] = _layer_norm(x + o, g_ref[0], b_ref[0], eps)


@functools.partial(
    jax.jit, static_argnames=("scale", "h", "blk", "interpret", "eps")
)
def _self_attn_call(
    t, x, wq, bq, wk, bk, wv, bv, wo, bo, g, b, sb, ck, cv, cb,
    scale: float, h: int, blk: int, interpret: bool, eps: float = _LN_EPS,
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
        functools.partial(_self_attn_kernel, scale=scale, h=h, d=d, eps=eps),
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


def self_attention_step_viable(
    bs: int, max_len: int, hd: int,
    cache_bytes: int = 4, weight_bytes: int = 4,
) -> Optional[int]:
    fixed = (4 * hd * hd) * weight_bytes + 6 * hd * 4
    # double-buffered: x, y, cache k/v in+out, cache bias in+out, step bias;
    # single: attn scratch
    per_row = (
        2 * (2 * hd * 4 + 4 * max_len * hd * cache_bytes + 2 * max_len * 4 + 4)
        + hd * 4
        + 2 * max_len * hd * 4  # f32 q*k product + w_full temps
    )
    return _plan_batch_block(bs, fixed, per_row)


def fused_self_attention_step(
    x, wq, bq, wk, bk, wv, bv, wo, bo, ln_scale, ln_bias,
    step_bias, t, cache_k, cache_v, cache_bias, scale: float, h: int,
    interpret: bool = False, eps: float = _LN_EPS,
):
    """One stateful decode step.  x (bs, hd); caches (bs, T, hd)/(bs, T);
    step_bias (bs,); t scalar int32.  Returns (y_post_ln, new_k, new_v,
    new_bias).  Caches may be bf16 (stores cast; attention math stays
    f32); eps selects the post-LN epsilon (flax 1e-6 default, 1e-12 for
    the HF BertLayer family).  Shards over the data axis under a
    registered mesh (ops/sharding.py — GSPMD would otherwise replicate
    the opaque pallas_call)."""
    from .sharding import BATCH, REP, data_shard_map, kernel_mesh

    mesh = kernel_mesh(x.shape[0])
    if mesh is not None:
        return data_shard_map(
            lambda x_, sb_, t_, ck_, cv_, cb_, *w: fused_self_attention_step(
                x_, *w, sb_, t_, ck_, cv_, cb_, scale, h, interpret, eps
            ),
            mesh,
            in_specs=(BATCH, BATCH, REP, BATCH, BATCH, BATCH) + (REP,) * 10,
            out_specs=(BATCH, BATCH, BATCH, BATCH),
        )(
            x, step_bias, t, cache_k, cache_v, cache_bias,
            wq, bq, wk, bk, wv, bv, wo, bo, ln_scale, ln_bias,
        )
    bs, hd = x.shape
    cbytes = 2 if cache_k.dtype == jnp.bfloat16 else 4
    wbytes = 2 if wq.dtype == jnp.bfloat16 else 4
    blk = self_attention_step_viable(bs, cache_k.shape[1], hd, cbytes, wbytes)
    assert blk is not None, "guard with self_attention_step_viable"
    return _self_attn_call(
        t.reshape(1).astype(jnp.int32), x,
        wq, bq.reshape(1, -1), wk, bk.reshape(1, -1),
        wv, bv.reshape(1, -1), wo, bo.reshape(1, -1),
        ln_scale.reshape(1, -1), ln_bias.reshape(1, -1),
        step_bias.reshape(-1, 1).astype(cache_bias.dtype),
        cache_k, cache_v, cache_bias,
        scale, h, blk, interpret, eps,
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
    # sub-8 blocks are only legal as blk == bs (Mosaic's second-to-last
    # block dim rule — see _plan_batch_block): a 63-row SCST beam batch
    # used to fall through to blk=1 and crash lowering
    for blk in [bs] + [b for b in (48, 32, 24, 16, 8) if b < bs]:
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
    VMEM); interpret mode takes f32 for exact CPU equivalence tests.
    Shards over the data axis under a registered mesh (ops/sharding.py)."""
    from .sharding import BATCH, REP, data_shard_map, kernel_mesh

    mesh = kernel_mesh(x.shape[0])
    if mesh is not None:
        return data_shard_map(
            lambda x_, sw, cw, fw, sb_, t_, ck_, cv_, cb_, ek_, ev_, eb_: (
                fused_decoder_layer_step(
                    x_, sw, cw, fw, sb_, t_, ck_, cv_, cb_, ek_, ev_, eb_,
                    scale, h, interpret,
                )
            ),
            mesh,
            in_specs=(
                BATCH, REP, REP, REP, BATCH, REP,
                BATCH, BATCH, BATCH, BATCH, BATCH, BATCH,
            ),
            out_specs=(BATCH, BATCH, BATCH, BATCH),
        )(
            x, self_w, cross_w, ffn_w, step_bias, t,
            cache_k, cache_v, cache_bias, enc_k, enc_v, enc_bias,
        )
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
    post-LN hidden (bs, hd).  Shards over the data axis under a
    registered mesh (ops/sharding.py)."""
    from .sharding import BATCH, REP, data_shard_map, kernel_mesh

    mesh = kernel_mesh(x.shape[0])
    if mesh is not None:
        return data_shard_map(
            lambda x_, ek_, ev_, eb_, *w: fused_cross_attention_step(
                x_, *w, ek_, ev_, eb_, scale, h, interpret
            ),
            mesh,
            in_specs=(BATCH, BATCH, BATCH, BATCH) + (REP,) * 6,
            out_specs=BATCH,
        )(x, enc_k, enc_v, enc_bias, wq, bq, wo, bo, ln_scale, ln_bias)
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


def _ffn_kernel(
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, b_ref, y_ref, *, eps
):
    # activations cast to the weight dtype before the dot (bf16 weights on
    # hardware for the 768/3072 BERT FFN — MXU rounds operands to bf16 at
    # default precision anyway; f32 weights in interpret mode keep the CPU
    # equivalence tests exact)
    x = x_ref[:]
    hidden = (
        jnp.dot(
            x.astype(w1_ref.dtype), w1_ref[:],
            preferred_element_type=jnp.float32,
        )
        + b1_ref[0]
    )
    hidden = _gelu_exact(hidden)  # erf GELU (torch parity)
    o = (
        jnp.dot(
            hidden.astype(w2_ref.dtype), w2_ref[:],
            preferred_element_type=jnp.float32,
        )
        + b2_ref[0]
    )
    y_ref[:] = _layer_norm(x + o, g_ref[0], b_ref[0], eps)


@functools.partial(jax.jit, static_argnames=("blk", "interpret", "eps"))
def _ffn_call(x, w1, b1, w2, b2, g, b, blk: int, interpret: bool,
              eps: float = _LN_EPS):
    bs, hd = x.shape
    d_ff = w1.shape[1]
    nb = bs // blk
    row_spec = pl.BlockSpec((blk, hd), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def w_spec(shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    return pl.pallas_call(
        functools.partial(_ffn_kernel, eps=eps),
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


def ffn_step_viable(
    bs: int, hd: int, d_ff: int, weight_bytes: int = 4
) -> Optional[int]:
    fixed = (2 * hd * d_ff) * weight_bytes + (2 * d_ff + 4 * hd) * 4
    # double-buffered: x, y; single: the (blk, d_ff) hidden stack temp
    per_row = (2 * 2 * hd + 2 * d_ff) * 4
    return _plan_batch_block(bs, fixed, per_row)


def fused_ffn_step(x, w1, b1, w2, b2, ln_scale, ln_bias,
                   interpret: bool = False, eps: float = _LN_EPS):
    """Dense -> erf-GELU -> Dense -> residual LayerNorm on (bs, hd) rows.
    Shards over the data axis under a registered mesh (ops/sharding.py).
    NOTE: callers flattening (bs, S, hd) encodes to (bs*S, hd) rows keep
    data-parallel semantics because the flatten puts sample-major rows
    first — bs*S rows shard into contiguous whole-sample groups as long
    as the data axis divides bs*S (it divides bs in every task layout)."""
    from .sharding import BATCH, REP, data_shard_map, kernel_mesh

    mesh = kernel_mesh(x.shape[0])
    if mesh is not None:
        return data_shard_map(
            lambda x_, *w: fused_ffn_step(x_, *w, interpret=interpret, eps=eps),
            mesh,
            in_specs=(BATCH,) + (REP,) * 6,
            out_specs=BATCH,
        )(x, w1, b1, w2, b2, ln_scale, ln_bias)
    bs, hd = x.shape
    wb = 2 if w1.dtype == jnp.bfloat16 else 4
    blk = ffn_step_viable(bs, hd, w1.shape[1], wb)
    assert blk is not None, "guard with ffn_step_viable"
    return _ffn_call(
        x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
        ln_scale.reshape(1, -1), ln_bias.reshape(1, -1), blk, interpret, eps,
    )


# ---------------------------------------------------------------------------
# kernel D: BERT-layer decode step (the M4C family's incremental greedy,
# models/m4c_common.py MMT.decode_step semantics).  Differences from the
# generative kernels A-C that make this its own kernel:
#   * the attended stream is [frozen context | decoded slots]: the context
#     K/V (220 of 232 rows at MMF dims) NEVER changes across steps, so it is
#     a READ-ONLY input here — the ring-append kernels alias and write back
#     the whole cache, which at 232-row joint caches would add ~22 MB of
#     pure write-back HBM traffic per layer per step;
#   * only the (bs, T, hd) slot caches are aliased in/out (T=12 at MMF
#     dims), shrinking the scan carry ~20x vs joint caches;
#   * the column bias is STEP-INVARIANT (context padding bias; slots are
#     masked in-kernel from t), so there is no carried bias ring;
#   * post-LN eps is the HF BertLayer 1e-12 (kernels A-C use flax's 1e-6);
#   * slot caches may be bf16 (modules/bert.decode_cache_dtype) — stores
#     cast, attention math stays f32;
#   * the context K/V is STREAMED through VMEM in chunks over a second
#     grid dim with flash-style running (max, denom, numerator) scratch:
#     a whole 220-row context per batch row (~1.35 MB/row bf16 before
#     temps) cannot fit a legal >=8-row batch block in the ~16 MB VMEM,
#     which is exactly the misfit that kept the first kernel-D cut off
#     hardware.  Grid iterations on TPU run sequentially per core, so the
#     scratch accumulates across ctx chunks (same pattern as the streamed
#     training kernel in ops/fused_attention.py).
# Replaces ~12 XLA ops per layer per step with ONE pallas_call (+ the FFN
# kernel above with eps=1e-12: 2 calls per BertLayer step).
# ---------------------------------------------------------------------------
def _bert_self_kernel(
    t_ref, x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
    wo_ref, bo_ref, g_ref, b_ref, cbias_ref, ctxk_ref, ctxv_ref,
    sk_ref, sv_ref, y_ref, sk_out, sv_out,
    q_scr, acc_scr, m_scr, s_scr,
    *, scale, h, d, eps, nj,
):
    blk, dec_len = sk_ref.shape[0], sk_ref.shape[1]
    chunk = ctxk_ref.shape[1]
    hd = h * d
    j = pl.program_id(1)
    x = x_ref[:]

    def dot_w(a, w_ref, b_ref_):
        return (
            jnp.dot(
                a.astype(w_ref.dtype), w_ref[:],
                preferred_element_type=jnp.float32,
            )
            + b_ref_[0]
        )

    # block-diagonal head-selector (see _heads_attend): per-head segment
    # sums as ONE MXU matmul; its transpose expands (.., h) -> (.., hd)
    seg = (
        jax.lax.broadcasted_iota(jnp.int32, (hd, h), 0) // d
        == jax.lax.broadcasted_iota(jnp.int32, (hd, h), 1)
    ).astype(jnp.float32)

    def seg_logits(q, k_vals, n):
        prod = q[:, None, :] * k_vals.astype(jnp.float32)
        return jax.lax.dot_general(
            prod.reshape(blk * n, hd), seg,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(blk, n, h)

    def expand_heads(w_part):  # (rows, h) -> (rows, hd)
        return jax.lax.dot_general(
            w_part, seg,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == 0)
    def _init():
        # clamp like the XLA path's dynamic_update_slice (overruns
        # overwrite the last slot on both paths)
        t = jnp.minimum(t_ref[0], dec_len - 1)
        k_new = dot_w(x, wk_ref, bk_ref).astype(sk_ref.dtype)
        v_new = dot_w(x, wv_ref, bv_ref).astype(sv_ref.dtype)
        q = dot_w(x, wq_ref, bq_ref)
        q_scr[:] = q
        spos = jax.lax.broadcasted_iota(jnp.int32, (blk, dec_len), 1)
        spos3 = jax.lax.broadcasted_iota(jnp.int32, (blk, dec_len, 1), 1)
        at_t = spos3 == t
        sk_out[:] = jnp.where(at_t, k_new[:, None, :], sk_ref[:])
        sv_out[:] = jnp.where(at_t, v_new[:, None, :], sv_ref[:])
        # slots carry zero column bias by construction (m4c_common.MMT
        # init_decode_caches builds bias_base = [col_bias | zeros]);
        # future slots are masked exactly like the XLA path's
        # where(pos <= ctx_len + step, bias_base, MASK_VALUE)
        slot_bias = jnp.where(spos <= t, 0.0, MASK_VALUE)
        logits = (
            seg_logits(q, sk_out[:], dec_len) * scale
            + slot_bias[:, :, None]
        )
        m0 = jnp.max(logits, axis=1)  # (blk, h)
        p = jnp.exp(logits - m0[:, None, :])
        s_scr[:] = jnp.sum(p, axis=1)
        p_full = expand_heads(p.reshape(blk * dec_len, h)).reshape(
            blk, dec_len, hd
        )
        acc_scr[:] = jnp.sum(p_full * sv_out[:].astype(jnp.float32), axis=1)
        m_scr[:] = m0

    # fold this context chunk into the running softmax.  Padded rows
    # (ctx_len -> ctx_pad and reference padding alike) carry MASK_VALUE
    # bias: exp(-1e5 - m) underflows to exactly 0.0 in f32, matching the
    # XLA path's treatment of masked rows bit-for-bit.
    q = q_scr[:]
    logits = (
        seg_logits(q, ctxk_ref[:], chunk) * scale
        + cbias_ref[0][:, :, None]
    )
    m_old = m_scr[:]
    m_new = jnp.maximum(m_old, jnp.max(logits, axis=1))
    alpha = jnp.exp(m_old - m_new)  # (blk, h)
    p = jnp.exp(logits - m_new[:, None, :])
    s_scr[:] = s_scr[:] * alpha + jnp.sum(p, axis=1)
    p_full = expand_heads(p.reshape(blk * chunk, h)).reshape(blk, chunk, hd)
    acc_scr[:] = (
        acc_scr[:] * expand_heads(alpha)
        + jnp.sum(p_full * ctxv_ref[:].astype(jnp.float32), axis=1)
    )
    m_scr[:] = m_new

    @pl.when(j == nj - 1)
    def _fin():
        out = acc_scr[:] / expand_heads(s_scr[:])
        o = dot_w(out, wo_ref, bo_ref)
        y_ref[:] = _layer_norm(x + o, g_ref[0], b_ref[0], eps)


@functools.partial(
    jax.jit, static_argnames=("scale", "h", "eps", "blk", "interpret")
)
def _bert_self_call(
    t, x, wq, bq, wk, bk, wv, bv, wo, bo, g, b, cbias, ctx_k, ctx_v,
    slot_k, slot_v, scale: float, h: int, eps: float, blk: int,
    interpret: bool,
):
    bs, hd = x.shape
    dec_len = slot_k.shape[1]
    nj, _, chunk = cbias.shape  # ctx pre-reshaped (nj, bs, chunk)
    d = hd // h
    nb = bs // blk

    row_spec = pl.BlockSpec(
        (blk, hd), lambda i, j: (i, 0), memory_space=pltpu.VMEM
    )
    ctx_spec = pl.BlockSpec(
        (blk, chunk, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    slot_spec = pl.BlockSpec(
        (blk, dec_len, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    # (nj, bs, chunk) layout keeps the chunk the FULL last dim — a
    # (blk, chunk) window of a (bs, ctx_pad) row would need chunk % 128
    cbias_spec = pl.BlockSpec(
        (1, blk, chunk), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
    )

    def w_spec(shape):
        return pl.BlockSpec(
            shape, lambda i, j: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    y, sk2, sv2 = pl.pallas_call(
        functools.partial(
            _bert_self_kernel, scale=scale, h=h, d=d, eps=eps, nj=nj
        ),
        grid=(nb, nj),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            row_spec,
            w_spec(wq.shape), w_spec(bq.shape),
            w_spec(wk.shape), w_spec(bk.shape),
            w_spec(wv.shape), w_spec(bv.shape),
            w_spec(wo.shape), w_spec(bo.shape),
            w_spec(g.shape), w_spec(b.shape),
            cbias_spec, ctx_spec, ctx_spec,
            slot_spec, slot_spec,
        ],
        out_specs=(row_spec, slot_spec, slot_spec),
        out_shape=(
            jax.ShapeDtypeStruct((bs, hd), jnp.float32),
            jax.ShapeDtypeStruct(slot_k.shape, slot_k.dtype),
            jax.ShapeDtypeStruct(slot_v.shape, slot_v.dtype),
        ),
        input_output_aliases={15: 1, 16: 2},
        scratch_shapes=[
            pltpu.VMEM((blk, hd), jnp.float32),  # q
            pltpu.VMEM((blk, hd), jnp.float32),  # numerator
            pltpu.VMEM((blk, h), jnp.float32),  # running max
            pltpu.VMEM((blk, h), jnp.float32),  # denominator
        ],
        interpret=interpret,
    )(t, x, wq, bq, wk, bk, wv, bv, wo, bo, g, b, cbias, ctx_k, ctx_v,
      slot_k, slot_v)
    return y, sk2, sv2


def bert_self_step_plan(
    bs: int, ctx_len: int, dec_len: int, hd: int,
    cache_bytes: int = 4, weight_bytes: int = 4,
) -> Optional[Tuple[int, int]]:
    """(batch block, ctx chunk) plan for kernel D, or None when no legal
    cell fits VMEM.  The context is padded to a multiple of the chunk
    (MASK_VALUE bias rows) by the caller.  Blocks/chunks keep Mosaic's
    second-to-last-dim rule: divisible by 8 or the full dim.
    OPENVIVQA_DECODE_CHUNK forces the chunk (A/B + multi-chunk tests)."""
    forced = os.environ.get("OPENVIVQA_DECODE_CHUNK")
    if forced:
        chunks = [int(forced)]
    else:
        chunks = [ctx_len] + [c for c in (256, 128, 64, 32, 16, 8)
                              if c < ctx_len]
    blks = [bs] + [b for b in (64, 48, 32, 24, 16, 8) if b < bs and bs % b == 0]
    for blk in blks:
        for chunk in chunks:
            if _bert_self_cell_bytes(
                blk, chunk, dec_len, hd, cache_bytes, weight_bytes
            ) <= _VMEM_BUDGET:
                return blk, chunk
    return None


def _bert_self_cell_bytes(
    blk: int, chunk: int, dec_len: int, hd: int,
    cache_bytes: int, weight_bytes: int,
) -> int:
    return (
        (4 * hd * hd) * weight_bytes + 6 * hd * 4  # weights (single-buffered)
        + 2 * 2 * blk * hd * 4  # x, y (double-buffered)
        + 2 * 2 * blk * chunk * hd * cache_bytes  # ctx k/v chunk
        + 2 * blk * chunk * 4  # ctx bias chunk
        + 2 * 4 * blk * dec_len * hd * cache_bytes  # slots in+out
        + 2 * blk * hd * 4  # q + numerator scratch
        + 2 * blk * chunk * hd * 4  # f32 prod + p_full temps
        + 2 * blk * dec_len * hd * 4  # slot-fold temps (j == 0)
    )


def bert_self_step_viable(
    bs: int, ctx_len: int, dec_len: int, hd: int,
    cache_bytes: int = 4, weight_bytes: int = 4,
) -> Optional[int]:
    plan = bert_self_step_plan(
        bs, ctx_len, dec_len, hd, cache_bytes, weight_bytes
    )
    return None if plan is None else plan[0]


def fused_bert_self_step(
    x, w: dict, ctx_kv, slot_k, slot_v, step, ctx_bias,
    scale: float, h: int, eps: float, interpret: bool = False,
):
    """One M4C decode token's self-attention over [frozen context | slots]:
    q/k/v projections of the token, slot write at `step`, joint softmax
    streamed over context chunks, out projection + residual LayerNorm.
    x (bs, hd); ctx_kv = (k, v) each (bs, ctx_pad, hd) read-only and
    pre-padded to the plan's chunk multiple; slot_k/v (bs, T, hd) aliased;
    ctx_bias (nj, bs, chunk) additive with MASK_VALUE on padded rows (see
    BertEncoderStack.init_fused_decode_state).  Returns (y, new_slot_k,
    new_slot_v).  Shards over the data axis under a registered mesh
    (ops/sharding.py; the (nj, bs, chunk) bias shards its MIDDLE dim)."""
    from .sharding import (
        BATCH,
        BATCH_DIM1,
        REP,
        data_shard_map,
        kernel_mesh,
    )

    mesh = kernel_mesh(x.shape[0])
    if mesh is not None:
        return data_shard_map(
            lambda x_, w_, ckv_, sk_, sv_, st_, cb_: fused_bert_self_step(
                x_, w_, ckv_, sk_, sv_, st_, cb_, scale, h, eps, interpret
            ),
            mesh,
            in_specs=(BATCH, REP, BATCH, BATCH, BATCH, REP, BATCH_DIM1),
            out_specs=(BATCH, BATCH, BATCH),
        )(x, w, ctx_kv, slot_k, slot_v, step, ctx_bias)
    bs, hd = x.shape
    ctx_k, ctx_v = ctx_kv
    nj, _, chunk = ctx_bias.shape
    assert ctx_k.shape[1] == nj * chunk, "pad ctx K/V to the bias layout"
    cb = 2 if slot_k.dtype == jnp.bfloat16 else 4
    wb = 2 if w["wq"].dtype == jnp.bfloat16 else 4
    # the chunk is fixed by the state layout; re-derive only the batch block
    blk = next(
        (
            b
            for b in [bs] + [c for c in (64, 48, 32, 24, 16, 8)
                             if c < bs and bs % c == 0]
            if _bert_self_cell_bytes(b, chunk, slot_k.shape[1], hd, cb, wb)
            <= _VMEM_BUDGET
        ),
        None,
    )
    assert blk is not None, "guard with bert_self_step_plan"
    return _bert_self_call(
        step.reshape(1).astype(jnp.int32), x,
        w["wq"], w["bq"].reshape(1, -1), w["wk"], w["bk"].reshape(1, -1),
        w["wv"], w["bv"].reshape(1, -1), w["wo"], w["bo"].reshape(1, -1),
        w["ln_scale"].reshape(1, -1), w["ln_bias"].reshape(1, -1),
        ctx_bias.astype(jnp.float32), ctx_k, ctx_v, slot_k, slot_v,
        scale, h, eps, blk, interpret,
    )


# ---------------------------------------------------------------------------
# kernel E: frozen-KV cross-attention decode step (the Iterative M4C
# family's per-layer cross-attention over the pre-projected encoder
# states, models/mmf_variants.py incremental_greedy_decode).  Kernel D
# minus the slot machinery: the attended stream never changes across
# steps, so it is a read-only input streamed chunk-by-chunk over the
# second grid dim with flash-style running (max, denom, numerator)
# scratch — the same VMEM-misfit fix (a 220-row encoder K/V per batch
# row cannot legally fit one VMEM block at 768 wide).  One pallas_call
# replaces the ~8 XLA ops of BertSelfAttention.decode_step.
# ---------------------------------------------------------------------------
def _streamed_cross_kernel(
    x_ref, wq_ref, bq_ref, wo_ref, bo_ref, g_ref, b_ref,
    ebias_ref, ek_ref, ev_ref, y_ref,
    q_scr, acc_scr, m_scr, s_scr,
    *, scale, h, d, eps, nj,
):
    blk = x_ref.shape[0]
    chunk = ek_ref.shape[1]
    hd = h * d
    j = pl.program_id(1)
    x = x_ref[:]

    def dot_w(a, w_ref, b_ref_):
        return (
            jnp.dot(
                a.astype(w_ref.dtype), w_ref[:],
                preferred_element_type=jnp.float32,
            )
            + b_ref_[0]
        )

    seg = (
        jax.lax.broadcasted_iota(jnp.int32, (hd, h), 0) // d
        == jax.lax.broadcasted_iota(jnp.int32, (hd, h), 1)
    ).astype(jnp.float32)

    def expand_heads(w_part):
        return jax.lax.dot_general(
            w_part, seg,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == 0)
    def _init():
        q_scr[:] = dot_w(x, wq_ref, bq_ref)
        # -1e30 (finite) start: an all-masked first chunk contributes
        # weights that a later real logit rescales to exactly 0.0
        # (exp(MASK_VALUE - real_max) underflows in f32) — same masked-row
        # semantics as the XLA softmax
        m_scr[:] = jnp.full((blk, h), -1e30, jnp.float32)
        s_scr[:] = jnp.zeros((blk, h), jnp.float32)
        acc_scr[:] = jnp.zeros((blk, hd), jnp.float32)

    q = q_scr[:]
    prod = q[:, None, :] * ek_ref[:].astype(jnp.float32)
    logits = jax.lax.dot_general(
        prod.reshape(blk * chunk, hd), seg,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(blk, chunk, h)
    logits = logits * scale + ebias_ref[0][:, :, None]
    m_old = m_scr[:]
    m_new = jnp.maximum(m_old, jnp.max(logits, axis=1))
    alpha = jnp.exp(m_old - m_new)
    p = jnp.exp(logits - m_new[:, None, :])
    s_scr[:] = s_scr[:] * alpha + jnp.sum(p, axis=1)
    p_full = expand_heads(p.reshape(blk * chunk, h)).reshape(blk, chunk, hd)
    acc_scr[:] = (
        acc_scr[:] * expand_heads(alpha)
        + jnp.sum(p_full * ev_ref[:].astype(jnp.float32), axis=1)
    )
    m_scr[:] = m_new

    @pl.when(j == nj - 1)
    def _fin():
        out = acc_scr[:] / expand_heads(s_scr[:])
        o = dot_w(out, wo_ref, bo_ref)
        y_ref[:] = _layer_norm(x + o, g_ref[0], b_ref[0], eps)


@functools.partial(
    jax.jit, static_argnames=("scale", "h", "eps", "blk", "interpret")
)
def _streamed_cross_call(
    x, wq, bq, wo, bo, g, b, ebias, enc_k, enc_v,
    scale: float, h: int, eps: float, blk: int, interpret: bool,
):
    bs, hd = x.shape
    nj, _, chunk = ebias.shape  # enc bias pre-reshaped (nj, bs, chunk)
    d = hd // h
    nb = bs // blk

    row_spec = pl.BlockSpec(
        (blk, hd), lambda i, j: (i, 0), memory_space=pltpu.VMEM
    )
    enc_spec = pl.BlockSpec(
        (blk, chunk, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    ebias_spec = pl.BlockSpec(
        (1, blk, chunk), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
    )

    def w_spec(shape):
        return pl.BlockSpec(
            shape, lambda i, j: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    return pl.pallas_call(
        functools.partial(
            _streamed_cross_kernel, scale=scale, h=h, d=d, eps=eps, nj=nj
        ),
        grid=(nb, nj),
        in_specs=[
            row_spec,
            w_spec(wq.shape), w_spec(bq.shape),
            w_spec(wo.shape), w_spec(bo.shape),
            w_spec(g.shape), w_spec(b.shape),
            ebias_spec, enc_spec, enc_spec,
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((bs, hd), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((blk, hd), jnp.float32),  # q
            pltpu.VMEM((blk, hd), jnp.float32),  # numerator
            pltpu.VMEM((blk, h), jnp.float32),  # running max
            pltpu.VMEM((blk, h), jnp.float32),  # denominator
        ],
        interpret=interpret,
    )(x, wq, bq, wo, bo, g, b, ebias, enc_k, enc_v)


def _cross_cell_bytes(
    blk: int, chunk: int, hd: int, cache_bytes: int, weight_bytes: int
) -> int:
    return (
        (2 * hd * hd) * weight_bytes + 4 * hd * 4  # wq, wo + bias/ln rows
        + 2 * 2 * blk * hd * 4  # x, y (double-buffered)
        + 2 * 2 * blk * chunk * hd * cache_bytes  # enc k/v chunk
        + 2 * blk * chunk * 4  # enc bias chunk
        + 2 * blk * hd * 4  # q + numerator scratch
        + 2 * blk * chunk * hd * 4  # f32 prod + p_full temps
    )


def cross_step_plan(
    bs: int, enc_len: int, hd: int,
    cache_bytes: int = 4, weight_bytes: int = 4,
) -> Optional[Tuple[int, int]]:
    """(batch block, enc chunk) plan for kernel E, or None.  Same legality
    rules as bert_self_step_plan; OPENVIVQA_DECODE_CHUNK forces the
    chunk."""
    forced = os.environ.get("OPENVIVQA_DECODE_CHUNK")
    if forced:
        chunks = [int(forced)]
    else:
        chunks = [enc_len] + [c for c in (256, 128, 64, 32, 16, 8)
                              if c < enc_len]
    blks = [bs] + [b for b in (64, 48, 32, 24, 16, 8) if b < bs and bs % b == 0]
    for blk in blks:
        for chunk in chunks:
            if _cross_cell_bytes(
                blk, chunk, hd, cache_bytes, weight_bytes
            ) <= _VMEM_BUDGET:
                return blk, chunk
    return None


def fused_cross_attention_streamed(
    x, w: dict, enc_kv, enc_bias, scale: float, h: int, eps: float,
    interpret: bool = False,
):
    """One decode token's cross-attention over frozen pre-projected
    encoder K/V: q projection, softmax streamed over encoder chunks, out
    projection + residual LayerNorm.  x (bs, hd); enc_kv = (k, v) each
    (bs, S_pad, hd) read-only, pre-padded to the plan's chunk multiple;
    enc_bias (nj, bs, chunk) additive with MASK_VALUE on padded rows.
    Returns y (bs, hd).  Shards over the data axis under a registered
    mesh (ops/sharding.py)."""
    from .sharding import (
        BATCH,
        BATCH_DIM1,
        REP,
        data_shard_map,
        kernel_mesh,
    )

    mesh = kernel_mesh(x.shape[0])
    if mesh is not None:
        return data_shard_map(
            lambda x_, w_, ekv_, eb_: fused_cross_attention_streamed(
                x_, w_, ekv_, eb_, scale, h, eps, interpret
            ),
            mesh,
            in_specs=(BATCH, REP, BATCH, BATCH_DIM1),
            out_specs=BATCH,
        )(x, w, enc_kv, enc_bias)
    bs, hd = x.shape
    enc_k, enc_v = enc_kv
    nj, _, chunk = enc_bias.shape
    assert enc_k.shape[1] == nj * chunk, "pad enc K/V to the bias layout"
    cb = 2 if enc_k.dtype == jnp.bfloat16 else 4
    wb = 2 if w["wq"].dtype == jnp.bfloat16 else 4
    blk = next(
        (
            b
            for b in [bs] + [c for c in (64, 48, 32, 24, 16, 8)
                             if c < bs and bs % c == 0]
            if _cross_cell_bytes(b, chunk, hd, cb, wb) <= _VMEM_BUDGET
        ),
        None,
    )
    assert blk is not None, "guard with cross_step_plan"
    return _streamed_cross_call(
        x, w["wq"], w["bq"].reshape(1, -1), w["wo"], w["bo"].reshape(1, -1),
        w["ln_scale"].reshape(1, -1), w["ln_bias"].reshape(1, -1),
        enc_bias.astype(jnp.float32), enc_k, enc_v,
        scale, h, eps, blk, interpret,
    )
