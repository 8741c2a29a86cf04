"""Attention cores and the multi-head wrapper (flax.linen).

Behavioural parity with /root/reference/models/modules/attentions.py:10-338
(ScaledDotProduct / AugmentedGeometry / AugmentedMemory / Adaptive variants +
the MultiHeadAttention wrapper with dropout, post-LN residual, optional AoA
gates and a decode-time K/V cache).

TPU-native redesign vs the reference:
* the K/V cache is a **static-shape** ring buffer of *projected* per-head
  keys/values (the reference concatenates raw inputs and re-projects the
  whole prefix every step, attentions.py:320-325); projecting each token
  once is mathematically identical and O(L) cheaper;
* attention math runs in a single batched einsum chain that XLA fuses onto
  the MXU; masking is additive f32 bias (0 / -10e4), never boolean selects;
* the reference's geometry-variant crash when a mask is passed
  (attentions.py:128-129 uses an undefined name) is fixed: the bias is
  applied to the logits.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...builders import META_ATTENTION
from .masks import MASK_VALUE, box_relational_embedding

_xavier = nn.initializers.xavier_uniform()
_zeros = nn.initializers.zeros


def _split_heads(x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """(bs, L, h*d) -> (bs, h, L, d)."""
    bs, length, _ = x.shape
    return x.reshape(bs, length, n_heads, -1).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(bs, h, L, d) -> (bs, L, h*d)."""
    bs, h, length, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(bs, length, h * d)


class _ProjectionMixin:
    """Shared q/k/v/o projections for all attention cores."""

    def _build_projections(self):
        c = self.config
        self.h = c.HEAD
        self.d_k = c.D_KEY
        self.d_v = c.D_VALUE
        self.d_model = c.D_MODEL
        self.fc_q = nn.Dense(self.h * self.d_k, kernel_init=_xavier, bias_init=_zeros)
        self.fc_k = nn.Dense(self.h * self.d_k, kernel_init=_xavier, bias_init=_zeros)
        self.fc_v = nn.Dense(self.h * self.d_v, kernel_init=_xavier, bias_init=_zeros)
        self.fc_o = nn.Dense(self.d_model, kernel_init=_xavier, bias_init=_zeros)

    def project_q(self, queries: jnp.ndarray) -> jnp.ndarray:
        return _split_heads(self.fc_q(queries), self.h)

    def project_kv(
        self, keys: jnp.ndarray, values: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return (
            _split_heads(self.fc_k(keys), self.h),
            _split_heads(self.fc_v(values), self.h),
        )

    def attend(
        self,
        q: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        attention_bias: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        import math

        scale = 1.0 / math.sqrt(self.d_k)
        if attention_bias is not None and attention_bias.ndim != 4:
            if attention_bias.ndim == 2:
                # (bs, sk) key-padding bias: broadcast over heads/queries.
                # Leading-axis padding would land batch on the QUERY axis
                # and mask the wrong samples.
                attention_bias = attention_bias[:, None, None, :]
            else:
                raise ValueError(
                    "attention_bias must be 4-D (bs/1, h/1, sq/1, sk) or "
                    f"2-D (bs, sk); got ndim={attention_bias.ndim}"
                )
        from ...ops.fused_attention import (
            flat_attention_viable,
            fused_attention,
            should_use_fused,
        )

        # the Pallas kernel wins past the measured key-length crossover
        # (ops/fused_attention.py) and is exact at default matmul precision;
        # the flat variant holds the whole logits tile per cell, so very
        # long sequences stay on XLA
        if should_use_fused(
            q.shape[2], k.shape[2], self.d_k
        ) and flat_attention_viable(q.shape[2], k.shape[2], self.d_k):
            out = fused_attention(q, k, v, attention_bias, scale)
        else:
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * scale
            if attention_bias is not None:
                logits = logits + attention_bias
            weights = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        return self.fc_o(_merge_heads(out))


@META_ATTENTION.register()
class ScaledDotProductAttention(nn.Module, _ProjectionMixin):
    """softmax(QK^T/sqrt(d_k) + bias) V (attentions.py:10-60 parity)."""

    config: Any

    def setup(self):
        self._build_projections()

    def __call__(
        self,
        queries: jnp.ndarray,
        keys: jnp.ndarray,
        values: jnp.ndarray,
        attention_bias: Optional[jnp.ndarray] = None,
        train: bool = False,
        **kwargs,
    ) -> jnp.ndarray:
        import math

        from ...ops.fused_attention import (
            fused_attention_packed,
            fused_attention_packed_streamed,
            packed_attention_viable,
            should_use_fused,
            streamed_attention_viable,
        )

        # packed Pallas path on the raw projections (no head-split
        # transposes) for long streams; when the full-key blocks exceed
        # VMEM (>~640 keys at hd 768) the flash-style streaming variant
        # takes over.  See ops/fused_attention.py
        if (
            self.d_k == self.d_v
            and should_use_fused(queries.shape[1], keys.shape[1], self.d_k)
            and (
                attention_bias is None
                or (attention_bias.ndim == 4 and attention_bias.shape[1] == 1)
            )
        ):
            sq, sk = queries.shape[1], keys.shape[1]
            hd = self.h * self.d_k
            if packed_attention_viable(sq, sk, hd, self.h):
                out = fused_attention_packed(
                    self.fc_q(queries), self.fc_k(keys), self.fc_v(values),
                    attention_bias, 1.0 / math.sqrt(self.d_k), self.h,
                )
                return self.fc_o(out)
            if streamed_attention_viable(sq, sk, hd, self.h):
                out = fused_attention_packed_streamed(
                    self.fc_q(queries), self.fc_k(keys), self.fc_v(values),
                    attention_bias, 1.0 / math.sqrt(self.d_k), self.h,
                )
                return self.fc_o(out)
        q = self.project_q(queries)
        k, v = self.project_kv(keys, values)
        return self.attend(q, k, v, attention_bias)


@META_ATTENTION.register()
class AugmentedGeometryScaledDotProductAttention(nn.Module, _ProjectionMixin):
    """Adds a per-head log box-relation bias to the logits
    (attentions.py:62-137 parity; h Linear(d_g,1) heads fused as one
    Dense(d_g -> h))."""

    config: Any

    def setup(self):
        self._build_projections()
        if self.config.TRIGNOMETRIC_EMBEDDING:
            self.d_g = self.config.D_MODEL // self.config.HEAD
        else:
            self.d_g = 4
        self.fc_g = nn.Dense(self.config.HEAD, kernel_init=_xavier, bias_init=_zeros)
        self.trignometric_embedding = self.config.TRIGNOMETRIC_EMBEDDING

    def __call__(
        self,
        queries: jnp.ndarray,
        keys: jnp.ndarray,
        values: jnp.ndarray,
        boxes: jnp.ndarray,
        attention_bias: Optional[jnp.ndarray] = None,
        train: bool = False,
        **kwargs,
    ) -> jnp.ndarray:
        geometry = box_relational_embedding(
            boxes, dim_g=self.d_g, trignometric_embedding=self.trignometric_embedding
        )  # (bs, nk, nk, d_g)
        g_weights = nn.relu(self.fc_g(geometry))  # (bs, nk, nk, h)
        g_bias = jnp.log(jnp.clip(g_weights, min=1e-6)).transpose(0, 3, 1, 2)

        q = self.project_q(queries)
        k, v = self.project_kv(keys, values)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(float(self.d_k))
        if attention_bias is not None:
            logits = logits + attention_bias
        weights = jax.nn.softmax(logits + g_bias, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        return self.fc_o(_merge_heads(out))


@META_ATTENTION.register()
class AugmentedMemoryScaledDotProductAttention(nn.Module, _ProjectionMixin):
    """m learned memory K/V slots appended to the keys/values
    (attentions.py:139-208 parity, incl. the sqrt scalings and the bias being
    applied to real keys only)."""

    config: Any

    def setup(self):
        self._build_projections()
        m = self.config.MEMORY
        self.m = m
        self.m_k = self.param(
            "m_k", nn.initializers.normal(stddev=1.0 / self.d_k), (1, m, self.h * self.d_k)
        )
        self.m_v = self.param(
            "m_v", nn.initializers.normal(stddev=1.0 / m), (1, m, self.h * self.d_v)
        )

    def __call__(
        self,
        queries: jnp.ndarray,
        keys: jnp.ndarray,
        values: jnp.ndarray,
        attention_bias: Optional[jnp.ndarray] = None,
        train: bool = False,
        **kwargs,
    ) -> jnp.ndarray:
        bs, nk = keys.shape[0], keys.shape[1]
        m_k = jnp.sqrt(float(self.d_k)) * jnp.broadcast_to(
            self.m_k, (bs, self.m, self.h * self.d_k)
        )
        m_v = jnp.sqrt(float(self.m)) * jnp.broadcast_to(
            self.m_v, (bs, self.m, self.h * self.d_v)
        )
        k = _split_heads(jnp.concatenate([self.fc_k(keys), m_k], axis=1), self.h)
        v = _split_heads(jnp.concatenate([self.fc_v(values), m_v], axis=1), self.h)
        q = self.project_q(queries)

        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(float(self.d_k))
        if attention_bias is not None:
            pad = jnp.zeros_like(logits[..., nk:])
            logits = logits + jnp.concatenate(
                [jnp.broadcast_to(attention_bias, logits[..., :nk].shape), pad],
                axis=-1,
            )
        weights = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        return self.fc_o(_merge_heads(out))


@META_ATTENTION.register()
class AdaptiveScaledDotProductAttention(nn.Module, _ProjectionMixin):
    """Adaptive attention with a per-query language-signal column
    (attentions.py:210-291).  The reference loops over query positions in
    Python; here the extra column is computed with one einsum:
    lang_logit[b,h,i] = q_i . s_i / sqrt(d_k), the softmax runs over nk+1
    columns, and out_i = sum_k w_ik v_k + w_i,nk * s_i."""

    config: Any

    def setup(self):
        self._build_projections()
        self.fc_s = nn.Dense(self.h * self.d_k, kernel_init=_xavier, bias_init=_zeros)

    def __call__(
        self,
        queries: jnp.ndarray,
        keys: jnp.ndarray,
        values: jnp.ndarray,
        language_signals: jnp.ndarray,
        attention_bias: Optional[jnp.ndarray] = None,
        train: bool = False,
        **kwargs,
    ) -> jnp.ndarray:
        q = self.project_q(queries)  # (bs,h,nq,dk)
        s = _split_heads(self.fc_s(language_signals), self.h)  # (bs,h,nq,dk)
        k, v = self.project_kv(keys, values)

        scale = jnp.sqrt(float(self.d_k))
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / scale
        if attention_bias is not None:
            logits = logits + attention_bias
        lang_logit = jnp.sum(q * s, axis=-1, keepdims=True) / scale  # (bs,h,nq,1)

        combined = jax.nn.softmax(
            jnp.concatenate([logits, lang_logit], axis=-1), axis=-1
        )
        out = jnp.einsum("bhqk,bhkd->bhqd", combined[..., :-1], v)
        out = out + combined[..., -1:] * s
        return self.fc_o(_merge_heads(out))


class _DecodeKVCache(nn.Module):
    """Static-shape decode cache in PACKED (bs, T, h*d) layout: ring-writes
    the step's projected K/V and the step's padding bias, returns the full
    buffers plus a bias that masks future positions.  (flax variables must
    be created in a compact method, hence this submodule.)

    Packed layout (round 3): full-lane rows feed the decode-step megakernel
    (ops/decode_step.py) directly; the XLA fallback reshapes to heads.

    `fused`: optional parameter bundle — when given, the ENTIRE step
    (projections + append + attend + out-proj + residual LayerNorm) runs as
    one Pallas kernel that updates the cache variables in place and the
    post-LN hidden is returned instead of the buffers."""

    @nn.compact
    def __call__(
        self, k_new, v_new, step_bias, max_len: int, fused=None
    ):
        # cache widths come from the PROJECTION outputs (h*d_k / h*d_v),
        # which the schema allows to differ from d_model and each other —
        # sizing from fused["x"] (d_model) or k_new for BOTH buffers broke
        # HEAD*D_KEY != D_MODEL and D_KEY != D_VALUE configs (round-3
        # review finding)
        if fused is not None:
            bs = fused["x"].shape[0]
            k_width = fused["self_w"]["wk"].shape[1]
            v_width = fused["self_w"]["wv"].shape[1]
        else:
            bs = k_new.shape[0]
            k_width = k_new.shape[2]
            v_width = v_new.shape[2]
        cached_k = self.variable(
            "cache", "key", lambda: jnp.zeros((bs, max_len, k_width), jnp.float32)
        )
        cached_v = self.variable(
            "cache", "value", lambda: jnp.zeros((bs, max_len, v_width), jnp.float32)
        )
        cached_bias = self.variable(
            "cache", "bias", lambda: jnp.zeros((bs, max_len), jnp.float32)
        )
        index = self.variable("cache", "index", lambda: jnp.zeros((), jnp.int32))
        i = index.value

        if fused is not None:
            if fused.get("kind") == "layer":
                from ...ops.decode_step import fused_decoder_layer_step

                y, new_k, new_v, new_bias = fused_decoder_layer_step(
                    fused["x"], fused["self_w"], fused["cross_w"],
                    fused["ffn_w"],
                    step_bias.reshape(bs), i,
                    cached_k.value, cached_v.value, cached_bias.value,
                    fused["enc_k"], fused["enc_v"], fused["enc_bias"],
                    fused["scale"], fused["h"],
                    interpret=fused["interpret"],
                )
            else:
                from ...ops.decode_step import fused_self_attention_step

                w = fused["self_w"]
                y, new_k, new_v, new_bias = fused_self_attention_step(
                    fused["x"],
                    w["wq"], w["bq"], w["wk"], w["bk"],
                    w["wv"], w["bv"], w["wo"], w["bo"],
                    w["ln_scale"], w["ln_bias"],
                    step_bias.reshape(bs),
                    i,
                    cached_k.value, cached_v.value, cached_bias.value,
                    fused["scale"], fused["h"],
                    interpret=fused["interpret"],
                )
            cached_k.value = new_k
            cached_v.value = new_v
            cached_bias.value = new_bias
            index.value = i + 1
            return y

        cached_k.value = jax.lax.dynamic_update_slice(
            cached_k.value, k_new, (0, i, 0)
        )
        cached_v.value = jax.lax.dynamic_update_slice(
            cached_v.value, v_new, (0, i, 0)
        )
        cached_bias.value = jax.lax.dynamic_update_slice(
            cached_bias.value, step_bias.reshape(bs, 1), (0, i)
        )
        index.value = i + 1

        positions = jnp.arange(max_len)
        future = jnp.where(positions > i, MASK_VALUE, 0.0)[None, :]
        return (
            cached_k.value,
            cached_v.value,
            (cached_bias.value + future)[:, None, None, :],
        )


class _StaticEncKVCache(nn.Module):
    """Cross-attention K/V cache for decoding: the encoder features are
    constant across decode steps, so their K/V projections are computed on
    the first step and reused (the reference re-projects every step,
    attentions.py:327 — at d_model 512 that re-projection is ~90% of the
    per-step cross-attention FLOPs).  Named `enc_kv` so the beam-search
    gather can skip these beam-invariant buffers.

    PACKED (bs, Sk, h*d) layout (round 3) — feeds the cross-attention
    decode megakernel directly; head-split consumers reshape."""

    @nn.compact
    def __call__(self, project_fn, keys, values, n_heads, d_k, d_v):
        bs, sk = keys.shape[0], keys.shape[1]
        cached_k = self.variable(
            "cache", "enc_kv_key", lambda: jnp.zeros((bs, sk, n_heads * d_k))
        )
        cached_v = self.variable(
            "cache", "enc_kv_value", lambda: jnp.zeros((bs, sk, n_heads * d_v))
        )
        filled = self.variable(
            "cache", "enc_kv_filled", lambda: jnp.zeros((), jnp.int32)
        )
        k, v = jax.lax.cond(
            filled.value > 0,
            lambda: (cached_k.value, cached_v.value),
            lambda: project_fn(keys, values),
        )
        cached_k.value, cached_v.value = k, v
        filled.value = jnp.ones((), jnp.int32)
        return k, v


class MultiHeadAttention(nn.Module):
    """Attention core + dropout + post-LN residual + optional AoA gates +
    decode-time K/V cache (attentions.py:293-338 parity)."""

    config: Any

    def setup(self):
        from ...builders import build_attention

        self.use_aoa = self.config.USE_AOA
        if self.use_aoa:
            self.informative_attention = nn.Dense(self.config.D_MODEL)
            self.gated_attention = nn.Dense(self.config.D_MODEL)
        self.attention = build_attention(self.config)
        self.dropout = nn.Dropout(rate=self.config.DROPOUT)
        self.layer_norm = nn.LayerNorm()
        self.can_be_stateful = self.config.CAN_BE_STATEFUL
        if self.can_be_stateful:
            self.kv_cache = _DecodeKVCache()
        else:
            self.enc_kv_cache = _StaticEncKVCache()

    def __call__(
        self,
        queries: jnp.ndarray,
        keys: jnp.ndarray,
        values: jnp.ndarray,
        attention_bias: Optional[jnp.ndarray] = None,
        train: bool = False,
        decode: bool = False,
        max_decode_len: int = 0,
        **kwargs,
    ) -> jnp.ndarray:
        post_ln_done = False
        if decode and self.can_be_stateful:
            out, post_ln_done = self._decode_step(
                queries, keys, values, attention_bias, max_decode_len,
                train=train, **kwargs,
            )
        elif decode and isinstance(self.attention, ScaledDotProductAttention):
            out, post_ln_done = self._cross_decode_step(
                queries, keys, values, attention_bias, train=train
            )
        else:
            out = self.attention(
                queries, keys, values, attention_bias=attention_bias,
                train=train, **kwargs,
            )
        if not post_ln_done:
            out = self.dropout(out, deterministic=not train)
            out = self.layer_norm(queries + out)
        if self.use_aoa:
            aoa_input = jnp.concatenate([queries, out], axis=-1)
            informative = self.informative_attention(aoa_input)
            gate = jax.nn.sigmoid(self.gated_attention(aoa_input))
            out = informative * gate
        return out

    def fused_weights(self) -> dict:
        """Projection + LayerNorm param values for the decode megakernels
        (read directly from the bound submodules)."""
        core = self.attention
        params_of = lambda m: m.variables["params"]  # noqa: E731
        ln = params_of(self.layer_norm)
        return {
            "wq": params_of(core.fc_q)["kernel"],
            "bq": params_of(core.fc_q)["bias"],
            "wk": params_of(core.fc_k)["kernel"],
            "bk": params_of(core.fc_k)["bias"],
            "wv": params_of(core.fc_v)["kernel"],
            "bv": params_of(core.fc_v)["bias"],
            "wo": params_of(core.fc_o)["kernel"],
            "bo": params_of(core.fc_o)["bias"],
            "ln_scale": ln["scale"],
            "ln_bias": ln["bias"],
        }

    def fill_enc_cache(self, keys, values):
        """Project the constant encoder stream into the packed enc K/V
        cache (idempotent across decode steps)."""
        core = self.attention
        return self.enc_kv_cache(
            lambda kk, vv: (core.fc_k(kk), core.fc_v(vv)),
            keys, values, core.h, core.d_k, core.d_v,
        )

    def run_layer_step(self, bundle: dict, step_bias, max_decode_len: int):
        """Run the whole-decoder-layer megakernel through this MHA's decode
        cache (the cache variables live here, so the call must too)."""
        return self.kv_cache(None, None, step_bias, max_decode_len, fused=bundle)

    def supports_fused_decode(self) -> bool:
        core = self.attention
        return (
            isinstance(core, ScaledDotProductAttention)
            and not self.use_aoa
            and core.d_k == core.d_v
        )

    def _fused_decode_mode(self, core, queries, train: bool) -> Optional[bool]:
        """None (keep XLA) or the kernel's interpret flag.  The decode-step
        megakernel fuses the wrapper's residual LayerNorm, so it only
        engages for the single-token, no-dropout decode shape."""
        from ...ops.decode_step import decode_kernel_mode

        mode = decode_kernel_mode()
        if (
            mode == "off"
            or train
            or queries.shape[1] != 1
            or not isinstance(core, ScaledDotProductAttention)
            or core.d_k != core.d_v
        ):
            return None
        return mode == "interpret"

    def _decode_step(
        self,
        queries: jnp.ndarray,
        keys: jnp.ndarray,
        values: jnp.ndarray,
        attention_bias: Optional[jnp.ndarray],
        max_decode_len: int,
        train: bool = False,
        **kwargs,
    ):
        """One-token decode: write the step's projected K/V into a
        static-shape packed cache and attend over the valid prefix.

        `attention_bias` here is the (bs,1,1,1) padding bias of the *current*
        token (the reference appends per-step masks to
        running_mask_self_attention, decoders.py:646-648 — same semantics).

        Returns (out, post_ln_done): the megakernel path fuses the residual
        LayerNorm (ops/decode_step.fused_self_attention_step — projections,
        ring-append, attend, out-proj, LN in ONE op); the XLA fallback
        returns the pre-LN attention output.
        """
        adaptive = isinstance(self.attention, AdaptiveScaledDotProductAttention)
        if not isinstance(self.attention, ScaledDotProductAttention) and not adaptive:
            raise NotImplementedError(
                "stateful decode requires ScaledDotProduct or Adaptive attention"
            )
        assert max_decode_len > 0, "max_decode_len must be set in decode mode"
        core = self.attention
        bs = queries.shape[0]
        hd = core.h * core.d_k
        import math

        step_bias = (
            attention_bias
            if attention_bias is not None
            else jnp.zeros((bs, 1, 1, 1), jnp.float32)
        )

        interpret = self._fused_decode_mode(core, queries, train)
        if interpret is not None:
            from ...ops.decode_step import (
                decode_kernel_parts,
                self_attention_step_viable,
            )

            if "self" in decode_kernel_parts() and self_attention_step_viable(
                bs, max_decode_len, hd
            ) is not None:
                fused = {
                    "x": queries[:, 0, :],
                    "self_w": self.fused_weights(),
                    "scale": 1.0 / math.sqrt(core.d_k),
                    "h": core.h,
                    "interpret": interpret,
                }
                y = self.kv_cache(
                    None, None, step_bias, max_decode_len, fused=fused
                )
                return y[:, None, :], True

        k_new = core.fc_k(keys)  # (bs, 1, h*dk) packed
        v_new = core.fc_v(values)
        k_all, v_all, bias = self.kv_cache(
            k_new, v_new, step_bias, max_decode_len
        )
        k_h = k_all.reshape(bs, max_decode_len, core.h, core.d_k).transpose(
            0, 2, 1, 3
        )
        v_h = v_all.reshape(bs, max_decode_len, core.h, core.d_v).transpose(
            0, 2, 1, 3
        )
        q = core.project_q(queries)
        if adaptive:
            # per-step adaptive attention: the language column depends only
            # on the CURRENT query and its signal, so only the standard K/V
            # prefix needs the ring cache (reference semantics: the column
            # joins the softmax, attentions.py:210-291)
            s = _split_heads(core.fc_s(kwargs["language_signals"]), core.h)
            scale = jnp.sqrt(float(core.d_k))
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k_h, preferred_element_type=jnp.float32
            ) / scale + bias
            lang_logit = jnp.sum(q * s, axis=-1, keepdims=True) / scale
            combined = jax.nn.softmax(
                jnp.concatenate([logits, lang_logit], axis=-1), axis=-1
            )
            out = jnp.einsum("bhqk,bhkd->bhqd", combined[..., :-1], v_h)
            out = out + combined[..., -1:] * s
            return core.fc_o(_merge_heads(out)), False
        return core.attend(q, k_h, v_h, bias), False

    def _cross_decode_step(
        self,
        queries: jnp.ndarray,
        keys: jnp.ndarray,
        values: jnp.ndarray,
        attention_bias: Optional[jnp.ndarray],
        train: bool = False,
    ):
        """Cross-attention during decode: keys/values are the constant
        encoder stream — projected ONCE into a packed cache and reused
        every step.  The megakernel path fuses q-proj + attend + out-proj +
        residual LayerNorm (ops/decode_step.fused_cross_attention_step)."""
        core = self.attention
        bs, sk = keys.shape[0], keys.shape[1]
        k, v = self.fill_enc_cache(keys, values)

        interpret = self._fused_decode_mode(core, queries, train)
        if interpret is not None:
            from ...ops.decode_step import (
                cross_attention_step_viable,
                decode_kernel_parts,
                fused_cross_attention_step,
            )

            hd = core.h * core.d_k
            if "cross" in decode_kernel_parts() and cross_attention_step_viable(
                bs, sk, hd
            ) is not None:
                import math

                eb = (
                    attention_bias[:, 0, 0, :]
                    if attention_bias is not None
                    else jnp.zeros((bs, sk), jnp.float32)
                )
                if eb.shape[0] != bs:
                    eb = jnp.broadcast_to(eb, (bs, sk))
                w = self.fused_weights()  # one source for param plumbing
                y = fused_cross_attention_step(
                    queries[:, 0, :],
                    w["wq"], w["bq"], w["wo"], w["bo"],
                    w["ln_scale"], w["ln_bias"],
                    k, v, eb,
                    1.0 / math.sqrt(core.d_k), core.h,
                    interpret=interpret,
                )
                return y[:, None, :], True

        k_h = k.reshape(bs, sk, core.h, core.d_k).transpose(0, 2, 1, 3)
        v_h = v.reshape(bs, sk, core.h, core.d_v).transpose(0, 2, 1, 3)
        out = core.attend(core.project_q(queries), k_h, v_h, attention_bias)
        return out, False
