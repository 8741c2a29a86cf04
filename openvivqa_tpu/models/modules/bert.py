"""BERT-style transformer stack (flax.linen).

TPU-native equivalent of the HuggingFace BertEmbeddings/BertEncoder modules
the reference's MMF-ported models build on (mmf_m4c.py:7-12,258-364).
Post-LN layers with GELU intermediates (HF semantics: LN eps 1e-12,
intermediate = 4*hidden unless overridden), additive attention masks
(0 / -10e4 pre-softmax), optional cross-attention, and optional
all-hidden-states output (needed by MMF_Iterative_Multilevel_M4C).
"""

from __future__ import annotations

import os
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

LN_EPS = 1e-12
_normal = nn.initializers.normal(stddev=0.02)


def decode_cache_dtype() -> jnp.dtype:
    """Storage dtype for incremental-decode K/V caches.

    On TPU both attend paths already round K/V matmul operands to bf16 —
    the Pallas packed kernel casts in-VMEM (ops/fused_attention.py) and
    default-precision XLA matmuls round f32 operands in the MXU — so
    storing the caches in bf16 is value-identical on the attend path while
    halving the dominant per-step HBM read (4 layers x 2 x (bs, C+T, h)
    f32 at MMF dims is ~180 MB re-read per decode step) and the scan-carry
    footprint.  Off-TPU (the CPU test mesh) the XLA fallback computes
    true-f32 dots, so caches stay f32 to keep incremental-vs-quadratic
    equivalence bit-exact there.  OPENVIVQA_KV_CACHE_DTYPE=f32|bf16
    overrides for A/B benchmarking."""
    mode = os.environ.get("OPENVIVQA_KV_CACHE_DTYPE", "auto")
    if mode == "f32":
        return jnp.float32
    if mode == "bf16":
        return jnp.bfloat16
    from ...ops.fused_attention import _on_tpu

    return jnp.bfloat16 if _on_tpu() else jnp.float32


def _xla_attention(
    qp: jnp.ndarray,
    kp: jnp.ndarray,
    vp: jnp.ndarray,
    attention_bias: Optional[jnp.ndarray],
    num_heads: int,
    hidden_size: int,
    attn_dropout=None,
) -> jnp.ndarray:
    """The non-Pallas attention body on packed (b, S, h) projections — the
    ONE copy both __call__ and decode_step fall back to, so scaling and
    masking can never drift between the full-sequence and incremental
    paths."""
    head_dim = hidden_size // num_heads

    def heads(x):
        return x.reshape(x.shape[0], x.shape[1], num_heads, head_dim)

    q, k, v = heads(qp), heads(kp), heads(vp)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(float(head_dim))
    if attention_bias is not None:
        logits = logits + attention_bias
    weights = jax.nn.softmax(logits, axis=-1)
    if attn_dropout is not None:
        weights = attn_dropout(weights)
    context = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
    return context.reshape(context.shape[0], context.shape[1], hidden_size)


class BertSelfAttention(nn.Module):
    """q/k/v/out projections + softmax attention + residual LayerNorm.

    setup-style with legacy attribute names (Dense_0..Dense_3, LayerNorm_0)
    so parameter trees stay byte-compatible with the original nn.compact
    layout that the HF/torch checkpoint converters target
    (modules/hf_conversion.py, modules/torch_conversion.py)."""

    hidden_size: int
    num_heads: int
    dropout: float = 0.1

    def setup(self):
        self.Dense_0 = nn.Dense(self.hidden_size, kernel_init=_normal)  # q
        self.Dense_1 = nn.Dense(self.hidden_size, kernel_init=_normal)  # k
        self.Dense_2 = nn.Dense(self.hidden_size, kernel_init=_normal)  # v
        self.Dense_3 = nn.Dense(self.hidden_size, kernel_init=_normal)  # out
        self.LayerNorm_0 = nn.LayerNorm(epsilon=LN_EPS)
        self.attn_dropout = nn.Dropout(rate=self.dropout)
        self.out_dropout = nn.Dropout(rate=self.dropout)

    def project_kv(
        self, states: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Packed (b, S, h) key/value projections of `states` — computed
        once per sequence by incremental decoders, so per-step cost stops
        scaling with the context length (the decode-mode __call__ used to
        re-project the full [context, cache] every step)."""
        return self.Dense_1(states), self.Dense_2(states)

    def decode_step(
        self,
        hidden_states: jnp.ndarray,
        k_cache: jnp.ndarray,
        v_cache: jnp.ndarray,
        attention_bias: Optional[jnp.ndarray],
    ) -> jnp.ndarray:
        """Single-token attention over PRE-PROJECTED packed K/V caches:
        q-projection of the new token only, softmax over the cached keys,
        out-projection + residual LayerNorm.  Eval-only (no dropout).
        Routes through the Pallas packed kernel at winning key lengths
        (same dispatch as __call__ — decode streams at MMF dims sit in the
        >=192-key regime where it wins 1.4x+)."""
        from ...ops.fused_attention import (
            fused_attention_packed,
            packed_attention_viable,
            should_use_fused,
        )

        head_dim = self.hidden_size // self.num_heads
        qp = self.Dense_0(hidden_states)
        sk = k_cache.shape[1]
        scale = 1.0 / float(head_dim) ** 0.5
        use_fused = (
            should_use_fused(qp.shape[1], sk, head_dim)
            and (attention_bias is None or attention_bias.shape[1] == 1)
            and packed_attention_viable(
                qp.shape[1], sk, self.hidden_size, self.num_heads
            )
        )
        if use_fused:
            context = fused_attention_packed(
                qp, k_cache, v_cache, attention_bias, scale, self.num_heads
            )
        else:
            context = _xla_attention(
                qp, k_cache, v_cache, attention_bias,
                self.num_heads, self.hidden_size,
            )
        out = self.Dense_3(context)
        return self.LayerNorm_0(hidden_states + out)

    def _sublayer_fused(self, hidden_states, attention_bias):
        """Route the WHOLE eval-encode self-attention sublayer through the
        fused Pallas kernel F (q/k/v projections + per-head softmax with
        the key-padding bias + out projection + residual LN in ONE call —
        ops/encoder_layer.py).  MEASURED interleaved on v5e at MMF bench
        dims (bs 32, chain=64 so the ~24 ms tunnel dispatch floor is
        amortised — chain-8 numbers carry a ~3 ms/iter floor that had
        inflated the round-4 'TextBert = 40.6 %' attribution): TextBert
        question encode 0.70 -> 0.64 ms (1.09x), cumulative context
        prefix 4.08 -> 4.00 ms, full greedy batch neutral (8.0 vs 7.9 ms,
        within drift).  Kept ON: the prefix wins are real, encode-heavy
        callers (classification tasks, longer questions, deeper stacks)
        scale with the per-layer op-count cut (a 3-layer 20-token stack's
        marginal per-layer cost drops to ~45 us, scripts/
        profile_textbert.py), and greedy equivalence is pinned on-chip
        (100 % token agreement, max |score diff| 7.5e-3,
        scripts/check_decode_kernel_tpu.py).

        Engages only for multi-token SELF-attention eval encodes with a
        key-only additive bias on TPU (or interpret mode for CPU
        equivalence tests): training needs dropout + AD, cross-attention
        reads kv_states the kernel does not take, causal/full (bq > 1)
        biases never reach eval encodes here, and init must create params
        through the XLA path.  OPENVIVQA_ENCODE_ATTN=0 forces off for A/B.
        Returns None to fall through to the packed-kernel / XLA paths."""
        if (
            self.is_initializing()
            or hidden_states.ndim != 3
            or hidden_states.shape[1] <= 1
            or self.hidden_size % self.num_heads
            or os.environ.get("OPENVIVQA_ENCODE_ATTN", "") in ("0", "off")
        ):
            return None
        from ...ops.decode_step import decode_kernel_mode
        from ...ops.encoder_layer import (
            encoder_attention_plan,
            fused_encoder_self_attention,
        )

        mode = decode_kernel_mode()
        if mode == "off":
            return None
        interpret = mode == "interpret"
        bs, seq, hd = hidden_states.shape
        if attention_bias is None:
            key_bias = jnp.zeros((bs, seq), jnp.float32)
        else:
            if (
                attention_bias.ndim != 4
                or attention_bias.shape[1] != 1
                or attention_bias.shape[2] != 1
                or attention_bias.shape[3] != seq
            ):
                return None  # per-head or causal bias: not a key-only mask
            key_bias = jnp.broadcast_to(
                attention_bias[:, 0, 0, :], (bs, seq)
            ).astype(jnp.float32)
        if encoder_attention_plan(bs, seq, hd, 4 if interpret else 2) is None:
            return None
        params_of = lambda m: m.variables["params"]  # noqa: E731
        cast = (lambda w: w) if interpret else (lambda w: w.astype(jnp.bfloat16))
        pq, pk = params_of(self.Dense_0), params_of(self.Dense_1)
        pv, po = params_of(self.Dense_2), params_of(self.Dense_3)
        ln = params_of(self.LayerNorm_0)
        return fused_encoder_self_attention(
            hidden_states.astype(jnp.float32),
            {
                "wq": cast(pq["kernel"]), "bq": pq["bias"],
                "wk": cast(pk["kernel"]), "bk": pk["bias"],
                "wv": cast(pv["kernel"]), "bv": pv["bias"],
                "wo": cast(po["kernel"]), "bo": po["bias"],
                "ln_scale": ln["scale"], "ln_bias": ln["bias"],
            },
            key_bias,
            1.0 / float(self.hidden_size // self.num_heads) ** 0.5,
            self.num_heads, LN_EPS, interpret=interpret,
        ).astype(hidden_states.dtype)

    def __call__(
        self,
        hidden_states: jnp.ndarray,
        kv_states: Optional[jnp.ndarray] = None,
        attention_bias: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        if kv_states is None and not train:
            fused = self._sublayer_fused(hidden_states, attention_bias)
            if fused is not None:
                return fused
        kv = hidden_states if kv_states is None else kv_states
        head_dim = self.hidden_size // self.num_heads

        qp = self.Dense_0(hidden_states)
        kp = self.Dense_1(kv)
        vp = self.Dense_2(kv)

        from ...ops.fused_attention import (
            dropout_attention_viable,
            fused_attention_packed,
            fused_attention_packed_dropout,
            packed_attention_viable,
            should_use_fused,
        )

        # Pallas packed kernel for the long streams (ViT 197 / BERT 256 /
        # MMT 350-640 tokens: measured 1.4-1.8x over XLA on v5e,
        # ops/fused_attention.py) — consumes the raw dense outputs, zero
        # head-split transposes.  Training with attention-weights dropout
        # uses the in-kernel-PRNG variant (masks regenerated in the Pallas
        # backward; 1.72x over XLA fwd+bwd at MMT dims); per-head biases
        # never reach this module.
        wants_dropout = train and self.dropout > 0.0
        shape_ok = should_use_fused(
            qp.shape[1], kp.shape[1], head_dim
        ) and (attention_bias is None or attention_bias.shape[1] == 1)
        if wants_dropout:
            use_fused = (
                shape_ok
                and self.has_rng("dropout")
                and dropout_attention_viable(
                    qp.shape[1], kp.shape[1], self.hidden_size, self.num_heads
                )
            )
        else:
            use_fused = shape_ok and packed_attention_viable(
                qp.shape[1], kp.shape[1], self.hidden_size, self.num_heads
            )
        if use_fused and wants_dropout:
            seed = jax.random.randint(
                self.make_rng("dropout"), (1,), 0,
                jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
            )
            context = fused_attention_packed_dropout(
                qp, kp, vp, attention_bias, seed,
                1.0 / float(head_dim) ** 0.5, self.num_heads, self.dropout,
            )
        elif use_fused:
            context = fused_attention_packed(
                qp, kp, vp, attention_bias,
                1.0 / float(head_dim) ** 0.5, self.num_heads,
            )
        else:
            context = _xla_attention(
                qp, kp, vp, attention_bias, self.num_heads, self.hidden_size,
                attn_dropout=lambda w: self.attn_dropout(
                    w, deterministic=not train
                ),
            )

        out = self.Dense_3(context)
        out = self.out_dropout(out, deterministic=not train)
        return self.LayerNorm_0(hidden_states + out)


class BertLayer(nn.Module):
    """Self-attention (+ optional cross-attention) + GELU FFN, post-LN.

    setup-style with legacy attribute names (BertSelfAttention_0/1,
    Dense_0/1, LayerNorm_0) matching the original nn.compact auto-naming
    so checkpoints and the HF/torch converters stay byte-compatible."""

    hidden_size: int
    num_heads: int
    intermediate_size: Optional[int] = None
    dropout: float = 0.1
    cross_attention: bool = False

    def setup(self):
        self.BertSelfAttention_0 = BertSelfAttention(
            self.hidden_size, self.num_heads, self.dropout
        )
        if self.cross_attention:
            self.BertSelfAttention_1 = BertSelfAttention(
                self.hidden_size, self.num_heads, self.dropout
            )
        intermediate_size = self.intermediate_size or 4 * self.hidden_size
        self.Dense_0 = nn.Dense(intermediate_size, kernel_init=_normal)
        self.Dense_1 = nn.Dense(self.hidden_size, kernel_init=_normal)
        self.ffn_dropout = nn.Dropout(rate=self.dropout)
        self.LayerNorm_0 = nn.LayerNorm(epsilon=LN_EPS)

    def ffn(self, hidden_states: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        fused = self._ffn_fused(hidden_states, train)
        if fused is not None:
            return fused
        intermediate = jax.nn.gelu(self.Dense_0(hidden_states), approximate=False)
        out = self.Dense_1(intermediate)
        out = self.ffn_dropout(out, deterministic=not train)
        return self.LayerNorm_0(hidden_states + out)

    def _ffn_fused(self, hidden_states, train: bool):
        """Route the full-sequence encode FFN through the fused Pallas FFN
        kernel (Dense -> erf-GELU -> Dense -> residual LN in ONE call).
        Measured on v5e at the MMT context-encode shape (32x220x768,
        d_ff 3072): 0.45 ms vs 0.77 ms for the XLA sublayer — the encode
        was the largest MMF-greedy stage (4.67 ms of 9.13, chain-64
        knockout) and its FFN half ran at ~2.3x off the MXU roofline from
        the extra LN/GELU memory passes the kernel keeps in VMEM.

        Engages only for multi-token eval encodes on TPU (or interpret
        mode for CPU equivalence tests): training needs dropout + AD
        (pallas_call has no VJP here), single-token rows belong to the
        decode kernels (in-scan weight casts would NOT be hoisted by XLA,
        CLAUDE.md), and init must create params through the XLA path.
        OPENVIVQA_ENCODE_FFN=0 forces off for A/B."""
        if (
            train
            or self.is_initializing()
            or hidden_states.ndim != 3
            or hidden_states.shape[1] <= 1
            or os.environ.get("OPENVIVQA_ENCODE_FFN", "") in ("0", "off")
        ):
            return None
        from ...ops.decode_step import (
            decode_kernel_mode,
            ffn_step_viable,
            fused_ffn_step,
        )

        mode = decode_kernel_mode()
        if mode == "off":
            return None
        interpret = mode == "interpret"
        bs, seq, hd = hidden_states.shape
        d_ff = self.intermediate_size or 4 * self.hidden_size
        if ffn_step_viable(bs * seq, hd, d_ff, 4 if interpret else 2) is None:
            return None
        params_of = lambda m: m.variables["params"]  # noqa: E731
        cast = (lambda w: w) if interpret else (lambda w: w.astype(jnp.bfloat16))
        p1, p2 = params_of(self.Dense_0), params_of(self.Dense_1)
        ln = params_of(self.LayerNorm_0)
        out = fused_ffn_step(
            hidden_states.reshape(bs * seq, hd),
            cast(p1["kernel"]), p1["bias"],
            cast(p2["kernel"]), p2["bias"],
            ln["scale"], ln["bias"],
            interpret=interpret, eps=LN_EPS,
        )
        return out.reshape(bs, seq, hd).astype(hidden_states.dtype)

    def project_kv(self, states: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Self-attention packed K/V projections (see BertSelfAttention)."""
        return self.BertSelfAttention_0.project_kv(states)

    def project_cross_kv(
        self, states: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Cross-attention packed K/V projections of the (step-invariant)
        encoder states — computed once per sequence by incremental decoders
        instead of once per decode step."""
        return self.BertSelfAttention_1.project_kv(states)

    def decode_step(
        self,
        hidden_states: jnp.ndarray,  # (bs, 1, h) the new token
        k_cache: jnp.ndarray,  # (bs, K, h) packed pre-projected keys
        v_cache: jnp.ndarray,
        attention_bias: Optional[jnp.ndarray],
        cross_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        encoder_bias: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """One decode token against pre-projected K/V: self-attention over
        the packed caches, optional cross-attention over pre-projected
        encoder K/V, then the FFN.  Eval-only (no dropout)."""
        hidden_states = self.BertSelfAttention_0.decode_step(
            hidden_states, k_cache, v_cache, attention_bias
        )
        if cross_kv is not None:
            hidden_states = self.BertSelfAttention_1.decode_step(
                hidden_states, cross_kv[0], cross_kv[1], encoder_bias
            )
        return self.ffn(hidden_states)

    def __call__(
        self,
        hidden_states: jnp.ndarray,
        attention_bias: Optional[jnp.ndarray] = None,
        encoder_states: Optional[jnp.ndarray] = None,
        encoder_bias: Optional[jnp.ndarray] = None,
        kv_states: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        # kv_states: the self-attention reads keys/values from an external
        # sequence while the residual stays on the query tokens
        hidden_states = self.BertSelfAttention_0(
            hidden_states,
            kv_states=kv_states,
            attention_bias=attention_bias,
            train=train,
        )
        if self.cross_attention:
            hidden_states = self.BertSelfAttention_1(
                hidden_states,
                kv_states=encoder_states,
                attention_bias=encoder_bias,
                train=train,
            )
        return self.ffn(hidden_states, train=train)


class BertEncoderStack(nn.Module):
    """N BertLayers.  Full-sequence encode via __call__; incremental decode
    via project_context (once per sequence) + decode_step (once per token)
    over pre-projected packed K/V caches — per-step cost is O(C+T) attention
    only, with no re-projection of the context keys/values."""

    hidden_size: int
    num_layers: int
    num_heads: int
    intermediate_size: Optional[int] = None
    dropout: float = 0.1
    cross_attention: bool = False

    def setup(self):
        self.layers = [
            BertLayer(
                self.hidden_size,
                self.num_heads,
                self.intermediate_size,
                self.dropout,
                self.cross_attention,
                name=f"layer_{i}",
            )
            for i in range(self.num_layers)
        ]

    def __call__(
        self,
        hidden_states: jnp.ndarray,
        attention_bias: Optional[jnp.ndarray] = None,
        encoder_states: Optional[jnp.ndarray] = None,
        encoder_bias: Optional[jnp.ndarray] = None,
        train: bool = False,
        return_all: bool = False,
        return_layer_inputs: bool = False,
    ):
        if return_all and return_layer_inputs:
            # the early return below would silently drop all_states —
            # callers needing both should make two calls (the layer inputs
            # are the all-states list shifted by one plus hidden_states)
            raise ValueError(
                "return_all and return_layer_inputs are mutually exclusive"
            )
        all_states: List[jnp.ndarray] = []
        layer_inputs: List[jnp.ndarray] = []
        for layer in self.layers:
            layer_inputs.append(hidden_states)
            hidden_states = layer(
                hidden_states,
                attention_bias=attention_bias,
                encoder_states=encoder_states,
                encoder_bias=encoder_bias,
                train=train,
            )
            all_states.append(hidden_states)
        if return_layer_inputs:
            # inputs to each layer — the K/V sources an incremental decoder
            # projects + caches (see m4c_common.MMT.encode_context)
            return hidden_states, layer_inputs
        if return_all:
            return hidden_states, all_states
        return hidden_states

    def project_context(self, layer_inputs) -> Tuple:
        """Per-layer packed (K, V) projections of the frozen context states
        (the `layer_inputs` returned by __call__) — computed ONCE per
        sequence so decode steps never re-project the context."""
        return tuple(
            layer.project_kv(states)
            for layer, states in zip(self.layers, layer_inputs)
        )

    @staticmethod
    def init_decode_caches(context_kv, dec_len: int) -> Tuple:
        """Joint per-layer (K, V) caches: the pre-projected context K/V
        followed by dec_len zeroed slots that decode_step fills IN PLACE
        (single-row dynamic updates on the scan carry — the per-step
        [context, cache] concatenation of the naive layout was measured
        1.3x slower than even full K/V re-projection at MMF dims).
        Stored in decode_cache_dtype() (bf16 on TPU: the attend paths
        round K/V to bf16 anyway, so this halves per-step HBM reads for
        free)."""
        dtype = decode_cache_dtype()

        def with_slots(x):
            bs, _, h = x.shape
            return jnp.concatenate(
                [x.astype(dtype), jnp.zeros((bs, dec_len, h), dtype)], axis=1
            )

        return tuple((with_slots(k), with_slots(v)) for k, v in context_kv)

    # -- kernel-D fused decode (ops/decode_step.py) -------------------------
    # One pallas_call per sublayer instead of ~12 XLA ops: the M4C decode
    # step was measured op-LATENCY-bound (0.62 ms/step at MMF dims spread
    # over ~60 tiny ops), so op-count is the only lever left.  The context
    # K/V is read-only in the kernel (it never changes across steps) and
    # only the (bs, T, h) slot caches ride the scan carry.

    def fused_step_bundles(self, bs: int, ctx_len: int, dec_len: int):
        """Per-layer fused-step weight bundles (matrices cast to bf16 on
        hardware — MXU default precision rounds operands to bf16 anyway;
        identity in interpret mode for the CPU equivalence tests).  Call
        ONCE outside the decode scan: XLA does not hoist scan invariants,
        so casting inside the body would re-convert ~14 MB per step.
        Returns None when the kernels cannot engage (off-TPU, cross
        attention, VMEM plan misfit)."""
        from ...ops.decode_step import (
            bert_self_step_plan,
            decode_kernel_mode,
            decode_kernel_parts,
            ffn_step_viable,
        )

        mode = decode_kernel_mode()
        hd = self.hidden_size
        d_ff = self.intermediate_size or 4 * hd
        if (
            mode == "off"
            or "layer" not in decode_kernel_parts()
            or self.cross_attention
            or hd % self.num_heads
        ):
            return None
        interpret = mode == "interpret"
        wb = 4 if interpret else 2
        cb = 2 if decode_cache_dtype() == jnp.bfloat16 else 4
        plan = bert_self_step_plan(bs, ctx_len, dec_len, hd, cb, wb)
        if plan is None or ffn_step_viable(bs, hd, d_ff, wb) is None:
            return None

        cast = (lambda w: w) if interpret else (lambda w: w.astype(jnp.bfloat16))
        params_of = lambda m: m.variables["params"]  # noqa: E731
        layers = []
        for layer in self.layers:
            sa = layer.BertSelfAttention_0
            sa_ln = params_of(sa.LayerNorm_0)
            ffn_ln = params_of(layer.LayerNorm_0)
            layers.append(
                {
                    "self": {
                        "wq": cast(params_of(sa.Dense_0)["kernel"]),
                        "bq": params_of(sa.Dense_0)["bias"],
                        "wk": cast(params_of(sa.Dense_1)["kernel"]),
                        "bk": params_of(sa.Dense_1)["bias"],
                        "wv": cast(params_of(sa.Dense_2)["kernel"]),
                        "bv": params_of(sa.Dense_2)["bias"],
                        "wo": cast(params_of(sa.Dense_3)["kernel"]),
                        "bo": params_of(sa.Dense_3)["bias"],
                        "ln_scale": sa_ln["scale"],
                        "ln_bias": sa_ln["bias"],
                    },
                    "ffn": {
                        "w1": cast(params_of(layer.Dense_0)["kernel"]),
                        "b1": params_of(layer.Dense_0)["bias"],
                        "w2": cast(params_of(layer.Dense_1)["kernel"]),
                        "b2": params_of(layer.Dense_1)["bias"],
                        "ln_scale": ffn_ln["scale"],
                        "ln_bias": ffn_ln["bias"],
                    },
                }
            )
        return {"layers": layers, "interpret": interpret, "plan": plan}

    def init_fused_decode_state(self, context_kv, col_bias, dec_len: int):
        """Kernel-D decode state from the pre-projected context K/V:
        (bundles, per-layer cast ctx (K, V) padded to the plan's chunk
        multiple, per-layer zeroed slot caches, (nj, bs, chunk) context
        bias with MASK_VALUE on the pad rows) — or None when the kernels
        cannot engage.  The kernel streams the context chunk-by-chunk over
        its second grid dim; padded rows score exp(-1e5 - m) == 0.0 in
        f32, identical to the XLA path's masked rows.  Everything here is
        computed ONCE per sequence, outside the scan."""
        from .masks import MASK_VALUE

        bs, ctx_len = context_kv[0][0].shape[0], context_kv[0][0].shape[1]
        bundles = self.fused_step_bundles(bs, ctx_len, dec_len)
        if bundles is None:
            return None
        _, chunk = bundles["plan"]
        nj = -(-ctx_len // chunk)
        pad = nj * chunk - ctx_len
        dtype = decode_cache_dtype()

        def pad_ctx(x):
            x = x.astype(dtype)
            if pad:
                x = jnp.concatenate(
                    [x, jnp.zeros((bs, pad, x.shape[2]), dtype)], axis=1
                )
            return x

        ctx_kvs = tuple((pad_ctx(k), pad_ctx(v)) for k, v in context_kv)
        slots = tuple(
            tuple(
                jnp.zeros((bs, dec_len, self.hidden_size), dtype)
                for _ in range(2)
            )
            for _ in self.layers
        )
        ctx_bias = jnp.broadcast_to(
            col_bias[:, 0, 0, :], (bs, ctx_len)
        ).astype(jnp.float32)
        if pad:
            ctx_bias = jnp.concatenate(
                [ctx_bias, jnp.full((bs, pad), MASK_VALUE, jnp.float32)],
                axis=1,
            )
        ctx_bias = ctx_bias.reshape(bs, nj, chunk).transpose(1, 0, 2)
        return {
            "bundles": bundles,
            "ctx_kvs": ctx_kvs,
            "slots": slots,
            "ctx_bias": ctx_bias,
        }

    def fused_decode_step(self, hidden_states, state, slot_caches, step):
        """One new token through all layers via the kernel-D pair (fused
        self-attention over [frozen context | slots] + fused BERT FFN).
        Exactly the decode_step semantics below at eps 1e-12; equivalence
        pinned in tests/test_fused_m4c_step.py.  Returns (out (bs, 1, h),
        new_slot_caches)."""
        from ...ops.decode_step import fused_bert_self_step, fused_ffn_step

        bundles = state["bundles"]
        interpret = bundles["interpret"]
        scale = 1.0 / float(self.hidden_size // self.num_heads) ** 0.5
        x = hidden_states[:, 0, :]
        new_slots = []
        for i in range(len(self.layers)):
            w = bundles["layers"][i]
            x, sk, sv = fused_bert_self_step(
                x, w["self"], state["ctx_kvs"][i],
                slot_caches[i][0], slot_caches[i][1],
                step, state["ctx_bias"], scale, self.num_heads, LN_EPS,
                interpret=interpret,
            )
            new_slots.append((sk, sv))
            f = w["ffn"]
            x = fused_ffn_step(
                x, f["w1"], f["b1"], f["w2"], f["b2"],
                f["ln_scale"], f["ln_bias"],
                interpret=interpret, eps=LN_EPS,
            )
        return x[:, None, :], tuple(new_slots)

    def decode_step(
        self,
        hidden_states: jnp.ndarray,  # (bs, 1, h) the new token
        kv_caches,  # per-layer (K, V) (bs, C+T, h) from init_decode_caches
        pos: jnp.ndarray,  # scalar int: ABSOLUTE slot to write (C + step)
        attention_bias: Optional[jnp.ndarray],  # (bs, 1, 1, C+T)
    ):
        """One new token through all layers: project ONLY the new token's
        K/V, write it at `pos`, attend over the joint pre-projected
        [context, decoded-prefix] keys.  Returns (out, new_caches).

        Self-attention stacks only: a cross_attention=True stack must
        drive its layers directly with per-layer cross_kv (the
        mmf_variants.py incremental decoder pattern) — this method would
        silently skip the cross sublayer."""
        if self.cross_attention:
            raise NotImplementedError(
                "BertEncoderStack.decode_step does not thread cross_kv; "
                "drive layer.decode_step(..., cross_kv=...) per layer "
                "instead (see models/mmf_variants.py)"
            )
        new_caches = []
        for i, layer in enumerate(self.layers):
            k_new, v_new = layer.project_kv(hidden_states)
            k_cache = jax.lax.dynamic_update_slice_in_dim(
                kv_caches[i][0], k_new.astype(kv_caches[i][0].dtype), pos, axis=1
            )
            v_cache = jax.lax.dynamic_update_slice_in_dim(
                kv_caches[i][1], v_new.astype(kv_caches[i][1].dtype), pos, axis=1
            )
            new_caches.append((k_cache, v_cache))
            hidden_states = layer.decode_step(
                hidden_states, k_cache, v_cache, attention_bias
            )
        return hidden_states, tuple(new_caches)


class BertEmbeddings(nn.Module):
    """Word + learned position (+ token type) embeddings, LN, dropout."""

    vocab_size: int
    hidden_size: int
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        token_ids: jnp.ndarray,
        token_type_ids: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        seq_len = token_ids.shape[1]
        words = nn.Embed(self.vocab_size, self.hidden_size, embedding_init=_normal)(
            token_ids
        )
        positions = nn.Embed(
            self.max_position_embeddings, self.hidden_size, embedding_init=_normal
        )(jnp.arange(seq_len)[None, :])
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(token_ids)
        types = nn.Embed(
            self.type_vocab_size, self.hidden_size, embedding_init=_normal
        )(token_type_ids)
        out = nn.LayerNorm(epsilon=LN_EPS)(words + positions + types)
        return nn.Dropout(rate=self.dropout)(out, deterministic=not train)
