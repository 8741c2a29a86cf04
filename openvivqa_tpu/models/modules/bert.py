"""BERT-style transformer stack (flax.linen).

TPU-native equivalent of the HuggingFace BertEmbeddings/BertEncoder modules
the reference's MMF-ported models build on (mmf_m4c.py:7-12,258-364).
Post-LN layers with GELU intermediates (HF semantics: LN eps 1e-12,
intermediate = 4*hidden unless overridden), additive attention masks
(0 / -10e4 pre-softmax), optional cross-attention, and optional
all-hidden-states output (needed by MMF_Iterative_Multilevel_M4C).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

LN_EPS = 1e-12
_normal = nn.initializers.normal(stddev=0.02)


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

    def __call__(
        self,
        hidden_states: jnp.ndarray,
        kv_states: Optional[jnp.ndarray] = None,
        attention_bias: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
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
        intermediate = jax.nn.gelu(self.Dense_0(hidden_states), approximate=False)
        out = self.Dense_1(intermediate)
        out = self.ffn_dropout(out, deterministic=not train)
        return self.LayerNorm_0(hidden_states + out)

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
        1.3x slower than even full K/V re-projection at MMF dims)."""
        def with_slots(x):
            bs, _, h = x.shape
            return jnp.concatenate(
                [x, jnp.zeros((bs, dec_len, h), x.dtype)], axis=1
            )

        return tuple((with_slots(k), with_slots(v)) for k, v in context_kv)

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
                kv_caches[i][0], k_new, pos, axis=1
            )
            v_cache = jax.lax.dynamic_update_slice_in_dim(
                kv_caches[i][1], v_new, pos, axis=1
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
