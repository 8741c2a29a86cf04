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


class BertSelfAttention(nn.Module):
    hidden_size: int
    num_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        kv_states: Optional[jnp.ndarray] = None,
        attention_bias: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        kv = hidden_states if kv_states is None else kv_states
        head_dim = self.hidden_size // self.num_heads

        qp = nn.Dense(self.hidden_size, kernel_init=_normal)(hidden_states)
        kp = nn.Dense(self.hidden_size, kernel_init=_normal)(kv)
        vp = nn.Dense(self.hidden_size, kernel_init=_normal)(kv)

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
            def heads(x):
                return x.reshape(
                    x.shape[0], x.shape[1], self.num_heads, head_dim
                )

            q, k, v = heads(qp), heads(kp), heads(vp)
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) / jnp.sqrt(float(head_dim))
            if attention_bias is not None:
                logits = logits + attention_bias
            weights = jax.nn.softmax(logits, axis=-1)
            weights = nn.Dropout(rate=self.dropout)(
                weights, deterministic=not train
            )
            context = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
            context = context.reshape(
                context.shape[0], context.shape[1], self.hidden_size
            )

        out = nn.Dense(self.hidden_size, kernel_init=_normal)(context)
        out = nn.Dropout(rate=self.dropout)(out, deterministic=not train)
        return nn.LayerNorm(epsilon=LN_EPS)(hidden_states + out)


class BertLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: Optional[int] = None
    dropout: float = 0.1
    cross_attention: bool = False

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        attention_bias: Optional[jnp.ndarray] = None,
        encoder_states: Optional[jnp.ndarray] = None,
        encoder_bias: Optional[jnp.ndarray] = None,
        kv_states: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        # kv_states: decode-step mode — the self-attention reads keys/values
        # from an externally assembled [context, dec-cache] sequence while
        # the residual stays on the query tokens
        attn = BertSelfAttention(self.hidden_size, self.num_heads, self.dropout)
        hidden_states = attn(
            hidden_states,
            kv_states=kv_states,
            attention_bias=attention_bias,
            train=train,
        )
        if self.cross_attention:
            cross = BertSelfAttention(self.hidden_size, self.num_heads, self.dropout)
            hidden_states = cross(
                hidden_states,
                kv_states=encoder_states,
                attention_bias=encoder_bias,
                train=train,
            )
        intermediate_size = self.intermediate_size or 4 * self.hidden_size
        intermediate = jax.nn.gelu(
            nn.Dense(intermediate_size, kernel_init=_normal)(hidden_states),
            approximate=False,
        )
        out = nn.Dense(self.hidden_size, kernel_init=_normal)(intermediate)
        out = nn.Dropout(rate=self.dropout)(out, deterministic=not train)
        return nn.LayerNorm(epsilon=LN_EPS)(hidden_states + out)


class BertEncoderStack(nn.Module):
    hidden_size: int
    num_layers: int
    num_heads: int
    intermediate_size: Optional[int] = None
    dropout: float = 0.1
    cross_attention: bool = False

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        attention_bias: Optional[jnp.ndarray] = None,
        encoder_states: Optional[jnp.ndarray] = None,
        encoder_bias: Optional[jnp.ndarray] = None,
        train: bool = False,
        return_all: bool = False,
        return_layer_inputs: bool = False,
        context_inputs: Optional[List[jnp.ndarray]] = None,
        dec_caches: Optional[List[jnp.ndarray]] = None,
        step: Optional[jnp.ndarray] = None,
    ):
        """Full-sequence encode by default.  Decode-step mode (all three of
        context_inputs/dec_caches/step given): hidden_states is ONE new
        token (bs, 1, h); each layer i writes its input into dec_caches[i]
        at `step` and attends over [context_inputs[i], dec_caches[i]] with
        `attention_bias` covering that concatenated key space.  Returns
        (output, updated_caches)."""
        decode_mode = dec_caches is not None
        all_states: List[jnp.ndarray] = []
        layer_inputs: List[jnp.ndarray] = []
        new_caches: List[jnp.ndarray] = []
        for i in range(self.num_layers):
            layer_inputs.append(hidden_states)
            kv_states = None
            if decode_mode:
                cache = jax.lax.dynamic_update_slice_in_dim(
                    dec_caches[i], hidden_states, step, axis=1
                )
                new_caches.append(cache)
                kv_states = jnp.concatenate([context_inputs[i], cache], axis=1)
            hidden_states = BertLayer(
                self.hidden_size,
                self.num_heads,
                self.intermediate_size,
                self.dropout,
                self.cross_attention,
                name=f"layer_{i}",
            )(
                hidden_states,
                attention_bias=attention_bias,
                encoder_states=encoder_states,
                encoder_bias=encoder_bias,
                kv_states=kv_states,
                train=train,
            )
            all_states.append(hidden_states)
        if decode_mode:
            return hidden_states, new_caches
        if return_layer_inputs:
            # inputs to each layer — the K/V sources an incremental decoder
            # caches (see m4c_common.MMT.encode_context)
            return hidden_states, layer_inputs
        if return_all:
            return hidden_states, all_states
        return hidden_states


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
