"""Encoder stacks (flax.linen).

Parity targets: /root/reference/models/modules/encoders.py:9-253
(EncoderLayer, GuidedEncoderLayer, CrossModalityEncoderLayer, Encoder,
GeometricEncoder, GuidedAttentionEncoder, CoAttentionEncoder,
CrossModalityEncoder).  Notes:
* the reference's CrossModalityEncoderLayer computes cross-attention then
  immediately *overwrites* it with self-attention (encoders.py:375-404);
  we keep LXMERT's intended dataflow (cross -> self -> FFN) — documented
  divergence, strictly the published architecture;
* GeometricEncoder fixes the reference's broken super() call
  (encoders.py:460) and actually threads `boxes` to the attention.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...builders import META_ENCODER
from .attentions import MultiHeadAttention
from .ffn import PositionWiseFeedForward
from .position import SinusoidPositionalEmbedding


class EncoderLayer(nn.Module):
    """Self/cross attention + FFN (encoders.py:9-22 parity)."""

    config: Any

    def setup(self):
        self.mhatt = MultiHeadAttention(self.config)
        self.pwff = PositionWiseFeedForward(self.config)

    def __call__(self, queries, keys, values, attention_bias, train=False, **kwargs):
        att = self.mhatt(
            queries=queries, keys=keys, values=values,
            attention_bias=attention_bias, train=train, **kwargs,
        )
        return self.pwff(att, train=train)


class GuidedEncoderLayer(nn.Module):
    """Self-attention then guided (cross) attention then FFN
    (encoders.py:66-91 parity)."""

    config: Any

    def setup(self):
        self.self_mhatt = MultiHeadAttention(self.config)
        self.guided_mhatt = MultiHeadAttention(self.config)
        self.pwff = PositionWiseFeedForward(self.config)

    def __call__(
        self, queries, keys, values,
        self_attention_bias, guided_attention_bias, train=False, **kwargs,
    ):
        self_att = self.self_mhatt(
            queries=queries, keys=queries, values=queries,
            attention_bias=self_attention_bias, train=train, **kwargs,
        )
        guided_att = self.guided_mhatt(
            queries=self_att, keys=keys, values=values,
            attention_bias=guided_attention_bias, train=train, **kwargs,
        )
        return self.pwff(guided_att, train=train)


class CrossModalityEncoderLayer(nn.Module):
    """LXMERT dual-stream layer: cross-attn, self-attn, FFN per stream
    (encoders.py:24-64)."""

    config: Any

    def setup(self):
        c = self.config
        self.vision_language_mhattn = MultiHeadAttention(c.VISION_LANGUAGE_ATTENTION)
        self.language_vision_mhattn = MultiHeadAttention(c.LANGUAGE_VISION_ATTENTION)
        self.vision_mhattn = MultiHeadAttention(c.VISION_SELF_ATTENTION)
        self.language_mhattn = MultiHeadAttention(c.LANGUAGE_SELF_ATTENTION)
        self.vision_pff = PositionWiseFeedForward(c.VISION_SELF_ATTENTION)
        self.language_pff = PositionWiseFeedForward(c.LANGUAGE_SELF_ATTENTION)

    def __call__(
        self,
        vision_features, vision_padding_bias,
        language_features, language_padding_bias,
        train=False, **kwargs,
    ):
        vision_cross = self.vision_language_mhattn(
            queries=vision_features, keys=language_features,
            values=language_features, attention_bias=language_padding_bias,
            train=train, **kwargs,
        )
        language_cross = self.language_vision_mhattn(
            queries=language_features, keys=vision_features,
            values=vision_features, attention_bias=vision_padding_bias,
            train=train,
        )
        vision_attn = self.vision_mhattn(
            queries=vision_cross, keys=vision_cross, values=vision_cross,
            attention_bias=vision_padding_bias, train=train, **kwargs,
        )
        language_attn = self.language_mhattn(
            queries=language_cross, keys=language_cross, values=language_cross,
            attention_bias=language_padding_bias, train=train,
        )
        return (
            self.vision_pff(vision_attn, train=train),
            self.language_pff(language_attn, train=train),
        )


@META_ENCODER.register()
class Encoder(nn.Module):
    """LN + sinusoid positions, N self-attention layers
    (encoders.py:101-117 parity)."""

    config: Any

    def setup(self):
        self.pos_embedding = SinusoidPositionalEmbedding(self.config.D_MODEL)
        self.layer_norm = nn.LayerNorm()
        self.layers = [
            EncoderLayer(self.config.SELF_ATTENTION, name=f"layer_{i}")
            for i in range(self.config.LAYERS)
        ]

    def __call__(
        self,
        features: jnp.ndarray,
        padding_bias,
        train=False,
        return_layer_inputs=False,
        **kwargs,
    ):
        out = self.layer_norm(features) + self.pos_embedding(features)
        layer_inputs = []
        for layer in self.layers:
            layer_inputs.append(out)
            out = layer(
                queries=out, keys=out, values=out,
                attention_bias=padding_bias, train=train, **kwargs,
            )
        if return_layer_inputs:
            # the K/V sources an incremental decoder caches alongside its
            # own prefix (cf. m4c_common.MMT.encode_context)
            return out, layer_inputs
        return out

    def decode_step(
        self,
        token_features: jnp.ndarray,  # (bs, 1, d) pre-prologue embedding
        position: jnp.ndarray,  # (bs, 1) 1-based absolute position value
        context_inputs,  # per-layer (bs, C, d) frozen context inputs
        caches,  # per-layer (bs, T, d) decoded-prefix inputs
        step: jnp.ndarray,  # scalar int: slot to write
        attention_bias: jnp.ndarray,  # (bs, 1, 1, C+T) over [context, slots]
    ):
        """One new token through all layers against cached context +
        decoded-prefix keys (the single-stream analogue of
        BertEncoderStack's decode mode).  Returns (out (bs,1,d),
        new_caches)."""
        x = self.layer_norm(token_features) + self.pos_embedding.encode_positions(
            position
        )
        new_caches = []
        for i, layer in enumerate(self.layers):
            cache = jax.lax.dynamic_update_slice_in_dim(
                caches[i], x, step, axis=1
            )
            new_caches.append(cache)
            kv = jnp.concatenate([context_inputs[i], cache], axis=1)
            x = layer(
                queries=x, keys=kv, values=kv, attention_bias=attention_bias
            )
        return x, new_caches


@META_ENCODER.register()
class MultiModalEncoder(Encoder):
    """Single-stream encoder over a joint multimodal sequence — referenced
    by configs/{unique_transformer,iterative_m4c,m4c,experimental_mmf_m4c}
    .yaml but registered nowhere in the reference (SURVEY.md §2.3); the
    prefix-LM models pass a full (bs,1,L,L) attention bias which Encoder
    already broadcasts, so this is the Encoder under the expected name."""


@META_ENCODER.register()
class GeometricEncoder(nn.Module):
    """Encoder whose layers receive `boxes` for geometry-augmented attention
    (encoders.py:119-135; the reference's constructor is broken — fixed)."""

    config: Any

    def setup(self):
        self.pos_embedding = SinusoidPositionalEmbedding(self.config.D_MODEL)
        self.layer_norm = nn.LayerNorm()
        self.layers = [
            EncoderLayer(self.config.SELF_ATTENTION, name=f"layer_{i}")
            for i in range(self.config.LAYERS)
        ]

    def __call__(
        self, features: jnp.ndarray, boxes: jnp.ndarray, padding_bias,
        train=False, **kwargs,
    ):
        out = self.layer_norm(features) + self.pos_embedding(features)
        for layer in self.layers:
            out = layer(
                queries=out, keys=out, values=out, boxes=boxes,
                attention_bias=padding_bias, train=train, **kwargs,
            )
        return out


@META_ENCODER.register()
class GuidedAttentionEncoder(nn.Module):
    """MCAN guided-attention stack (encoders.py:137-164 parity)."""

    config: Any

    def setup(self):
        self.pos_embedding = SinusoidPositionalEmbedding(self.config.D_MODEL)
        self.layer_norm = nn.LayerNorm()
        self.guided_attn_layers = [
            GuidedEncoderLayer(self.config.GUIDED_ATTENTION, name=f"layer_{i}")
            for i in range(self.config.LAYERS)
        ]

    def __call__(
        self,
        vision_features, vision_padding_bias,
        language_features, language_padding_bias,
        train=False, **kwargs,
    ):
        out = self.layer_norm(vision_features) + self.pos_embedding(vision_features)
        for layer in self.guided_attn_layers:
            out = layer(
                queries=out, keys=language_features, values=language_features,
                self_attention_bias=vision_padding_bias,
                guided_attention_bias=language_padding_bias,
                train=train, **kwargs,
            )
        return out


@META_ENCODER.register()
class CoAttentionEncoder(nn.Module):
    """ViLBERT co-attention: per layer cross-attn both ways then self-attn
    both ways (encoders.py:166-224 parity, incl. the sequential update
    order: language cross-attends the *already updated* vision stream)."""

    config: Any

    def setup(self):
        c = self.config
        self.pos_embedding = SinusoidPositionalEmbedding(c.D_MODEL)
        self.vision_layer_norm = nn.LayerNorm()
        self.language_layer_norm = nn.LayerNorm()
        n = c.LAYERS
        self.vision_language_attn_layers = [
            EncoderLayer(c.VISION_LANGUAGE_ATTENTION, name=f"vl_{i}") for i in range(n)
        ]
        self.language_vision_attn_layers = [
            EncoderLayer(c.LANGUAGE_VISION_ATTENTION, name=f"lv_{i}") for i in range(n)
        ]
        self.vision_self_attn_layers = [
            EncoderLayer(c.VISION_SELF_ATTENTION, name=f"vs_{i}") for i in range(n)
        ]
        self.language_self_attn_layers = [
            EncoderLayer(c.LANGUAGE_SELF_ATTENTION, name=f"ls_{i}") for i in range(n)
        ]

    def __call__(
        self,
        vision_features, vision_padding_bias,
        language_features, language_padding_bias,
        train=False, **kwargs,
    ):
        vision = self.vision_layer_norm(vision_features) + self.pos_embedding(
            vision_features
        )
        language = self.language_layer_norm(language_features) + self.pos_embedding(
            language_features
        )
        for vl, lv, vs, ls in zip(
            self.vision_language_attn_layers,
            self.language_vision_attn_layers,
            self.vision_self_attn_layers,
            self.language_self_attn_layers,
        ):
            vision = vl(
                queries=vision, keys=language, values=language,
                attention_bias=language_padding_bias, train=train,
            )
            language = lv(
                queries=language, keys=vision, values=vision,
                attention_bias=vision_padding_bias, train=train,
            )
            vision = vs(
                queries=vision, keys=vision, values=vision,
                attention_bias=vision_padding_bias, train=train,
            )
            language = ls(
                queries=language, keys=language, values=language,
                attention_bias=language_padding_bias, train=train,
            )
        return vision, language


@META_ENCODER.register()
class CrossModalityEncoder(nn.Module):
    """LXMERT stack (encoders.py:226-253 parity)."""

    config: Any

    def setup(self):
        self.pos_embedding = SinusoidPositionalEmbedding(self.config.D_MODEL)
        self.vision_layer_norm = nn.LayerNorm()
        self.language_layer_norm = nn.LayerNorm()
        self.layers = [
            CrossModalityEncoderLayer(self.config, name=f"layer_{i}")
            for i in range(self.config.LAYERS)
        ]

    def __call__(
        self,
        vision_features, vision_padding_bias,
        language_features, language_padding_bias,
        train=False, **kwargs,
    ):
        vision = self.vision_layer_norm(vision_features) + self.pos_embedding(
            vision_features
        )
        language = self.language_layer_norm(language_features) + self.pos_embedding(
            language_features
        )
        for layer in self.layers:
            vision, language = layer(
                vision_features=vision,
                vision_padding_bias=vision_padding_bias,
                language_features=language,
                language_padding_bias=language_padding_bias,
                train=train, **kwargs,
            )
        return vision, language
