"""IterativeMCAN — MCAN encoder stack + transformer decoder (generative).

Parity: /root/reference/models/iterative_mcan.py:13-70 (encoder_forward
fuses SA/GA streams by concatenation + FFN + LN, :43-70).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..builders import (
    META_ARCHITECTURE,
    build_decoder,
    build_encoder,
    build_text_embedding,
    build_vision_embedding,
)
from .base import BatchArrays, GenerativeModel
from .modules.ffn import PositionWiseFeedForward


@META_ARCHITECTURE.register()
class IterativeMCAN(GenerativeModel):
    config: Any
    vocab: Any

    def setup(self):
        self.text_embedding = build_text_embedding(
            self.config.TEXT_EMBEDDING, self.vocab
        )
        self.vision_embedding = build_vision_embedding(self.config.VISION_EMBEDDING)
        self.self_encoder = build_encoder(self.config.SELF_ENCODER)
        self.guided_encoder = build_encoder(self.config.GUIDED_ENCODER)
        self.fusion = PositionWiseFeedForward(self.config.MULTIMODAL_FUSION)
        self.norm = nn.LayerNorm()
        self.decoder = build_decoder(self.config.DECODER, vocab=self.vocab)

    def _vision(self, batch: BatchArrays, train: bool):
        """Vision stream hook — ReadableIterativeMCAN overrides this with
        the VisionOcrEmbedding fusion; everything after it is shared."""
        return self.vision_embedding(batch["region_features"], train=train)

    def encode(self, batch: BatchArrays, train: bool = False):
        vision_features, vision_bias = self._vision(batch, train)
        text_features, (text_bias, _) = self.text_embedding(
            batch["question_tokens"], train=train
        )

        text_features = self.self_encoder(
            features=text_features, padding_bias=text_bias, train=train
        )
        vision_features = self.guided_encoder(
            vision_features=vision_features,
            vision_padding_bias=vision_bias,
            language_features=text_features,
            language_padding_bias=text_bias,
            train=train,
        )

        encoder_features = jnp.concatenate([vision_features, text_features], axis=1)
        encoder_bias = jnp.concatenate([vision_bias, text_bias], axis=-1)
        encoder_features = self.norm(self.fusion(encoder_features, train=train))
        return encoder_features, encoder_bias

    def __call__(self, batch: BatchArrays, train: bool = False) -> jnp.ndarray:
        encoder_features, encoder_bias = self.encode(batch, train=train)
        return self.decoder(
            answer_tokens=batch["answer_tokens"],
            encoder_features=encoder_features,
            encoder_attention_bias=encoder_bias,
            train=train,
        )
