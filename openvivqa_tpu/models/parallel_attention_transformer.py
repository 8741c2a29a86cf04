"""ParallelAttentionTransformer — ViLBERT-style co-attention encoder with
dual attr-reduce classification (parity:
/root/reference/models/parallel_attention_transformer.py:26-67)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builders import (
    META_ARCHITECTURE,
    build_encoder,
    build_text_embedding,
    build_vision_embedding,
)
from .base import BatchArrays, ClassificationModel
from .common import DualStreamClassifier, total_answers_of


@META_ARCHITECTURE.register()
class ParallelAttentionTransformer(ClassificationModel):
    config: Any
    vocab: Any

    @nn.compact
    def __call__(self, batch: BatchArrays, train: bool = False) -> jnp.ndarray:
        c = self.config
        vision_features, vision_bias = build_vision_embedding(c.VISION_EMBEDDING)(
            batch["region_features"], train=train
        )
        text_features, (text_bias, _) = build_text_embedding(
            c.TEXT_EMBEDDING, self.vocab
        )(batch["question_tokens"], train=train)

        vision_features, text_features = build_encoder(c.ENCODER)(
            vision_features=vision_features,
            vision_padding_bias=vision_bias,
            language_features=text_features,
            language_padding_bias=text_bias,
            train=train,
        )
        out = DualStreamClassifier(c, total_answers_of(self.vocab))(
            vision_features, text_features, train=train
        )
        return jax.nn.log_softmax(out, axis=-1)
