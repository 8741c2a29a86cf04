"""VanillaTransformer — concat vision+text -> single self-attn encoder ->
attr-reduce -> classify (parity: /root/reference/models/vanilla_transformer.py:26-64)."""

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
from .common import AttentionReduceMLP, attention_pool, total_answers_of

_xavier = nn.initializers.xavier_uniform()


@META_ARCHITECTURE.register()
class VanillaTransformer(ClassificationModel):
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

        fused = jnp.concatenate([vision_features, text_features], axis=1)
        fused_bias = jnp.concatenate([vision_bias, text_bias], axis=-1)
        fused = build_encoder(c.ENCODER)(fused, fused_bias, train=train)

        pooled = attention_pool(
            fused, AttentionReduceMLP(c.ATTR_REDUCE)(fused, train=train)
        )
        out = nn.LayerNorm()(nn.Dense(c.D_MODEL, kernel_init=_xavier)(pooled))
        out = nn.Dense(total_answers_of(self.vocab), kernel_init=_xavier)(out)
        return jax.nn.log_softmax(out, axis=-1)
