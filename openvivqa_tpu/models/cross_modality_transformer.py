"""CrossModalityTransformer (LXMERT-style) and VisiolinguisticTransformer
(ViLBERT-style).

Parity: /root/reference/models/cross_modality_transformer.py:27-78 and
visiolinguistic_transformer.py:27-78 — classification models with dual
attr-reduce heads.  Both reference models return raw logits while the task
trains them with NLLLoss (an inconsistency); we return log-probs — argmax
predictions unchanged.

The VLSP configs (cross_modality_transformer_vlsp.yaml,
visiolinguistic_transformer_vlsp.yaml) pair these names with the generative
VlspEvjVqaTask and a DECODER section — impossible with the reference's
registered classes.  Here the models are dual-mode: when the config carries
a DECODER they run as encoder-decoder generators over region(+box) and
grid(+box) streams, which is what those configs describe.
"""

from __future__ import annotations

from typing import Any

import jax
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
from .common import DualStreamClassifier, total_answers_of
from .modules.ffn import PositionWiseFeedForward


class _DualStreamVQAModel(GenerativeModel):
    """Classification by default; generative when the config has DECODER."""

    config: Any
    vocab: Any

    def setup(self):
        c = self.config
        self.d_model = c.get("D_MODEL", 512)
        self.generative = c.get("DECODER") is not None
        self.text_embedding = build_text_embedding(c.TEXT_EMBEDDING, self.vocab)
        self.encoder = build_encoder(c.ENCODER)
        if self.generative:
            self.region_embedding = build_vision_embedding(c.REGION_EMBEDDING)
            self.grid_embedding = build_vision_embedding(c.GRID_EMBEDDING)
            self.box_embedding = build_vision_embedding(c.BOX_EMBEDDING)
            from ..config import ConfigNode

            fusion_cfg = c.get("MULTIMODAL_FUSION") or ConfigNode(
                {"D_MODEL": self.d_model, "D_FF": 4 * self.d_model, "DROPOUT": 0.1}
            )
            self.fusion = PositionWiseFeedForward(fusion_cfg)
            self.norm = nn.LayerNorm()
            self.decoder = build_decoder(c.DECODER, vocab=self.vocab)
        else:
            self.region_embedding = build_vision_embedding(c.REGION_EMBEDDING)
            self.classifier = DualStreamClassifier(c, total_answers_of(self.vocab))

    def _vision(self, batch: BatchArrays, train: bool):
        region, region_bias = self.region_embedding(
            batch["region_features"], train=train
        )
        if not self.generative:
            return region, region_bias
        region_boxes, _ = self.box_embedding(batch["region_boxes"], train=train)
        region = region + region_boxes
        grid, grid_bias = self.grid_embedding(batch["grid_features"], train=train)
        grid_boxes, _ = self.box_embedding(batch["grid_boxes"], train=train)
        grid = grid + grid_boxes
        vision = jnp.concatenate([region, grid], axis=1)
        vision_bias = jnp.concatenate([region_bias, grid_bias], axis=-1)
        return vision, vision_bias

    def encode(self, batch: BatchArrays, train: bool = False):
        vision, vision_bias = self._vision(batch, train)
        text, (text_bias, _) = self.text_embedding(
            batch["question_tokens"], train=train
        )
        vision, text = self.encoder(
            vision_features=vision,
            vision_padding_bias=vision_bias,
            language_features=text,
            language_padding_bias=text_bias,
            train=train,
        )
        if not self.generative:
            return (vision, text), (vision_bias, text_bias)
        fused = jnp.concatenate([vision, text], axis=1)
        fused_bias = jnp.concatenate([vision_bias, text_bias], axis=-1)
        fused = self.norm(self.fusion(fused, train=train))
        return fused, fused_bias

    def __call__(self, batch: BatchArrays, train: bool = False) -> jnp.ndarray:
        if self.generative:
            encoder_features, encoder_bias = self.encode(batch, train=train)
            return self.decoder(
                answer_tokens=batch["answer_tokens"],
                encoder_features=encoder_features,
                encoder_attention_bias=encoder_bias,
                train=train,
            )
        (vision, text), _ = self.encode(batch, train=train)
        out = self.classifier(vision, text, train=train)
        return jax.nn.log_softmax(out, axis=-1)


@META_ARCHITECTURE.register()
class CrossModalityTransformer(_DualStreamVQAModel):
    pass


@META_ARCHITECTURE.register()
class VisiolinguisticTransformer(_DualStreamVQAModel):
    pass
