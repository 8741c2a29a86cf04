"""ViT/pretrained-LM backed models + the configs' dangling architectures.

Parity targets:
* ViTmBERTClassification — vit_mbert_classification.py:11-37 (frozen ViT +
  frozen mBERT, concat, linear fusion, token-sum, classify).
* ViTmBERTGeneration — vit_mbert_generation.py:12-53 (grid features + mBERT
  question embedding -> fusion -> Decoder).
* ViTmT5 — vit_mt5.py:11-57 (ViT pixels + T5 question embedding -> linear
  fusion -> Decoder; the reference's `nn.Linear(config.MULTIMODAL_FUSION)`
  is a crash — implemented as Dense(D_MODEL)).
* ExtendedMCAN — referenced by configs/extended_mcan_vlsp.yaml but absent
  from the reference's registries (SURVEY.md §2.3); implemented from its
  config: region/grid/box streams + SA/GA encoders + fusion + decoder.
* ReadableIterativeMCAN — readable_iterative_mcan.py:13-78: IterativeMCAN
  with the VisionOcrEmbedding multi-stream vision front-end.
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
from .common import total_answers_of
from .base import BatchArrays, ClassificationModel, GenerativeModel
from .iterative_mcan import IterativeMCAN
from .modules.ffn import PositionWiseFeedForward

_xavier = nn.initializers.xavier_uniform()


def _vision_input(batch: BatchArrays):
    """ViT models feed raw pixels when available, else grid features."""
    if "pixel_values" in batch:
        return batch["pixel_values"]
    return batch["grid_features"]


def _question_input(batch: BatchArrays, text_config):
    """Prefer real HF backbone ids (datasets configured with HF_TOKENIZER
    emit `question_backbone_tokens` + `question_backbone_mask`;
    text_embeddings.py:329-330 parity) over framework-vocab ids.  Returns
    (tokens, padding_idx_or_None, padding_mask_or_None) — the mask carries
    the tokenizer's REAL pad id (RoBERTa-family tokenizers pad with 1), so
    it always wins over the PRETRAINED_PAD_ID fallback."""
    if "question_backbone_tokens" in batch:
        mask = batch.get("question_backbone_mask")
        pad = int(text_config.get("PRETRAINED_PAD_ID") or 0)
        return batch["question_backbone_tokens"], pad, mask
    return batch["question_tokens"], None, None


@META_ARCHITECTURE.register()
class ViTmBERTClassification(ClassificationModel):
    config: Any
    vocab: Any

    @nn.compact
    def __call__(self, batch: BatchArrays, train: bool = False) -> jnp.ndarray:
        c = self.config
        vision_features, _ = build_vision_embedding(c.VISION_EMBEDDING)(
            _vision_input(batch), train=train
        )
        tokens, pad, mask = _question_input(batch, c.TEXT_EMBEDDING)
        text_features, _ = build_text_embedding(c.TEXT_EMBEDDING, self.vocab)(
            tokens, train=train, padding_idx=pad, padding_mask=mask
        )
        fused = jnp.concatenate([vision_features, text_features], axis=1)
        fused = nn.Dropout(rate=c.DROPOUT)(
            nn.Dense(c.D_MODEL, kernel_init=_xavier)(fused),
            deterministic=not train,
        )
        pooled = jnp.sum(fused, axis=1)
        out = nn.Dense(total_answers_of(self.vocab), kernel_init=_xavier)(pooled)
        return jax.nn.log_softmax(out, axis=-1)


@META_ARCHITECTURE.register()
class ViTmBERTGeneration(GenerativeModel):
    config: Any
    vocab: Any

    def setup(self):
        c = self.config
        self.d_model = c.D_MODEL
        self.vision_encoder = build_vision_embedding(c.VISION_EMBEDDING)
        self.text_embedding = build_text_embedding(c.TEXT_EMBEDDING, self.vocab)
        self.fusion = nn.Dense(c.D_MODEL, kernel_init=_xavier)
        self.fusion_dropout = nn.Dropout(rate=c.DROPOUT)
        self.decoder = build_decoder(c.DECODER, vocab=self.vocab)

    def encode(self, batch: BatchArrays, train: bool = False):
        vision_features, vision_bias = self.vision_encoder(
            _vision_input(batch), train=train
        )
        text_features, text_bias = self._text(batch, train)
        fused = jnp.concatenate([vision_features, text_features], axis=1)
        fused = jax.nn.gelu(self.fusion(fused), approximate=False)
        fused = self.fusion_dropout(fused, deterministic=not train)
        bias = jnp.concatenate([vision_bias, text_bias], axis=-1)
        return fused, bias

    def _text(self, batch, train):
        tokens, pad, mask = _question_input(batch, self.config.TEXT_EMBEDDING)
        result = self.text_embedding(
            tokens, train=train, padding_idx=pad, padding_mask=mask
        )
        features, masks = result
        bias = masks[0] if isinstance(masks, tuple) else masks
        return features, bias

    def __call__(self, batch: BatchArrays, train: bool = False) -> jnp.ndarray:
        encoder_features, encoder_bias = self.encode(batch, train=train)
        return self.decoder(
            answer_tokens=batch["answer_tokens"],
            encoder_features=encoder_features,
            encoder_attention_bias=encoder_bias,
            train=train,
        )


@META_ARCHITECTURE.register()
class ViTmT5(ViTmBERTGeneration):
    """Same skeleton with a T5 text embedding and plain linear fusion
    (vit_mt5.py:30-44: no GELU on the fusion)."""

    def encode(self, batch: BatchArrays, train: bool = False):
        vision_features, vision_bias = self.vision_encoder(
            _vision_input(batch), train=train
        )
        text_features, text_bias = self._text(batch, train)
        fused = jnp.concatenate([vision_features, text_features], axis=1)
        fused = self.fusion(fused)
        bias = jnp.concatenate([vision_bias, text_bias], axis=-1)
        return fused, bias


@META_ARCHITECTURE.register()
class ExtendedMCAN(GenerativeModel):
    config: Any
    vocab: Any

    def setup(self):
        c = self.config
        # extended_mcan_vlsp.yaml has no top-level D_MODEL
        self.d_model = c.get("D_MODEL") or c.MULTIMODAL_FUSION.D_MODEL
        self.region_embedding = build_vision_embedding(c.REGION_EMBEDDING)
        self.grid_embedding = build_vision_embedding(c.GRID_EMBEDDING)
        self.box_embedding = build_vision_embedding(c.BOX_EMBEDDING)
        self.text_embedding = build_text_embedding(c.TEXT_EMBEDDING, self.vocab)
        self.self_encoder = build_encoder(c.SELF_ENCODER)
        self.guided_encoder = build_encoder(c.GUIDED_ENCODER)
        self.fusion = PositionWiseFeedForward(c.MULTIMODAL_FUSION)
        self.norm = nn.LayerNorm()
        self.decoder = build_decoder(c.DECODER, vocab=self.vocab)

    def encode(self, batch: BatchArrays, train: bool = False):
        region, region_bias = self.region_embedding(
            batch["region_features"], train=train
        )
        region_boxes, _ = self.box_embedding(batch["region_boxes"], train=train)
        region = region + region_boxes
        grid, grid_bias = self.grid_embedding(batch["grid_features"], train=train)
        grid_boxes, _ = self.box_embedding(batch["grid_boxes"], train=train)
        grid = grid + grid_boxes

        vision = jnp.concatenate([region, grid], axis=1)
        vision_bias = jnp.concatenate([region_bias, grid_bias], axis=-1)

        text, (text_bias, _) = self.text_embedding(
            batch["question_tokens"], train=train
        )
        text = self.self_encoder(features=text, padding_bias=text_bias, train=train)
        vision = self.guided_encoder(
            vision_features=vision,
            vision_padding_bias=vision_bias,
            language_features=text,
            language_padding_bias=text_bias,
            train=train,
        )

        fused = jnp.concatenate([vision, text], axis=1)
        fused_bias = jnp.concatenate([vision_bias, text_bias], axis=-1)
        fused = self.norm(self.fusion(fused, train=train))
        return fused, fused_bias

    def __call__(self, batch: BatchArrays, train: bool = False) -> jnp.ndarray:
        encoder_features, encoder_bias = self.encode(batch, train=train)
        return self.decoder(
            answer_tokens=batch["answer_tokens"],
            encoder_features=encoder_features,
            encoder_attention_bias=encoder_bias,
            train=train,
        )


@META_ARCHITECTURE.register()
class ReadableIterativeMCAN(IterativeMCAN):
    """IterativeMCAN whose vision stream is the VisionOcrEmbedding fusion of
    object + OCR (det/rec/fasttext/box) features
    (readable_iterative_mcan.py:43-54)."""

    def _vision(self, batch: BatchArrays, train: bool):
        # only the vision stream differs from IterativeMCAN; setup/encode/
        # __call__ are inherited (a verbatim copy used to live here and
        # silently miss parent fixes)
        return self.vision_embedding(
            obj_features=batch["region_features"],
            obj_boxes=batch["region_boxes"],
            ocr_det_features=batch["ocr_det_features"],
            ocr_rec_features=batch["ocr_rec_features"],
            ocr_fasttext=batch["ocr_fasttext_features"],
            ocr_boxes=batch["ocr_boxes"],
            train=train,
        )
