"""Vision embeddings (flax.linen).

Parity targets in /root/reference/models/modules/vision_embeddings.py:
FeatureEmbedding (:10-25), VisionOcrEmbedding (:27-84).  The frozen-ViT
backbone (ViTEmbedding, :86-111) lives in `pretrained_embeddings.py`.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...builders import META_VISION_EMBEDDING
from .masks import padding_bias

_xavier = nn.initializers.xavier_uniform()


@META_VISION_EMBEDDING.register()
class FeatureEmbedding(nn.Module):
    """Linear + GELU + dropout over region/grid features; all-zero rows are
    padding (vision_embeddings.py:10-25 parity)."""

    config: Any

    @nn.compact
    def __call__(self, features: jnp.ndarray, train: bool = False):
        masks = padding_bias(features, padding_idx=0)
        out = nn.Dense(self.config.D_MODEL, kernel_init=_xavier)(features)
        out = jax.nn.gelu(out, approximate=False)
        out = nn.Dropout(rate=self.config.DROPOUT)(out, deterministic=not train)
        return out, masks


@META_VISION_EMBEDDING.register()
class VisionOcrEmbedding(nn.Module):
    """Object + OCR streams, each LN(W·feat) + LN(W·bbox), GELU, dropout,
    concatenated along the token axis (vision_embeddings.py:27-84 parity)."""

    config: Any

    @nn.compact
    def __call__(
        self,
        obj_features: jnp.ndarray,
        obj_boxes: jnp.ndarray,
        ocr_det_features: jnp.ndarray,
        ocr_rec_features: jnp.ndarray,
        ocr_fasttext: jnp.ndarray,
        ocr_boxes: jnp.ndarray,
        train: bool = False,
    ):
        c = self.config
        deterministic = not train
        ocr_features = jnp.concatenate(
            [ocr_det_features, ocr_rec_features, ocr_fasttext], axis=-1
        )

        obj_masks = padding_bias(obj_features, padding_idx=0)
        ocr_masks = padding_bias(ocr_det_features, padding_idx=0)
        masks = jnp.concatenate([obj_masks, ocr_masks], axis=-1)

        obj_in = nn.LayerNorm()(
            nn.Dense(c.D_MODEL, kernel_init=_xavier)(obj_features)
        ) + nn.LayerNorm()(nn.Dense(c.D_MODEL, kernel_init=_xavier)(obj_boxes))
        obj_in = nn.Dropout(rate=c.DROPOUT)(
            jax.nn.gelu(obj_in, approximate=False), deterministic=deterministic
        )

        ocr_in = nn.LayerNorm()(
            nn.Dense(c.D_MODEL, kernel_init=_xavier)(ocr_features)
        ) + nn.LayerNorm()(nn.Dense(c.D_MODEL, kernel_init=_xavier)(ocr_boxes))
        ocr_in = nn.Dropout(rate=c.DROPOUT)(
            jax.nn.gelu(ocr_in, approximate=False), deterministic=deterministic
        )

        features = jnp.concatenate([obj_in, ocr_in], axis=1)
        return features, masks
