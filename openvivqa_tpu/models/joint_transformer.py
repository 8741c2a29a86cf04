"""JointTransformer — region/box/grid/box/question single-stream encoder
with modality-type token embeddings + transformer decoder.

Parity: /root/reference/models/joint_transformer.py:11-82.  The modality
streams (region feats, region boxes, grid feats, grid boxes, question) each
get the embedding of their modality special token added, are concatenated,
and self-attend in one Encoder; a standard masked decoder generates the
answer.  (The reference wraps encoder/decoder args in Instance objects that
its own modules cannot unpack — fixed here by calling them directly.)
"""

from __future__ import annotations

from typing import Any, Tuple

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


class ModalityStreams(nn.Module):
    """Embeds the five modality streams and tags each with its modality
    token embedding (joint_transformer.py:40-75 semantics)."""

    config: Any
    vocab: Any
    shared_text_embedding: Any = None

    def setup(self):
        self.region_embedding = build_vision_embedding(self.config.REGION_EMBEDDING)
        self.grid_embedding = build_vision_embedding(self.config.GRID_EMBEDDING)
        self.box_embedding = build_vision_embedding(self.config.BOX_EMBEDDING)
        if self.shared_text_embedding is not None:
            self.text_embedding = self.shared_text_embedding
        else:
            self.text_embedding = build_text_embedding(
                self.config.TEXT_EMBEDDING, self.vocab
            )

    def _tag(self, features: jnp.ndarray, token_idx: int, train: bool):
        bs, length = features.shape[0], features.shape[1]
        tokens = jnp.full((bs, length), token_idx, jnp.int32)
        tag_embedded, _ = self.text_embedding(tokens, train=train)
        return features + tag_embedded

    def __call__(
        self, batch: BatchArrays, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        v = self.vocab
        region_features, region_bias = self.region_embedding(
            batch["region_features"], train=train
        )
        region_features = self._tag(region_features, v.feat_idx, train)

        region_boxes, region_boxes_bias = self.box_embedding(
            batch["region_boxes"], train=train
        )
        region_boxes = self._tag(region_boxes, v.box_idx, train)

        grid_features, grid_bias = self.grid_embedding(
            batch["grid_features"], train=train
        )
        grid_features = self._tag(grid_features, v.feat_idx, train)

        grid_boxes, grid_boxes_bias = self.box_embedding(
            batch["grid_boxes"], train=train
        )
        grid_boxes = self._tag(grid_boxes, v.box_idx, train)

        question_features, (question_bias, _) = self.text_embedding(
            batch["question_tokens"], train=train
        )
        question_features = self._tag(question_features, v.question_idx, train)

        joint = jnp.concatenate(
            [region_features, region_boxes, grid_features, grid_boxes,
             question_features],
            axis=1,
        )
        joint_bias = jnp.concatenate(
            [region_bias, region_boxes_bias, grid_bias, grid_boxes_bias,
             question_bias],
            axis=-1,
        )
        return joint, joint_bias


@META_ARCHITECTURE.register()
class JointTransformer(GenerativeModel):
    config: Any
    vocab: Any

    def setup(self):
        self.streams = ModalityStreams(self.config, self.vocab)
        self.encoder = build_encoder(self.config.ENCODER)
        self.decoder = build_decoder(self.config.DECODER, vocab=self.vocab)

    def encode(self, batch: BatchArrays, train: bool = False):
        joint, joint_bias = self.streams(batch, train=train)
        encoded = self.encoder(joint, joint_bias, train=train)
        return encoded, joint_bias

    def __call__(self, batch: BatchArrays, train: bool = False) -> jnp.ndarray:
        encoder_features, encoder_bias = self.encode(batch, train=train)
        return self.decoder(
            answer_tokens=batch["answer_tokens"],
            encoder_features=encoder_features,
            encoder_attention_bias=encoder_bias,
            train=train,
        )
