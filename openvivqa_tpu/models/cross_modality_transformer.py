"""CrossModalityTransformer (LXMERT-style) and VisiolinguisticTransformer
(ViLBERT-style) classification models.

Parity: /root/reference/models/cross_modality_transformer.py:27-78 and
visiolinguistic_transformer.py:27-78.  Both reference models return raw
logits while the task trains them with NLLLoss (an inconsistency that makes
their loss ill-defined); we return log-probs like every other classification
model — documented divergence, argmax predictions are unchanged.
"""

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
from .common import DualStreamClassifier


class _RegionTextDualEncoder(ClassificationModel):
    """Shared skeleton: region+text embeddings -> dual-stream encoder ->
    dual attr-reduce classifier."""

    config: Any
    vocab: Any

    @nn.compact
    def __call__(self, batch: BatchArrays, train: bool = False) -> jnp.ndarray:
        c = self.config
        vision_features, vision_bias = build_vision_embedding(c.REGION_EMBEDDING)(
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
        out = DualStreamClassifier(c, self.vocab.total_answers)(
            vision_features, text_features, train=train
        )
        return jax.nn.log_softmax(out, axis=-1)


@META_ARCHITECTURE.register()
class CrossModalityTransformer(_RegionTextDualEncoder):
    pass


@META_ARCHITECTURE.register()
class VisiolinguisticTransformer(_RegionTextDualEncoder):
    pass
