"""HierarchicalCoAttention — n-gram conv hierarchy over word embeddings +
co-attention encoder + dual attr-reduce classification.

Parity: /root/reference/models/hierarchical_co_attention.py:26-104.  The
reference accumulates n-gram features into unigram positions with a triple
Python loop (O(L·n²) tensor indexing, :46-53); here the same sum is computed
with cumulative sums and two static gathers per n-gram level — identical
result, fully vectorised for the VPU.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..builders import (
    META_ARCHITECTURE,
    build_encoder,
    build_text_embedding,
    build_vision_embedding,
)
from .base import BatchArrays, ClassificationModel
from .common import DualStreamClassifier, total_answers_of

_xavier = nn.initializers.xavier_uniform()


class HierarchicalFeaturesExtractor(nn.Module):
    """Conv per n-gram size; levels >= 2 are window-summed into the unigram
    stream (hierarchical_co_attention.py:26-54 semantics)."""

    config: Any

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        ngrams = [int(n) for n in self.config.N_GRAMS]
        length = features.shape[1]

        level_features = []
        for ngram in ngrams:
            conv = nn.Conv(
                features=self.config.D_MODEL,
                kernel_size=(ngram,),
                padding="VALID",
                kernel_init=_xavier,
            )
            level_features.append(conv(features))  # (bs, L-n+1, d)

        out = level_features[0]
        # reference sums levels 1..max(ngrams)-1 by list index (:48)
        for level in range(1, max(ngrams)):
            if level >= len(level_features):
                break
            feats = level_features[level]
            level_len = feats.shape[1]
            # contribution to unigram position i: sum of feats[p] for
            # p in [max(0, i-level), min(i, level_len-1)] — a ragged window
            # sum, computed as a difference of (zero-prepended) cumsums
            csum = jnp.concatenate(
                [jnp.zeros_like(feats[:, :1]), jnp.cumsum(feats, axis=1)], axis=1
            )
            idx = np.arange(length)
            hi = np.minimum(idx, level_len - 1) + 1
            lo = np.maximum(0, idx - level)
            out = out + (csum[:, hi] - csum[:, lo])
        return out


@META_ARCHITECTURE.register()
class HierarchicalCoAttention(ClassificationModel):
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

        text_features = HierarchicalFeaturesExtractor(c.HIERARCHICAL)(text_features)
        # n-gram convs shorten the text stream to L-1+1 of the unigram conv;
        # the bias keeps the original question length (unigram conv, n=1)
        vision_features, text_features = build_encoder(c.ENCODER)(
            vision_features=vision_features,
            vision_padding_bias=vision_bias,
            language_features=text_features,
            language_padding_bias=text_bias[..., : text_features.shape[1]],
            train=train,
        )
        out = DualStreamClassifier(c, total_answers_of(self.vocab))(
            vision_features, text_features, train=train
        )
        return jax.nn.log_softmax(out, axis=-1)
