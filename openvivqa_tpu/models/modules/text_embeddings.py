"""Text embeddings (flax.linen).

Parity targets in /root/reference/models/modules/text_embeddings.py:
UsualEmbedding (:56-80), LSTMTextEmbedding (:221-246), DynamicEmbedding
(:135-177), FixedVocabDynamicEmbedding (:179-219), OcrWordEmbedding
(:82-133, split host/device here), HierarchicalFeaturesExtractor (:248-281).
HuggingFace wrappers (Bert/Albert/Roberta/Deberta/XLM-R) live in
`pretrained_embeddings.py`.

Every embedding returns `(features, (padding_bias, causal_bias))` with the
additive 0/-10e4 convention so downstream modules are drop-in compatible
with the reference call sites.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...builders import META_TEXT_EMBEDDING
from .masks import causal_bias, padding_bias

_xavier = nn.initializers.xavier_uniform()


def _token_masks(tokens: jnp.ndarray, padding_idx: int):
    return padding_bias(tokens, padding_idx), causal_bias(tokens.shape[-1])


@META_TEXT_EMBEDDING.register()
class UsualEmbedding(nn.Module):
    """Learned table, or frozen pretrained vectors + projection
    (text_embeddings.py:56-80 parity)."""

    config: Any
    vocab: Any

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, train: bool = False):
        masks = _token_masks(tokens, self.vocab.padding_idx)
        if self.config.get("WORD_EMBEDDING") is None:
            table = self.param(
                "embedding",
                nn.initializers.normal(stddev=1.0),
                (len(self.vocab), self.config.D_MODEL),
            )
            table = table.at[self.vocab.padding_idx].set(0.0)
            features = jnp.take(table, tokens, axis=0)
        else:
            if self.vocab.word_embeddings is None:
                raise ValueError(
                    "TEXT_EMBEDDING.WORD_EMBEDDING is set but the vocab has "
                    "no word_embeddings loaded (stale vocab cache pickled "
                    "before WORD_EMBEDDING was configured? rebuild it, or "
                    "align the vocab config's WORD_EMBEDDING)"
                )
            pretrained = self.variable(
                "frozen",
                "embedding",
                lambda: jnp.asarray(self.vocab.word_embeddings, jnp.float32),
            )
            features = jnp.take(pretrained.value, tokens, axis=0)
            features = nn.Dense(self.config.D_MODEL, kernel_init=_xavier)(features)
            features = nn.Dropout(rate=self.config.DROPOUT)(
                features, deterministic=not train
            )
        return features, masks


class _LSTM(nn.Module):
    """Single-layer LSTM over the time axis returning the full sequence."""

    features: int

    @nn.compact
    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        rnn = nn.RNN(nn.OptimizedLSTMCell(self.features))
        return rnn(inputs)


@META_TEXT_EMBEDDING.register()
class LSTMTextEmbedding(nn.Module):
    """Embed -> project -> dropout -> LSTM (text_embeddings.py:221-246)."""

    config: Any
    vocab: Any

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, train: bool = False):
        masks = _token_masks(tokens, self.vocab.padding_idx)
        if (
            self.config.get("WORD_EMBEDDING") is not None
            and self.vocab.word_embeddings is None
        ):
            # silently training a learned table where frozen pretrained
            # vectors were configured is a different model — same policy as
            # UsualEmbedding above
            raise ValueError(
                "TEXT_EMBEDDING.WORD_EMBEDDING is set but the vocab has no "
                "word_embeddings loaded (stale vocab cache? mismatched "
                "vocab config?)"
            )
        if self.config.get("WORD_EMBEDDING") is not None:
            pretrained = self.variable(
                "frozen",
                "embedding",
                lambda: jnp.asarray(self.vocab.word_embeddings, jnp.float32),
            )
            embedded = jnp.take(pretrained.value, tokens, axis=0)
        else:
            table = self.param(
                "embedding",
                nn.initializers.normal(stddev=1.0),
                (len(self.vocab), self.config.D_EMBEDDING),
            )
            table = table.at[self.vocab.padding_idx].set(0.0)
            embedded = jnp.take(table, tokens, axis=0)
        features = nn.Dense(self.config.D_MODEL, kernel_init=_xavier)(embedded)
        features = nn.Dropout(rate=self.config.DROPOUT)(
            features, deterministic=not train
        )
        features = _LSTM(self.config.D_MODEL)(features)
        return features, masks


def split_embedding_lookup(
    fixed_weights: jnp.ndarray,  # (n_fixed, d) shared across the batch
    oov_features: jnp.ndarray,  # (bs, K, d) per-sample rows
    tokens: jnp.ndarray,  # (bs, L); ids >= n_fixed index the OOV block
    padding_idx: int,
) -> jnp.ndarray:
    """Embedding lookup over a [shared fixed ⊕ per-sample OOV] table —
    the TPU-native equivalent of the reference's flattened-offset gather
    (text_embeddings.py:145-163) — WITHOUT materialising the
    (bs, n_fixed + K, d) broadcast concat: the fixed rows are read once
    per call, not once per batch row (the concat re-reads n_fixed*d*bs
    floats from HBM per lookup; at a 5k-row table and bs 32 that is
    500 MB vs 15 MB).  Out-of-range ids yield zero rows in the shared
    lookup and the OOV half is masked explicitly, so the result is
    bit-identical to gathering from the concat table.

    padding_idx follows F.embedding's actual semantics: it only masks
    GRADIENTS in torch — the forward still returns row[padding_idx]
    (verified against torch; tests/test_standalone_m4c.py pins this via
    a batch with a padded answer position).  Row gradients at pad tokens
    are stopped to match."""
    from ...ops.gather import take_rows, take_rows_shared

    n_fixed = fixed_weights.shape[0]
    fixed_rows = take_rows_shared(fixed_weights, tokens)
    oov_ids = tokens - n_fixed
    in_oov = (oov_ids >= 0)[..., None]
    oov_rows = take_rows(
        oov_features, jnp.clip(oov_ids, 0, oov_features.shape[1] - 1)
    )
    gathered = fixed_rows + jnp.where(in_oov, oov_rows, 0.0)
    is_pad = (tokens == padding_idx)[..., None].astype(gathered.dtype)
    return (
        gathered * (1.0 - is_pad)
        + jax.lax.stop_gradient(gathered) * is_pad
    )


@META_TEXT_EMBEDDING.register()
class DynamicEmbedding(nn.Module):
    """Fixed-vocab rows (learned) ⊕ per-sample OCR feature rows; token ids
    >= len(vocab) index the OCR block (text_embeddings.py:135-177)."""

    config: Any
    vocab: Any

    @nn.compact
    def __call__(
        self, tokens: jnp.ndarray, oov_features: jnp.ndarray, train: bool = False
    ):
        masks = _token_masks(tokens, self.vocab.padding_idx)
        fixed = self.param(
            "fixed_weights", _xavier, (len(self.vocab), self.config.D_MODEL)
        )
        features = split_embedding_lookup(
            fixed, oov_features, tokens, self.vocab.padding_idx
        )
        return features, masks


@META_TEXT_EMBEDDING.register()
class FixedVocabDynamicEmbedding(nn.Module):
    """DynamicEmbedding with caller-supplied fixed rows
    (text_embeddings.py:179-219)."""

    config: Any
    vocab: Any

    def __call__(
        self,
        tokens: jnp.ndarray,
        oov_features: jnp.ndarray,
        fixed_weights: jnp.ndarray,
        train: bool = False,
    ):
        masks = _token_masks(tokens, self.vocab.padding_idx)
        features = split_embedding_lookup(
            fixed_weights, oov_features, tokens, self.vocab.padding_idx
        )
        return features, masks


@META_TEXT_EMBEDDING.register()
class OcrWordEmbedding(nn.Module):
    """Project per-batch OCR word vectors (text_embeddings.py:82-133).

    The reference looks up FastText vectors *inside* the model; strings
    cannot cross the jit boundary, so here the data pipeline provides
    `ocr_fasttext_features` (bs, n_ocr, D_EMBEDDING) and this module is the
    device-side projection."""

    config: Any
    vocab: Any

    @nn.compact
    def __call__(self, ocr_fasttext_features: jnp.ndarray, train: bool = False):
        features = nn.Dense(self.config.D_MODEL, kernel_init=_xavier)(
            ocr_fasttext_features
        )
        features = nn.Dropout(rate=self.config.DROPOUT)(
            features, deterministic=not train
        )
        return features, None


@META_TEXT_EMBEDDING.register()
class HierarchicalFeaturesExtractor(nn.Module):
    """n-gram Conv1d hierarchy over word embeddings
    (text_embeddings.py:248-281): each n-gram window's feature is
    overlap-added into EVERY token position the window covers, so the
    output stays token-aligned (bs, L, D) with the token-level masks.

    This implements the reference's documented intent ('summing all
    possible n-gram tokens into the unigram'); its own forward is broken
    as checked out — it iterates `range(features.shape[-1])` (= D_MODEL)
    over the TIME axis (IndexError whenever D_MODEL > L, i.e. always) and
    mixes the conv-list index with the kernel size in the window bounds
    (text_embeddings.py:271-279)."""

    config: Any
    vocab: Any

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, train: bool = False):
        features, (pad_bias, seq_bias) = UsualEmbedding(self.config, self.vocab)(
            tokens, train=train
        )
        length = tokens.shape[-1]
        out = None
        for ngram in self.config.N_GRAMS:
            n = int(ngram)
            conv = nn.Conv(
                features=self.config.D_MODEL,
                kernel_size=(n,),
                padding="VALID",
                kernel_init=_xavier,
            )
            windows = conv(features)  # (bs, L-n+1, D)
            # window p covers tokens [p, p+n): add it to each covered
            # position (vectorised overlap-add of the reference's loops)
            acc = jnp.zeros_like(features)
            for offset in range(n):
                acc = acc.at[:, offset : offset + length - n + 1].add(windows)
            out = acc if out is None else out + acc
        return out, (pad_bias, seq_bias)
