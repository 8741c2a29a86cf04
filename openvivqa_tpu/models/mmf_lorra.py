"""LoRRA as classification (MMF ports).

Parity: /root/reference/models/mmf_lorra.py:12-163 — question self-attention
branch, spatial (objects over question) and context (OCR over question)
attention branches whose *weights* re-weight the question features, summed
and classified over total_answers + MAX_SCENE_TEXT choices; and
mmf_iterative_lorra.py:16-208 — the iterative variant where the branches are
applied per decoding layer.

The reference reuses its registry attention classes for the branch weights
(single-head in its configs); here the branches are explicit single-head
attentions returning weights, so the exotic weight-combination semantics
(mmf_lorra.py:115-152: weights are column-summed over the stream axis and
scale the question features) is implemented literally.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builders import META_ARCHITECTURE, build_text_embedding
from .base import BatchArrays
from .m4c_common import l2_normalize
from .modules.bert import LN_EPS
from .modules.masks import padding_bias

_normal = nn.initializers.normal(stddev=0.02)
_xavier = nn.initializers.xavier_uniform()


class _WeightsAttention(nn.Module):
    """Single-head scaled-dot attention returning (context, weights)."""

    d_model: int

    @nn.compact
    def __call__(self, queries, keys, values, attention_bias=None):
        q = nn.Dense(self.d_model, kernel_init=_xavier)(queries)
        k = nn.Dense(self.d_model, kernel_init=_xavier)(keys)
        v = nn.Dense(self.d_model, kernel_init=_xavier)(values)
        logits = jnp.einsum(
            "bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(float(self.d_model))
        if attention_bias is not None:
            logits = logits + attention_bias[:, 0]
        weights = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bqk,bkd->bqd", weights, v), weights


@META_ARCHITECTURE.register()
class MMF_LoRRA(nn.Module):
    config: Any
    vocab: Any

    def setup(self):
        c = self.config
        self.d_model = c.D_MODEL
        self.txt_embedding = build_text_embedding(c.TEXT_EMBEDDING, self.vocab)
        self.txt_norm = nn.LayerNorm(epsilon=LN_EPS)

        self.obj_proj = nn.Dense(self.d_model, kernel_init=_normal)
        self.obj_norm = nn.LayerNorm(epsilon=LN_EPS)
        self.obj_dropout = nn.Dropout(rate=c.OBJECT_EMBEDDING.DROPOUT)

        self.ocr_proj = nn.Dense(self.d_model, kernel_init=_normal)
        self.ocr_norm = nn.LayerNorm(epsilon=LN_EPS)
        self.ocr_dropout = nn.Dropout(rate=c.OCR_EMBEDDING.DROPOUT)

        self.self_attn = _WeightsAttention(self.d_model)
        self.spatial_attn = _WeightsAttention(self.d_model)
        self.context_attn = _WeightsAttention(self.d_model)

        # mmf_lorra.yaml pairs LoRRA with OcrVocab (no total_answers) — a
        # latent reference crash; fall back to the token vocab size
        total_answers = getattr(self.vocab, "total_answers", len(self.vocab))
        self.num_choices = total_answers + c.get("MAX_SCENE_TEXT", 0)
        self.classifier = nn.Dense(self.num_choices, kernel_init=_normal)

    def _streams(self, batch: BatchArrays, train: bool):
        txt_emb, (txt_bias, _) = self.txt_embedding(
            batch["question_tokens"], train=train
        )
        txt_emb = self.txt_norm(txt_emb)

        obj = self.obj_norm(self.obj_proj(batch["region_features"]))
        obj = self.obj_dropout(obj, deterministic=not train)

        ocr_feat = l2_normalize(batch["ocr_fasttext_features"])
        ocr = self.ocr_norm(self.ocr_proj(ocr_feat))
        ocr = self.ocr_dropout(ocr, deterministic=not train)
        return txt_emb, txt_bias, obj, ocr

    def _pooled(self, batch: BatchArrays, train: bool) -> jnp.ndarray:
        txt_emb, txt_bias, obj, ocr = self._streams(batch, train)

        self_feat, _ = self.self_attn(txt_emb, txt_emb, txt_emb, txt_bias)
        _, spatial_w = self.spatial_attn(obj, self_feat, self_feat, txt_bias)
        _, context_w = self.context_attn(ocr, self_feat, self_feat, txt_bias)

        # reference quirk (mmf_lorra.py:148-152): weights are summed over the
        # stream axis and scale the question features, then token-summed
        attended_spatial = jnp.einsum("bol,bld->bld", spatial_w, self_feat)
        attended_context = jnp.einsum("bkl,bld->bld", context_w, self_feat)
        return jnp.sum(attended_spatial + attended_context, axis=1)

    def __call__(self, batch: BatchArrays, train: bool = False) -> Dict:
        return {"scores": self.classifier(self._pooled(batch, train))}


@META_ARCHITECTURE.register()
class MMF_IterativeLoRRA(MMF_LoRRA):
    """LoRRA with N stacked branch blocks (mmf_iterative_lorra.py:16-208):
    the question stream is refined by each block before pooling."""

    def setup(self):
        super().setup()
        self.n_blocks = int(self.config.get("LAYERS", 2))
        self.block_self_attns = [
            _WeightsAttention(self.d_model, name=f"self_attn_{i}")
            for i in range(self.n_blocks)
        ]

    def _pooled(self, batch: BatchArrays, train: bool) -> jnp.ndarray:
        txt_emb, txt_bias, obj, ocr = self._streams(batch, train)

        self_feat = txt_emb
        pooled = jnp.zeros((txt_emb.shape[0], self.d_model), txt_emb.dtype)
        for attn in self.block_self_attns:
            self_feat, _ = attn(self_feat, self_feat, self_feat, txt_bias)
            _, spatial_w = self.spatial_attn(obj, self_feat, self_feat, txt_bias)
            _, context_w = self.context_attn(ocr, self_feat, self_feat, txt_bias)
            attended = jnp.einsum(
                "bol,bld->bld", spatial_w, self_feat
            ) + jnp.einsum("bkl,bld->bld", context_w, self_feat)
            pooled = pooled + jnp.sum(attended, axis=1)
        return pooled
