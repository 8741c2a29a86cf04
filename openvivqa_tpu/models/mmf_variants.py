"""M4C family variants.

Parity targets:
* MMF_REGIONAL_M4C  — mmf_regional_m4c.py:15-216 (4th modality stream:
  grid/"region" features between obj and ocr in the MMT).
* MMF_IterativeM4C  — mmf_iterative_m4c.py:13-270 (BertEncoder encoder over
  [txt,obj,ocr] + causal cross-attention BertEncoder decoder).
* MMF_Iterative_Multilevel_M4C — mmf_iterative_multilevel_m4c.py:14-362
  (decoder layer i cross-attends encoder layer i's hidden states).
* MMF_LanguageAdaptiveM4C — mmf_language_adaptive_m4c.py:18-251 (question
  encoded by a per-language text encoder, selected per sample).
* MMF_SAL — mmf_sal.py:21-379 (extra OCR word-embedding stream in the MMT).
* M4C — m4c.py:35-235 (standalone reimplementation; same architecture as
  MMF_M4C here, registered under its own name).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builders import META_ARCHITECTURE
from .base import BatchArrays
from .m4c_common import (
    FeatureBoxEncoding,
    OcrPtrNet,
    TextBert,
    batch_gather,
    ocr_joint_features,
    ocr_padding_bias,
    l2_normalize,
)
from .m4c_common import PrevPredEmbeddings
from .mmf_m4c import MMF_M4C
from .modules.bert import LN_EPS, BertEncoderStack, BertLayer
from .modules.masks import causal_bias, padding_bias

_normal = nn.initializers.normal(stddev=0.02)


@META_ARCHITECTURE.register()
class M4C(MMF_M4C):
    """Standalone M4C reimplementation (m4c.py:35-235) — architecturally the
    canonical MMF_M4C; registered separately so m4c configs resolve."""


@META_ARCHITECTURE.register()
class MMF_REGIONAL_M4C(MMF_M4C):
    """Adds a grid/"region" stream between obj and ocr
    (mmf_regional_m4c.py:29-56,131-160)."""

    def setup(self):
        super().setup()
        self.region_encoding = FeatureBoxEncoding(
            self.hidden_size, self.config.REGION_EMBEDDING.DROPOUT
        )

    def compute_scores(self, batch, prev_inds, train: bool = False):
        txt_emb, txt_bias = self._txt(batch, train)
        obj_emb, obj_bias = self._obj(batch, train)
        ocr_emb, ocr_bias = self._ocr(batch, train)
        region_emb = self.region_encoding(
            batch["grid_features"], batch["grid_boxes"], train=train
        )
        region_bias = padding_bias(batch["grid_features"], 0)

        results = self.mmt(
            txt_emb, txt_bias, obj_emb, obj_bias, ocr_emb, ocr_bias,
            fixed_ans_emb=self._fixed_ans_emb(),
            prev_inds=prev_inds,
            pre_ocr_streams=((region_emb, region_bias),),
            train=train,
        )
        fixed_scores = self.classifier(results["mmt_dec_output"])
        dynamic_scores = self.ocr_ptr_net(
            results["mmt_dec_output"], results["mmt_ocr_output"], ocr_bias
        )
        return jnp.concatenate([fixed_scores, dynamic_scores], axis=-1)


@META_ARCHITECTURE.register()
class MMF_SAL(MMF_M4C):
    """SAL (spatially-aware look): the MMT gets an extra OCR word-embedding
    stream (mmf_sal.py:59-74)."""

    def setup(self):
        super().setup()
        self.ocr_word_proj = nn.Dense(self.hidden_size, kernel_init=_normal)
        self.ocr_word_norm = nn.LayerNorm(epsilon=LN_EPS)

    def compute_scores(self, batch, prev_inds, train: bool = False):
        txt_emb, txt_bias = self._txt(batch, train)
        obj_emb, obj_bias = self._obj(batch, train)
        ocr_emb, ocr_bias = self._ocr(batch, train)
        word_emb = self.ocr_word_norm(
            self.ocr_word_proj(l2_normalize(batch["ocr_fasttext_features"]))
        )

        results = self.mmt(
            txt_emb, txt_bias, obj_emb, obj_bias, ocr_emb, ocr_bias,
            fixed_ans_emb=self._fixed_ans_emb(),
            prev_inds=prev_inds,
            extra_streams=((word_emb, ocr_bias),),
            train=train,
        )
        fixed_scores = self.classifier(results["mmt_dec_output"])
        dynamic_scores = self.ocr_ptr_net(
            results["mmt_dec_output"], results["mmt_ocr_output"], ocr_bias
        )
        return jnp.concatenate([fixed_scores, dynamic_scores], axis=-1)


class _IterativeM4CBase(MMF_M4C):
    """Encoder/decoder split shared by MMF_IterativeM4C and the multilevel
    variant (mmf_iterative_m4c.py:78-98)."""

    multilevel: bool = False

    def setup(self):
        super().setup()
        c = self.config
        enc = c.get("ENCODER") or c.MMT
        dec = c.get("DECODER") or c.MMT
        self.joint_encoder = BertEncoderStack(
            hidden_size=self.hidden_size,
            num_layers=enc.get("LAYERS", enc.get("NUM_HIDDEN_LAYERS")),
            num_heads=self.num_heads,
        )
        self.dec_layers = int(dec.get("LAYERS", dec.get("NUM_HIDDEN_LAYERS")))
        self.decoder_layers = [
            BertLayer(
                self.hidden_size, self.num_heads, cross_attention=True,
                name=f"dec_layer_{i}",
            )
            for i in range(self.dec_layers)
        ]
        self.dec_embeddings = PrevPredEmbeddings(self.hidden_size)

    def compute_scores(self, batch, prev_inds, train: bool = False):
        txt_emb, txt_bias = self._txt(batch, train)
        obj_emb, obj_bias = self._obj(batch, train)
        ocr_emb, ocr_bias = self._ocr(batch, train)

        enc_inputs = jnp.concatenate([txt_emb, obj_emb, ocr_emb], axis=1)
        enc_bias = jnp.concatenate([txt_bias, obj_bias, ocr_bias], axis=-1)
        encoded = self.joint_encoder(
            enc_inputs, attention_bias=enc_bias, train=train,
            return_all=self.multilevel,
        )
        if self.multilevel:
            encoded, all_states = encoded
        ocr_begin = txt_emb.shape[1] + obj_emb.shape[1]
        ocr_end = ocr_begin + ocr_emb.shape[1]

        dec = self.dec_embeddings(
            self._fixed_ans_emb(), ocr_emb, prev_inds, train=train
        )
        dec_bias = causal_bias(dec.shape[1])
        for i, layer in enumerate(self.decoder_layers):
            cross_states = all_states[i] if self.multilevel else encoded
            dec = layer(
                dec,
                attention_bias=dec_bias,
                encoder_states=cross_states,
                encoder_bias=enc_bias,
                train=train,
            )

        fixed_scores = self.classifier(dec)
        dynamic_scores = self.ocr_ptr_net(dec, encoded[:, ocr_begin:ocr_end], ocr_bias)
        return jnp.concatenate([fixed_scores, dynamic_scores], axis=-1)


@META_ARCHITECTURE.register()
class MMF_IterativeM4C(_IterativeM4CBase):
    multilevel: bool = False


@META_ARCHITECTURE.register()
class MMF_Iterative_Multilevel_M4C(_IterativeM4CBase):
    """Decoder layer i cross-attends encoder layer i's hidden states
    (MultiLevelBertDecoder, mmf_iterative_multilevel_m4c.py:14-130)."""

    multilevel: bool = True


@META_ARCHITECTURE.register()
class MMF_LanguageAdaptiveM4C(MMF_M4C):
    """Question encoded per-language (PretrainedAdaptiveTextBert,
    mmf_language_adaptive_m4c.py:204-251): one text stack per configured
    language, outputs selected by the per-sample `language_id` batch field
    (0 when absent).  The reference dispatches to per-language HF AutoModels
    on host; on TPU all stacks run and a where-select keeps shapes static."""

    def setup(self):
        super().setup()
        languages = self.config.get("LANGUAGES", ("vi", "en", "ja"))
        self.n_languages = len(languages)
        self.language_text_berts = [
            TextBert(
                self.config.TEXT_BERT,
                num_heads=self.num_heads,
                vocab_size=len(self.vocab),
                name=f"text_bert_{lang}",
            )
            for lang in languages
        ]

    def _txt(self, batch: BatchArrays, train: bool):
        txt_bias = padding_bias(batch["question_tokens"], self.vocab.padding_idx)
        language_id = batch.get(
            "language_id",
            jnp.zeros(batch["question_tokens"].shape[:1], jnp.int32),
        )
        outputs = jnp.stack(
            [
                bert(batch["question_tokens"], txt_bias, train=train)
                for bert in self.language_text_berts
            ],
            axis=0,
        )  # (n_lang, bs, L, h)
        index = jnp.broadcast_to(
            language_id[None, :, None, None].astype(jnp.int32),
            (1,) + outputs.shape[1:],
        )
        selected = jnp.take_along_axis(outputs, index, axis=0)[0]
        if self.uses_text_proj:
            selected = self.text_bert_out_linear(selected)
        return selected, txt_bias
