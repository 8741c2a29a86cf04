"""Shared components of the M4C family (MMF ports).

Parity targets in /root/reference/models/mmf_m4c.py: TextBert (:258-280),
object/OCR encodings (:143-200), OcrPtrNet (:367-396), PrevPredEmbeddings
(:399-445), _batch_gather (:447-459), and the greedy full-re-encode decode
loop (:236-256) — here a `lax.scan` with static shapes.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .modules.bert import LN_EPS, BertEmbeddings, BertEncoderStack
from .modules.masks import MASK_VALUE, causal_bias, padding_bias

_normal = nn.initializers.normal(stddev=0.02)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch.nn.functional.normalize parity."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


class TextBert(nn.Module):
    """Question encoder: BertEmbeddings + BertEncoder over our vocab ids
    (mmf_m4c.py:258-280).  LOAD_PRETRAINED weight conversion is handled by
    the checkpoint tooling; the architecture is identical either way."""

    config: Any  # TEXT_BERT node
    num_heads: int
    vocab_size: int

    @nn.compact
    def __call__(
        self, token_ids: jnp.ndarray, attention_bias, train: bool = False
    ) -> jnp.ndarray:
        hidden = self.config.HIDDEN_SIZE
        embeddings = BertEmbeddings(
            vocab_size=max(self.vocab_size, 30522), hidden_size=hidden
        )(token_ids, train=train)
        return BertEncoderStack(
            hidden_size=hidden,
            num_layers=self.config.NUM_HIDDEN_LAYERS,
            num_heads=self.num_heads,
            intermediate_size=self.config.get("INTERMEDIATE_SIZE"),
        )(embeddings, attention_bias=attention_bias, train=train)


class FeatureBoxEncoding(nn.Module):
    """LN(W·feat) + LN(W·bbox) -> dropout (obj/ocr encodings,
    mmf_m4c.py:143-200).  These LayerNorms are plain torch ``nn.LayerNorm``
    in the reference (mmf_m4c.py:81-97), i.e. eps 1e-5, unlike the BERT
    stack's 1e-12."""

    hidden_size: int
    dropout: float
    _TORCH_LN_EPS = 1e-5

    @nn.compact
    def __call__(
        self, features: jnp.ndarray, boxes: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        out = nn.LayerNorm(epsilon=self._TORCH_LN_EPS)(
            nn.Dense(self.hidden_size, kernel_init=_normal)(features)
        ) + nn.LayerNorm(epsilon=self._TORCH_LN_EPS)(
            nn.Dense(self.hidden_size, kernel_init=_normal)(boxes)
        )
        return nn.Dropout(rate=self.dropout)(out, deterministic=not train)


class OcrPtrNet(nn.Module):
    """Pointer scores QK^T/sqrt(d) + additive OCR mask
    (mmf_m4c.py:367-396).

    setup-style with legacy attribute names (Dense_0 query, Dense_1 key)
    matching the original nn.compact auto-naming so checkpoints and the
    torch converters stay byte-compatible.  project_keys/score exist so
    incremental decoders can hoist the step-invariant OCR key projection
    OUT of the decode scan (XLA does not hoist scan invariants —
    CLAUDE.md measured facts; re-projecting the (bs, 100, 768) keys every
    step was pure waste)."""

    hidden_size: int
    query_key_size: Optional[int] = None

    def setup(self):
        qk = self.query_key_size or self.hidden_size
        self.Dense_0 = nn.Dense(qk, kernel_init=_normal)  # query
        self.Dense_1 = nn.Dense(qk, kernel_init=_normal)  # key

    def project_keys(self, key_inputs: jnp.ndarray) -> jnp.ndarray:
        """Step-invariant (bs, K, qk) key projections — compute once per
        sequence, not once per decode step."""
        return self.Dense_1(key_inputs)

    def score(
        self,
        query_inputs: jnp.ndarray,
        keys: jnp.ndarray,
        attention_bias: jnp.ndarray,
    ) -> jnp.ndarray:
        qk = self.query_key_size or self.hidden_size
        q = self.Dense_0(query_inputs)  # (bs, L_dec, qk)
        scores = jnp.einsum(
            "bqd,bkd->bqk", q, keys, preferred_element_type=jnp.float32
        ) / jnp.sqrt(float(qk))
        # attention_bias: (bs, 1, 1, K) additive
        return scores + attention_bias[:, 0]

    def __call__(
        self,
        query_inputs: jnp.ndarray,
        key_inputs: jnp.ndarray,
        attention_bias: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        return self.score(
            query_inputs, self.project_keys(key_inputs), attention_bias
        )


def batch_gather(x: jnp.ndarray, inds: jnp.ndarray) -> jnp.ndarray:
    """Per-row gather: x (bs, N, d), inds (bs, L) -> (bs, L, d)
    (mmf_m4c.py:447-459 parity; one-hot matmul on TPU, see ops/gather.py)."""
    from ..ops.gather import take_rows

    return take_rows(x, inds)


class PrevPredEmbeddings(nn.Module):
    """Decode-step embeddings: gather from [LN(fixed vocab emb) ⊕ LN(ocr
    emb)] + learned position + type embeddings (mmf_m4c.py:399-445).

    setup-style with legacy attribute names (LayerNorm_0/1/2, Embed_0/1)
    matching the original nn.compact auto-naming so checkpoints and the
    torch converters stay byte-compatible.  build_table exists so
    incremental decoders can hoist the LayerNormed gather table OUT of the
    per-step scan body (XLA does not hoist loop invariants across scan
    iterations — re-normalising the ~5000-row answer table every step is
    pure waste)."""

    hidden_size: int
    dropout: float = 0.1
    max_dec_length: int = 100
    max_type_num: int = 5

    def setup(self):
        self.LayerNorm_0 = nn.LayerNorm(epsilon=LN_EPS)  # ans emb
        self.LayerNorm_1 = nn.LayerNorm(epsilon=LN_EPS)  # ocr emb
        self.Embed_0 = nn.Embed(
            self.max_dec_length, self.hidden_size, embedding_init=_normal
        )  # positions
        self.Embed_1 = nn.Embed(
            self.max_type_num, self.hidden_size, embedding_init=_normal
        )  # token types
        self.LayerNorm_2 = nn.LayerNorm(epsilon=LN_EPS)  # extra
        self.extra_dropout = nn.Dropout(rate=self.dropout)

    def build_table(self, ans_emb: jnp.ndarray, ocr_emb: jnp.ndarray):
        """SPLIT LayerNormed gather tables — step-invariant; compute once
        per sequence when decoding incrementally.  Kept split (shared
        (num_vocab, h) answer table ⊕ per-sample (bs, K, h) OCR table)
        rather than concatenated: a batch-broadcast concat table re-reads
        num_vocab*h*bs floats from HBM per lookup (~500 MB at reference
        dims — measured ~1 ms per decode step, HALF the whole step)."""
        return self.LayerNorm_0(ans_emb), self.LayerNorm_1(ocr_emb)

    def embed_from_table(
        self,
        table,  # (ans (num_vocab, h), ocr (bs, K, h)) from build_table
        ans_num: int,
        prev_inds: jnp.ndarray,  # (bs, L)
        position_offset=0,
        train: bool = False,
    ) -> jnp.ndarray:
        from ..ops.gather import take_rows_shared

        ans_table, ocr_table = table
        seq_length = prev_inds.shape[1]
        # split lookup: out-of-range ids (< 0 or >= N) yield zero rows in
        # BOTH lookups (the ops/gather contract, uniform across backends),
        # so the sum equals the single concat-table gather bit-for-bit
        fixed_rows = take_rows_shared(ans_table, prev_inds)
        ocr_rows = batch_gather(ocr_table, prev_inds - ans_num)
        raw_dec_emb = fixed_rows + ocr_rows
        positions = self.Embed_0(
            jnp.arange(seq_length)[None, :] + position_offset
        )
        token_types = self.Embed_1((prev_inds >= ans_num).astype(jnp.int32))
        extra = self.LayerNorm_2(positions + token_types)
        extra = self.extra_dropout(extra, deterministic=not train)
        return raw_dec_emb + extra

    def __call__(
        self,
        ans_emb: jnp.ndarray,  # (num_vocab, h)
        ocr_emb: jnp.ndarray,  # (bs, K, h)
        prev_inds: jnp.ndarray,  # (bs, L)
        position_offset=0,  # decode-step mode: absolute position of column 0
        train: bool = False,
    ) -> jnp.ndarray:
        table = self.build_table(ans_emb, ocr_emb)
        return self.embed_from_table(
            table, ans_emb.shape[0], prev_inds, position_offset, train
        )


class MMT(nn.Module):
    """Joint multimodal transformer over [txt, obj, ocr, dec] with the
    prefix-LM + causal-decoder mask (mmf_m4c.py:282-364)."""

    hidden_size: int
    num_layers: int
    num_heads: int
    intermediate_size: Optional[int] = None

    def setup(self):
        self.prev_pred_embeddings = PrevPredEmbeddings(self.hidden_size)
        self.encoder = BertEncoderStack(
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            intermediate_size=self.intermediate_size,
        )

    def __call__(
        self,
        txt_emb, txt_bias,
        obj_emb, obj_bias,
        ocr_emb, ocr_bias,
        fixed_ans_emb, prev_inds,
        pre_ocr_streams=(),  # (emb, bias) pairs between obj and ocr
        extra_streams=(),  # (emb, bias) pairs between ocr and dec
        train: bool = False,
        return_all: bool = False,
        context_blind: bool = False,
    ):
        dec_emb = self.prev_pred_embeddings(
            fixed_ans_emb, ocr_emb, prev_inds, train=train
        )
        dec_len = dec_emb.shape[1]
        dec_bias = jnp.zeros((dec_emb.shape[0], 1, 1, dec_len), jnp.float32)

        streams = [
            (txt_emb, txt_bias), (obj_emb, obj_bias), *pre_ocr_streams,
            (ocr_emb, ocr_bias), *extra_streams, (dec_emb, dec_bias),
        ]
        inputs = jnp.concatenate([s[0] for s in streams], axis=1)
        col_bias = jnp.concatenate([s[1] for s in streams], axis=-1)

        total = inputs.shape[1]
        extended = jnp.broadcast_to(
            col_bias, col_bias.shape[:2] + (total, total)
        )
        dec_block = jnp.broadcast_to(
            causal_bias(dec_len), (extended.shape[0], 1, dec_len, dec_len)
        )
        extended = extended.at[:, :, -dec_len:, -dec_len:].set(dec_block)
        if context_blind:
            # upstream-MMF M4C semantics: encoding-step elements cannot
            # attend to decoding steps.  The reference's re-implementation
            # inverted this (mmf_m4c.py:306-312 builds dec_mask=zeros in the
            # ADDITIVE convention, i.e. fully attendable, while keeping the
            # upstream comment) — default False reproduces the reference;
            # True restores upstream behavior and enables exact incremental
            # decoding (MMF_M4C.incremental_greedy_decode).
            extended = extended.at[:, :, : total - dec_len, -dec_len:].set(
                MASK_VALUE
            )

        encoded = self.encoder(
            inputs, attention_bias=extended, train=train, return_all=return_all
        )
        if return_all:
            encoded, all_states = encoded
        txt_len = txt_emb.shape[1]
        obj_len = obj_emb.shape[1]
        pre_len = sum(s[0].shape[1] for s in pre_ocr_streams)
        ocr_begin = txt_len + obj_len + pre_len
        ocr_end = ocr_begin + ocr_emb.shape[1]
        results = {
            "mmt_seq_output": encoded,
            "mmt_txt_output": encoded[:, :txt_len],
            "mmt_ocr_output": encoded[:, ocr_begin:ocr_end],
            "mmt_dec_output": encoded[:, -dec_len:],
        }
        if return_all:
            results["all_hidden_states"] = all_states
        return results


    # -- incremental decoding (TPU-native; no reference equivalent) ------------
    # The reference greedy loop re-encodes the FULL joint transformer per
    # step (mmf_m4c.py:236-256): O(T · (C+T)²) attention.  Under context-
    # blind masking the context states never depend on decoder tokens, so we
    # encode the context once, pre-project each layer's context K/V, and
    # decode one token per step against those caches — per-step matmuls
    # touch only the new token: O(C² + T·(C+T)) attention with O(1)
    # projection work per step.

    def encode_context(
        self,
        txt_emb, txt_bias,
        obj_emb, obj_bias,
        ocr_emb, ocr_bias,
        pre_ocr_streams=(),
        extra_streams=(),
        train: bool = False,
    ):
        streams = [
            (txt_emb, txt_bias), (obj_emb, obj_bias), *pre_ocr_streams,
            (ocr_emb, ocr_bias), *extra_streams,
        ]
        inputs = jnp.concatenate([s[0] for s in streams], axis=1)
        col_bias = jnp.concatenate([s[1] for s in streams], axis=-1)
        ctx_out, layer_inputs = self.encoder(
            inputs,
            attention_bias=col_bias,
            return_layer_inputs=True,
            train=train,
        )
        txt_len = txt_emb.shape[1]
        obj_len = obj_emb.shape[1]
        pre_len = sum(s[0].shape[1] for s in pre_ocr_streams)
        ocr_begin = txt_len + obj_len + pre_len
        return {
            "ctx_out": ctx_out,
            "context_kv": self.encoder.project_context(layer_inputs),
            "col_bias": col_bias,
            "ctx_len": inputs.shape[1],
            "ocr_begin": ocr_begin,
            "ocr_end": ocr_begin + ocr_emb.shape[1],
        }

    def init_decode_caches(self, context, dec_len: int):
        """Per-layer joint [context | dec slots] K/V caches plus the
        step-invariant part of the joint attention bias."""
        caches = self.encoder.init_decode_caches(context["context_kv"], dec_len)
        bs = context["col_bias"].shape[0]
        bias_base = jnp.concatenate(
            [
                jnp.broadcast_to(
                    context["col_bias"], (bs,) + context["col_bias"].shape[1:]
                ),
                jnp.zeros((bs, 1, 1, dec_len), jnp.float32),
            ],
            axis=-1,
        )
        return caches, bias_base

    def build_dec_table(self, fixed_ans_emb, ocr_emb):
        """Step-invariant LayerNormed gather table (hoist out of the scan)."""
        return self.prev_pred_embeddings.build_table(fixed_ans_emb, ocr_emb)

    def embed_step(self, table, ans_num, prev_token, step):
        """One decode-step embedding from the prebuilt table:
        (bs,) prev token -> (bs, 1, h)."""
        return self.prev_pred_embeddings.embed_from_table(
            table, ans_num, prev_token[:, None], position_offset=step
        )

    def decode_step(self, dec_emb, context, dec_caches, bias_base, step):
        """Run ONE new decoder token through all layers against the joint
        pre-projected [context | decoded-prefix] K/V caches.  Returns
        (out (bs,1,h), new_caches) where caches are per-layer (K, V)."""
        ctx_len = context["ctx_len"]
        positions = jnp.arange(bias_base.shape[-1])
        bias = jnp.where(
            positions[None, None, None, :] <= ctx_len + step,
            bias_base,
            MASK_VALUE,
        )
        return self.encoder.decode_step(
            dec_emb, dec_caches, ctx_len + step, bias
        )

    def init_fused_decode(self, context, dec_len: int):
        """Kernel-D fused decode state (one pallas_call per sublayer per
        step; see BertEncoderStack.init_fused_decode_state) — or None when
        the kernels cannot engage (off-TPU / VMEM misfit), in which case
        callers fall back to init_decode_caches + decode_step."""
        return self.encoder.init_fused_decode_state(
            context["context_kv"], context["col_bias"], dec_len
        )

    def fused_decode_step(self, dec_emb, state, slot_caches, step):
        """Kernel-D decode step (exact decode_step semantics; equivalence
        pinned in tests/test_fused_m4c_step.py)."""
        return self.encoder.fused_decode_step(dec_emb, state, slot_caches, step)


def ocr_joint_features(batch, normalize: bool = True) -> jnp.ndarray:
    """[fasttext, rec, det] concat (mmf_m4c.py:168-186 ordering)."""
    fasttext = batch["ocr_fasttext_features"]
    rec = batch["ocr_rec_features"]
    det = batch["ocr_det_features"]
    if normalize:
        fasttext = l2_normalize(fasttext)
        rec = l2_normalize(rec)
        det = l2_normalize(det)
    return jnp.concatenate([fasttext, rec, det], axis=-1)


def ocr_padding_bias(batch) -> jnp.ndarray:
    """Padding bias computed on the *concatenated* OCR features like the
    reference (mmf_m4c.py:188-200)."""
    return padding_bias(ocr_joint_features(batch, normalize=False), padding_idx=0)
