"""IterativeM4C — home-grown M4C: single-stream prefix-LM over
region/grid/OCR/question with a dynamic-vocab answer stream (fixed vocab ⊕
per-sample OCR rows) and a pointer network for OCR copying.

Parity: /root/reference/models/iterative_m4c.py:34-289 (DynamicPointerNetwork
:18-32, stream tagging :86-146, joint assembly :157-186, output head
:222-229).  The reference's OCR word features come from an in-model FastText
lookup over strings; here the data pipeline supplies
`ocr_fasttext_features` and OcrWordEmbedding projects them (strings never
cross the jit boundary).  Beam decode keeps a static token buffer like
UniqueTransformer instead of the reference's growing-buffer step().
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builders import (
    META_ARCHITECTURE,
    build_encoder,
    build_text_embedding,
    build_vision_embedding,
)
from .base import BatchArrays, GenerativeModel
from .modules.masks import (
    MASK_VALUE,
    causal_bias,
    combine_biases,
    padding_bias,
    prefix_lm_bias,
)
from .unique_transformer import _TokenBuffer

_xavier = nn.initializers.xavier_uniform()


class DynamicPointerNetwork(nn.Module):
    """Pointer scores = Q(ocr) K(answer)^T / sqrt(d), OCR-padding masked,
    transposed to (bs, L_ans, K) (iterative_m4c.py:18-32 parity)."""

    d_model: int

    @nn.compact
    def __call__(self, ocr_features, answer_features, ocr_bias):
        q = nn.Dense(self.d_model, kernel_init=_xavier)(ocr_features)
        k = nn.Dense(self.d_model, kernel_init=_xavier)(answer_features)
        scores = jnp.einsum(
            "bkd,bad->bka", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(float(self.d_model))
        masked = ocr_bias[:, 0, 0, :, None] != 0  # (bs, K, 1)
        scores = jnp.where(masked, MASK_VALUE, scores)
        return scores.transpose(0, 2, 1)  # (bs, L_ans, K)


class _ArrayCache(nn.Module):
    """One 'cache'-collection buffer created lazily from a template (flax
    cache variables must live in compact submodules, cf. _TokenBuffer)."""

    @nn.compact
    def __call__(self, init_like: jnp.ndarray, new_value=None) -> jnp.ndarray:
        var = self.variable("cache", "buf", lambda: jnp.zeros_like(init_like))
        if new_value is not None:
            var.value = new_value
        return var.value


@META_ARCHITECTURE.register()
class IterativeM4C(GenerativeModel):
    config: Any
    vocab: Any

    def setup(self):
        c = self.config
        self.d_model = c.D_MODEL
        # DECODING_MODE "incremental" (TPU-native fast path, mirrors the
        # MMF family): encode the joint prefix once, cache each encoder
        # layer's inputs, and decode one token per step against them.
        # Exact under CONTEXT_BLIND masking (joint rows never attend the
        # generated prefix); the default reproduces the reference
        # semantics where they do (iterative_m4c.py:237-270).
        from .mmf_m4c import resolve_decoding_mode

        self.decoding_mode, self.context_blind = resolve_decoding_mode(c)
        self.answer_cache = _ArrayCache()
        self.region_embedding = build_vision_embedding(c.REGION_EMBEDDING)
        self.grid_embedding = build_vision_embedding(c.GRID_EMBEDDING)
        self.box_embedding = build_vision_embedding(c.BOX_EMBEDDING)
        self.ocr_det_embedding = build_vision_embedding(c.OCR_DET_EMBEDDING)
        self.ocr_rec_embedding = build_vision_embedding(c.OCR_REC_EMBEDDING)
        self.text_embedding = build_text_embedding(c.TEXT_EMBEDDING, self.vocab)
        self.ocr_embedding = build_text_embedding(c.OCR_TEXT_EMBEDDING, self.vocab)
        self.dynamic_embedding = build_text_embedding(
            c.DYNAMIC_EMBEDDING, self.vocab
        )
        self.encoder = build_encoder(c.ENCODER)
        self.dynamic_network = DynamicPointerNetwork(c.D_MODEL)
        self.vocab_proj = nn.Dense(len(self.vocab), kernel_init=_xavier)
        self.token_buffer = _TokenBuffer(self.vocab.max_answer_length)

    # -- stream embedding ------------------------------------------------------
    def _tag(self, features: jnp.ndarray, token_idx: int, train: bool):
        tokens = jnp.full(features.shape[:2], token_idx, jnp.int32)
        tag, _ = self.text_embedding(tokens, train=train)
        return features + tag

    def embed_features(self, batch: BatchArrays, train: bool = False):
        v = self.vocab
        region, region_bias = self.region_embedding(
            batch["region_features"], train=train
        )
        region = self._tag(region, v.feat_idx, train)
        region_boxes, _ = self.box_embedding(batch["region_boxes"], train=train)
        region = region + self._tag(region_boxes, v.box_idx, train)

        grid, grid_bias = self.grid_embedding(batch["grid_features"], train=train)
        grid = self._tag(grid, v.feat_idx, train)
        grid_boxes, _ = self.box_embedding(batch["grid_boxes"], train=train)
        grid = grid + self._tag(grid_boxes, v.box_idx, train)

        det, ocr_bias = self.ocr_det_embedding(
            batch["ocr_det_features"], train=train
        )
        det = self._tag(det, v.ocr_det_idx, train)
        rec, _ = self.ocr_rec_embedding(batch["ocr_rec_features"], train=train)
        rec = self._tag(rec, v.ocr_rec_idx, train)
        ocr_boxes, _ = self.box_embedding(batch["ocr_boxes"], train=train)
        ocr_boxes = self._tag(ocr_boxes, v.box_idx, train)
        words, _ = self.ocr_embedding(batch["ocr_fasttext_features"], train=train)
        words = self._tag(words, v.ocr_idx, train)
        ocr = det + rec + ocr_boxes + words

        question, (question_bias, _) = self.text_embedding(
            batch["question_tokens"], train=train
        )
        question = self._tag(question, v.question_idx, train)

        joint = jnp.concatenate([region, grid, ocr, question], axis=1)
        joint_bias = jnp.concatenate(
            [region_bias, grid_bias, ocr_bias, question_bias], axis=-1
        )
        return joint, joint_bias

    def _ocr_span(self, batch: BatchArrays) -> Tuple[int, int]:
        start = batch["region_features"].shape[1] + batch["grid_features"].shape[1]
        return start, start + batch["ocr_det_features"].shape[1]

    def encode(self, batch: BatchArrays, train: bool = False):
        """Pre-encoder joint prefix; the OCR slice and its bias ride along
        so decode_step can address the dynamic-vocab rows without knowing
        the stream layout."""
        joint, joint_bias = self.embed_features(batch, train=train)
        ocr_start, ocr_end = self._ocr_span(batch)
        state = {
            "ocr": joint[:, ocr_start:ocr_end],
            "ocr_bias": joint_bias[..., ocr_start:ocr_end],
            "ocr_start": jnp.full((joint.shape[0],), ocr_start, jnp.int32),
        }
        if self.decoding_mode == "incremental":
            # context-blind: the joint prefix never attends the answer, so
            # its per-layer inputs and OCR outputs are decode-invariant —
            # encode once here.  (These leaves live in the ENCODER STATE
            # that step_fn closes over — training/decode.py gathers only
            # the mutated 'cache' collection, so they are never part of
            # the per-step beam reorder regardless of naming.)  The raw
            # `joint` tensor is NOT carried separately: it IS
            # enc_kv_ctx_inputs[0] (see decode_teacher_forced).
            ctx_out, layer_inputs = self.encoder(
                joint, joint_bias, train=False, return_layer_inputs=True
            )
            state["enc_kv_ctx_inputs"] = tuple(layer_inputs)
            state["enc_kv_ocr_out"] = ctx_out[:, ocr_start:ocr_end]
        else:
            state["joint"] = joint
        return state, joint_bias

    def _answer_features(self, tokens, embedded_ocr, train: bool):
        features, (pad_bias, _) = self.dynamic_embedding(
            tokens, embedded_ocr, train=train
        )
        return self._tag(features, self.vocab.answer_idx, train), pad_bias

    def _output(self, answer_out, ocr_out, ocr_bias):
        vocab_scores = self.vocab_proj(answer_out)
        pointer_scores = self.dynamic_network(ocr_out, answer_out, ocr_bias)
        return jax.nn.log_softmax(
            jnp.concatenate([vocab_scores, pointer_scores], axis=-1), axis=-1
        )

    def __call__(self, batch: BatchArrays, train: bool = False) -> jnp.ndarray:
        joint, joint_bias = self.embed_features(batch, train=train)
        joint_len = joint.shape[1]
        ocr_start, ocr_end = self._ocr_span(batch)
        ocr_bias = joint_bias[..., ocr_start:ocr_end]

        answer_tokens = batch["answer_tokens"]
        answer_features, answer_pad = self._answer_features(
            answer_tokens, joint[:, ocr_start:ocr_end], train
        )
        answer_block = combine_biases(
            answer_pad, causal_bias(answer_tokens.shape[1])
        )

        features = jnp.concatenate([joint, answer_features], axis=1)
        bias = prefix_lm_bias(joint_bias, answer_pad, answer_block)
        if self.context_blind:
            bias = bias.at[:, :, :joint_len, joint_len:].set(MASK_VALUE)
        encoded = self.encoder(features, bias, train=train)

        answer_out = encoded[:, joint_len:]
        ocr_out = encoded[:, ocr_start:ocr_end]
        return self._output(answer_out, ocr_out, ocr_bias)

    def decode_teacher_forced(
        self, tokens, encoder_state, encoder_attention_bias, train=False
    ):
        """SCST re-scoring: this single-stream prefix-LM has no `decoder`
        submodule for the GenerativeModel default to delegate to — mirror
        __call__'s joint layout from the encode() state.  In incremental
        mode the raw joint prefix is the FIRST cached layer input (the
        state deliberately omits a separate copy)."""
        joint = encoder_state.get("joint")
        if joint is None:
            joint = encoder_state["enc_kv_ctx_inputs"][0]
        joint_len = joint.shape[1]
        embedded_ocr = encoder_state["ocr"]
        ocr_bias = encoder_state["ocr_bias"]
        ocr_start = encoder_state["ocr_start"][0]
        ocr_len = embedded_ocr.shape[1]

        answer_features, answer_pad = self._answer_features(
            tokens, embedded_ocr, train
        )
        answer_block = combine_biases(answer_pad, causal_bias(tokens.shape[1]))
        features = jnp.concatenate([joint, answer_features], axis=1)
        bias = prefix_lm_bias(encoder_attention_bias, answer_pad, answer_block)
        if self.context_blind:
            bias = bias.at[:, :, :joint_len, joint_len:].set(MASK_VALUE)
        encoded = self.encoder(features, bias, train=train)
        answer_out = encoded[:, joint_len:]
        ocr_out = jax.lax.dynamic_slice_in_dim(encoded, ocr_start, ocr_len, axis=1)
        return self._output(answer_out, ocr_out, ocr_bias)

    def decode_step(self, token, encoder_state, encoder_attention_bias):
        if self.decoding_mode == "incremental":
            return self._incremental_decode_step(
                token, encoder_state, encoder_attention_bias
            )
        joint = encoder_state["joint"]
        embedded_ocr = encoder_state["ocr"]
        ocr_bias = encoder_state["ocr_bias"]
        ocr_start = encoder_state["ocr_start"][0]
        ocr_len = embedded_ocr.shape[1]
        joint_len = joint.shape[1]

        buffer, i = self.token_buffer(token)
        max_len = buffer.shape[1]

        answer_features, _ = self._answer_features(buffer, embedded_ocr, False)
        positions = jnp.arange(max_len)
        generated = jnp.where(positions <= i, 0.0, MASK_VALUE)[None, None, None, :]
        answer_col = combine_biases(
            padding_bias(buffer, self.vocab.padding_idx), generated
        )
        answer_block = combine_biases(answer_col, causal_bias(max_len))

        features = jnp.concatenate([joint, answer_features], axis=1)
        bias = prefix_lm_bias(encoder_attention_bias, answer_col, answer_block)
        if self.context_blind:
            bias = bias.at[:, :, :joint_len, joint_len:].set(MASK_VALUE)
        encoded = self.encoder(features, bias)

        answer_out = jax.lax.dynamic_slice_in_dim(
            encoded, joint_len + i, 1, axis=1
        )
        ocr_out = jax.lax.dynamic_slice_in_dim(encoded, ocr_start, ocr_len, axis=1)
        return self._output(answer_out, ocr_out, ocr_bias)

    def _incremental_decode_step(self, token, encoder_state, encoder_attention_bias):
        """One-token step against the cached joint prefix: O(C + T) keys
        per step instead of re-encoding the (C + T)-token stream.  Exact
        vs the quadratic step under CONTEXT_BLIND (tested in
        tests/test_incremental_m4c.py)."""
        embedded_ocr = encoder_state["ocr"]
        ocr_bias = encoder_state["ocr_bias"]
        ctx_inputs = list(encoder_state["enc_kv_ctx_inputs"])
        ocr_out = encoder_state["enc_kv_ocr_out"]
        joint_len = ctx_inputs[0].shape[1]
        bs = token.shape[0]

        buffer, i = self.token_buffer(token)
        max_len = buffer.shape[1]

        token_features, _ = self._answer_features(token, embedded_ocr, False)
        position = jnp.full((bs, 1), joint_len + 1, jnp.float32) + i

        slots = jnp.where(jnp.arange(max_len) <= i, 0.0, MASK_VALUE)
        slot_bias = combine_biases(
            jnp.broadcast_to(slots[None, None, None, :], (bs, 1, 1, max_len)),
            # mask PAD tokens among the written slots too — the quadratic
            # step masks them (decode_step's answer_col), and beam search
            # feeds word 0 (= padding_idx) into finished beams every step
            padding_bias(buffer, self.vocab.padding_idx),
        )
        bias = jnp.concatenate([encoder_attention_bias, slot_bias], axis=-1)

        d = token_features.shape[-1]
        template = jnp.zeros(
            (bs, len(ctx_inputs), max_len, d), token_features.dtype
        )
        bank = self.answer_cache(template)
        caches = [bank[:, layer] for layer in range(len(ctx_inputs))]
        out, new_caches = self.encoder.decode_step(
            token_features, position, ctx_inputs, caches, i, bias
        )
        self.answer_cache(template, jnp.stack(new_caches, axis=1))
        return self._output(out, ocr_out, ocr_bias)
