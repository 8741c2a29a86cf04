"""MMF_M4C — canonical M4C port (TextBert + MMT joint encoder + pointer
network), plus the MMF_ImprovedDecodingM4C and experimental_MMF_M4C
variants.

Parity: /root/reference/models/mmf_m4c.py:20-256 (model),
mmf_improved_decoding_m4c.py:20-461 (masks future prev_inds per greedy
step, length-based padding mask), experimental_mmf_m4c.py:22-470.
TPU redesign: the greedy decode loop (reference: Python loop of full MMT
re-encodes with host-side early exit, mmf_m4c.py:236-256) is one `lax.scan`
over max_iter steps with static shapes; the early-exit saving is handled by
the scan being fully on-device (no per-step host sync at all).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from ..builders import META_ARCHITECTURE
from .base import BatchArrays
from .m4c_common import (
    FeatureBoxEncoding,
    MMT,
    OcrPtrNet,
    TextBert,
    ocr_joint_features,
    ocr_padding_bias,
)
from .modules.masks import padding_bias

_normal = nn.initializers.normal(stddev=0.02)


def resolve_decoding_mode(config):
    """(decoding_mode, context_blind) from the MODEL config node.

    DECODING_MODE "incremental" (TPU-native fast path): context-blind
    masking + per-layer KV caches; greedy decode drops from T full
    joint-transformer re-encodes to one context encode + T single-token
    steps.  Implies CONTEXT_BLIND.  Default (None) is exact reference
    behavior.  Shared by the whole M4C family (MMF_M4C, standalone M4C,
    MMF_IterativeLoRRA)."""
    mode = config.get("DECODING_MODE")
    if mode not in (None, "incremental"):
        raise ValueError(
            f"MODEL.DECODING_MODE must be 'incremental' or unset, got {mode!r}"
        )
    return mode, bool(config.get("CONTEXT_BLIND") or mode == "incremental")


@META_ARCHITECTURE.register()
class MMF_M4C(nn.Module):
    config: Any
    vocab: Any

    def setup(self):
        c = self.config
        # some reference configs (mmf_iterative_m4c.yaml) describe the stack
        # via ENCODER/DECODER instead of MMT — fall back accordingly
        mmt = c.get("MMT") or c.get("ENCODER")
        self.hidden_size = mmt.get("HIDDEN_SIZE", mmt.get("D_MODEL", c.D_MODEL))
        self.num_heads = mmt.get("NUM_ATTENTION_HEADS", mmt.get("HEAD", 8))
        self.mmt_layers = mmt.get(
            "NUM_HIDDEN_LAYERS", mmt.get("LAYERS", 4)
        )
        self.max_iter = self.vocab.max_answer_length
        self.d_model = self.hidden_size
        self.decoding_mode, self.context_blind = resolve_decoding_mode(c)

        self.text_bert = TextBert(
            c.TEXT_BERT, num_heads=self.num_heads, vocab_size=len(self.vocab)
        )
        # reference rule (mmf_m4c.py:62-71): a projection exists iff MMT
        # hidden != 768 (the TEXT_BERT_HIDDEN_SIZE constant).  We also add it
        # when the text hidden differs from MMT hidden — the one case the
        # reference would crash on (Identity feeding a mismatched width).
        self.uses_text_proj = (
            self.hidden_size != 768
            or c.TEXT_BERT.HIDDEN_SIZE != self.hidden_size
        )
        if self.uses_text_proj:
            self.text_bert_out_linear = nn.Dense(
                self.hidden_size, kernel_init=_normal
            )
        self.obj_encoding = FeatureBoxEncoding(
            self.hidden_size, c.OBJECT_EMBEDDING.DROPOUT
        )
        self.ocr_encoding = FeatureBoxEncoding(
            self.hidden_size, c.OCR_EMBEDDING.DROPOUT
        )
        self.mmt = MMT(
            hidden_size=self.hidden_size,
            num_layers=self.mmt_layers,
            num_heads=self.num_heads,
            intermediate_size=mmt.get("INTERMEDIATE_SIZE"),
        )
        # explicit classifier params: the kernel doubles as the fixed-vocab
        # embedding table for PrevPredEmbeddings (mmf_m4c.py:215 weight tying)
        self.classifier_kernel = self.param(
            "classifier_kernel", _normal, (self.hidden_size, len(self.vocab))
        )
        self.classifier_bias = self.param(
            "classifier_bias", nn.initializers.zeros, (len(self.vocab),)
        )
        ptr = c.get("OCR_PTR_NET")
        self.ocr_ptr_net = OcrPtrNet(
            hidden_size=ptr.HIDDEN_SIZE if ptr else self.hidden_size,
            query_key_size=ptr.get("QUERY_KEY_SIZE") if ptr else None,
        )

    # -- encodings -------------------------------------------------------------
    def _txt(self, batch: BatchArrays, train: bool):
        txt_bias = padding_bias(batch["question_tokens"], self.vocab.padding_idx)
        txt_emb = self.text_bert(batch["question_tokens"], txt_bias, train=train)
        if self.uses_text_proj:
            txt_emb = self.text_bert_out_linear(txt_emb)
        return txt_emb, txt_bias

    def _obj(self, batch: BatchArrays, train: bool):
        obj_emb = self.obj_encoding(
            batch["region_features"], batch["region_boxes"], train=train
        )
        return obj_emb, padding_bias(batch["region_features"], 0)

    def _ocr(self, batch: BatchArrays, train: bool):
        ocr_emb = self.ocr_encoding(
            ocr_joint_features(batch), batch["ocr_boxes"], train=train
        )
        return ocr_emb, ocr_padding_bias(batch)

    def classifier(self, x: jnp.ndarray) -> jnp.ndarray:
        return x @ self.classifier_kernel + self.classifier_bias

    def _fixed_ans_emb(self):
        # (num_vocab, hidden): transpose of the classifier kernel
        return self.classifier_kernel.T

    def _mmt_streams(self, batch: BatchArrays, train: bool) -> Dict:
        """All MMT input streams in joint order.  Variants override this to
        add pre_ocr/extra streams (MMF_REGIONAL_M4C, MMF_SAL) or change the
        question stream (MMF_LanguageAdaptiveM4C) — both compute_scores and
        the incremental decode path consume it."""
        txt_emb, txt_bias = self._txt(batch, train)
        obj_emb, obj_bias = self._obj(batch, train)
        ocr_emb, ocr_bias = self._ocr(batch, train)
        return {
            "txt": (txt_emb, txt_bias),
            "obj": (obj_emb, obj_bias),
            "ocr": (ocr_emb, ocr_bias),
            "pre_ocr": (),
            "extra": (),
        }

    def compute_scores(
        self, batch: BatchArrays, prev_inds: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        return self._scores_from_streams(
            self._mmt_streams(batch, train), prev_inds, train
        )

    def _greedy_invariants(self, batch: BatchArrays):
        """Everything prev_inds-invariant, computed ONCE outside the greedy
        scan (XLA does not lift invariants out of scan bodies).  Variants
        overriding compute_scores must override this + _scores_from_streams
        as a pair."""
        return self._mmt_streams(batch, False)

    def _scores_from_streams(
        self, streams, prev_inds: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        """Scores from precomputed _greedy_invariants."""
        ocr_bias = streams["ocr"][1]

        results = self.mmt(
            *streams["txt"], *streams["obj"], *streams["ocr"],
            fixed_ans_emb=self._fixed_ans_emb(),
            prev_inds=prev_inds,
            pre_ocr_streams=streams["pre_ocr"],
            extra_streams=streams["extra"],
            train=train,
            context_blind=self.context_blind,
        )
        fixed_scores = self.classifier(results["mmt_dec_output"])
        dynamic_scores = self.ocr_ptr_net(
            results["mmt_dec_output"], results["mmt_ocr_output"], ocr_bias
        )
        return jnp.concatenate([fixed_scores, dynamic_scores], axis=-1)

    def __call__(self, batch: BatchArrays, train: bool = False) -> Dict:
        """Training: teacher-forced scores on answer_tokens
        (mmf_m4c.py:228-231)."""
        scores = self.compute_scores(batch, batch["answer_tokens"], train=train)
        return {"scores": scores}

    def _update_prev_inds(self, prev_inds, scores, step):
        argmax_inds = jnp.argmax(scores, axis=-1)
        return prev_inds.at[:, 1:].set(argmax_inds[:, :-1])

    def greedy_decode(self, batch: BatchArrays) -> Dict:
        """Greedy inference: max_iter full re-encodes as a lax.scan
        (mmf_m4c.py:236-256 semantics, without the host-side early exit).
        With DECODING_MODE incremental, dispatches to the KV-cached path."""
        if self.decoding_mode == "incremental":
            return self.incremental_greedy_decode(batch)
        bs = batch["question_tokens"].shape[0]
        prev_inds = jnp.zeros((bs, self.max_iter), jnp.int32)
        prev_inds = prev_inds.at[:, 0].set(self.vocab.bos_idx)
        invariants = self._greedy_invariants(batch)

        def body(mdl, prev_inds, step):
            # invariants are scan constants — only prev_inds-dependent
            # compute re-runs per step
            scores = mdl._scores_from_streams(invariants, prev_inds, train=False)
            return mdl._update_prev_inds(prev_inds, scores, step), scores

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        prev_inds, all_scores = scan(self, prev_inds, jnp.arange(self.max_iter))
        return {"scores": all_scores[-1], "prev_inds": prev_inds}

    def incremental_greedy_decode(self, batch: BatchArrays) -> Dict:
        """KV-cached greedy decode: encode [txt, obj, ocr] once, then one
        single-token step per position against per-layer caches.  Exactly
        equivalent to the quadratic greedy under CONTEXT_BLIND masking
        (verified token- and score-identical in tests/test_incremental_m4c.py):
        with a causal decoder and context blind to decoder slots, position
        i's scores depend only on prev_inds[0..i], which are final by step i."""
        bs = batch["question_tokens"].shape[0]
        streams = self._mmt_streams(batch, False)
        ocr_emb, ocr_bias = streams["ocr"]
        context = self.mmt.encode_context(
            *streams["txt"], *streams["obj"], *streams["ocr"],
            pre_ocr_streams=streams["pre_ocr"],
            extra_streams=streams["extra"],
        )
        ctx_ocr = context["ctx_out"][:, context["ocr_begin"]:context["ocr_end"]]
        max_iter = self.max_iter
        # kernel-D fused path (TPU): one pallas_call per sublayer per step
        # over read-only context K/V + slot-only caches; falls back to the
        # XLA path with joint [context | dec slots] caches — decode steps
        # project and write only the new token's row either way
        # (see BertEncoderStack.{fused_,}decode_step)
        fused_state = self.mmt.init_fused_decode(context, max_iter)
        if fused_state is not None:
            init_caches = fused_state["slots"]
        else:
            init_caches, bias_base = self.mmt.init_decode_caches(
                context, max_iter
            )
        fixed_ans_emb = self._fixed_ans_emb()
        dec_table = self.mmt.build_dec_table(fixed_ans_emb, ocr_emb)
        ans_num = fixed_ans_emb.shape[0]
        # step-invariant ptr-net key projection hoisted out of the scan
        # (XLA does not hoist scan invariants — re-projecting (bs, K, h)
        # keys every step was pure waste)
        ptr_keys = self.ocr_ptr_net.project_keys(ctx_ocr)

        def body(mdl, carry, step):
            prev_token, caches = carry
            dec_emb = mdl.mmt.embed_step(dec_table, ans_num, prev_token, step)
            if fused_state is not None:
                out, caches = mdl.mmt.fused_decode_step(
                    dec_emb, fused_state, caches, step
                )
            else:
                out, caches = mdl.mmt.decode_step(
                    dec_emb, context, caches, bias_base, step
                )
            fixed = mdl.classifier(out)
            dynamic = mdl.ocr_ptr_net.score(out, ptr_keys, ocr_bias)
            scores = jnp.concatenate([fixed, dynamic], axis=-1)[:, 0]
            next_token = jnp.argmax(scores, axis=-1).astype(prev_token.dtype)
            return (next_token, caches), scores

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        bos = jnp.full((bs,), self.vocab.bos_idx, jnp.int32)
        (_, _), all_scores = scan(self, (bos, init_caches), jnp.arange(max_iter))
        scores = jnp.moveaxis(all_scores, 0, 1)  # (bs, T, V+K)
        prev_inds = jnp.concatenate(
            [bos[:, None], jnp.argmax(scores[:, :-1], axis=-1).astype(jnp.int32)],
            axis=1,
        )
        return {"scores": scores, "prev_inds": prev_inds}


@META_ARCHITECTURE.register()
class MMF_ImprovedDecodingM4C(MMF_M4C):
    """Masks future prev_inds at each greedy step
    (mmf_improved_decoding_m4c.py:225-231): positions > step are reset to 0
    so the decoder cannot condition on stale future predictions."""

    def _update_prev_inds(self, prev_inds, scores, step):
        argmax_inds = jnp.argmax(scores, axis=-1)
        updated = prev_inds.at[:, 1:].set(argmax_inds[:, :-1])
        positions = jnp.arange(updated.shape[1])[None, :]
        return jnp.where(positions <= step + 1, updated, 0)


@META_ARCHITECTURE.register()
class experimental_MMF_M4C(MMF_M4C):  # noqa: N801 (reference name)
    """Experimental text-encoding variant (experimental_mmf_m4c.py:22-470):
    the question stream is re-encoded with the object stream as context
    before entering the MMT."""

    def setup(self):
        super().setup()
        from .modules.bert import BertEncoderStack

        self.txt_context_encoder = BertEncoderStack(
            hidden_size=self.hidden_size,
            num_layers=1,
            num_heads=self.num_heads,
            cross_attention=True,
        )

    def _txt(self, batch: BatchArrays, train: bool):
        txt_emb, txt_bias = super()._txt(batch, train)
        obj_emb, obj_bias = self._obj(batch, train)
        txt_emb = self.txt_context_encoder(
            txt_emb,
            attention_bias=txt_bias,
            encoder_states=obj_emb,
            encoder_bias=obj_bias,
            train=train,
        )
        return txt_emb, txt_bias
