"""Standalone M4C — the reference's own M4C reimplementation
(m4c.py:35-235), distinct from the MMF port (mmf_m4c.py):

* question: BertEmbeddings + BertEncoder over OUR vocab ids
  (m4c.py:81-86) — heads come from config.MMT (m4c.py:85), layers/hidden
  from config.TEXT_BERT; no text projection, no pretrained load (the
  TEXT_BERT.LOAD_PRETRAINED flag is dead in the reference build).
* obj/ocr: separate feat/bbox linears + LayerNorms — with the reference's
  SWAPPED bbox projections (object boxes go through
  `linear_ocr_bbox_to_mmt_in`, m4c.py:107-109, and OCR boxes through
  `linear_obj_bbox_to_mmt_in`, m4c.py:131-133), replicated so migrated
  checkpoints keep their semantics.  OCR features are
  [det, rec, fasttext], each l2-normalised (m4c.py:115-126 — note the
  order differs from MMF's [fasttext, rec, det]).
* answer stream: FixedVocabDynamicEmbedding over [vocab_proj rows ⊕ OCR
  embeddings] (m4c.py:148-162) — parameter-free, weight-tied to the
  output projection.
* joint encoder: ONE BertEncoder over [obj, ocr, question, answer]
  (m4c.py:163-181); within the answer block only the causal mask applies
  (the reference overwrites the block with the sequential mask, dropping
  answer padding there, m4c.py:166-168 — replicated).
* output: vocab projection ⊕ DynamicPointerNetwork copy scores over the
  joint-encoded OCR slice (m4c.py:195-203).

Documented mask divergence (NOT replicated): the reference's
`generate_padding_mask` already returns -10e4-scaled additive masks
(models/utils.py:56), and m4c.py rescales them AGAIN — `* -10e4` on the
question mask (m4c.py:146) and `.long() * -10000` on the joint masks
(m4c.py:169-171) — flipping every mask to +1e9, so its encoders attend
predominantly to padded (and, in the answer block, future) positions.
This model uses the masks the code plainly intends (additive 0/-10e4,
modules/masks.py).  Checkpoint weights are unaffected (masks carry no
parameters); migrated checkpoints simply run under correct masking here.

Both stacks keep the reference BertConfig's DEFAULT intermediate size
(3072) because m4c.py:82-85/91-94 never set it — override with
TEXT_BERT.INTERMEDIATE_SIZE / ENCODER.INTERMEDIATE_SIZE.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from ..builders import META_ARCHITECTURE, build_text_embedding
from .base import BatchArrays
from .m4c_common import OcrPtrNet, l2_normalize
from .mmf_m4c import resolve_decoding_mode
from .modules.bert import BertEmbeddings, BertEncoderStack
from .modules.masks import MASK_VALUE, causal_bias, padding_bias

_normal = nn.initializers.normal(stddev=0.02)
# reference obj/ocr LayerNorms are plain torch nn.LayerNorm (eps 1e-5)
_TORCH_LN_EPS = 1e-5
# BertConfig default the reference never overrides (m4c.py:82-85,91-94)
_BERT_DEFAULT_INTERMEDIATE = 3072


@META_ARCHITECTURE.register()
class M4C(nn.Module):
    """The reference's standalone M4C (m4c.py:35-235)."""

    config: Any
    vocab: Any

    def setup(self):
        c = self.config
        self.d_model = c.D_MODEL
        self.max_iter = self.vocab.max_answer_length
        # the reference joint encoder lets context rows attend answer
        # columns (m4c.py:163-171 builds no context->answer restriction);
        # CONTEXT_BLIND restores prefix-LM semantics and enables the exact
        # incremental decode (as in MMF_M4C.incremental_greedy_decode)
        self.decoding_mode, self.context_blind = resolve_decoding_mode(c)

        # -- obj/ocr embeddings (m4c.py:58-78), torch param names kept ----
        self.linear_obj_feat_to_mmt_in = nn.Dense(
            self.d_model, kernel_init=_normal
        )
        self.linear_obj_bbox_to_mmt_in = nn.Dense(
            self.d_model, kernel_init=_normal
        )
        self.linear_ocr_feat_to_mmt_in = nn.Dense(
            self.d_model, kernel_init=_normal
        )
        self.linear_ocr_bbox_to_mmt_in = nn.Dense(
            self.d_model, kernel_init=_normal
        )
        self.obj_feat_layer_norm = nn.LayerNorm(epsilon=_TORCH_LN_EPS)
        self.obj_bbox_layer_norm = nn.LayerNorm(epsilon=_TORCH_LN_EPS)
        self.ocr_feat_layer_norm = nn.LayerNorm(epsilon=_TORCH_LN_EPS)
        self.ocr_bbox_layer_norm = nn.LayerNorm(epsilon=_TORCH_LN_EPS)
        # (the reference also constructs `ocr_text_layer_norm`, m4c.py:77,
        # but its forward never uses it — dead parameter, not replicated)
        self.obj_drop = nn.Dropout(rate=c.OBJECT_EMBEDDING.DROPOUT)
        self.ocr_drop = nn.Dropout(rate=c.OCR_EMBEDDING.DROPOUT)

        # -- question encoder (m4c.py:80-86) ------------------------------
        tb = c.TEXT_BERT
        self.num_heads = c.MMT.NUM_ATTENTION_HEADS  # m4c.py:85
        self.question_embedding = BertEmbeddings(
            # BertConfig default table (30522 rows); our ids only index the
            # low rows — the converter copies the full table
            vocab_size=max(len(self.vocab), 30522),
            hidden_size=tb.HIDDEN_SIZE,
        )
        self.question_encoder = BertEncoderStack(
            hidden_size=tb.HIDDEN_SIZE,
            num_layers=tb.NUM_HIDDEN_LAYERS,
            num_heads=self.num_heads,
            intermediate_size=tb.get("INTERMEDIATE_SIZE")
            or _BERT_DEFAULT_INTERMEDIATE,
        )

        # -- answer embedding + joint encoder (m4c.py:88-94) ---------------
        self.dynamic_embedding = build_text_embedding(
            c.DYNAMIC_EMBEDDING, self.vocab
        )
        enc = c.ENCODER
        self.mmt_layers = enc.LAYERS
        self.encoder = BertEncoderStack(
            hidden_size=enc.SELF_ATTENTION.D_MODEL,
            num_layers=self.mmt_layers,
            num_heads=enc.SELF_ATTENTION.HEAD,
            intermediate_size=enc.get("INTERMEDIATE_SIZE")
            or _BERT_DEFAULT_INTERMEDIATE,
        )

        # -- output (m4c.py:96-98): vocab_proj weight doubles as the fixed
        # dynamic-embedding table, so keep it as explicit params
        self.vocab_proj_kernel = self.param(
            "vocab_proj_kernel", _normal, (self.d_model, len(self.vocab))
        )
        self.vocab_proj_bias = self.param(
            "vocab_proj_bias", nn.initializers.zeros, (len(self.vocab),)
        )
        # DynamicPointerNetwork (m4c.py:19-33): query/key denses + scaled
        # scores.  Divergence: the reference masks padded keys with -inf
        # (m4c.py:31); we use the additive-bias convention (0/-10e4,
        # modules/masks.py) — identical argmax/loss on non-degenerate rows
        # and no NaNs when a sample has zero OCR tokens.
        self.dynamic_network = OcrPtrNet(hidden_size=self.d_model)

    # -- streams (m4c.py:100-146) ----------------------------------------
    def _obj(self, batch: BatchArrays, train: bool):
        # note the bbox projection swap (m4c.py:107-109): obj boxes run
        # through linear_OCR_bbox_to_mmt_in
        emb = self.obj_feat_layer_norm(
            self.linear_obj_feat_to_mmt_in(batch["region_features"])
        ) + self.obj_bbox_layer_norm(
            self.linear_ocr_bbox_to_mmt_in(batch["region_boxes"])
        )
        emb = self.obj_drop(emb, deterministic=not train)
        return emb, padding_bias(batch["region_features"], 0)

    def _ocr(self, batch: BatchArrays, train: bool):
        det = l2_normalize(batch["ocr_det_features"])
        rec = l2_normalize(batch["ocr_rec_features"])
        fasttext = l2_normalize(batch["ocr_fasttext_features"])
        joint = jnp.concatenate([det, rec, fasttext], axis=-1)  # m4c.py:126
        # ...and OCR boxes through linear_OBJ_bbox_to_mmt_in (m4c.py:131-133)
        emb = self.ocr_feat_layer_norm(
            self.linear_ocr_feat_to_mmt_in(joint)
        ) + self.ocr_bbox_layer_norm(
            self.linear_obj_bbox_to_mmt_in(batch["ocr_boxes"])
        )
        emb = self.ocr_drop(emb, deterministic=not train)
        # padding derived from the det features alone (m4c.py:119-124)
        return emb, padding_bias(batch["ocr_det_features"], 0)

    def _question(self, batch: BatchArrays, train: bool):
        bias = padding_bias(batch["question_tokens"], self.vocab.padding_idx)
        emb = self.question_embedding(batch["question_tokens"], train=train)
        return (
            self.question_encoder(emb, attention_bias=bias, train=train),
            bias,
        )

    def _fixed_rows(self) -> jnp.ndarray:
        # vocab_proj.weight rows as embedding table (m4c.py:158)
        return self.vocab_proj_kernel.T

    # -- joint encode + output (m4c.py:148-203) --------------------------
    def _streams(self, batch: BatchArrays, train: bool):
        """The prev_inds-invariant input streams (hoisted out of the greedy
        scan: XLA does not lift invariants out of scan bodies, and the
        question BERT + obj/ocr embeddings do not depend on the decoded
        prefix)."""
        return (
            self._obj(batch, train),
            self._ocr(batch, train),
            self._question(batch, train),
        )

    def compute_scores(
        self, batch: BatchArrays, prev_inds: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        return self._scores_from_streams(
            self._streams(batch, train), prev_inds, train
        )

    def _scores_from_streams(
        self, streams, prev_inds: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        (obj_emb, obj_bias), (ocr_emb, ocr_bias), (q_emb, q_bias) = streams
        ans_emb, (ans_bias, _) = self.dynamic_embedding(
            prev_inds, ocr_emb, self._fixed_rows()
        )

        joint = jnp.concatenate([obj_emb, ocr_emb, q_emb, ans_emb], axis=1)
        col_bias = jnp.concatenate(
            [obj_bias, ocr_bias, q_bias, ans_bias], axis=-1
        )
        bs, total = joint.shape[0], joint.shape[1]
        ans_len = ans_emb.shape[1]
        extended = jnp.broadcast_to(col_bias, (bs, 1, total, total))
        # answer block = causal mask only (answer padding dropped there,
        # m4c.py:166-168 — replicated)
        extended = extended.at[:, :, -ans_len:, -ans_len:].set(
            jnp.broadcast_to(causal_bias(ans_len), (bs, 1, ans_len, ans_len))
        )
        if self.context_blind:
            extended = extended.at[:, :, : total - ans_len, -ans_len:].set(
                MASK_VALUE
            )
        encoded = self.encoder(joint, attention_bias=extended, train=train)

        obj_len, ocr_len = obj_emb.shape[1], ocr_emb.shape[1]
        ocr_out = encoded[:, obj_len:obj_len + ocr_len]
        dec_out = encoded[:, -ans_len:]
        fixed = dec_out @ self.vocab_proj_kernel + self.vocab_proj_bias
        dynamic = self.dynamic_network(dec_out, ocr_out, ocr_bias)
        return jnp.concatenate([fixed, dynamic], axis=-1)

    def __call__(self, batch: BatchArrays, train: bool = False) -> Dict:
        """Training: teacher-forced scores on answer_tokens (m4c.py:208-214)."""
        scores = self.compute_scores(batch, batch["answer_tokens"], train=train)
        return {"scores": scores}

    # -- greedy decode (m4c.py:216-235) ----------------------------------
    def greedy_decode(self, batch: BatchArrays) -> Dict:
        """max_iter full re-encodes as a lax.scan (the reference's Python
        loop with host-side early exit, m4c.py:224-235 — the scan stays
        on-device instead).  DECODING_MODE incremental dispatches to the
        KV-cached path."""
        if self.decoding_mode == "incremental":
            return self.incremental_greedy_decode(batch)
        bs = batch["question_tokens"].shape[0]
        # reference seeds with padding_idx everywhere + BOS (m4c.py:221-222)
        prev_inds = jnp.full(
            (bs, self.max_iter), self.vocab.padding_idx, jnp.int32
        )
        prev_inds = prev_inds.at[:, 0].set(self.vocab.bos_idx)

        streams = self._streams(batch, False)

        def body(mdl, prev_inds, _):
            # streams are scan constants — only the joint encoder re-runs
            scores = mdl._scores_from_streams(streams, prev_inds, train=False)
            argmax_inds = jnp.argmax(scores, axis=-1)
            return prev_inds.at[:, 1:].set(argmax_inds[:, :-1]), scores

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
        """Encode [obj, ocr, question] once, then one cached single-token
        step per position (exact under CONTEXT_BLIND, same argument as
        MMF_M4C.incremental_greedy_decode: position i's scores depend only
        on prev_inds[0..i])."""
        bs = batch["question_tokens"].shape[0]
        obj_emb, obj_bias = self._obj(batch, False)
        ocr_emb, ocr_bias = self._ocr(batch, False)
        q_emb, q_bias = self._question(batch, False)
        ctx = jnp.concatenate([obj_emb, ocr_emb, q_emb], axis=1)
        col_bias = jnp.concatenate([obj_bias, ocr_bias, q_bias], axis=-1)
        ctx_out, layer_inputs = self.encoder(
            ctx, attention_bias=col_bias, return_layer_inputs=True
        )
        context_kv = self.encoder.project_context(layer_inputs)
        obj_len, ocr_len = obj_emb.shape[1], ocr_emb.shape[1]
        ctx_ocr = ctx_out[:, obj_len:obj_len + ocr_len]
        max_iter = self.max_iter
        ctx_len = ctx.shape[1]
        # kernel-D fused path (TPU) over read-only context K/V + slot-only
        # caches; falls back to the XLA path with per-layer joint
        # [context | dec slots] (K, V) caches — decode steps write only the
        # new token's row either way
        fused_state = self.encoder.init_fused_decode_state(
            context_kv, col_bias, max_iter
        )
        if fused_state is not None:
            init_caches = fused_state["slots"]
        else:
            init_caches = self.encoder.init_decode_caches(context_kv, max_iter)
            bias_base = jnp.concatenate(
                [
                    jnp.broadcast_to(col_bias, (bs,) + col_bias.shape[1:]),
                    jnp.zeros((bs, 1, 1, max_iter), jnp.float32),
                ],
                axis=-1,
            )
            joint_positions = jnp.arange(ctx_len + max_iter)[None, None, None, :]

        def body(mdl, carry, step):
            prev_token, caches = carry
            dec_emb, _ = mdl.dynamic_embedding(
                prev_token[:, None], ocr_emb, mdl._fixed_rows()
            )
            if fused_state is not None:
                out, new_caches = mdl.encoder.fused_decode_step(
                    dec_emb, fused_state, caches, step
                )
            else:
                bias = jnp.where(
                    joint_positions <= ctx_len + step, bias_base, MASK_VALUE
                )
                out, new_caches = mdl.encoder.decode_step(
                    dec_emb, caches, ctx_len + step, bias
                )
            fixed = out @ mdl.vocab_proj_kernel + mdl.vocab_proj_bias
            dynamic = mdl.dynamic_network(out, ctx_ocr, ocr_bias)
            scores = jnp.concatenate([fixed, dynamic], axis=-1)[:, 0]
            next_token = jnp.argmax(scores, axis=-1).astype(prev_token.dtype)
            return (next_token, tuple(new_caches)), scores

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
            [
                bos[:, None],
                jnp.argmax(scores[:, :-1], axis=-1).astype(jnp.int32),
            ],
            axis=1,
        )
        return {"scores": scores, "prev_inds": prev_inds}
