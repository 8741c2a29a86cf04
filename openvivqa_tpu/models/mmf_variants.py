"""M4C family variants.

Parity targets:
* MMF_REGIONAL_M4C  — mmf_regional_m4c.py:15-216 (4th modality stream:
  grid/"region" features between obj and ocr in the MMT).
* MMF_IterativeM4C  — mmf_iterative_m4c.py:13-270 (BertEncoder encoder over
  [txt,obj,ocr] + causal cross-attention BertEncoder decoder).
* MMF_Iterative_Multilevel_M4C — mmf_iterative_multilevel_m4c.py:14-362
  (decoder layer i cross-attends encoder layer i's hidden states).
* MMF_LanguageAdaptiveM4C — mmf_language_adaptive_m4c.py:18-251 (one
  frozen multilingual pretrained backbone + trainable fine-tune encoder).
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
from .modules.bert import decode_cache_dtype
from .modules.bert import LN_EPS, BertEncoderStack, BertLayer
from .modules.masks import (
    MASK_VALUE,
    causal_bias,
    padding_bias,
    validity_to_bias,
)

_normal = nn.initializers.normal(stddev=0.02)


@META_ARCHITECTURE.register()
class MMF_REGIONAL_M4C(MMF_M4C):
    """Adds a grid/"region" stream between obj and ocr
    (mmf_regional_m4c.py:29-56,131-160)."""

    def setup(self):
        super().setup()
        self.region_encoding = FeatureBoxEncoding(
            self.hidden_size, self.config.REGION_EMBEDDING.DROPOUT
        )

    def _mmt_streams(self, batch, train: bool):
        streams = super()._mmt_streams(batch, train)
        region_emb = self.region_encoding(
            batch["grid_features"], batch["grid_boxes"], train=train
        )
        region_bias = padding_bias(batch["grid_features"], 0)
        return {**streams, "pre_ocr": ((region_emb, region_bias),)}


@META_ARCHITECTURE.register()
class MMF_SAL(MMF_M4C):
    """SAL (spatially-aware look): the MMT gets an extra OCR word-embedding
    stream (mmf_sal.py:59-74)."""

    def setup(self):
        super().setup()
        self.ocr_word_proj = nn.Dense(self.hidden_size, kernel_init=_normal)
        self.ocr_word_norm = nn.LayerNorm(epsilon=LN_EPS)

    def _mmt_streams(self, batch, train: bool):
        streams = super()._mmt_streams(batch, train)
        word_emb = self.ocr_word_norm(
            self.ocr_word_proj(l2_normalize(batch["ocr_fasttext_features"]))
        )
        return {**streams, "extra": ((word_emb, streams["ocr"][1]),)}


class _IterativeM4CBase(MMF_M4C):
    """Encoder/decoder split shared by MMF_IterativeM4C and the multilevel
    variant (mmf_iterative_m4c.py:78-98)."""

    multilevel: bool = False

    def setup(self):
        super().setup()
        c = self.config
        # the reference iterative file uses nn.Identity() unconditionally
        # (mmf_iterative_m4c.py:37) — project only when the text hidden size
        # actually differs (where the reference would crash)
        self.uses_text_proj = c.TEXT_BERT.HIDDEN_SIZE != self.hidden_size
        enc = c.get("ENCODER") or c.MMT
        dec = c.get("DECODER") or c.MMT
        self.joint_encoder = BertEncoderStack(
            hidden_size=self.hidden_size,
            num_layers=enc.get("LAYERS", enc.get("NUM_HIDDEN_LAYERS")),
            num_heads=self.num_heads,
            intermediate_size=enc.get("INTERMEDIATE_SIZE"),
        )
        self.dec_layers = int(dec.get("LAYERS", dec.get("NUM_HIDDEN_LAYERS")))
        self.decoder_layers = [
            BertLayer(
                self.hidden_size, self.num_heads,
                intermediate_size=dec.get("INTERMEDIATE_SIZE"),
                cross_attention=True,
                name=f"dec_layer_{i}",
            )
            for i in range(self.dec_layers)
        ]
        self.dec_embeddings = PrevPredEmbeddings(self.hidden_size)

    def _encode_joint(self, batch, train: bool):
        streams = self._mmt_streams(batch, train)
        (txt_emb, txt_bias) = streams["txt"]
        (obj_emb, obj_bias) = streams["obj"]
        (ocr_emb, ocr_bias) = streams["ocr"]
        enc_inputs = jnp.concatenate([txt_emb, obj_emb, ocr_emb], axis=1)
        enc_bias = jnp.concatenate([txt_bias, obj_bias, ocr_bias], axis=-1)
        encoded = self.joint_encoder(
            enc_inputs, attention_bias=enc_bias, train=train,
            return_all=self.multilevel,
        )
        all_states = None
        if self.multilevel:
            encoded, all_states = encoded
        ocr_begin = txt_emb.shape[1] + obj_emb.shape[1]
        return {
            "encoded": encoded,
            "all_states": all_states,
            "enc_bias": enc_bias,
            "ocr_emb": ocr_emb,
            "ocr_bias": ocr_bias,
            "ocr_begin": ocr_begin,
            "ocr_end": ocr_begin + ocr_emb.shape[1],
        }

    def compute_scores(self, batch, prev_inds, train: bool = False):
        return self._scores_from_streams(
            self._encode_joint(batch, train), prev_inds, train
        )

    def _greedy_invariants(self, batch):
        # the WHOLE joint encode is prev_inds-invariant here — hoisting it
        # out of the quadratic greedy scan leaves only the decoder layers
        # re-running per step (exact: identical inputs every step)
        return self._encode_joint(batch, False)

    def _scores_from_streams(self, enc, prev_inds, train: bool = False):
        dec = self.dec_embeddings(
            self._fixed_ans_emb(), enc["ocr_emb"], prev_inds, train=train
        )
        dec_bias = causal_bias(dec.shape[1])
        for i, layer in enumerate(self.decoder_layers):
            cross_states = (
                enc["all_states"][i] if self.multilevel else enc["encoded"]
            )
            dec = layer(
                dec,
                attention_bias=dec_bias,
                encoder_states=cross_states,
                encoder_bias=enc["enc_bias"],
                train=train,
            )

        fixed_scores = self.classifier(dec)
        dynamic_scores = self.ocr_ptr_net(
            dec, enc["encoded"][:, enc["ocr_begin"]:enc["ocr_end"]],
            enc["ocr_bias"],
        )
        return jnp.concatenate([fixed_scores, dynamic_scores], axis=-1)

    def _init_fused_dec(self, enc, max_iter: int):
        """Fused decode state for the kernel A/E/FFN triple (one
        pallas_call per sublayer per step instead of ~30 XLA ops per
        layer): per-layer cast weight bundles, pre-projected cross K/V
        padded to the kernel-E chunk plan, (nj, bs, chunk) encoder bias,
        and zeroed slot caches + bias rings.  None when the kernels cannot
        engage (off-TPU, VMEM misfit) — callers fall back to the XLA
        path.  Computed ONCE per sequence, outside the decode scan."""
        from ..ops.decode_step import (
            cross_step_plan,
            decode_kernel_mode,
            decode_kernel_parts,
            ffn_step_viable,
            self_attention_step_viable,
        )

        mode = decode_kernel_mode()
        hd, heads = self.hidden_size, self.num_heads
        if (
            mode == "off"
            or "layer" not in decode_kernel_parts()
            or hd % heads
        ):
            return None
        bs = enc["encoded"].shape[0]
        enc_len = enc["encoded"].shape[1]
        interpret = mode == "interpret"
        wb = 4 if interpret else 2
        cache_dtype = decode_cache_dtype()
        cb = 2 if cache_dtype == jnp.bfloat16 else 4
        params_of = lambda m: m.variables["params"]  # noqa: E731
        d_ff = params_of(self.decoder_layers[0].Dense_0)["kernel"].shape[1]
        plan = cross_step_plan(bs, enc_len, hd, cb, wb)
        if (
            plan is None
            or self_attention_step_viable(bs, max_iter, hd, cb, wb) is None
            or ffn_step_viable(bs, hd, d_ff, wb) is None
        ):
            return None
        _, chunk = plan
        nj = -(-enc_len // chunk)
        pad = nj * chunk - enc_len
        cast = (lambda w: w) if interpret else (lambda w: w.astype(jnp.bfloat16))

        def sa_bundle(sa):
            ln = params_of(sa.LayerNorm_0)
            return {
                "wq": cast(params_of(sa.Dense_0)["kernel"]),
                "bq": params_of(sa.Dense_0)["bias"],
                "wk": cast(params_of(sa.Dense_1)["kernel"]),
                "bk": params_of(sa.Dense_1)["bias"],
                "wv": cast(params_of(sa.Dense_2)["kernel"]),
                "bv": params_of(sa.Dense_2)["bias"],
                "wo": cast(params_of(sa.Dense_3)["kernel"]),
                "bo": params_of(sa.Dense_3)["bias"],
                "ln_scale": ln["scale"],
                "ln_bias": ln["bias"],
            }

        def pad_enc(x):
            x = x.astype(cache_dtype)
            if pad:
                x = jnp.concatenate(
                    [x, jnp.zeros((bs, pad, x.shape[2]), cache_dtype)], axis=1
                )
            return x

        layers, enc_kvs = [], []
        for i, layer in enumerate(self.decoder_layers):
            ffn_ln = params_of(layer.LayerNorm_0)
            layers.append(
                {
                    "self": sa_bundle(layer.BertSelfAttention_0),
                    "cross": sa_bundle(layer.BertSelfAttention_1),
                    "ffn": {
                        "w1": cast(params_of(layer.Dense_0)["kernel"]),
                        "b1": params_of(layer.Dense_0)["bias"],
                        "w2": cast(params_of(layer.Dense_1)["kernel"]),
                        "b2": params_of(layer.Dense_1)["bias"],
                        "ln_scale": ffn_ln["scale"],
                        "ln_bias": ffn_ln["bias"],
                    },
                }
            )
            k, v = layer.project_cross_kv(
                enc["all_states"][i] if self.multilevel else enc["encoded"]
            )
            enc_kvs.append((pad_enc(k), pad_enc(v)))

        enc_bias = jnp.broadcast_to(
            enc["enc_bias"][:, 0, 0, :], (bs, enc_len)
        ).astype(jnp.float32)
        if pad:
            enc_bias = jnp.concatenate(
                [enc_bias, jnp.full((bs, pad), MASK_VALUE, jnp.float32)],
                axis=1,
            )
        enc_bias = enc_bias.reshape(bs, nj, chunk).transpose(1, 0, 2)
        slots = tuple(
            (
                jnp.zeros((bs, max_iter, hd), cache_dtype),
                jnp.zeros((bs, max_iter, hd), cache_dtype),
                jnp.zeros((bs, max_iter), jnp.float32),  # bias ring
            )
            for _ in range(self.dec_layers)
        )
        return {
            "layers": layers,
            "interpret": interpret,
            "enc_kvs": tuple(enc_kvs),
            "enc_bias": enc_bias,
            "slots": slots,
        }

    def _fused_dec_step(self, fused, dec, caches, step):
        """One token through all decoder layers via kernels A (self over
        the slot ring) + E (cross over frozen encoder chunks) + the fused
        FFN, all at the HF BertLayer eps 1e-12.  Exactly the XLA
        decode_step semantics; equivalence pinned in
        tests/test_fused_iterative_step.py."""
        from ..ops.decode_step import (
            fused_cross_attention_streamed,
            fused_ffn_step,
            fused_self_attention_step,
        )

        interpret = fused["interpret"]
        scale = 1.0 / float(self.hidden_size // self.num_heads) ** 0.5
        x = dec[:, 0, :]
        bs = x.shape[0]
        zeros = jnp.zeros((bs,), jnp.float32)
        new_caches = []
        for i in range(self.dec_layers):
            w = fused["layers"][i]
            s = w["self"]
            x, ck, cv, cbias = fused_self_attention_step(
                x, s["wq"], s["bq"], s["wk"], s["bk"], s["wv"], s["bv"],
                s["wo"], s["bo"], s["ln_scale"], s["ln_bias"],
                zeros, step, caches[i][0], caches[i][1], caches[i][2],
                scale, self.num_heads, interpret=interpret, eps=LN_EPS,
            )
            new_caches.append((ck, cv, cbias))
            x = fused_cross_attention_streamed(
                x, w["cross"], fused["enc_kvs"][i], fused["enc_bias"],
                scale, self.num_heads, LN_EPS, interpret=interpret,
            )
            f = w["ffn"]
            x = fused_ffn_step(
                x, f["w1"], f["b1"], f["w2"], f["b2"],
                f["ln_scale"], f["ln_bias"],
                interpret=interpret, eps=LN_EPS,
            )
        return x[:, None, :], tuple(new_caches)

    def incremental_greedy_decode(self, batch):
        """KV-cached greedy: the joint encoder never sees decoder tokens in
        this topology, so this is exactly the quadratic greedy (no mask
        change needed) at O(C² + T·(C+T)) instead of O(T) full passes."""
        bs = batch["question_tokens"].shape[0]
        enc = self._encode_joint(batch, False)
        ctx_ocr = enc["encoded"][:, enc["ocr_begin"]:enc["ocr_end"]]
        max_iter = self.max_iter
        # kernel A/E/FFN fused path (TPU); falls back to the XLA path with
        # per-layer (K, V) self-attention caches in PROJECTED space, plus
        # the cross-attention K/V of the (step-invariant) encoder states
        # projected ONCE instead of at every decode step.  Both stored in
        # decode_cache_dtype() (bf16 on TPU — the attend paths round K/V
        # operands to bf16 anyway; see modules/bert.decode_cache_dtype)
        cache_dtype = decode_cache_dtype()
        fused = self._init_fused_dec(enc, max_iter)
        if fused is not None:
            caches = fused["slots"]
        else:
            caches = tuple(
                tuple(
                    jnp.zeros((bs, max_iter, self.hidden_size), cache_dtype)
                    for _ in range(2)
                )
                for _ in range(self.dec_layers)
            )
            cross_kvs = tuple(
                tuple(
                    x.astype(cache_dtype)
                    for x in layer.project_cross_kv(
                        enc["all_states"][i]
                        if self.multilevel
                        else enc["encoded"]
                    )
                )
                for i, layer in enumerate(self.decoder_layers)
            )
        fixed_ans_emb = self._fixed_ans_emb()
        dec_table = self.dec_embeddings.build_table(fixed_ans_emb, enc["ocr_emb"])
        ans_num = fixed_ans_emb.shape[0]
        # step-invariant ptr-net key projection hoisted out of the scan
        # (XLA does not hoist scan invariants — CLAUDE.md measured facts)
        ptr_keys = self.ocr_ptr_net.project_keys(ctx_ocr)

        def body(mdl, carry, step):
            prev_token, caches = carry
            dec = mdl.dec_embeddings.embed_from_table(
                dec_table, ans_num, prev_token[:, None], position_offset=step,
            )
            if fused is not None:
                dec, new_caches = mdl._fused_dec_step(fused, dec, caches, step)
                new_caches = list(new_caches)
            else:
                positions = jnp.arange(max_iter)
                step_bias = jnp.broadcast_to(
                    jnp.where(positions <= step, 0.0, MASK_VALUE)[
                        None, None, None, :
                    ],
                    (bs, 1, 1, max_iter),
                )
                new_caches = []
                for i, layer in enumerate(mdl.decoder_layers):
                    k_new, v_new = layer.project_kv(dec)
                    k_cache = jax.lax.dynamic_update_slice_in_dim(
                        caches[i][0], k_new.astype(caches[i][0].dtype),
                        step, axis=1,
                    )
                    v_cache = jax.lax.dynamic_update_slice_in_dim(
                        caches[i][1], v_new.astype(caches[i][1].dtype),
                        step, axis=1,
                    )
                    new_caches.append((k_cache, v_cache))
                    dec = layer.decode_step(
                        dec, k_cache, v_cache, step_bias,
                        cross_kv=cross_kvs[i], encoder_bias=enc["enc_bias"],
                    )
            fixed = mdl.classifier(dec)
            dynamic = mdl.ocr_ptr_net.score(dec, ptr_keys, enc["ocr_bias"])
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
        (_, _), all_scores = scan(self, (bos, caches), jnp.arange(max_iter))
        scores = jnp.moveaxis(all_scores, 0, 1)
        prev_inds = jnp.concatenate(
            [bos[:, None], jnp.argmax(scores[:, :-1], axis=-1).astype(jnp.int32)],
            axis=1,
        )
        return {"scores": scores, "prev_inds": prev_inds}


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
    """Language-adaptive question encoding (PretrainedAdaptiveTextBert,
    mmf_language_adaptive_m4c.py:204-251): ONE frozen multilingual
    pretrained backbone at D_LANGUAGE dims (the reference loads
    `AutoModel.from_pretrained(TEXT_BERT.PRETRAINED_NAME)`, e.g.
    vinai/phobert-base, and freezes it), an optional projection when
    D_LANGUAGE != the MMT hidden size, then a TRAINABLE fine-tuning
    BertEncoder at TEXT_BERT.{HIDDEN_SIZE, NUM_HIDDEN_LAYERS,
    NUM_ATTENTION_HEADS}.

    (Round 1 shipped a per-language-stack stand-in here — 3x the text
    FLOPs and not the reference architecture; replaced in round 2.)

    Input ids: `question_backbone_tokens` when the dataset is configured
    with the matching HF tokenizer (pad id 0 unless PRETRAINED_PAD_ID),
    else the framework vocab ids."""

    def setup(self):
        super().setup()
        c = self.config.TEXT_BERT
        self.d_language = int(c.get("D_LANGUAGE") or 768)
        backbone_layers = int(c.get("PRETRAINED_LAYERS") or 12)
        from .modules.pretrained_embeddings import backbone_table_rows

        table_rows = backbone_table_rows(c, len(self.vocab))
        from .modules.bert import BertEmbeddings

        self.language_embeddings = BertEmbeddings(
            vocab_size=table_rows, hidden_size=self.d_language
        )
        self.language_backbone = BertEncoderStack(
            hidden_size=self.d_language,
            num_layers=backbone_layers,
            num_heads=int(
                c.get("PRETRAINED_HEADS") or max(1, self.d_language // 64)
            ),
            intermediate_size=c.get("PRETRAINED_INTERMEDIATE_SIZE"),
        )
        if self.d_language != self.hidden_size:
            self.language_proj = nn.Dense(self.hidden_size, kernel_init=_normal)
        else:
            self.language_proj = None
        self.finetune_encoder = BertEncoderStack(
            hidden_size=self.hidden_size,
            num_layers=self.config.TEXT_BERT.NUM_HIDDEN_LAYERS,
            num_heads=self.num_heads,
            intermediate_size=self.config.TEXT_BERT.get("INTERMEDIATE_SIZE"),
        )

    def _txt(self, batch: BatchArrays, train: bool):
        if "question_backbone_tokens" in batch:
            tokens = batch["question_backbone_tokens"]
            if "question_backbone_mask" in batch:
                # tokenizer-derived validity mask (real pad id may be 1)
                mask = batch["question_backbone_mask"]
                txt_bias = validity_to_bias(mask)
            else:
                pad_idx = int(
                    self.config.TEXT_BERT.get("PRETRAINED_PAD_ID") or 0
                )
                txt_bias = padding_bias(tokens, pad_idx)
        else:
            tokens = batch["question_tokens"]
            txt_bias = padding_bias(tokens, self.vocab.padding_idx)

        embedded = self.language_embeddings(tokens, train=False)
        encoded = self.language_backbone(
            embedded, attention_bias=txt_bias, train=False
        )
        encoded = jax.lax.stop_gradient(encoded)  # frozen pretrained LM
        if self.language_proj is not None:
            encoded = self.language_proj(encoded)
        encoded = self.finetune_encoder(
            encoded, attention_bias=txt_bias, train=train
        )
        return encoded, txt_bias
