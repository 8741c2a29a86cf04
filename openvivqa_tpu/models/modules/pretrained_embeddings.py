"""Pretrained text/vision embedding wrappers (flax).

Parity targets: the HF wrappers in text_embeddings.py:303-570 (Bert/Albert/
Roberta/Deberta/XLM-R: tokenizer -> frozen encoder -> proj -> GELU ->
dropout) and vision_embeddings.py:86-111 (ViTEmbedding: frozen ViT backbone
-> proj -> GELU -> dropout), plus T5Embedding (dangling registry name in
configs/vit_mt5.yaml:65 — implemented here so the config runs).

TPU adaptation: HF hub downloads are host-only/offline, so
* backbones are architecture-faithful flax stacks at the real checkpoint
  dims (BACKBONE_SPECS keyed by PRETRAINED_NAME; BERT-layout families via
  BertEmbeddings/BertEncoderStack, plus true T5/mT5, ALBERT and
  DeBERTa-v2/v3 stacks in modules/t5.py / albert.py / deberta.py), frozen
  with stop_gradient (the reference sets requires_grad=False);
* question ids default to the framework vocab (`question_tokens`); with a
  dataset-side `HF_TOKENIZER`, real backbone ids + a tokenizer-derived
  validity mask arrive as `question_backbone_tokens`/`_mask`
  (data/hf_tokenization.py) for bit-parity with the HF text path;
* converted checkpoint weights seed the wrappers in one call
  (hf_conversion.load_into_wrapper, torch-verified in
  tests/test_hf_conversion.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...builders import (
    META_PRETRAINED_LANGUAGE_MODEL,
    META_TEXT_EMBEDDING,
    META_VISION_EMBEDDING,
)
from ...logging_utils import setup_logger
from .bert import BertEmbeddings, BertEncoderStack
from .masks import (
    causal_bias,
    combine_biases,
    padding_bias,
    sinusoid_encoding_table,
    validity_to_bias,
)

logger = setup_logger()

_xavier = nn.initializers.xavier_uniform()
_normal = nn.initializers.normal(stddev=0.02)


# real vocab sizes of the BERT-layout checkpoints the reference configs name
_BERT_FAMILY_VOCABS = {
    "bert-base-uncased": 30522,
    "bert-base-cased": 28996,
    "bert-base-multilingual-uncased": 105879,
    "bert-base-multilingual-cased": 119547,
    "xlm-roberta-base": 250002,
    "xlm-roberta-large": 250002,
    "roberta-base": 50265,
    "vinai/phobert-base": 64001,
    "vinai/phobert-large": 64001,
}


def backbone_table_rows(config, vocab_len: int = 0) -> int:
    """Embedding-table rows for a BERT-layout backbone: the explicit
    PRETRAINED_VOCAB_SIZE, else the known checkpoint size.  An UNKNOWN
    checkpoint name without an explicit size is an error — nn.Embed's
    jnp.take clamps out-of-range ids under jit, so a too-small default
    table would silently map every high tokenizer id to the last row."""
    name = config.get("PRETRAINED_NAME")
    configured = config.get("PRETRAINED_VOCAB_SIZE")
    if configured:
        rows = int(configured)
    elif not name:
        rows = 30522  # BERT-base layout default (no checkpoint named)
    elif name in _BERT_FAMILY_VOCABS:
        rows = _BERT_FAMILY_VOCABS[name]
    else:
        raise ValueError(
            f"PRETRAINED_NAME {name!r} has no known vocab size; set "
            "PRETRAINED_VOCAB_SIZE to the checkpoint's real vocab rows "
            "(ids past the table would be silently clamped)"
        )
    return max(vocab_len, rows)


class _FrozenTextBackboneEmbedding(nn.Module):
    """Shared skeleton of the BERT-layout HF text wrappers: embed question
    ids with a BERT stack at the pretrained dims (12-layer base shapes by
    default, matching the checkpoints the configs name), stop_gradient
    (frozen), project to D_MODEL, GELU, dropout."""

    config: Any
    vocab: Any
    default_hidden: int = 768
    default_layers: int = 12

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,
        train: bool = False,
        padding_idx=None,
        padding_mask=None,
    ):
        c = self.config
        hidden = int(c.get("D_PRETRAINED_FEATURE", self.default_hidden))
        layers = int(
            c.get("PRETRAINED_LAYERS")
            or c.get("NUM_HIDDEN_LAYERS")
            or self.default_layers
        )
        heads = int(c.get("NUM_ATTENTION_HEADS") or max(1, hidden // 64))

        if padding_mask is not None:
            # explicit validity mask from the HF tokenizer (its pad id may
            # collide with real token ids: RoBERTa-family tokenizers pad
            # with 1, which is a live id in other spaces)
            bias = validity_to_bias(padding_mask)
        else:
            if padding_idx is None:
                padding_idx = self.vocab.padding_idx
            bias = padding_bias(tokens, padding_idx)
        table_rows = backbone_table_rows(c, len(self.vocab))
        embedded = BertEmbeddings(
            vocab_size=table_rows, hidden_size=hidden
        )(tokens, train=False)
        encoded = BertEncoderStack(
            hidden_size=hidden, num_layers=layers, num_heads=heads,
            intermediate_size=c.get("PRETRAINED_INTERMEDIATE_SIZE"),
        )(embedded, attention_bias=bias, train=False)
        encoded = jax.lax.stop_gradient(encoded)  # frozen backbone

        out = nn.Dense(c.D_MODEL, kernel_init=_xavier)(encoded)
        out = jax.nn.gelu(out, approximate=False)
        out = nn.Dropout(rate=c.DROPOUT)(out, deterministic=not train)
        return out, bias


def _register_text_wrapper(name: str):
    @META_TEXT_EMBEDDING.register(name=name)
    class _Wrapper(_FrozenTextBackboneEmbedding):  # noqa: N801
        pass

    _Wrapper.__name__ = name
    return _Wrapper


# BERT-layout families: the BertEmbeddings/BertEncoderStack pair IS the
# faithful architecture (RoBERTa/XLM-R differences are absorbed at weight
# conversion, hf_conversion.convert_roberta_weights)
BertEmbedding = _register_text_wrapper("BertEmbedding")
RobertaEmbedding = _register_text_wrapper("RobertaEmbedding")
XLMRobertaEmbedding = _register_text_wrapper("XLMRobertaEmbedding")


# -- architecture specs for real pretrained backbones ------------------------
# Default dims follow the checkpoint the reference configs name
# (PRETRAINED_NAME), so e.g. vit_mt5.yaml builds an actual mT5-small-shaped
# encoder rather than a generic stand-in.  Explicit config keys
# (D_PRETRAINED_FEATURE / PRETRAINED_LAYERS / HIDDEN_SIZE /
# NUM_HIDDEN_LAYERS / NUM_ATTENTION_HEADS / PRETRAINED_VOCAB_SIZE) override.
BACKBONE_SPECS = {
    "google/mt5-small": dict(
        family="t5", hidden=512, layers=8, heads=6, d_kv=64, d_ff=1024,
        vocab_size=250112, gated_act=True, act_fn="gelu_new",
    ),
    "google/mt5-base": dict(
        family="t5", hidden=768, layers=12, heads=12, d_kv=64, d_ff=2048,
        vocab_size=250112, gated_act=True, act_fn="gelu_new",
    ),
    "t5-small": dict(
        family="t5", hidden=512, layers=6, heads=8, d_kv=64, d_ff=2048,
        vocab_size=32128, gated_act=False, act_fn="relu",
    ),
    "t5-base": dict(
        family="t5", hidden=768, layers=12, heads=12, d_kv=64, d_ff=3072,
        vocab_size=32128, gated_act=False, act_fn="relu",
    ),
    "albert-base-v2": dict(
        family="albert", hidden=768, layers=12, heads=12, embedding_size=128,
        intermediate=3072, vocab_size=30000,
    ),
    "albert-large-v2": dict(
        family="albert", hidden=1024, layers=24, heads=16, embedding_size=128,
        intermediate=4096, vocab_size=30000,
    ),
    "microsoft/deberta-v3-base": dict(
        family="deberta", hidden=768, layers=12, heads=12, intermediate=3072,
        vocab_size=128100, position_buckets=256, share_att_key=True,
        norm_rel_ebd="layer_norm",
    ),
    "microsoft/deberta-v3-large": dict(
        family="deberta", hidden=1024, layers=24, heads=16, intermediate=4096,
        vocab_size=128100, position_buckets=256, share_att_key=True,
        norm_rel_ebd="layer_norm",
    ),
    "microsoft/deberta-v2-xlarge": dict(
        family="deberta", hidden=1536, layers=24, heads=24, intermediate=6144,
        vocab_size=128100, position_buckets=256, share_att_key=True,
        norm_rel_ebd="layer_norm", conv_kernel_size=3, conv_groups=1,
    ),
}

_FAMILY_DEFAULTS = {
    # used when PRETRAINED_NAME is absent/unknown: base-model shapes
    "t5": BACKBONE_SPECS["google/mt5-small"],
    "albert": BACKBONE_SPECS["albert-base-v2"],
    "deberta": BACKBONE_SPECS["microsoft/deberta-v3-base"],
}


def resolve_backbone_spec(config, family: str, vocab=None) -> dict:
    """Spec = family default <- PRETRAINED_NAME entry <- explicit keys."""
    spec = dict(_FAMILY_DEFAULTS[family])
    name = config.get("PRETRAINED_NAME")
    if name in BACKBONE_SPECS and BACKBONE_SPECS[name]["family"] == family:
        spec = dict(BACKBONE_SPECS[name])
    # reference wrapper schema (text_embeddings.py:308-312 etc.)
    for cfg_key, spec_key in (
        ("D_PRETRAINED_FEATURE", "hidden"),
        ("HIDDEN_SIZE", "hidden"),
        ("PRETRAINED_LAYERS", "layers"),
        ("NUM_HIDDEN_LAYERS", "layers"),
        ("NUM_ATTENTION_HEADS", "heads"),
        ("PRETRAINED_VOCAB_SIZE", "vocab_size"),
        ("PRETRAINED_INTERMEDIATE_SIZE", "intermediate"),
        ("PRETRAINED_D_KV", "d_kv"),
        ("PRETRAINED_D_FF", "d_ff"),
        ("PRETRAINED_EMBEDDING_SIZE", "embedding_size"),
    ):
        value = config.get(cfg_key)
        if value is not None:
            spec[spec_key] = int(value)
    if vocab is not None:
        # framework vocab ids must be addressable even without converted
        # weights / HF tokenization
        spec["vocab_size"] = max(spec["vocab_size"], len(vocab))
    return spec


class _ProjectedBackboneEmbedding(nn.Module):
    """Shared tail of every HF text wrapper: frozen backbone ->
    Dense(D_MODEL) -> GELU -> dropout, returning (features, padding bias)
    (text_embeddings.py:313-345)."""

    config: Any
    vocab: Any
    family: str = "t5"

    def _backbone(self, spec):
        raise NotImplementedError

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,
        train: bool = False,
        padding_idx=None,
        padding_mask=None,
    ):
        c = self.config
        spec = resolve_backbone_spec(c, self.family, self.vocab)
        if padding_mask is not None:
            bias = validity_to_bias(padding_mask)
        else:
            if padding_idx is None:
                padding_idx = self.vocab.padding_idx
            bias = padding_bias(tokens, padding_idx)
        encoded = self._backbone(spec)(tokens, attention_bias=bias, train=False)
        encoded = jax.lax.stop_gradient(encoded)  # frozen backbone

        out = nn.Dense(c.D_MODEL, kernel_init=_xavier)(encoded)
        out = jax.nn.gelu(out, approximate=False)
        out = nn.Dropout(rate=c.DROPOUT)(out, deterministic=not train)
        return out, bias


@META_TEXT_EMBEDDING.register()
class T5Embedding(_ProjectedBackboneEmbedding):
    """Faithful mT5/T5 encoder behind the projection (the architecture the
    reference intends at configs/vit_mt5.yaml:65 / vit_mt5.py:11-57).
    Weight conversion: hf_conversion.convert_t5_encoder_weights +
    load_into_wrapper."""

    family: str = "t5"

    def _backbone(self, spec):
        from .t5 import T5EncoderStack

        return T5EncoderStack(
            vocab_size=spec["vocab_size"],
            d_model=spec["hidden"],
            num_layers=spec["layers"],
            num_heads=spec["heads"],
            d_kv=spec.get("d_kv", 64),
            d_ff=spec.get("d_ff"),
            gated_act=spec.get("gated_act", True),
            act_fn=spec.get("act_fn", "gelu_new"),
            dropout=0.1,
            name="backbone",
        )


@META_TEXT_EMBEDDING.register()
class AlbertEmbedding(_ProjectedBackboneEmbedding):
    """Faithful ALBERT (factorised embeddings + cross-layer sharing) behind
    the projection (text_embeddings.py:363-397).  Divergence: the reference
    TextAlbert inserts a second embedding_hidden_mapping_in on top of HF's
    own (dimensionally broken for embedding_size != hidden_size); we apply
    the single correct mapping."""

    family: str = "albert"

    def _backbone(self, spec):
        from .albert import AlbertEncoderStack

        return AlbertEncoderStack(
            vocab_size=spec["vocab_size"],
            hidden_size=spec["hidden"],
            num_layers=spec["layers"],
            num_heads=spec["heads"],
            embedding_size=spec.get("embedding_size", 128),
            intermediate_size=spec.get("intermediate"),
            dropout=0.1,
            name="backbone",
        )


@META_TEXT_EMBEDDING.register()
class DebertaEmbedding(_ProjectedBackboneEmbedding):
    """Faithful DeBERTa-v2/v3 (disentangled attention) behind the projection
    (text_embeddings.py:457-513 builds TextDeberta_v2)."""

    family: str = "deberta"

    def _backbone(self, spec):
        from .deberta import DebertaV2EncoderStack

        return DebertaV2EncoderStack(
            vocab_size=spec["vocab_size"],
            hidden_size=spec["hidden"],
            num_layers=spec["layers"],
            num_heads=spec["heads"],
            intermediate_size=spec.get("intermediate"),
            position_buckets=spec.get("position_buckets", -1),
            share_att_key=spec.get("share_att_key", False),
            norm_rel_ebd=spec.get("norm_rel_ebd", "none"),
            conv_kernel_size=spec.get("conv_kernel_size", 0),
            conv_groups=spec.get("conv_groups", 1),
            dropout=0.1,
            name="backbone",
        )


@META_VISION_EMBEDDING.register()
class ViTEmbedding(nn.Module):
    """Frozen ViT backbone over pixel_values -> proj -> GELU -> dropout
    (vision_embeddings.py:86-111 parity; backbone topology matches HF
    ViTModel's pre-LN stack + final LayerNorm so pretrained weights convert,
    see hf_conversion.convert_vit_weights).  When the batch carries
    `grid_features` instead of raw pixels (pre-extracted ViT features), the
    backbone is skipped and the projection runs directly."""

    config: Any

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray, train: bool = False):
        from .vit import ViTEncoder

        c = self.config
        hidden = int(c.get("D_PRETRAINED_FEATURE", 768))
        if pixel_values.ndim == 4:  # raw images (bs, H, W, 3)
            patch = int(c.get("PATCH_SIZE", 16))
            layers = int(c.get("PRETRAINED_LAYERS", 12))  # ViT-base depth
            heads = int(c.get("PRETRAINED_HEADS", max(1, hidden // 64)))
            patches = nn.Conv(
                features=hidden,
                kernel_size=(patch, patch),
                strides=(patch, patch),
                padding="VALID",  # torch Conv2d floors, never pads
                kernel_init=_normal,
                name="patch_embed",
            )(pixel_values)
            bs = patches.shape[0]
            tokens = patches.reshape(bs, -1, hidden)
            cls = self.param("cls_token", _normal, (1, 1, hidden))
            tokens = jnp.concatenate(
                [jnp.broadcast_to(cls, (bs, 1, hidden)), tokens], axis=1
            )
            pos = self.param(
                "position_embedding", _normal, (1, tokens.shape[1], hidden)
            )
            tokens = tokens + pos
            features = ViTEncoder(
                hidden_size=hidden,
                num_layers=layers,
                num_heads=heads,
                intermediate_size=c.get("PRETRAINED_INTERMEDIATE_SIZE"),
                name="backbone",
            )(tokens, train=False)
        else:  # pre-extracted features (bs, L, D)
            features = pixel_values
        features = jax.lax.stop_gradient(features)  # frozen backbone

        mask = padding_bias(features, padding_idx=0)
        out = nn.Dense(c.D_MODEL, kernel_init=_xavier)(features)
        out = jax.nn.gelu(out, approximate=False)
        out = nn.Dropout(rate=c.DROPOUT)(out, deterministic=not train)
        return out, mask


class _FrozenCausalLM(nn.Module):
    """Frozen LM + projection + one encoder layer + vocab head, returning
    (log-probs, language_signals) for the AdaptiveDecoder
    (language_models.py:73-175 parity).

    Intentional divergence: the reference runs its frozen BERT with an
    ALL-ONES attention mask when none is given (language_models.py — the
    frozen LM attends padding, so non-pad features absorb pad-key
    contributions); here padding is properly masked (pad_bias below).
    Language signals at non-pad positions therefore differ slightly from
    the reference's — deliberately, since attending padding is a bug, and
    no pretrained checkpoint depends on it (the LM is frozen)."""

    config: Any
    vocab: Any

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, train: bool = False):
        c = self.config
        hidden = int(c.get("D_PRETRAINED_FEATURE", 768))
        d_model = int(c.D_MODEL)
        layers = int(c.get("PRETRAINED_LAYERS", 12))  # base-model depth
        heads = max(1, hidden // 64)

        pad_bias = padding_bias(tokens, self.vocab.padding_idx)
        self_bias = combine_biases(pad_bias, causal_bias(tokens.shape[1]))

        embedded = BertEmbeddings(
            vocab_size=max(len(self.vocab), 30522), hidden_size=hidden
        )(tokens, train=False)
        encoded = BertEncoderStack(
            hidden_size=hidden, num_layers=layers, num_heads=heads
        )(embedded, attention_bias=pad_bias, train=False)
        encoded = jax.lax.stop_gradient(encoded)  # frozen LM

        feature = nn.Dense(d_model, kernel_init=_xavier)(encoded)
        max_len = tokens.shape[1]
        table = jnp.asarray(sinusoid_encoding_table(max_len + 1, d_model, 0))
        positions = jnp.arange(1, max_len + 1)[None, :]
        positions = jnp.where(pad_bias[:, 0, 0, :] != 0, 0, positions)
        feature = feature + jnp.take(table, positions, axis=0)

        from .bert import BertLayer

        feature = BertLayer(d_model, max(1, d_model // 64))(
            feature, attention_bias=self_bias, train=train
        )
        logits = nn.Dense(len(self.vocab), kernel_init=_xavier)(feature)
        return jax.nn.log_softmax(logits, axis=-1), feature


@META_PRETRAINED_LANGUAGE_MODEL.register()
class BERTModel(_FrozenCausalLM):
    pass


@META_PRETRAINED_LANGUAGE_MODEL.register()
class PhoBERTModel(_FrozenCausalLM):
    pass


@META_PRETRAINED_LANGUAGE_MODEL.register()
class BARTPhoModel(_FrozenCausalLM):
    """Empty stub in the reference (language_models.py:177-179); registered
    here as a working frozen-LM so configs naming it run."""


@META_PRETRAINED_LANGUAGE_MODEL.register()
class GPT2Model(_FrozenCausalLM):
    """Empty stub in the reference (language_models.py:180-181); see
    BARTPhoModel."""


