"""HuggingFace BERT weight conversion into the flax BERT stack.

The reference loads pretrained HF encoders at model build
(text_embeddings.py:303-570, mmf_m4c.py:53-57).  Offline, our stacks random-
initialise; when a local HF checkpoint is available (hub cache or a path),
`convert_bert_weights` maps a torch BertModel state dict onto the
BertEmbeddings + BertEncoderStack parameter tree, and `load_text_bert`
returns ready flax params.  Conversion is verified numerically in
tests/test_hf_conversion.py against a torch BertModel on shared inputs.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ...logging_utils import setup_logger

logger = setup_logger()


def _t(array) -> np.ndarray:
    return np.asarray(array.detach().cpu().numpy(), np.float32)


def _linear(state_dict: Dict, prefix: str) -> Dict:
    return {
        "kernel": _t(state_dict[f"{prefix}.weight"]).T,
        "bias": _t(state_dict[f"{prefix}.bias"]),
    }


def _layer_norm(state_dict: Dict, prefix: str) -> Dict:
    return {
        "scale": _t(state_dict[f"{prefix}.weight"]),
        "bias": _t(state_dict[f"{prefix}.bias"]),
    }


def convert_bert_weights(state_dict: Dict, num_layers: int) -> Dict:
    """torch BertModel state_dict -> {'embeddings': ..., 'encoder': ...}
    param trees for our BertEmbeddings / BertEncoderStack."""

    def linear(prefix):
        return _linear(state_dict, prefix)

    def layer_norm(prefix):
        return _layer_norm(state_dict, prefix)

    embeddings = {
        "Embed_0": {
            "embedding": _t(state_dict["embeddings.word_embeddings.weight"])
        },
        "Embed_1": {
            "embedding": _t(state_dict["embeddings.position_embeddings.weight"])
        },
        "Embed_2": {
            "embedding": _t(state_dict["embeddings.token_type_embeddings.weight"])
        },
        "LayerNorm_0": layer_norm("embeddings.LayerNorm"),
    }

    encoder = {}
    for i in range(num_layers):
        prefix = f"encoder.layer.{i}"
        encoder[f"layer_{i}"] = {
            # BertSelfAttention_0: q/k/v/out Dense + LN
            "BertSelfAttention_0": {
                "Dense_0": linear(f"{prefix}.attention.self.query"),
                "Dense_1": linear(f"{prefix}.attention.self.key"),
                "Dense_2": linear(f"{prefix}.attention.self.value"),
                "Dense_3": linear(f"{prefix}.attention.output.dense"),
                "LayerNorm_0": layer_norm(f"{prefix}.attention.output.LayerNorm"),
            },
            "Dense_0": linear(f"{prefix}.intermediate.dense"),
            "Dense_1": linear(f"{prefix}.output.dense"),
            "LayerNorm_0": layer_norm(f"{prefix}.output.LayerNorm"),
        }
    return {"embeddings": embeddings, "encoder": encoder}


def convert_roberta_weights(state_dict: Dict, num_layers: int) -> Dict:
    """torch RobertaModel / XLMRobertaModel state_dict -> our BERT-stack
    trees.  Layer layout is identical to BERT; the embeddings differ in two
    documented ways (text_embeddings.py:303-570 wrappers consume vocab ids
    directly, so both differences are absorbed here):
    * RoBERTa position ids start at padding_idx+1 (=2) — rows [2:] of the
      position table align with our arange(L) positions;
    * type_vocab_size is 1 — the single type row is duplicated to fill our
      2-row table (only row 0 is ever read).
    Caveat: HF RoBERTa numbers positions by cumsum over non-pad tokens;
    our stack uses arange.  Identical while sequences are left-aligned with
    trailing padding (this framework's collate invariant) — rows at/after
    pads differ but are attention-masked.
    """
    converted = convert_bert_weights(state_dict, num_layers)
    positions = _t(state_dict["embeddings.position_embeddings.weight"])[2:]
    types = _t(state_dict["embeddings.token_type_embeddings.weight"])
    converted["embeddings"]["Embed_1"] = {"embedding": positions}
    converted["embeddings"]["Embed_2"] = {
        "embedding": np.broadcast_to(types[:1], (2, types.shape[1])).copy()
    }
    return converted


def convert_vit_weights(state_dict: Dict, num_layers: int) -> Dict:
    """torch ViTModel state_dict -> param tree fragments for ViTEmbedding's
    raw-pixel path (patch_embed / cls_token / position_embedding / backbone).
    torch Conv2d weight (out, in, kh, kw) -> flax Conv kernel (kh, kw, in,
    out); the final `layernorm` is what makes last_hidden_state."""

    def linear(prefix):
        return _linear(state_dict, prefix)

    def layer_norm(prefix):
        return _layer_norm(state_dict, prefix)

    backbone = {}
    for i in range(num_layers):
        prefix = f"encoder.layer.{i}"
        backbone[f"layer_{i}"] = {
            "layernorm_before": layer_norm(f"{prefix}.layernorm_before"),
            "layernorm_after": layer_norm(f"{prefix}.layernorm_after"),
            "attention": {
                "query": linear(f"{prefix}.attention.attention.query"),
                "key": linear(f"{prefix}.attention.attention.key"),
                "value": linear(f"{prefix}.attention.attention.value"),
                "out": linear(f"{prefix}.attention.output.dense"),
            },
            "intermediate": linear(f"{prefix}.intermediate.dense"),
            "output": linear(f"{prefix}.output.dense"),
        }
    backbone["final_layernorm"] = layer_norm("layernorm")

    return {
        "patch_embed": {
            "kernel": _t(
                state_dict["embeddings.patch_embeddings.projection.weight"]
            ).transpose(2, 3, 1, 0),
            "bias": _t(state_dict["embeddings.patch_embeddings.projection.bias"]),
        },
        "cls_token": _t(state_dict["embeddings.cls_token"]),
        "position_embedding": _t(state_dict["embeddings.position_embeddings"]),
        "backbone": backbone,
    }


def convert_t5_encoder_weights(state_dict: Dict, num_layers: int) -> Dict:
    """torch T5EncoderModel / MT5EncoderModel state_dict -> param tree for
    modules/t5.T5EncoderStack.  All linears are bias-free; RMSNorm has only
    a `weight`; the shared relative_attention_bias lives in layer 0."""

    def kernel(key):
        return {"kernel": _t(state_dict[key]).T}

    params = {
        "token_embed": {"embedding": _t(state_dict["shared.weight"])}
        if "shared.weight" in state_dict
        else {"embedding": _t(state_dict["encoder.embed_tokens.weight"])},
        "relative_attention_bias": {
            "embedding": _t(
                state_dict[
                    "encoder.block.0.layer.0.SelfAttention"
                    ".relative_attention_bias.weight"
                ]
            )
        },
        "final_layer_norm": {
            "weight": _t(state_dict["encoder.final_layer_norm.weight"])
        },
    }
    for i in range(num_layers):
        attn = f"encoder.block.{i}.layer.0"
        ff = f"encoder.block.{i}.layer.1"
        gated = f"{ff}.DenseReluDense.wi_0.weight" in state_dict
        ff_params = (
            {
                "wi_0": kernel(f"{ff}.DenseReluDense.wi_0.weight"),
                "wi_1": kernel(f"{ff}.DenseReluDense.wi_1.weight"),
                "wo": kernel(f"{ff}.DenseReluDense.wo.weight"),
            }
            if gated
            else {
                "wi": kernel(f"{ff}.DenseReluDense.wi.weight"),
                "wo": kernel(f"{ff}.DenseReluDense.wo.weight"),
            }
        )
        params[f"block_{i}"] = {
            "ln_attn": {"weight": _t(state_dict[f"{attn}.layer_norm.weight"])},
            "attention": {
                "q": kernel(f"{attn}.SelfAttention.q.weight"),
                "k": kernel(f"{attn}.SelfAttention.k.weight"),
                "v": kernel(f"{attn}.SelfAttention.v.weight"),
                "o": kernel(f"{attn}.SelfAttention.o.weight"),
            },
            "ln_ff": {"weight": _t(state_dict[f"{ff}.layer_norm.weight"])},
            "ff": ff_params,
        }
    return params


def convert_albert_weights(
    state_dict: Dict, num_groups: int = 1, inner_group_num: int = 1
) -> Dict:
    """torch AlbertModel state_dict -> param tree for
    modules/albert.AlbertEncoderStack.  The shared layer groups live under
    encoder.albert_layer_groups.{g}.albert_layers.{j}."""

    def linear(prefix):
        return _linear(state_dict, prefix)

    def layer_norm(prefix):
        return _layer_norm(state_dict, prefix)

    params = {
        "embeddings": {
            "word_embeddings": {
                "embedding": _t(state_dict["embeddings.word_embeddings.weight"])
            },
            "position_embeddings": {
                "embedding": _t(
                    state_dict["embeddings.position_embeddings.weight"]
                )
            },
            "token_type_embeddings": {
                "embedding": _t(
                    state_dict["embeddings.token_type_embeddings.weight"]
                )
            },
            "LayerNorm": layer_norm("embeddings.LayerNorm"),
        },
        "embedding_hidden_mapping_in": linear(
            "encoder.embedding_hidden_mapping_in"
        ),
    }
    for g in range(num_groups):
        for j in range(inner_group_num):
            prefix = f"encoder.albert_layer_groups.{g}.albert_layers.{j}"
            params[f"group_{g}_layer_{j}"] = {
                "query": linear(f"{prefix}.attention.query"),
                "key": linear(f"{prefix}.attention.key"),
                "value": linear(f"{prefix}.attention.value"),
                "attn_dense": linear(f"{prefix}.attention.dense"),
                "attn_LayerNorm": layer_norm(f"{prefix}.attention.LayerNorm"),
                "ffn": linear(f"{prefix}.ffn"),
                "ffn_output": linear(f"{prefix}.ffn_output"),
                "full_layer_LayerNorm": layer_norm(
                    f"{prefix}.full_layer_layer_norm"
                ),
            }
    return params


def convert_deberta_v2_weights(state_dict: Dict, num_layers: int) -> Dict:
    """torch DebertaV2Model state_dict -> param tree for
    modules/deberta.DebertaV2EncoderStack.  Optional pieces (absolute
    positions, token types, embed_proj, rel embeddings + their LN, conv,
    dedicated pos projections) convert when present."""

    def linear(prefix):
        return _linear(state_dict, prefix)

    def layer_norm(prefix):
        return _layer_norm(state_dict, prefix)

    params = {
        "word_embeddings": {
            "embedding": _t(state_dict["embeddings.word_embeddings.weight"])
        },
        "embeddings_LayerNorm": layer_norm("embeddings.LayerNorm"),
    }
    if "embeddings.position_embeddings.weight" in state_dict:
        params["position_embeddings"] = {
            "embedding": _t(state_dict["embeddings.position_embeddings.weight"])
        }
    if "embeddings.token_type_embeddings.weight" in state_dict:
        params["token_type_embeddings"] = {
            "embedding": _t(
                state_dict["embeddings.token_type_embeddings.weight"]
            )
        }
    if "embeddings.embed_proj.weight" in state_dict:
        params["embed_proj"] = {
            "kernel": _t(state_dict["embeddings.embed_proj.weight"]).T
        }
    if "encoder.rel_embeddings.weight" in state_dict:
        params["rel_embeddings"] = _t(state_dict["encoder.rel_embeddings.weight"])
    if "encoder.LayerNorm.weight" in state_dict:
        params["rel_LayerNorm"] = layer_norm("encoder.LayerNorm")
    if "encoder.conv.conv.weight" in state_dict:
        params["conv"] = {
            # torch Conv1d (out, in/groups, k) -> flax (k, in/groups, out)
            "kernel": _t(state_dict["encoder.conv.conv.weight"]).transpose(
                2, 1, 0
            ),
            "bias": _t(state_dict["encoder.conv.conv.bias"]),
        }
        params["conv_LayerNorm"] = layer_norm("encoder.conv.LayerNorm")

    for i in range(num_layers):
        prefix = f"encoder.layer.{i}"
        self_params = {
            "query_proj": linear(f"{prefix}.attention.self.query_proj"),
            "key_proj": linear(f"{prefix}.attention.self.key_proj"),
            "value_proj": linear(f"{prefix}.attention.self.value_proj"),
        }
        for name in ("pos_key_proj", "pos_query_proj"):
            if f"{prefix}.attention.self.{name}.weight" in state_dict:
                self_params[name] = linear(f"{prefix}.attention.self.{name}")
        params[f"layer_{i}"] = {
            "self": self_params,
            "attn_output": linear(f"{prefix}.attention.output.dense"),
            "attn_LayerNorm": layer_norm(f"{prefix}.attention.output.LayerNorm"),
            "intermediate": linear(f"{prefix}.intermediate.dense"),
            "output": linear(f"{prefix}.output.dense"),
            "output_LayerNorm": layer_norm(f"{prefix}.output.LayerNorm"),
        }
    return params


def seed_text_backbone(params: Dict, converted: Dict) -> Dict:
    """Graft a converted {'embeddings','encoder'} pair (from
    convert_bert_weights / convert_roberta_weights) into a pretrained text
    wrapper's param tree (pretrained_embeddings._FrozenTextBackboneEmbedding:
    BertEmbeddings_0 + BertEncoderStack_0 + projection).  Vocab and position
    tables smaller than the wrapper's (default 30522/512) are zero-padded;
    larger ones are truncated."""
    embeddings = {key: dict(val) for key, val in converted["embeddings"].items()}
    for key in ("Embed_0", "Embed_1"):
        table = np.asarray(embeddings[key]["embedding"])
        target_rows = np.asarray(
            params["BertEmbeddings_0"][key]["embedding"]
        ).shape[0]
        if table.shape[0] < target_rows:
            pad = np.zeros(
                (target_rows - table.shape[0], table.shape[1]), table.dtype
            )
            table = np.concatenate([table, pad], axis=0)
        elif table.shape[0] > target_rows:
            table = table[:target_rows]
        embeddings[key] = {"embedding": table}
    out = dict(params)
    out["BertEmbeddings_0"] = embeddings
    out["BertEncoderStack_0"] = converted["encoder"]
    return out


def graft_with_padding(target: Dict, converted: Dict, path: str = "") -> Dict:
    """Recursively overlay `converted` onto `target`.  Embedding-style
    tables whose shapes differ only in dim 0 (vocab / position rows) are
    zero-padded or truncated to the target's row count; any other shape
    mismatch raises.  Leaves present only in the target keep their values
    (e.g. the trainable projection); leaves only in `converted` raise
    (they would silently drop pretrained weights)."""
    out = dict(target)
    for key, value in converted.items():
        here = f"{path}/{key}"
        if key not in target:
            raise KeyError(f"converted weight {here} has no slot in the wrapper")
        if isinstance(value, dict):
            out[key] = graft_with_padding(target[key], value, here)
            continue
        want = np.asarray(target[key])
        have = np.asarray(value)
        if have.shape == want.shape:
            out[key] = have
        elif (
            key == "embedding"  # nn.Embed tables ONLY: a Dense kernel that
            # differs in dim 0 (e.g. checkpoint d_ff vs configured D_FF) is
            # a real config mismatch and must raise, not silently truncate
            and have.ndim == want.ndim
            and have.ndim >= 2
            and have.shape[1:] == want.shape[1:]
        ):
            if have.shape[0] < want.shape[0]:
                pad = np.zeros(
                    (want.shape[0] - have.shape[0],) + have.shape[1:], have.dtype
                )
                out[key] = np.concatenate([have, pad], axis=0)
            else:
                out[key] = have[: want.shape[0]]
            logger.info(
                "resized %s rows %d -> %d", here, have.shape[0], want.shape[0]
            )
        else:
            raise ValueError(
                f"shape mismatch at {here}: converted {have.shape} vs "
                f"wrapper {want.shape}"
            )
    return out


def load_into_wrapper(wrapper_params: Dict, converted: Dict) -> Dict:
    """Graft a converted backbone tree into a `_ProjectedBackboneEmbedding`
    wrapper's params (the `backbone` submodule of T5Embedding /
    AlbertEmbedding / DebertaEmbedding), padding vocab/position tables to
    the wrapper's shapes in one call (the helper the round-1 ROADMAP left
    manual)."""
    out = dict(wrapper_params)
    out["backbone"] = graft_with_padding(
        wrapper_params["backbone"], converted, "backbone"
    )
    return out


def load_hf_bert_params(
    name_or_path: str, num_layers: Optional[int] = None
) -> Optional[Dict]:
    """Best-effort local-only HF load + conversion (no network egress)."""
    try:
        from transformers import BertModel

        model = BertModel.from_pretrained(name_or_path, local_files_only=True)
    except Exception as exc:  # noqa: BLE001
        logger.warning(
            "no local HF weights for %s (%s); using random init",
            name_or_path, exc,
        )
        return None
    layers = num_layers or model.config.num_hidden_layers
    return convert_bert_weights(model.state_dict(), layers)
