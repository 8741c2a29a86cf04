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


def convert_bert_weights(state_dict: Dict, num_layers: int) -> Dict:
    """torch BertModel state_dict -> {'embeddings': ..., 'encoder': ...}
    param trees for our BertEmbeddings / BertEncoderStack."""

    def linear(prefix):
        return {
            "kernel": _t(state_dict[f"{prefix}.weight"]).T,
            "bias": _t(state_dict[f"{prefix}.bias"]),
        }

    def layer_norm(prefix):
        return {
            "scale": _t(state_dict[f"{prefix}.weight"]),
            "bias": _t(state_dict[f"{prefix}.bias"]),
        }

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
        return {
            "kernel": _t(state_dict[f"{prefix}.weight"]).T,
            "bias": _t(state_dict[f"{prefix}.bias"]),
        }

    def layer_norm(prefix):
        return {
            "scale": _t(state_dict[f"{prefix}.weight"]),
            "bias": _t(state_dict[f"{prefix}.bias"]),
        }

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
