"""Convert reference (torch) checkpoints into this framework's param trees.

Users migrating from the PyTorch reference can load a trained
`last_model.pth` / `best_model.pth` state_dict and convert the modules this
framework shares layouts with.  The same mapping underlies the end-to-end
parity test (tests/test_full_model_parity.py: converted IterativeMCAN
matches the torch model to 2e-4 with identical argmax).

Conventions: torch `nn.Linear.weight` is (out, in) -> flax Dense kernel is
its transpose; `nn.LayerNorm` weight/bias -> scale/bias; embedding tables
copy as-is.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(tensor) -> np.ndarray:
    if hasattr(tensor, "detach"):
        return np.asarray(tensor.detach().cpu().numpy(), np.float32)
    return np.asarray(tensor, np.float32)


class StateDict:
    """Prefix-scoped view over a torch state_dict."""

    def __init__(self, mapping: Mapping[str, Any], prefix: str = ""):
        self._mapping = mapping
        self._prefix = prefix

    def scope(self, name: str) -> "StateDict":
        return StateDict(self._mapping, f"{self._prefix}{name}.")

    def __getitem__(self, key: str) -> np.ndarray:
        return _np(self._mapping[f"{self._prefix}{key}"])

    def __contains__(self, key: str) -> bool:
        return f"{self._prefix}{key}" in self._mapping


def linear(sd: StateDict, name: str) -> Dict:
    scope = sd.scope(name)
    out = {"kernel": scope["weight"].T}
    if "bias" in scope:
        out["bias"] = scope["bias"]
    return out


def layer_norm(sd: StateDict, name: str) -> Dict:
    scope = sd.scope(name)
    return {"scale": scope["weight"], "bias": scope["bias"]}


def embedding(sd: StateDict, name: str) -> Dict:
    return {"embedding": sd.scope(name)["weight"]}


def multi_head_attention(sd: StateDict, name: str) -> Dict:
    """MultiHeadAttention (attentions.py:293-338) -> our MHA tree."""
    scope = sd.scope(name)
    return {
        "attention": {
            "fc_q": linear(scope, "attention.fc_q"),
            "fc_k": linear(scope, "attention.fc_k"),
            "fc_v": linear(scope, "attention.fc_v"),
            "fc_o": linear(scope, "attention.fc_o"),
        },
        "layer_norm": layer_norm(scope, "layer_norm"),
    }


def positionwise_ffn(sd: StateDict, name: str) -> Dict:
    scope = sd.scope(name)
    return {
        "Dense_0": linear(scope, "fc1"),
        "Dense_1": linear(scope, "fc2"),
        "LayerNorm_0": layer_norm(scope, "layer_norm"),
    }


def encoder_layer(sd: StateDict, name: str) -> Dict:
    scope = sd.scope(name)
    return {
        "mhatt": multi_head_attention(scope, "mhatt"),
        "pwff": positionwise_ffn(scope, "pwff"),
    }


def guided_encoder_layer(sd: StateDict, name: str) -> Dict:
    scope = sd.scope(name)
    return {
        "self_mhatt": multi_head_attention(scope, "self_mhatt"),
        "guided_mhatt": multi_head_attention(scope, "guided_mhatt"),
        "pwff": positionwise_ffn(scope, "pwff"),
    }


def decoder_layer(sd: StateDict, name: str) -> Dict:
    scope = sd.scope(name)
    return {
        "self_attn": multi_head_attention(scope, "self_attn"),
        "enc_attn": multi_head_attention(scope, "enc_attn"),
        "pwff": positionwise_ffn(scope, "pwff"),
    }


def encoder(sd: StateDict, name: str, n_layers: int) -> Dict:
    scope = sd.scope(name)
    return {
        "layer_norm": layer_norm(scope, "layer_norm"),
        **{
            f"layer_{i}": encoder_layer(scope, f"layers.{i}")
            for i in range(n_layers)
        },
    }


def guided_encoder(sd: StateDict, name: str, n_layers: int) -> Dict:
    scope = sd.scope(name)
    return {
        "layer_norm": layer_norm(scope, "layer_norm"),
        **{
            f"layer_{i}": guided_encoder_layer(scope, f"guided_attn_layers.{i}")
            for i in range(n_layers)
        },
    }


def decoder(sd: StateDict, name: str, n_layers: int) -> Dict:
    scope = sd.scope(name)
    out = {
        # full dispatch (plain / pretrained-vectors / LSTM variants) — the
        # flax Decoder's word_emb is a build_text_embedding module
        "word_emb": convert_text_embedding(scope, "word_emb"),
        "fc": {"kernel": scope["fc.weight"].T},
        **{
            f"layer_{i}": decoder_layer(scope, f"layers.{i}")
            for i in range(n_layers)
        },
    }
    return out


def convert_iterative_mcan(state_dict: Mapping[str, Any], config) -> Dict:
    """Trained reference IterativeMCAN state_dict -> our param tree."""
    sd = StateDict(state_dict)
    return {
        "vision_embedding": {"Dense_0": linear(sd, "vision_embedding.proj")},
        "text_embedding": convert_text_embedding(sd, "text_embedding"),
        "self_encoder": encoder(sd, "self_encoder", config.SELF_ENCODER.LAYERS),
        "guided_encoder": guided_encoder(
            sd, "guided_encoder", config.GUIDED_ENCODER.LAYERS
        ),
        "fusion": positionwise_ffn(sd, "fusion"),
        "norm": layer_norm(sd, "norm"),
        "decoder": decoder(sd, "decoder", config.DECODER.LAYERS),
    }


def convert_mcan(state_dict: Mapping[str, Any], config) -> Dict:
    """Trained reference MCAN state_dict -> our param tree (mcan.py:27-81).
    The LSTM text embedding is converted when present (torch LSTM gate order
    i,f,g,o matches flax OptimizedLSTMCell's i,f,g,o kernels)."""
    sd = StateDict(state_dict)
    params = {
        "vision_embedding": {"Dense_0": linear(sd, "vision_embedding.proj")},
        "self_encoder": encoder(sd, "self_encoder", config.SELF_ENCODER.LAYERS),
        "guided_encoder": guided_encoder(
            sd, "guided_encoder", config.GUIDED_ENCODER.LAYERS
        ),
        "vision_attr_reduce": {
            "Dense_0": linear(sd, "vision_attr_reduce.fc1"),
            "Dense_1": linear(sd, "vision_attr_reduce.fc2"),
        },
        "text_attr_reduce": {
            "Dense_0": linear(sd, "text_attr_reduce.fc1"),
            "Dense_1": linear(sd, "text_attr_reduce.fc2"),
        },
        "vision_proj": linear(sd, "vision_proj"),
        "text_proj": linear(sd, "text_proj"),
        "layer_norm": layer_norm(sd, "layer_norm"),
        "classify": linear(sd, "classify"),
    }
    params["text_embedding"] = convert_text_embedding(sd, "text_embedding")
    return params


def convert_text_embedding(sd: StateDict, name: str) -> Dict:
    """UsualEmbedding (components.weight) or LSTMTextEmbedding
    (embedding + proj + torch nn.LSTM) -> our module trees.

    torch LSTM packs gates row-blocked as [i, f, g, o] in
    weight_ih_l0/weight_hh_l0; flax OptimizedLSTMCell splits them into
    ii/if/ig/io (input kernels, no bias) and hi/hf/hg/ho (hidden kernels
    carrying the summed torch biases)."""
    if f"{name}.components.weight" in sd:
        return {"embedding": sd[f"{name}.components.weight"]}
    if f"{name}.components.1.weight" in sd:
        # UsualEmbedding with pretrained vectors: nn.Sequential(frozen
        # Embedding, Linear, Dropout) (text_embeddings.py:66-71).  The
        # frozen table lives in our 'frozen' collection (seeded from
        # vocab.word_embeddings), so only the projection converts.
        return {"Dense_0": linear(sd, f"{name}.components.1")}
    # LSTMTextEmbedding (text_embeddings.py:221-246)
    w_ih = sd[f"{name}.lstm.weight_ih_l0"]
    w_hh = sd[f"{name}.lstm.weight_hh_l0"]
    b_ih = sd[f"{name}.lstm.bias_ih_l0"]
    b_hh = sd[f"{name}.lstm.bias_hh_l0"]
    hidden = w_hh.shape[1]
    cell = {}
    for idx, gate in enumerate("ifgo"):
        rows = slice(idx * hidden, (idx + 1) * hidden)
        cell[f"i{gate}"] = {"kernel": w_ih[rows].T}
        cell[f"h{gate}"] = {
            "kernel": w_hh[rows].T,
            "bias": b_ih[rows] + b_hh[rows],
        }
    return {
        "embedding": sd[f"{name}.embedding.weight"],
        "Dense_0": linear(sd, f"{name}.proj"),
        "_LSTM_0": {"OptimizedLSTMCell_0": cell},
    }


# -- M4C family (HF-BERT-based; mmf_m4c.py:20-256) ----------------------------


def hf_bert_embeddings(sd: StateDict, name: str) -> Dict:
    """transformers BertEmbeddings -> our BertEmbeddings tree."""
    scope = sd.scope(name)
    return {
        "Embed_0": {"embedding": scope["word_embeddings.weight"]},
        "Embed_1": {"embedding": scope["position_embeddings.weight"]},
        "Embed_2": {"embedding": scope["token_type_embeddings.weight"]},
        "LayerNorm_0": layer_norm(scope, "LayerNorm"),
    }


def hf_bert_layer(sd: StateDict, name: str, cross_attention: bool = False) -> Dict:
    """transformers BertLayer -> our BertLayer tree (optionally with the
    decoder-style crossattention block -> BertSelfAttention_1)."""
    scope = sd.scope(name)
    tree = {
        "BertSelfAttention_0": {
            "Dense_0": linear(scope, "attention.self.query"),
            "Dense_1": linear(scope, "attention.self.key"),
            "Dense_2": linear(scope, "attention.self.value"),
            "Dense_3": linear(scope, "attention.output.dense"),
            "LayerNorm_0": layer_norm(scope, "attention.output.LayerNorm"),
        },
        "Dense_0": linear(scope, "intermediate.dense"),
        "Dense_1": linear(scope, "output.dense"),
        "LayerNorm_0": layer_norm(scope, "output.LayerNorm"),
    }
    if cross_attention:
        tree["BertSelfAttention_1"] = {
            "Dense_0": linear(scope, "crossattention.self.query"),
            "Dense_1": linear(scope, "crossattention.self.key"),
            "Dense_2": linear(scope, "crossattention.self.value"),
            "Dense_3": linear(scope, "crossattention.output.dense"),
            "LayerNorm_0": layer_norm(scope, "crossattention.output.LayerNorm"),
        }
    return tree


def hf_bert_encoder(sd: StateDict, name: str, n_layers: int) -> Dict:
    scope = sd.scope(name)
    return {
        f"layer_{i}": hf_bert_layer(scope, f"layer.{i}") for i in range(n_layers)
    }


def prev_pred_embeddings(sd: StateDict, name: str) -> Dict:
    """Reference PrevPredEmbeddings (mmf_m4c.py:399-445) -> our tree."""
    scope = sd.scope(name)
    return {
        "LayerNorm_0": layer_norm(scope, "ans_layer_norm"),
        "LayerNorm_1": layer_norm(scope, "ocr_layer_norm"),
        "LayerNorm_2": layer_norm(scope, "emb_layer_norm"),
        "Embed_0": embedding(scope, "position_embeddings"),
        "Embed_1": embedding(scope, "token_type_embeddings"),
    }


def feature_box_encoding(
    sd: StateDict, feat: str, bbox: str, feat_ln: str, bbox_ln: str
) -> Dict:
    """Reference obj/ocr encodings (mmf_m4c.py:74-99) -> FeatureBoxEncoding."""
    return {
        "Dense_0": linear(sd, feat),
        "Dense_1": linear(sd, bbox),
        "LayerNorm_0": layer_norm(sd, feat_ln),
        "LayerNorm_1": layer_norm(sd, bbox_ln),
    }


def convert_mmf_m4c(
    state_dict: Mapping[str, Any], config, include_text_bert: bool = True
) -> Dict:
    """Trained reference MMF_M4C / MMF_ImprovedDecodingM4C state_dict ->
    our param tree (identical module layout in both, mmf_m4c.py:25-113).
    The unused reference param `ocr_text_layer_norm` is dropped.

    include_text_bert=False skips the standard TextBert scope for variants
    whose question stream is NOT a plain TextBert (MMF_LanguageAdaptiveM4C
    stores an AutoModel under text_bert.embedding.* — reading
    text_bert.embeddings.* would KeyError on every real checkpoint)."""
    sd = StateDict(state_dict)
    mmt_cfg = config.get("MMT") or config.get("ENCODER")
    mmt_layers = mmt_cfg.get("NUM_HIDDEN_LAYERS", mmt_cfg.get("LAYERS", 4))
    params = {
        "obj_encoding": feature_box_encoding(
            sd, "linear_obj_feat_to_mmt_in", "linear_obj_bbox_to_mmt_in",
            "obj_feat_layer_norm", "obj_bbox_layer_norm",
        ),
        "ocr_encoding": feature_box_encoding(
            sd, "linear_ocr_feat_to_mmt_in", "linear_ocr_bbox_to_mmt_in",
            "ocr_feat_layer_norm", "ocr_bbox_layer_norm",
        ),
        "mmt": {
            "prev_pred_embeddings": prev_pred_embeddings(
                sd, "mmt.prev_pred_embeddings"
            ),
            "encoder": hf_bert_encoder(sd, "mmt.encoder", mmt_layers),
        },
        "classifier_kernel": sd["classifier.weight"].T,
        "classifier_bias": sd["classifier.bias"],
        "ocr_ptr_net": {
            "Dense_0": linear(sd, "ocr_ptr_net.query"),
            "Dense_1": linear(sd, "ocr_ptr_net.key"),
        },
    }
    if include_text_bert:
        params["text_bert"] = {
            "BertEmbeddings_0": hf_bert_embeddings(sd, "text_bert.embeddings"),
            "BertEncoderStack_0": hf_bert_encoder(
                sd, "text_bert.encoder", config.TEXT_BERT.NUM_HIDDEN_LAYERS
            ),
        }
        if "text_bert_out_linear.weight" in sd:
            params["text_bert_out_linear"] = linear(sd, "text_bert_out_linear")
    return params


def convert_joint_transformer(state_dict: Mapping[str, Any], config) -> Dict:
    """Reference JointTransformer (joint_transformer.py:11-82) -> our tree:
    modality-stream embeddings (+ the shared UsualEmbedding providing the
    modality-tag rows), single Encoder, masked Decoder."""
    sd = StateDict(state_dict)
    return {
        "streams": {
            "region_embedding": {"Dense_0": linear(sd, "region_embedding.proj")},
            "grid_embedding": {"Dense_0": linear(sd, "grid_embedding.proj")},
            "box_embedding": {"Dense_0": linear(sd, "box_embedding.proj")},
            "text_embedding": convert_text_embedding(sd, "text_embedding"),
        },
        "encoder": encoder(sd, "encoder", config.ENCODER.LAYERS),
        "decoder": decoder(sd, "decoder", config.DECODER.LAYERS),
    }


def convert_saaa(state_dict: Mapping[str, Any], config) -> Dict:
    """Reference SAAA (saaa.py:68-126) -> our tree (models/saaa.py): vision
    FeatureEmbedding, LSTM text embedding, CoAttention's three linears
    (v_conv bias-free, q_lin, x_conv), two-layer classifier."""
    sd = StateDict(state_dict)
    return {
        "FeatureEmbedding_0": {"Dense_0": linear(sd, "vision.proj")},
        "LSTMTextEmbedding_0": convert_text_embedding(sd, "text"),
        "CoAttention_0": {
            "Dense_0": linear(sd, "attention.v_conv"),
            "Dense_1": linear(sd, "attention.q_lin"),
            "Dense_2": linear(sd, "attention.x_conv"),
        },
        "Dense_0": linear(sd, "classifier.lin1"),
        "Dense_1": linear(sd, "classifier.lin2"),
    }


def convert_mmf_language_adaptive(state_dict: Mapping[str, Any], config) -> Dict:
    """MMF_LanguageAdaptiveM4C: MMF_M4C body + PretrainedAdaptiveTextBert
    (mmf_language_adaptive_m4c.py:204-251 — one frozen multilingual
    AutoModel under `text_bert.embedding.`, optional projection, trainable
    fine-tune BertEncoder under `text_bert.encoder.`)."""
    from .hf_conversion import convert_bert_weights, convert_roberta_weights

    sd = StateDict(state_dict)
    # the adaptive trio below replaces the standard TextBert scope, whose
    # keys do not exist in an adaptive checkpoint
    params = convert_mmf_m4c(state_dict, config, include_text_bert=False)

    prefix = "text_bert.embedding."
    backbone_sd = {
        key[len(prefix):]: value
        for key, value in sd._mapping.items()
        if key.startswith(prefix)
    }
    layers = int(config.TEXT_BERT.get("PRETRAINED_LAYERS") or 12)
    name = str(config.TEXT_BERT.get("PRETRAINED_NAME") or "")
    roberta_like = any(tag in name.lower() for tag in ("roberta", "phobert", "xlm"))
    converted = (
        convert_roberta_weights(backbone_sd, layers)
        if roberta_like
        else convert_bert_weights(backbone_sd, layers)
    )
    # pad the checkpoint's embedding tables up to the rows the model builds
    # (BertEmbeddings defaults: 512 positions, 2 token types; vocab rows per
    # the model's PRETRAINED_VOCAB_SIZE/len(vocab) rule)
    def pad_rows(tree: Dict, key: str, rows: int) -> None:
        table = np.asarray(tree[key]["embedding"])
        if table.shape[0] < rows:
            pad = np.zeros((rows - table.shape[0], table.shape[1]), table.dtype)
            tree[key] = {"embedding": np.concatenate([table, pad], axis=0)}
        elif table.shape[0] > rows:
            tree[key] = {"embedding": table[:rows]}

    embeddings = {k: dict(v) for k, v in converted["embeddings"].items()}
    vocab_rows = np.asarray(embeddings["Embed_0"]["embedding"]).shape[0]
    # replicate the model's table-row rule (mmf_variants.py setup):
    # max(len(vocab), PRETRAINED_VOCAB_SIZE or family default).  The
    # converter cannot see len(vocab); framework vocabs are far smaller
    # than any pretrained table, and a mismatch fails loudly at restore.
    from .pretrained_embeddings import backbone_table_rows

    configured = backbone_table_rows(config.TEXT_BERT)
    pad_rows(embeddings, "Embed_0", max(configured, vocab_rows))
    pad_rows(embeddings, "Embed_1", 512)
    pad_rows(embeddings, "Embed_2", 2)
    params["language_embeddings"] = embeddings
    params["language_backbone"] = converted["encoder"]
    if "text_bert.text_bert_out_linear.weight" in sd:
        params["language_proj"] = linear(sd, "text_bert.text_bert_out_linear")
    params["finetune_encoder"] = hf_bert_encoder(
        sd, "text_bert.encoder", config.TEXT_BERT.NUM_HIDDEN_LAYERS
    )
    return params


def convert_mmf_regional_m4c(state_dict: Mapping[str, Any], config) -> Dict:
    """MMF_REGIONAL_M4C: MMF_M4C + the grid/"region" stream modules
    (mmf_regional_m4c.py:29-39).  Weight layout converts exactly; note the
    reference model itself is broken as checked out (uses undefined
    _get_mask/_get_causal_mask and mixes additive with 0/1 mask conventions
    at :187-197), so converted weights run under this framework's
    consistent-mask semantics."""
    params = convert_mmf_m4c(state_dict, config)
    sd = StateDict(state_dict)
    params["region_encoding"] = feature_box_encoding(
        sd, "linear_region_feat_to_mmt_in", "linear_region_bbox_to_mmt_in",
        "region_feat_layer_norm", "region_bbox_layer_norm",
    )
    return params


def convert_mmf_iterative_m4c(state_dict: Mapping[str, Any], config) -> Dict:
    """MMF_IterativeM4C / MMF_Iterative_Multilevel_M4C: TextBert + joint
    BertEncoder + cross-attention BertEncoder decoder
    (mmf_iterative_m4c.py:14-97).  Verified numerically on pad-free inputs
    (tests/test_m4c_variants_parity.py); with padding the reference feeds
    raw 0/1 masks to TextBert as additive biases (:116-123) — a constant
    +1 column bias, harmless pad-free, buggy otherwise — while this
    framework masks properly."""
    sd = StateDict(state_dict)
    enc = config.get("ENCODER") or config.MMT
    dec = config.get("DECODER") or config.MMT
    enc_layers = int(enc.get("LAYERS", enc.get("NUM_HIDDEN_LAYERS", 4)))
    dec_layers = int(dec.get("LAYERS", dec.get("NUM_HIDDEN_LAYERS", 4)))
    params = {
        "text_bert": {
            "BertEmbeddings_0": hf_bert_embeddings(sd, "text_bert.embeddings"),
            "BertEncoderStack_0": hf_bert_encoder(
                sd, "text_bert.encoder", config.TEXT_BERT.NUM_HIDDEN_LAYERS
            ),
        },
        "obj_encoding": feature_box_encoding(
            sd, "linear_obj_feat_to_mmt_in", "linear_obj_bbox_to_mmt_in",
            "obj_feat_layer_norm", "obj_bbox_layer_norm",
        ),
        "ocr_encoding": feature_box_encoding(
            sd, "linear_ocr_feat_to_mmt_in", "linear_ocr_bbox_to_mmt_in",
            "ocr_feat_layer_norm", "ocr_bbox_layer_norm",
        ),
        "joint_encoder": hf_bert_encoder(sd, "encoder", enc_layers),
        "dec_embeddings": prev_pred_embeddings(sd, "prev_pred_embeddings"),
        **{
            f"dec_layer_{i}": hf_bert_layer(
                sd, f"decoder.layer.{i}", cross_attention=True
            )
            for i in range(dec_layers)
        },
        "classifier_kernel": sd["classifier.weight"].T,
        "classifier_bias": sd["classifier.bias"],
        "ocr_ptr_net": {
            "Dense_0": linear(sd, "ocr_ptr_net.query"),
            "Dense_1": linear(sd, "ocr_ptr_net.key"),
        },
    }
    if "text_bert_out_linear.weight" in sd:
        params["text_bert_out_linear"] = linear(sd, "text_bert_out_linear")
    return params


def convert_standalone_m4c(state_dict: Mapping[str, Any], config) -> Dict:
    """Trained reference standalone-M4C state_dict (m4c.py:35-98 layout) ->
    our M4C tree (models/standalone_m4c.py).  The dead reference parameter
    `ocr_text_layer_norm` (m4c.py:77 — never used in its forward) is
    dropped; `question_embedding.position_ids` is a buffer, not a weight.
    The swapped bbox projections map name-to-name because our model
    replicates the swap at the call sites (standalone_m4c.py)."""
    sd = StateDict(state_dict)
    return {
        "linear_obj_feat_to_mmt_in": linear(sd, "linear_obj_feat_to_mmt_in"),
        "linear_obj_bbox_to_mmt_in": linear(sd, "linear_obj_bbox_to_mmt_in"),
        "linear_ocr_feat_to_mmt_in": linear(sd, "linear_ocr_feat_to_mmt_in"),
        "linear_ocr_bbox_to_mmt_in": linear(sd, "linear_ocr_bbox_to_mmt_in"),
        "obj_feat_layer_norm": layer_norm(sd, "obj_feat_layer_norm"),
        "obj_bbox_layer_norm": layer_norm(sd, "obj_bbox_layer_norm"),
        "ocr_feat_layer_norm": layer_norm(sd, "ocr_feat_layer_norm"),
        "ocr_bbox_layer_norm": layer_norm(sd, "ocr_bbox_layer_norm"),
        "question_embedding": hf_bert_embeddings(sd, "question_embedding"),
        "question_encoder": hf_bert_encoder(
            sd, "question_encoder", config.TEXT_BERT.NUM_HIDDEN_LAYERS
        ),
        "encoder": hf_bert_encoder(sd, "encoder", config.ENCODER.LAYERS),
        "vocab_proj_kernel": sd["vocab_proj.weight"].T,
        "vocab_proj_bias": sd["vocab_proj.bias"],
        "dynamic_network": {
            "Dense_0": linear(sd, "dynamic_network.query"),
            "Dense_1": linear(sd, "dynamic_network.key"),
        },
    }


def convert_mmf_lorra(state_dict: Mapping[str, Any], config) -> Dict:
    """Reference MMF_LoRRA (mmf_lorra.py:12-163) -> our tree
    (models/mmf_lorra.py).  The reference builds obj bbox projections its
    forward never uses (mmf_lorra.py:45-48) — dead params, dropped."""
    sd = StateDict(state_dict)

    def attn(name: str) -> Dict:
        scope = sd.scope(name)
        return {
            "fc_q": linear(scope, "fc_q"),
            "fc_k": linear(scope, "fc_k"),
            "fc_v": linear(scope, "fc_v"),
            "fc_o": linear(scope, "fc_o"),
        }

    return {
        "txt_embedding": convert_text_embedding(sd, "txt_embedding"),
        "txt_norm": layer_norm(sd, "txt_norm"),
        "linear_obj_feat_to_mmt_in": linear(sd, "linear_obj_feat_to_mmt_in"),
        "obj_feat_layer_norm": layer_norm(sd, "obj_feat_layer_norm"),
        "linear_ocr_feat_to_mmt_in": linear(sd, "linear_ocr_feat_to_mmt_in"),
        "ocr_feat_layer_norm": layer_norm(sd, "ocr_feat_layer_norm"),
        "self_attn": attn("self_attn"),
        "spatial_attn": attn("spatial_attn"),
        "context_attn": attn("context_attn"),
        "classifier": linear(sd, "classifier"),
    }


def _unsupported(reason: str):
    def converter(state_dict, config):
        raise NotImplementedError(
            f"no checkpoint converter for {config.ARCHITECTURE}: {reason}"
        )

    return converter


MODEL_CONVERTERS = {
    "IterativeMCAN": convert_iterative_mcan,
    "ReadableIterativeMCAN": convert_iterative_mcan,
    "MCAN": convert_mcan,
    "SAAA": convert_saaa,
    "MMF_M4C": convert_mmf_m4c,
    "MMF_ImprovedDecodingM4C": convert_mmf_m4c,
    "MMF_REGIONAL_M4C": convert_mmf_regional_m4c,
    "MMF_IterativeM4C": convert_mmf_iterative_m4c,
    "MMF_Iterative_Multilevel_M4C": convert_mmf_iterative_m4c,
    "MMF_LanguageAdaptiveM4C": convert_mmf_language_adaptive,
    "JointTransformer": convert_joint_transformer,
    # round 3: the standalone M4C is now its own faithful architecture
    # (models/standalone_m4c.py), so its checkpoints migrate directly
    "M4C": convert_standalone_m4c,
    "MMF_LoRRA": convert_mmf_lorra,
    "MMF_IterativeLoRRA": _unsupported(
        "the reference MMF_IterativeLoRRA cannot be constructed at all: "
        "_build_mmt resolves its branch configs through build_ENCODER "
        "(mmf_iterative_lorra.py:66-68) whose registry has no "
        "'ScaledDotProductAttention' entry — __init__ raises before any "
        "parameter exists, so no checkpoints can exist to migrate; this "
        "framework's faithful rebuild (models/mmf_lorra.py) trains fresh"
    ),
    # Documented hard-unsupported (VERDICT r1 item 7): these reference
    # checkpoints describe DIFFERENT architectures than the ones this
    # framework runs under the same registry names, so a weight mapping
    # would be semantically wrong, not merely unimplemented.
    "MMF_SAL": _unsupported(
        "the reference MMF_SAL (mmf_sal.py:44-88) encodes questions with "
        "an HF text-embedding wrapper over raw strings (not TextBert over "
        "vocab ids) and carries dead ocr_word_embedding/"
        "ocr_text_layer_norm modules its forward never uses; this "
        "framework's MMF_SAL implements the intended extra OCR "
        "word-embedding stream, so the parameter sets do not correspond. "
        "No reference config names MMF_SAL, so no upstream training "
        "pipeline (and no checkpoints) exists for it"
    ),
    "experimental_MMF_M4C": _unsupported(
        "the reference experimental_MMF_M4C cannot be constructed at all: "
        "its MMT calls build_encoder for ARCHITECTURE 'MultiModalEncoder' "
        "(experimental_mmf_m4c.py:272, configs/experimental_mmf_m4c.yaml:"
        "104), a name registered NOWHERE in the reference — __init__ "
        "raises before any parameter exists, so no checkpoints can exist "
        "to migrate; train fresh with this framework's variant"
    ),
}


def convert_reference_checkpoint(checkpoint: Mapping[str, Any], config) -> Dict:
    """Convert a torch `torch.load(...)['state_dict']` (or raw state_dict)
    for a supported architecture."""
    state_dict = checkpoint.get("state_dict", checkpoint)
    name = config.ARCHITECTURE
    if name not in MODEL_CONVERTERS:
        raise NotImplementedError(
            f"no converter for {name}; supported: {sorted(MODEL_CONVERTERS)}"
        )
    return MODEL_CONVERTERS[name](state_dict, config)
