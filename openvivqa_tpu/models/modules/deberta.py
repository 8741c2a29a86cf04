"""DeBERTa-v2 encoder stack (flax.linen), architecture-faithful to HF
DebertaV2Model.

The reference's `DebertaEmbedding` wraps DebertaV2Config/DebertaV2Encoder
(text_embeddings.py:457-513 — despite the v1 name it builds TextDeberta_v2).
Semantics reproduced here (verified vs torch in tests/test_hf_conversion.py):

* embeddings: word (+ optional absolute position when position_biased_input,
  + optional token type when type_vocab_size>0), optional embed_proj when
  embedding_size != hidden, LN(eps 1e-7), multiply by the input mask,
  dropout (modeling_deberta_v2.py:490-569);
* disentangled attention: content-to-content scores scaled by
  sqrt(head_dim * scale_factor) with scale_factor = 1 + |pos_att_type|;
  c2p and p2c terms gather from a shared relative-embedding table
  (log-bucketed positions when position_buckets > 0), each divided by the
  same scale (modeling_deberta_v2.py:141-351);
* share_att_key: position keys/queries reuse the content key/query
  projections (v3 and v2-xlarge checkpoints) or use dedicated
  pos_key_proj/pos_query_proj;
* optional depthwise-groupable ConvLayer merged after layer 0
  (v2 checkpoints, conv_kernel_size=3);
* post-LN residual layers identical to BERT otherwise.

TPU notes: the (L, L) relative-position bucket table is host-side numpy —
static shapes make it a compile-time constant.  The c2p/p2c gathers are
jnp.take_along_axis over the last axis on (B, H, L, 2S) score tensors,
which XLA lowers to vectorised dynamic-slices; everything else is MXU
matmuls.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_normal = nn.initializers.normal(stddev=0.02)


def make_log_bucket_position(
    relative_pos: np.ndarray, bucket_size: int, max_position: int
) -> np.ndarray:
    """Log-bucketed relative positions (modeling_deberta_v2.py:58-71)."""
    sign = np.sign(relative_pos)
    mid = bucket_size // 2
    abs_pos = np.where(
        (relative_pos < mid) & (relative_pos > -mid),
        mid - 1,
        np.abs(relative_pos),
    )
    log_pos = (
        np.ceil(
            np.log(abs_pos.astype(np.float64) / mid)
            / math.log((max_position - 1) / mid)
            * (mid - 1)
        )
        + mid
    )
    bucket_pos = np.where(
        abs_pos <= mid, relative_pos.astype(np.float64), log_pos * sign
    )
    return bucket_pos.astype(np.int64)


def build_relative_position(
    query_size: int, key_size: int, bucket_size: int = -1, max_position: int = -1
) -> np.ndarray:
    """(L_q, L_k) relative positions q_i - k_j, optionally log-bucketed
    (modeling_deberta_v2.py:73-103)."""
    q_ids = np.arange(query_size, dtype=np.int64)
    k_ids = np.arange(key_size, dtype=np.int64)
    rel_pos_ids = q_ids[:, None] - k_ids[None, :]
    if bucket_size > 0 and max_position > 0:
        rel_pos_ids = make_log_bucket_position(rel_pos_ids, bucket_size, max_position)
    return rel_pos_ids


class DisentangledSelfAttention(nn.Module):
    """c2c + c2p + p2c attention (modeling_deberta_v2.py:141-351)."""

    hidden_size: int
    num_heads: int
    pos_att_type: Sequence[str] = ("p2c", "c2p")
    relative_attention: bool = True
    share_att_key: bool = False
    att_span: int = 256  # pos_ebd_size: position_buckets or max_rel_positions
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        attention_bias: Optional[jnp.ndarray],
        relative_pos: Optional[jnp.ndarray],
        rel_embeddings: Optional[jnp.ndarray],
        train: bool = False,
    ) -> jnp.ndarray:
        head_dim = self.hidden_size // self.num_heads
        bs, seq_len = hidden_states.shape[0], hidden_states.shape[1]

        query_proj = nn.Dense(self.hidden_size, name="query_proj")
        key_proj = nn.Dense(self.hidden_size, name="key_proj")
        value_proj = nn.Dense(self.hidden_size, name="value_proj")

        def heads(x):
            return x.reshape(x.shape[0], x.shape[1], self.num_heads, head_dim)

        q_packed = query_proj(hidden_states)
        k_packed = key_proj(hidden_states)
        v_packed = value_proj(hidden_states)
        q, k, v = heads(q_packed), heads(k_packed), heads(v_packed)

        # HF counts pos_att_type entries even when relative_attention is off
        scale_factor = 1
        if "c2p" in self.pos_att_type:
            scale_factor += 1
        if "p2c" in self.pos_att_type:
            scale_factor += 1
        scale = math.sqrt(head_dim * scale_factor)

        # disentangled c2p/p2c terms accumulate into a per-head bias so the
        # main attend can route through the 2-bias packed kernel
        rel_bias = jnp.zeros((1, 1, 1, 1), jnp.float32)

        if self.relative_attention and rel_embeddings is not None:
            rel_emb = nn.Dropout(rate=self.dropout)(
                rel_embeddings, deterministic=not train
            )[: self.att_span * 2]  # (2S, hidden)
            if self.share_att_key:
                pos_key = heads(key_proj(rel_emb[None]))[0]  # (2S, H, D)
                pos_query = heads(query_proj(rel_emb[None]))[0]
            else:
                pos_key = (
                    heads(nn.Dense(self.hidden_size, name="pos_key_proj")(rel_emb[None]))[0]
                    if "c2p" in self.pos_att_type
                    else None
                )
                pos_query = (
                    heads(
                        nn.Dense(self.hidden_size, name="pos_query_proj")(rel_emb[None])
                    )[0]
                    if "p2c" in self.pos_att_type
                    else None
                )

            if "c2p" in self.pos_att_type:
                c2p_att = jnp.einsum(
                    "bqhd,shd->bhqs", q, pos_key,
                    preferred_element_type=jnp.float32,
                )
                c2p_pos = jnp.clip(
                    relative_pos + self.att_span, 0, self.att_span * 2 - 1
                )
                # gather along the span axis as a one-hot matmul: the
                # (b,h,q,k)-sized take_along_axis runs on the TPU scalar
                # core and dominated the whole stack (31 ms for 4 layers at
                # 197 tokens); the position one-hot depends only on (q,k)
                # so it is a shared constant.  HIGHEST keeps the gather
                # bit-exact (CLAUDE.md measured fact).
                c2p_onehot = jax.nn.one_hot(
                    c2p_pos, self.att_span * 2, dtype=jnp.float32
                )  # (q, k, 2S)
                rel_bias = rel_bias + jnp.einsum(
                    "bhqs,qks->bhqk", c2p_att, c2p_onehot,
                    precision=jax.lax.Precision.HIGHEST,
                ) / scale

            if "p2c" in self.pos_att_type:
                p2c_att = jnp.einsum(
                    "bkhd,shd->bhks", k, pos_query,
                    preferred_element_type=jnp.float32,
                )
                p2c_pos = jnp.clip(
                    -relative_pos + self.att_span, 0, self.att_span * 2 - 1
                )
                # the swapaxes(take_along_axis(...)) pattern as one matmul:
                # out[b,h,q,k] = p2c_att[b,h,k,p2c_pos[k,q]] (see c2p note)
                p2c_onehot = jax.nn.one_hot(
                    p2c_pos, self.att_span * 2, dtype=jnp.float32
                )  # (k, q, 2S) — p2c_pos is indexed [k, q] here
                rel_bias = rel_bias + jnp.einsum(
                    "bhks,kqs->bhqk", p2c_att, p2c_onehot,
                    precision=jax.lax.Precision.HIGHEST,
                ) / scale

        from ...ops.fused_attention import (
            fused_attention_packed_2bias,
            packed_2bias_viable,
            use_fused_attention,
        )

        # neutral at wrapper shapes (see t5.py note) — the measured DeBERTa
        # win was the one-hot gather rewrite above (31 ms -> 1.15 ms for 4
        # layers at 197 tokens); the kernel stays behind the force flag
        if (
            not train
            and use_fused_attention() is True
            and packed_2bias_viable(
                seq_len, seq_len, self.hidden_size, self.num_heads
            )
        ):
            head_bias = jnp.broadcast_to(
                rel_bias, (bs, self.num_heads, seq_len, seq_len)
            )
            context = fused_attention_packed_2bias(
                q_packed, k_packed, v_packed, attention_bias, head_bias,
                1.0 / scale, self.num_heads,
            )
            return context

        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / scale
        scores = scores + rel_bias
        if attention_bias is not None:
            scores = scores + attention_bias
        weights = jax.nn.softmax(scores, axis=-1).astype(hidden_states.dtype)
        weights = nn.Dropout(rate=self.dropout)(weights, deterministic=not train)
        context = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        return context.reshape(bs, seq_len, self.hidden_size)


class DebertaV2Layer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    pos_att_type: Sequence[str] = ("p2c", "c2p")
    relative_attention: bool = True
    share_att_key: bool = False
    att_span: int = 256
    act_fn: str = "gelu"
    ln_eps: float = 1e-7
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        attention_bias: Optional[jnp.ndarray],
        relative_pos: Optional[jnp.ndarray],
        rel_embeddings: Optional[jnp.ndarray],
        train: bool = False,
    ) -> jnp.ndarray:
        attn = DisentangledSelfAttention(
            self.hidden_size, self.num_heads, self.pos_att_type,
            self.relative_attention, self.share_att_key, self.att_span,
            self.dropout, name="self",
        )(hidden_states, attention_bias, relative_pos, rel_embeddings, train)
        attn = nn.Dense(self.hidden_size, name="attn_output")(attn)
        attn = nn.Dropout(rate=self.dropout)(attn, deterministic=not train)
        attn_out = nn.LayerNorm(epsilon=self.ln_eps, name="attn_LayerNorm")(
            attn + hidden_states
        )

        act = (
            (lambda y: jax.nn.gelu(y, approximate=False))
            if self.act_fn == "gelu"
            else (lambda y: jax.nn.gelu(y, approximate=True))
        )
        inter = act(
            nn.Dense(self.intermediate_size, name="intermediate")(attn_out)
        )
        out = nn.Dense(self.hidden_size, name="output")(inter)
        out = nn.Dropout(rate=self.dropout)(out, deterministic=not train)
        return nn.LayerNorm(epsilon=self.ln_eps, name="output_LayerNorm")(
            out + attn_out
        )


class DebertaV2EncoderStack(nn.Module):
    """token ids -> last_hidden_state, matching HF DebertaV2Model under
    converted weights.

    `attention_bias` is the framework additive padding bias (0 / -10e4,
    (bs, 1, 1, L)); HF masked_fills to dtype-min instead, which agrees
    after fp32 softmax underflow at all non-pad positions."""

    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    intermediate_size: Optional[int] = None
    embedding_size: Optional[int] = None  # != hidden -> embed_proj
    max_position_embeddings: int = 512
    type_vocab_size: int = 0
    position_biased_input: bool = True
    relative_attention: bool = True
    position_buckets: int = -1
    max_relative_positions: int = -1
    pos_att_type: Sequence[str] = ("p2c", "c2p")
    share_att_key: bool = False
    norm_rel_ebd: str = "none"
    conv_kernel_size: int = 0
    conv_groups: int = 1
    act_fn: str = "gelu"
    ln_eps: float = 1e-7
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        token_ids: jnp.ndarray,
        attention_bias: Optional[jnp.ndarray] = None,
        token_type_ids: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        seq_len = token_ids.shape[1]
        emb_size = self.embedding_size or self.hidden_size
        intermediate = self.intermediate_size or 4 * self.hidden_size
        max_rel = (
            self.max_relative_positions
            if self.max_relative_positions > 0
            else self.max_position_embeddings
        )
        att_span = self.position_buckets if self.position_buckets > 0 else max_rel

        # ---- embeddings --------------------------------------------------
        embedded = nn.Embed(
            self.vocab_size, emb_size, embedding_init=_normal,
            name="word_embeddings",
        )(token_ids)
        if self.position_biased_input:
            embedded = embedded + nn.Embed(
                self.max_position_embeddings, emb_size, embedding_init=_normal,
                name="position_embeddings",
            )(jnp.arange(seq_len)[None, :])
        if self.type_vocab_size > 0:
            if token_type_ids is None:
                token_type_ids = jnp.zeros_like(token_ids)
            embedded = embedded + nn.Embed(
                self.type_vocab_size, emb_size, embedding_init=_normal,
                name="token_type_embeddings",
            )(token_type_ids)
        if emb_size != self.hidden_size:
            embedded = nn.Dense(
                self.hidden_size, use_bias=False, name="embed_proj"
            )(embedded)
        hidden = nn.LayerNorm(epsilon=self.ln_eps, name="embeddings_LayerNorm")(
            embedded
        )
        input_mask = None
        if attention_bias is not None:
            input_mask = (attention_bias[:, 0, 0, :] == 0).astype(hidden.dtype)
            hidden = hidden * input_mask[..., None]
        hidden = nn.Dropout(rate=self.dropout)(hidden, deterministic=not train)

        # ---- shared relative embeddings + static bucket table ------------
        rel_embeddings = None
        relative_pos = None
        if self.relative_attention:
            rel_table = self.param(
                "rel_embeddings", _normal, (att_span * 2, self.hidden_size)
            )
            if "layer_norm" in self.norm_rel_ebd:
                rel_embeddings = nn.LayerNorm(
                    epsilon=self.ln_eps, name="rel_LayerNorm"
                )(rel_table)
            else:
                rel_embeddings = rel_table
            relative_pos = jnp.asarray(
                build_relative_position(
                    seq_len, seq_len, self.position_buckets, max_rel
                ),
                jnp.int32,
            )

        # ---- layers (+ optional conv merged after layer 0) ----------------
        first_input = hidden
        for i in range(self.num_layers):
            out = DebertaV2Layer(
                self.hidden_size, self.num_heads, intermediate,
                self.pos_att_type, self.relative_attention,
                self.share_att_key, att_span, self.act_fn, self.ln_eps,
                self.dropout, name=f"layer_{i}",
            )(hidden, attention_bias, relative_pos, rel_embeddings, train)
            if i == 0 and self.conv_kernel_size > 0:
                pad = (self.conv_kernel_size - 1) // 2
                conv = nn.Conv(
                    features=self.hidden_size,
                    kernel_size=(self.conv_kernel_size,),
                    padding=[(pad, pad)],  # torch Conv1d padding=(k-1)//2
                    feature_group_count=self.conv_groups,
                    name="conv",
                )(first_input)
                if input_mask is not None:
                    conv = conv * input_mask[..., None]
                conv = nn.Dropout(rate=self.dropout)(
                    conv, deterministic=not train
                )
                conv = jnp.tanh(conv)  # conv_act default
                merged = nn.LayerNorm(epsilon=self.ln_eps, name="conv_LayerNorm")(
                    out + conv
                )
                out = (
                    merged * input_mask[..., None]
                    if input_mask is not None
                    else merged
                )
            hidden = out
        return hidden
