"""T5/mT5 encoder stack (flax.linen), architecture-faithful to HF T5Stack.

The reference's intended mT5 text path (vit_mt5.py:11-57 with
configs/vit_mt5.yaml:65 naming `T5Embedding`, PRETRAINED_NAME
google/mt5-small) wraps a real HF encoder.  This module reproduces the HF
`T5Stack(is_decoder=False)` semantics exactly so converted mT5/T5 weights
produce matching activations (verified in tests/test_hf_conversion.py):

* T5LayerNorm = RMSNorm: no mean subtraction, no bias, variance in fp32
  (modeling_t5.py T5LayerNorm), eps 1e-6.
* pre-LN blocks with additive residuals: x + dropout(sublayer(LN(x))).
* attention WITHOUT sqrt(d) scaling — scale is folded into initialisation;
  inner_dim = num_heads * d_kv may differ from d_model (mT5-small: 6*64=384
  vs d_model 512); projections have no bias.
* bucketed relative-position bias (32 buckets, max_distance 128), computed
  by the FIRST layer only and reused by all subsequent layers.
* gated activation (wi_0 * act, wi_1 linear) when `gated_act` (mT5 / t5
  v1.1: gelu_new), single wi with relu otherwise (t5 v1.0).
* final RMSNorm + dropout after the block stack.

TPU notes: the bias table lookup is a static (L, L) gather folded into the
additive attention bias once per forward; everything else is dense matmuls
that XLA tiles onto the MXU directly.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_normal = nn.initializers.normal(stddev=1.0)


class T5LayerNorm(nn.Module):
    """RMS norm: scale only, fp32 variance (modeling_t5.py:240-263)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        variance = jnp.mean(
            jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True
        )
        normed = x * jax.lax.rsqrt(variance + self.eps).astype(x.dtype)
        return weight * normed


def relative_position_bucket(
    relative_position: np.ndarray,
    bidirectional: bool = True,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> np.ndarray:
    """Mesh-TF bucket mapping (modeling_t5.py:401-447).  Host-side numpy:
    sequence lengths are static, so the (L, L) bucket table is a compile-time
    constant."""
    relative_buckets = np.zeros_like(relative_position)
    if bidirectional:
        num_buckets //= 2
        relative_buckets += (relative_position > 0).astype(np.int64) * num_buckets
        relative_position = np.abs(relative_position)
    else:
        relative_position = -np.minimum(relative_position, 0)
    max_exact = num_buckets // 2
    is_small = relative_position < max_exact
    large = max_exact + (
        np.log(np.maximum(relative_position, 1).astype(np.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, num_buckets - 1)
    relative_buckets += np.where(is_small, relative_position, large)
    return relative_buckets


def encoder_bucket_table(
    seq_len: int, num_buckets: int = 32, max_distance: int = 128
) -> np.ndarray:
    """(L, L) int bucket ids for a bidirectional encoder."""
    context = np.arange(seq_len, dtype=np.int64)[:, None]
    memory = np.arange(seq_len, dtype=np.int64)[None, :]
    return relative_position_bucket(
        memory - context,
        bidirectional=True,
        num_buckets=num_buckets,
        max_distance=max_distance,
    )


class T5Attention(nn.Module):
    """Self-attention, HF T5Attention semantics: unscaled QK^T + position
    bias; no projection biases (modeling_t5.py:348-580)."""

    d_model: int
    num_heads: int
    d_kv: int
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        position_bias: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        inner = self.num_heads * self.d_kv

        q_packed = nn.Dense(inner, use_bias=False, name="q")(hidden_states)
        k_packed = nn.Dense(inner, use_bias=False, name="k")(hidden_states)
        v_packed = nn.Dense(inner, use_bias=False, name="v")(hidden_states)

        sq, sk = q_packed.shape[1], k_packed.shape[1]
        from ...ops.fused_attention import (
            fused_attention_packed_2bias,
            packed_2bias_viable,
            use_fused_attention,
        )

        # per-head relative-position bias CAN route through the 2-bias
        # packed kernel, but it measured neutral at the wrapper shapes
        # (1.06x/0.98x across runs at 256 keys on v5e — the per-head bias
        # blocks double the VMEM traffic the kernel saves), so it engages
        # only under OPENVIVQA_FUSED_ATTENTION=1.  NO sqrt(d_kv) scaling
        # either way (T5 folds it into init).
        if (
            not train
            and use_fused_attention() is True
            and packed_2bias_viable(sq, sk, inner, self.num_heads)
        ):
            context = fused_attention_packed_2bias(
                q_packed, k_packed, v_packed, None, position_bias,
                1.0, self.num_heads,
            )
            return nn.Dense(self.d_model, use_bias=False, name="o")(context)

        def heads(x):
            return x.reshape(x.shape[0], x.shape[1], self.num_heads, self.d_kv)

        q, k, v = heads(q_packed), heads(k_packed), heads(v_packed)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        scores = scores + position_bias
        weights = jax.nn.softmax(scores, axis=-1).astype(hidden_states.dtype)
        weights = nn.Dropout(rate=self.dropout)(weights, deterministic=not train)
        context = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        context = context.reshape(context.shape[0], context.shape[1], inner)
        return nn.Dense(self.d_model, use_bias=False, name="o")(context)


class T5FF(nn.Module):
    """Feed-forward: gated (wi_0*act ⊙ wi_1) or plain (wi, relu)."""

    d_model: int
    d_ff: int
    gated_act: bool = True
    act_fn: str = "gelu_new"
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # HF ACT2FN: 'gelu_new' is the tanh approximation, plain 'gelu' is
        # the exact erf form — conflating them drifts every FFN activation
        # vs a converted checkpoint
        if self.act_fn == "gelu_new":
            act = lambda y: jax.nn.gelu(y, approximate=True)  # noqa: E731
        elif self.act_fn == "gelu":
            act = lambda y: jax.nn.gelu(y, approximate=False)  # noqa: E731
        else:
            act = jax.nn.relu
        if self.gated_act:
            gate = act(nn.Dense(self.d_ff, use_bias=False, name="wi_0")(x))
            linear = nn.Dense(self.d_ff, use_bias=False, name="wi_1")(x)
            h = gate * linear
        else:
            h = act(nn.Dense(self.d_ff, use_bias=False, name="wi")(x))
        h = nn.Dropout(rate=self.dropout)(h, deterministic=not train)
        return nn.Dense(self.d_model, use_bias=False, name="wo")(h)


class T5EncoderBlock(nn.Module):
    d_model: int
    num_heads: int
    d_kv: int
    d_ff: int
    gated_act: bool = True
    act_fn: str = "gelu_new"
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        position_bias: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        normed = T5LayerNorm(name="ln_attn")(hidden_states)
        attn = T5Attention(
            self.d_model, self.num_heads, self.d_kv, self.dropout,
            name="attention",
        )(normed, position_bias, train=train)
        hidden_states = hidden_states + nn.Dropout(rate=self.dropout)(
            attn, deterministic=not train
        )

        normed = T5LayerNorm(name="ln_ff")(hidden_states)
        ff = T5FF(
            self.d_model, self.d_ff, self.gated_act, self.act_fn, self.dropout,
            name="ff",
        )(normed, train=train)
        return hidden_states + nn.Dropout(rate=self.dropout)(
            ff, deterministic=not train
        )


class T5EncoderStack(nn.Module):
    """token ids -> last_hidden_state, matching HF
    `T5EncoderModel(...).last_hidden_state` under converted weights.

    `attention_bias` is the framework's additive padding bias
    (0 / -10e4, shape (bs, 1, 1, L)); it is added onto the shared
    relative-position bias exactly where HF adds the extended attention
    mask (modeling_t5.py:549)."""

    vocab_size: int
    d_model: int
    num_layers: int
    num_heads: int
    d_kv: int = 64
    d_ff: Optional[int] = None
    num_buckets: int = 32
    max_distance: int = 128
    gated_act: bool = True
    act_fn: str = "gelu_new"
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        token_ids: jnp.ndarray,
        attention_bias: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        d_ff = self.d_ff or 4 * self.d_model
        seq_len = token_ids.shape[1]

        embedded = nn.Embed(
            self.vocab_size, self.d_model, embedding_init=_normal,
            name="token_embed",
        )(token_ids)
        hidden = nn.Dropout(rate=self.dropout)(embedded, deterministic=not train)

        # layer-0's relative_attention_bias, shared by every layer
        bias_table = nn.Embed(
            self.num_buckets, self.num_heads, embedding_init=_normal,
            name="relative_attention_bias",
        )
        buckets = jnp.asarray(
            encoder_bucket_table(seq_len, self.num_buckets, self.max_distance),
            jnp.int32,
        )
        position_bias = bias_table(buckets)  # (L, L, H)
        position_bias = jnp.transpose(position_bias, (2, 0, 1))[None]
        if attention_bias is not None:
            position_bias = position_bias + attention_bias

        for i in range(self.num_layers):
            hidden = T5EncoderBlock(
                self.d_model, self.num_heads, self.d_kv, d_ff,
                self.gated_act, self.act_fn, self.dropout,
                name=f"block_{i}",
            )(hidden, position_bias, train=train)

        hidden = T5LayerNorm(name="final_layer_norm")(hidden)
        return nn.Dropout(rate=self.dropout)(hidden, deterministic=not train)
