"""ALBERT encoder stack (flax.linen), architecture-faithful to HF
AlbertModel.

The reference wraps a real HF ALBERT (`AlbertEmbedding`,
text_embeddings.py:363-397).  Key semantics reproduced here (verified vs
torch in tests/test_hf_conversion.py):

* factorised embeddings: word/pos/type tables at `embedding_size` (128 for
  released checkpoints), LN(1e-12), dropout, then ONE Dense
  `embedding_hidden_mapping_in` to hidden_size (modeling_albert.py
  AlbertTransformer.forward applies the mapping — the reference's
  TextAlbert adds a second, dimensionally-broken mapping of its own; we
  implement the correct single-mapping HF semantics and document that
  divergence);
* cross-layer parameter sharing: num_hidden_groups groups of
  inner_group_num layers; layer i uses group i*groups//num_layers (all
  released checkpoints: 1 group, 1 inner layer applied num_layers times);
* post-LN BERT-style layer with scaled dot-product attention and gelu_new
  FFN activation.

TPU note: sharing means the loop re-applies the SAME weights — under jit
XLA still unrolls to num_layers matmul groups; weight reuse cuts HBM param
traffic ~num_layers-fold vs BERT.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

LN_EPS = 1e-12
_normal = nn.initializers.normal(stddev=0.02)


class AlbertEmbeddings(nn.Module):
    """Word + position + type at embedding_size, LN, dropout
    (modeling_albert.py:176-242)."""

    vocab_size: int
    embedding_size: int = 128
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        token_ids: jnp.ndarray,
        token_type_ids: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        seq_len = token_ids.shape[1]
        words = nn.Embed(
            self.vocab_size, self.embedding_size, embedding_init=_normal,
            name="word_embeddings",
        )(token_ids)
        positions = nn.Embed(
            self.max_position_embeddings, self.embedding_size,
            embedding_init=_normal, name="position_embeddings",
        )(jnp.arange(seq_len)[None, :])
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(token_ids)
        types = nn.Embed(
            self.type_vocab_size, self.embedding_size, embedding_init=_normal,
            name="token_type_embeddings",
        )(token_type_ids)
        out = nn.LayerNorm(epsilon=LN_EPS, name="LayerNorm")(
            words + positions + types
        )
        return nn.Dropout(rate=self.dropout)(out, deterministic=not train)


class AlbertLayer(nn.Module):
    """One shared transformer layer: post-LN attention + gelu_new FFN
    (modeling_albert.py:244-455)."""

    hidden_size: int
    num_heads: int
    intermediate_size: int
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        attention_bias: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        head_dim = self.hidden_size // self.num_heads

        def heads(x):
            return x.reshape(x.shape[0], x.shape[1], self.num_heads, head_dim)

        q = heads(nn.Dense(self.hidden_size, name="query")(hidden_states))
        k = heads(nn.Dense(self.hidden_size, name="key")(hidden_states))
        v = heads(nn.Dense(self.hidden_size, name="value")(hidden_states))
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(float(head_dim))
        if attention_bias is not None:
            logits = logits + attention_bias
        weights = jax.nn.softmax(logits, axis=-1).astype(hidden_states.dtype)
        weights = nn.Dropout(rate=self.dropout)(weights, deterministic=not train)
        context = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        context = context.reshape(
            context.shape[0], context.shape[1], self.hidden_size
        )
        projected = nn.Dense(self.hidden_size, name="attn_dense")(context)
        projected = nn.Dropout(rate=self.dropout)(
            projected, deterministic=not train
        )
        attn_out = nn.LayerNorm(epsilon=LN_EPS, name="attn_LayerNorm")(
            hidden_states + projected
        )

        ffn = jax.nn.gelu(
            nn.Dense(self.intermediate_size, name="ffn")(attn_out),
            approximate=True,  # gelu_new (ALBERT default hidden_act)
        )
        ffn = nn.Dense(self.hidden_size, name="ffn_output")(ffn)
        return nn.LayerNorm(epsilon=LN_EPS, name="full_layer_LayerNorm")(
            ffn + attn_out
        )


class AlbertEncoderStack(nn.Module):
    """token ids -> last_hidden_state, matching HF AlbertModel (without the
    pooler) under converted weights."""

    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    embedding_size: int = 128
    intermediate_size: Optional[int] = None
    num_groups: int = 1
    inner_group_num: int = 1
    max_position_embeddings: int = 512
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        token_ids: jnp.ndarray,
        attention_bias: Optional[jnp.ndarray] = None,
        token_type_ids: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        intermediate = self.intermediate_size or 4 * self.hidden_size
        embedded = AlbertEmbeddings(
            self.vocab_size, self.embedding_size,
            self.max_position_embeddings, dropout=self.dropout,
            name="embeddings",
        )(token_ids, token_type_ids=token_type_ids, train=train)
        hidden = nn.Dense(self.hidden_size, name="embedding_hidden_mapping_in")(
            embedded
        )

        # instantiate the shared groups ONCE; re-applying a module instance
        # reuses its params (flax setup-free sharing via static names)
        groups = [
            [
                AlbertLayer(
                    self.hidden_size, self.num_heads, intermediate,
                    self.dropout, name=f"group_{g}_layer_{j}",
                )
                for j in range(self.inner_group_num)
            ]
            for g in range(self.num_groups)
        ]
        for i in range(self.num_layers):
            group_idx = i * self.num_groups // self.num_layers
            for layer in groups[group_idx]:
                hidden = layer(hidden, attention_bias=attention_bias, train=train)
        return hidden
