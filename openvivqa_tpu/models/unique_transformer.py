"""UniqueTransformer — single-stream prefix-LM: modality-tagged vision
streams + question + appended answer with a causal sub-mask, one encoder,
outputs read off the answer positions.

Parity: /root/reference/models/unique_transformer.py:12-84 with
base_unique_transformer.py:8-70's append_answer mask layout: every row
attends prefix/answer columns by padding, and the answer x answer block is
causal+padding.  The reference's step() re-runs the full encoder per decode
step on a growing buffer (and its append_answer call is arity-broken);
here decode keeps a static-length answer buffer in the cache, masks the
not-yet-generated columns, and stays consistent with the training mask.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builders import (
    META_ARCHITECTURE,
    build_encoder,
    build_text_embedding,
)
from .base import BatchArrays, GenerativeModel
from .joint_transformer import ModalityStreams
from .modules.masks import (
    MASK_VALUE,
    causal_bias,
    combine_biases,
    padding_bias,
    prefix_lm_bias,
)

_xavier = nn.initializers.xavier_uniform()


class _TokenBuffer(nn.Module):
    """Static-length generated-token buffer in the 'cache' collection."""

    max_len: int

    @nn.compact
    def __call__(self, token: jnp.ndarray):
        bs = token.shape[0]
        buffer = self.variable(
            "cache", "tokens", lambda: jnp.zeros((bs, self.max_len), jnp.int32)
        )
        index = self.variable("cache", "index", lambda: jnp.zeros((), jnp.int32))
        i = index.value
        buffer.value = jax.lax.dynamic_update_slice(buffer.value, token, (0, i))
        index.value = i + 1
        return buffer.value, i


@META_ARCHITECTURE.register()
class UniqueTransformer(GenerativeModel):
    config: Any
    vocab: Any

    def setup(self):
        self.text_embedding = build_text_embedding(
            self.config.TEXT_EMBEDDING, self.vocab
        )
        self.streams = ModalityStreams(
            self.config, self.vocab, shared_text_embedding=self.text_embedding
        )
        self.encoder = build_encoder(self.config.ENCODER)
        self.fc = nn.Dense(len(self.vocab), use_bias=False, kernel_init=_xavier)
        self.token_buffer = _TokenBuffer(self.vocab.max_answer_length)

    def encode(self, batch: BatchArrays, train: bool = False):
        # pre-encoder joint prefix; the encoder itself runs with the answers
        return self.streams(batch, train=train)

    def __call__(self, batch: BatchArrays, train: bool = False) -> jnp.ndarray:
        joint, joint_bias = self.streams(batch, train=train)
        joint_len = joint.shape[1]

        answer_tokens = batch["answer_tokens"]
        answer_features, (answer_pad, _) = self.text_embedding(
            answer_tokens, train=train
        )
        answer_block = combine_biases(
            answer_pad, causal_bias(answer_tokens.shape[1])
        )

        features = jnp.concatenate([joint, answer_features], axis=1)
        bias = prefix_lm_bias(joint_bias, answer_pad, answer_block)
        out = self.encoder(features, bias, train=train)
        out = self.fc(out[:, joint_len:])
        return jax.nn.log_softmax(out, axis=-1)

    def decode_teacher_forced(
        self,
        tokens: jnp.ndarray,
        encoder_features: jnp.ndarray,
        encoder_attention_bias,
        train: bool = False,
    ) -> jnp.ndarray:
        """SCST re-scoring: the single-stream prefix-LM has no `decoder`
        submodule (the GenerativeModel default would dereference one) —
        re-run the joint encoder with the sampled answers appended, the
        __call__ layout with answer_tokens := tokens."""
        joint_len = encoder_features.shape[1]
        answer_features, (answer_pad, _) = self.text_embedding(
            tokens, train=train
        )
        answer_block = combine_biases(answer_pad, causal_bias(tokens.shape[1]))
        features = jnp.concatenate([encoder_features, answer_features], axis=1)
        bias = prefix_lm_bias(encoder_attention_bias, answer_pad, answer_block)
        out = self.encoder(features, bias, train=train)
        return jax.nn.log_softmax(self.fc(out[:, joint_len:]), axis=-1)

    def decode_step(self, token, encoder_features, encoder_attention_bias):
        joint_len = encoder_features.shape[1]
        buffer, i = self.token_buffer(token)
        max_len = buffer.shape[1]

        answer_features, _ = self.text_embedding(buffer)
        positions = jnp.arange(max_len)
        generated = jnp.where(positions <= i, 0.0, MASK_VALUE)[None, None, None, :]
        answer_col = combine_biases(
            padding_bias(buffer, self.vocab.padding_idx), generated
        )
        answer_block = combine_biases(answer_col, causal_bias(max_len))

        features = jnp.concatenate([encoder_features, answer_features], axis=1)
        bias = prefix_lm_bias(encoder_attention_bias, answer_col, answer_block)
        out = self.encoder(features, bias)
        current = jax.lax.dynamic_slice_in_dim(out, joint_len + i, 1, axis=1)
        return jax.nn.log_softmax(self.fc(current), axis=-1)
