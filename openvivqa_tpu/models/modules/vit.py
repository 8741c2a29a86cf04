"""Pre-LN ViT encoder stack (flax.linen).

Faithful to the HF ``ViTModel`` backbone the reference freezes in
ViTEmbedding (vision_embeddings.py:86-111): LN-before -> self-attention ->
residual, LN-after -> MLP(GELU) -> residual, and a final LayerNorm on the
encoder output (what ``last_hidden_state`` returns).  This differs from the
post-LN BERT stack in bert.py — converting HF ViT weights requires the
pre-LN topology.  Weight conversion lives in hf_conversion.py
(`convert_vit_weights`) and is verified numerically against a torch
ViTModel in tests/test_hf_conversion.py.

TPU notes: attention logits accumulate in f32 via preferred_element_type;
197-token streams keep both einsums MXU-shaped.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

LN_EPS = 1e-12  # ViTConfig.layer_norm_eps default
_normal = nn.initializers.normal(stddev=0.02)


class ViTAttention(nn.Module):
    hidden_size: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        head_dim = self.hidden_size // self.num_heads

        qp = nn.Dense(self.hidden_size, kernel_init=_normal, name="query")(x)
        kp = nn.Dense(self.hidden_size, kernel_init=_normal, name="key")(x)
        vp = nn.Dense(self.hidden_size, kernel_init=_normal, name="value")(x)

        from ...ops.fused_attention import (
            fused_attention_packed,
            packed_attention_viable,
            should_use_fused,
        )

        # ViT-base's 197-token stream clears the packed-kernel crossover
        # (1.46x over XLA on v5e, ops/fused_attention.py); the backbone
        # runs frozen/eval so the no-dropout path suffices
        if (
            should_use_fused(x.shape[1], x.shape[1], head_dim)
            and (not train or self.dropout == 0.0)
            and packed_attention_viable(
                x.shape[1], x.shape[1], self.hidden_size, self.num_heads
            )
        ):
            context = fused_attention_packed(
                qp, kp, vp, None, 1.0 / math.sqrt(head_dim), self.num_heads
            )
        else:
            def split(t):
                return t.reshape(
                    t.shape[0], t.shape[1], self.num_heads, head_dim
                )

            q, k, v = split(qp), split(kp), split(vp)
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) / math.sqrt(head_dim)
            weights = jax.nn.softmax(logits, axis=-1)
            weights = nn.Dropout(rate=self.dropout)(
                weights, deterministic=not train
            )
            context = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
            context = context.reshape(x.shape[0], x.shape[1], self.hidden_size)
        return nn.Dense(self.hidden_size, kernel_init=_normal, name="out")(context)


class ViTLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: Optional[int] = None
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        attn = ViTAttention(
            self.hidden_size, self.num_heads, self.dropout, name="attention"
        )(nn.LayerNorm(epsilon=LN_EPS, name="layernorm_before")(x), train=train)
        attn = nn.Dropout(rate=self.dropout)(attn, deterministic=not train)
        x = x + attn

        h = nn.LayerNorm(epsilon=LN_EPS, name="layernorm_after")(x)
        intermediate = jax.nn.gelu(
            nn.Dense(
                self.intermediate_size or 4 * self.hidden_size,
                kernel_init=_normal,
                name="intermediate",
            )(h),
            approximate=False,
        )
        out = nn.Dense(self.hidden_size, kernel_init=_normal, name="output")(
            intermediate
        )
        out = nn.Dropout(rate=self.dropout)(out, deterministic=not train)
        return x + out


class ViTEncoder(nn.Module):
    """Layer stack + the ViTModel final LayerNorm (last_hidden_state)."""

    hidden_size: int
    num_layers: int
    num_heads: int
    intermediate_size: Optional[int] = None
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = ViTLayer(
                self.hidden_size,
                self.num_heads,
                self.intermediate_size,
                self.dropout,
                name=f"layer_{i}",
            )(x, train=train)
        return nn.LayerNorm(epsilon=LN_EPS, name="final_layernorm")(x)
