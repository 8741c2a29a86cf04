"""Positional embeddings (parity: /root/reference/models/modules/pos_embeddings.py)."""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class SinusoidPositionalEmbedding(nn.Module):
    """DETR-style 1D sinusoid over sequence positions
    (pos_embeddings.py:40-73 parity): position p = cumulative count of
    unmasked slots, dim t scaled by temperature^(2*(t//2)/num_pos_feats),
    even dims sin / odd dims cos interleaved."""

    num_pos_feats: int = 64
    temperature: float = 10000.0
    normalize: bool = False
    scale: Optional[float] = None

    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        bs, length = x.shape[0], x.shape[1]
        if mask is None:
            not_mask = jnp.ones((bs, length), dtype=jnp.float32)
        else:
            not_mask = (~mask).astype(jnp.float32)
        embed = jnp.cumsum(not_mask, axis=1)
        if self.normalize:
            scale = self.scale if self.scale is not None else 2 * math.pi
            embed = embed / (embed[:, -1:] + 1e-6) * scale

        dim_t = jnp.arange(self.num_pos_feats, dtype=jnp.float32)
        dim_t = self.temperature ** (2 * (dim_t // 2) / self.num_pos_feats)
        pos = embed[:, :, None] / dim_t  # (bs, L, num_pos_feats)
        pos = jnp.stack([jnp.sin(pos[:, :, 0::2]), jnp.cos(pos[:, :, 1::2])], axis=-1)
        return pos.reshape(bs, length, -1)

    def encode_positions(self, values: jnp.ndarray) -> jnp.ndarray:
        """Same sinusoid formula for explicit (bs, L) position VALUES
        (1-based, matching the cumsum above) — used by incremental decode
        where one token sits at a dynamic absolute position."""
        bs, length = values.shape
        dim_t = jnp.arange(self.num_pos_feats, dtype=jnp.float32)
        dim_t = self.temperature ** (2 * (dim_t // 2) / self.num_pos_feats)
        pos = values.astype(jnp.float32)[:, :, None] / dim_t
        pos = jnp.stack(
            [jnp.sin(pos[:, :, 0::2]), jnp.cos(pos[:, :, 1::2])], axis=-1
        )
        return pos.reshape(bs, length, -1)


class LearnedPositionalEmbedding(nn.Module):
    """Learned additive positions (pos_embeddings.py:26-38 parity).

    Call-site-free like its reference counterpart — inventoried by
    SURVEY.md §2.4 and kept for parity; live models use the masks.py /
    sinusoid machinery instead."""

    d_model: int
    dropout: float = 0.1
    max_len: int = 5000

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        table = self.param(
            "pe", nn.initializers.normal(stddev=1.0), (1, self.max_len, self.d_model)
        )
        out = x + table[:, : x.shape[1]]
        return nn.Dropout(rate=self.dropout)(out, deterministic=not train)


def interleaved_sincos_table(max_len: int, d_model: int) -> np.ndarray:
    """Transformer sin/cos table with exp-log frequency spacing
    (pos_embeddings.py:6-24 parity).  Call-site-free parity artifact:
    numerically equal to masks.sinusoid_encoding_table, which additionally
    supports padding_idx and is what live modules use — new code should
    call THAT, not this."""
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * (-math.log(10000.0) / d_model)
    )
    table = np.zeros((max_len, d_model), dtype=np.float32)
    table[:, 0::2] = np.sin(position * div_term)
    table[:, 1::2] = np.cos(position * div_term)
    return table
