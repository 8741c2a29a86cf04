"""Additive attention-bias helpers, sinusoid tables, geometry embeddings.

Behavioural parity with /root/reference/models/utils.py:32-162: the additive
mask convention is a float bias of 0 (attend) or -10e4 (=-1e5, masked) added
to the pre-softmax logits, padding detection sums the trailing dim and
compares with padding_idx * dim, and the sinusoid table interleaves sin/cos.
All functions are jittable with static shapes.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

# the reference writes -10e4 (i.e. -1e5); kept bit-identical for parity.
# CANONICAL copy — ops/fused_attention.py and ops/decode_step.py hold
# equal duplicates (ops cannot import models without a cycle)
MASK_VALUE = -10e4


def padding_bias(sequences: jnp.ndarray, padding_idx: int) -> jnp.ndarray:
    """Additive padding bias of shape (bs, 1, 1, L).

    `sequences` is (bs, L) int tokens or (bs, L, D) float features; a
    position is padding when the sum over the trailing dim equals
    padding_idx * D (models/utils.py:44-57 parity — for features this means
    an all-zero row when padding_idx == 0).
    """
    if sequences.ndim == 2:
        seq3 = sequences[..., None]
    else:
        seq3 = sequences
    is_pad = jnp.sum(seq3, axis=-1) == (padding_idx * seq3.shape[-1])
    bias = is_pad.astype(jnp.float32) * MASK_VALUE
    return bias[:, None, None, :]


def validity_to_bias(validity_mask: jnp.ndarray) -> jnp.ndarray:
    """(bs, L) 1-valid/0-pad mask (e.g. an HF tokenizer attention_mask) ->
    additive (bs, 1, 1, L) bias.  The canonical conversion — callers must
    not re-derive it with a hardcoded mask constant."""
    return ((1.0 - validity_mask) * MASK_VALUE)[:, None, None, :]


def causal_bias(seq_len: int) -> jnp.ndarray:
    """Additive causal bias (1, 1, L, L): future positions get MASK_VALUE."""
    upper = jnp.triu(jnp.ones((seq_len, seq_len), dtype=jnp.float32), k=1)
    return (upper * MASK_VALUE)[None, None, :, :]


def combine_biases(*biases: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """Logical-or combine additive biases (models/utils.py:68-73 parity):
    a position is masked if masked in any input; output is 0/MASK_VALUE."""
    present = [b for b in biases if b is not None]
    if not present:
        return None
    masked = present[0] != 0
    for bias in present[1:]:
        masked = jnp.logical_or(masked, bias != 0)
    return masked.astype(jnp.float32) * MASK_VALUE


def prefix_lm_bias(
    prefix_bias: jnp.ndarray,
    answer_col_bias: jnp.ndarray,
    answer_block_bias: jnp.ndarray,
) -> jnp.ndarray:
    """(bs,1,L,L) additive bias for single-stream prefix-LM models
    (base_unique_transformer.py:29-40 layout): every row attends columns by
    their padding bias; the answer x answer block is the causal+padding
    block."""
    cols = jnp.concatenate([prefix_bias, answer_col_bias], axis=-1)
    total = cols.shape[-1]
    ans_len = answer_col_bias.shape[-1]
    full = jnp.broadcast_to(cols, cols.shape[:2] + (total, total))
    block = jnp.broadcast_to(
        answer_block_bias, answer_block_bias.shape[:2] + (ans_len, ans_len)
    )
    return full.at[:, :, -ans_len:, -ans_len:].set(block)


def sinusoid_encoding_table(
    max_len: int, d_model: int, padding_idx: Optional[int] = None
) -> np.ndarray:
    """Interleaved sin/cos table (models/utils.py:22-38 parity): row p has
    sin(p / 10000^(2i/d)) at even columns and cos at odd columns."""
    positions = np.arange(max_len, dtype=np.float32)[:, None]
    dims = np.arange(d_model // 2, dtype=np.float32)[None, :]
    angle = positions / np.power(10000.0, 2 * dims / d_model)
    table = np.zeros((max_len, d_model), dtype=np.float32)
    table[:, 0::2] = np.sin(angle)
    table[:, 1::2] = np.cos(angle)
    if padding_idx is not None:
        table[padding_idx] = 0.0
    return table


def box_relational_embedding(
    boxes: jnp.ndarray,
    dim_g: int = 64,
    wave_len: float = 1000.0,
    trignometric_embedding: bool = True,
) -> jnp.ndarray:
    """Pairwise box-geometry embedding (models/utils.py:102-162 parity).

    boxes: (bs, n, 4) as (x_min, y_min, x_max, y_max); returns
    (bs, n, n, dim_g) with log-scaled displacement features, optionally
    expanded with interleaved sin/cos at 8 frequencies.
    """
    x_min, y_min, x_max, y_max = jnp.split(boxes, 4, axis=-1)  # (bs, n, 1)
    cx = (x_min + x_max) * 0.5
    cy = (y_min + y_max) * 0.5
    w = (x_max - x_min) + 1.0
    h = (y_max - y_min) + 1.0

    delta_x = jnp.log(jnp.clip(jnp.abs((cx - cx.transpose(0, 2, 1)) / w), min=1e-3))
    delta_y = jnp.log(jnp.clip(jnp.abs((cy - cy.transpose(0, 2, 1)) / h), min=1e-3))
    delta_w = jnp.log(w / w.transpose(0, 2, 1))
    delta_h = jnp.log(h / h.transpose(0, 2, 1))

    position = jnp.stack([delta_x, delta_y, delta_w, delta_h], axis=-1)  # (bs,n,n,4)

    if not trignometric_embedding:
        return position

    bs, n = position.shape[0], position.shape[1]
    feat_range = jnp.arange(dim_g / 8, dtype=jnp.float32)
    dim_mat = 1.0 / jnp.power(wave_len, feat_range / (dim_g / 8))
    angles = (100.0 * position)[..., None] * dim_mat  # (bs,n,n,4,dim_g/8)
    angles = angles.reshape(bs, n, n, -1)
    return jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)


def grid_positions(grid_size) -> np.ndarray:
    """Normalised (0..1) box coordinates for a wxh grid
    (models/utils.py:79-100 parity, minus the hardcoded .cuda())."""
    w, h = grid_size
    x = np.arange(w, dtype=np.float32)
    y = np.arange(h, dtype=np.float32)
    px_min = np.repeat(x, w)
    py_min = np.tile(y, h)
    return np.stack(
        [px_min / w, py_min / h, (px_min + 1) / w, (py_min + 1) / h], axis=-1
    )
