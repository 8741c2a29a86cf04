"""Research one-off modules: SpatialCirclePosition (SCP) and
TextSemanticSeparate (TSS).

Parity targets: /root/reference/models/modules/SCP.py:9-112 and TSS.py:8-65.
Both are broken as checked out (SCP iterates `for batch in bs` over an int
and calls patch() with the wrong arity, SCP.py:90-93; TSS mixes token ids
with embeddings).  Here:

* SCP — OCR self-attention with a learned distance-bucket bias: box
  centroids are quantised onto an 11x11 image grid, pairwise euclidean
  patch distances index a per-head embedding added to the attention logits.
  Fully vectorised (the reference's O(bs*n^2) Python loops become two
  broadcasts).
* TSS — interleaves OCR token embeddings with learned <context> slots and
  sums the object/box streams into the context positions, producing the
  separated text-semantic stream.  The frozen T5 lookup becomes the data
  pipeline's embedding features (strings never cross jit).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attentions import ScaledDotProductAttention

_xavier = nn.initializers.xavier_uniform()


def quantise_to_patch_grid(boxes: jnp.ndarray, n_cells: int = 11) -> jnp.ndarray:
    """Box centroids -> centroid of their cell on an n_cells x n_cells grid
    (SCP.py:24-68 semantics, vectorised).  boxes are relative (0..1)."""
    cx = (boxes[..., 0] + boxes[..., 2]) * 0.5
    cy = (boxes[..., 1] + boxes[..., 3]) * 0.5
    cell_w = 1.0 / n_cells
    ix = jnp.clip(jnp.floor(cx / cell_w), 0, n_cells - 1)
    iy = jnp.clip(jnp.floor(cy / cell_w), 0, n_cells - 1)
    return jnp.stack(
        [ix * cell_w + cell_w / 2, iy * cell_w + cell_w / 2], axis=-1
    )  # (bs, n, 2)


from ...builders import META_ATTENTION


@META_ATTENTION.register()
class SpatialCirclePosition(ScaledDotProductAttention):
    """OCR self-attention + learned spatial-distance bias (SCP.py:9-112)."""

    config: Any

    def setup(self):
        super().setup()
        self.num_distance = int(self.config.get("NUM_DISTANCE", 16))
        self.dist_embedding = nn.Embed(
            self.num_distance, self.config.HEAD, embedding_init=_xavier
        )

    def __call__(
        self,
        ocr_features: jnp.ndarray,
        ocr_boxes: jnp.ndarray,
        ocr_padding_bias: jnp.ndarray,
        train: bool = False,
        **kwargs,
    ):
        patches = quantise_to_patch_grid(ocr_boxes)  # (bs, n, 2)
        delta = patches[:, :, None, :] - patches[:, None, :, :]
        dist = jnp.sqrt(jnp.sum(delta**2, axis=-1))  # (bs, n, n), 0..sqrt(2)
        buckets = jnp.clip(
            (dist * self.num_distance).astype(jnp.int32), 0, self.num_distance - 1
        )
        dist_bias = self.dist_embedding(buckets).transpose(0, 3, 1, 2)  # (bs,h,n,n)

        q = self.project_q(ocr_features)
        k, v = self.project_kv(ocr_features, ocr_features)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(float(self.d_k))
        logits = logits + ocr_padding_bias
        weights = jax.nn.softmax(logits + dist_bias, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        bs, _, n, _ = out.shape
        return self.fc_o(out.transpose(0, 2, 1, 3).reshape(bs, n, -1)), weights


class TextSemanticSeparate(nn.Module):
    """Interleave OCR embeddings with learned <context> slots and inject the
    object/box streams into the context positions (TSS.py:26-65 semantics)."""

    config: Any

    @nn.compact
    def __call__(
        self,
        obj_emb: jnp.ndarray,      # (bs, n, d)
        obj_box_emb: jnp.ndarray,  # (bs, n, d)
        ocr_emb: jnp.ndarray,      # (bs, n, d)
        ocr_box_emb: jnp.ndarray,  # (bs, n, d)
    ) -> jnp.ndarray:
        d_model = ocr_emb.shape[-1]
        context = self.param("context_embedding", _xavier, (1, 1, d_model))

        bs, n, _ = ocr_emb.shape
        combined = obj_emb + obj_box_emb + ocr_emb + ocr_box_emb
        # even positions: OCR token + streams; odd positions: context slot +
        # the same streams (TSS extends each stream over both slots)
        interleaved = jnp.zeros((bs, 2 * n, d_model), combined.dtype)
        interleaved = interleaved.at[:, 0::2].set(ocr_emb + combined)
        interleaved = interleaved.at[:, 1::2].set(
            jnp.broadcast_to(context, (bs, n, d_model)) + combined
        )
        return interleaved
