"""TPU-friendly batched row lookup.

TPU gathers execute on the scalar core; profiling the beam decode showed
them costing ~9 ms per (bs, N, d) gather per step (see training/decode.py).
On TPU, large float row-lookups are computed as one-hot matmuls (MXU work:
bs*L*N*d MACs is far cheaper than a scalar-core walk at these sizes);
elsewhere (CPU tests, small/int tables) the plain take_along_axis is used.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MIN_ROWS_FOR_MXU = 64


def take_rows(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """table (bs, N, d), ids (bs, L) int -> (bs, L, d).

    Out-of-range ids (< 0 or >= N) return all-zero rows on every backend
    (jax.nn.one_hot semantics); the take_along_axis fallback is normalized
    to match — its raw JAX behavior (NaN fill for ids >= N, wraparound for
    negatives) would let CPU-tested code behave differently on TPU."""
    if (
        jax.default_backend() == "tpu"
        and table.dtype in (jnp.float32, jnp.bfloat16)
        and table.shape[1] >= _MIN_ROWS_FOR_MXU
    ):
        onehot = jax.nn.one_hot(ids, table.shape[1], dtype=table.dtype)
        # HIGHEST precision: default (bf16-pass) matmuls round the selected
        # values (~8e-3 observed); one-hot selection at HIGHEST is bit-exact
        return jnp.einsum(
            "bln,bnd->bld", onehot, table,
            preferred_element_type=table.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
    valid = (ids >= 0) & (ids < table.shape[1])
    rows = jnp.take_along_axis(
        table, jnp.clip(ids, 0, table.shape[1] - 1)[..., None], axis=1
    )
    return jnp.where(valid[..., None], rows, jnp.zeros((), table.dtype))


def take_rows_shared(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """table (N, d) SHARED across the batch, ids (bs, L) int -> (bs, L, d).

    Unlike broadcasting the table to (bs, N, d) and calling take_rows, the
    one-hot matmul here has NO batch dimension on the table operand, so the
    N*d rows are read once per call instead of once per batch row — at a
    5k-row 768-wide answer table and bs 32 that is 15 MB of HBM traffic
    instead of 500 MB (measured ~1 ms/step of the MMF incremental decode).

    Out-of-range ids (< 0 or >= N) return all-zero rows on every backend
    (jax.nn.one_hot semantics) — callers stitch split [shared fixed ⊕
    per-sample] tables by summing two lookups."""
    if (
        jax.default_backend() == "tpu"
        and table.dtype in (jnp.float32, jnp.bfloat16)
        and table.shape[0] >= _MIN_ROWS_FOR_MXU
    ):
        onehot = jax.nn.one_hot(ids, table.shape[0], dtype=table.dtype)
        return jnp.einsum(
            "bln,nd->bld", onehot, table,
            preferred_element_type=table.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
    valid = (ids >= 0) & (ids < table.shape[0])
    rows = jnp.take(table, jnp.clip(ids, 0, table.shape[0] - 1), axis=0)
    return jnp.where(valid[..., None], rows, jnp.zeros((), table.dtype))
