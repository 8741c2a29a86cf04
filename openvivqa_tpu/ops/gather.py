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
    """table (bs, N, d), ids (bs, L) int -> (bs, L, d)."""
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
    return jnp.take_along_axis(table, ids[..., None], axis=1)
