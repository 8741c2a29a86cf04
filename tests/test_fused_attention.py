"""Pallas fused attention: numerical parity with the XLA reference (run in
interpreter mode on CPU) and gradient correctness via the custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from openvivqa_tpu.models.modules.masks import MASK_VALUE
from openvivqa_tpu.ops.fused_attention import fused_attention


def _reference(q, k, v, bias, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if bias is not None:
        logits = logits + bias
    return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1), v)


@pytest.mark.parametrize(
    "b,h,sq,sk,d,bias_shape",
    [
        (2, 2, 16, 16, 32, None),
        (2, 2, 10, 37, 64, (2, 1, 1, 37)),       # padding bias broadcast
        (1, 4, 50, 50, 64, (1, 1, 50, 50)),      # causal-style full bias
        (2, 2, 7, 20, 48, (2, 2, 7, 20)),        # per-head full bias
    ],
)
def test_fused_attention_matches_xla(b, h, sq, sk, d, bias_shape):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, h, sq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, sk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, sk, d)).astype(np.float32))
    bias = None
    if bias_shape is not None:
        mask = rng.random(bias_shape) < 0.2
        bias = jnp.asarray(mask.astype(np.float32) * MASK_VALUE)
    scale = 1.0 / np.sqrt(d)

    with pltpu.force_tpu_interpret_mode():
        ours = fused_attention(q, k, v, bias, scale)
    want = _reference(q, k, v, bias, scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(want), atol=2e-5)


def test_fused_attention_gradients():
    rng = np.random.default_rng(1)
    b, h, sq, sk, d = 1, 2, 8, 12, 16
    q = jnp.asarray(rng.normal(size=(b, h, sq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, sk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, sk, d)).astype(np.float32))
    bias = jnp.asarray(
        (rng.random((b, 1, 1, sk)) < 0.2).astype(np.float32) * MASK_VALUE
    )
    scale = 1.0 / np.sqrt(d)

    def loss_fused(q, k, v, bias):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fused_attention(q, k, v, bias, scale) ** 2)

    def loss_ref(q, k, v, bias):
        return jnp.sum(_reference(q, k, v, bias, scale) ** 2)

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-4)
