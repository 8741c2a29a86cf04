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


def _reference_bf16(q, k, v, bias, scale):
    """Same op order as the kernel: bf16 dot operands, f32 accumulate (the
    kernel matches XLA's default matmul precision, which rounds f32 MXU
    operands to bf16 — on CPU interpret mode the f32 reference differs by
    bf16 rounding, so compare against bf16-operand semantics)."""
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) * scale
    if bias is not None:
        logits = logits + bias
    w = jax.nn.softmax(logits, -1).astype(jnp.bfloat16)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", w, v.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


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
    want = _reference_bf16(q, k, v, bias, scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(want), atol=2e-4)
    # and against the f32 reference at bf16-rounding tolerance
    want_f32 = _reference(q, k, v, bias, scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(want_f32), atol=4e-2)


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
    # the backward itself is exact f32 XLA math; the residual difference is
    # the bf16-rounded forward output entering the cotangent (g = 2*out)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-2, rtol=2e-2)


def test_should_use_fused_heuristic():
    from openvivqa_tpu.ops.fused_attention import (
        fused_attention_wins,
        should_use_fused,
    )

    # measured crossover: ViT/BERT/MMT streams win, MCAN's 100-key stream
    # stays on XLA
    assert fused_attention_wins(384, 384, 96)
    assert fused_attention_wins(512, 512, 96)
    assert fused_attention_wins(197, 197, 64)
    assert not fused_attention_wins(100, 100, 64)

    # VMEM planning: big shapes get a q-block or are rejected
    from openvivqa_tpu.ops.fused_attention import (
        packed_attention_viable,
        plan_q_block,
    )

    assert plan_q_block(512, 512, 768, full_bias=True) == 256
    # beyond ~640 keys at hd=768 the full-key K/V blocks no longer fit the
    # budget — the packed kernel needs key streaming there, so it declines
    assert plan_q_block(1024, 1024, 768, full_bias=True) is None
    assert packed_attention_viable(197, 197, 768, 12)
    assert packed_attention_viable(640, 640, 768, 8)
    assert not packed_attention_viable(1024, 1024, 768, 8)

    import importlib
    import os
    from unittest import mock

    # `import ... as fa` would resolve the package attribute, which the
    # ops/__init__ re-export shadows with the custom_vjp function
    fa = importlib.import_module("openvivqa_tpu.ops.fused_attention")

    old = os.environ.pop("OPENVIVQA_FUSED_ATTENTION", None)
    try:
        with mock.patch.object(fa, "_on_tpu", lambda: True):
            assert should_use_fused(512, 512, 96)
            assert not should_use_fused(100, 100, 64)
            os.environ["OPENVIVQA_FUSED_ATTENTION"] = "1"
            assert should_use_fused(100, 100, 64)
            os.environ["OPENVIVQA_FUSED_ATTENTION"] = "0"
            assert not should_use_fused(512, 512, 96)
        # never fuses off-TPU (Mosaic won't lower)
        with mock.patch.object(fa, "_on_tpu", lambda: False):
            os.environ["OPENVIVQA_FUSED_ATTENTION"] = "1"
            assert not should_use_fused(512, 512, 96)
    finally:
        if old is None:
            os.environ.pop("OPENVIVQA_FUSED_ATTENTION", None)
        else:
            os.environ["OPENVIVQA_FUSED_ATTENTION"] = old


@pytest.mark.parametrize(
    "b,h,sq,sk,d,bias_shape",
    [
        (2, 4, 16, 16, 8, None),
        (2, 4, 24, 24, 8, (2, 1, 1, 24)),   # key-padding bias
        (1, 2, 32, 32, 16, (1, 1, 32, 32)), # full prefix-LM-style bias
    ],
)
def test_packed_attention_matches_xla(b, h, sq, sk, d, bias_shape):
    from openvivqa_tpu.ops.fused_attention import fused_attention_packed

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(b, sq, h * d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, sk, h * d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, sk, h * d)).astype(np.float32))
    bias = None
    if bias_shape is not None:
        mask = rng.random(bias_shape) < 0.2
        bias = jnp.asarray(mask.astype(np.float32) * MASK_VALUE)
    scale = 1.0 / np.sqrt(d)

    def xla_ref(q, k, v, bias):
        qh = q.reshape(b, sq, h, d)
        kh = k.reshape(b, sk, h, d)
        vh = v.reshape(b, sk, h, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * scale
        if bias is not None:
            logits = logits + bias
        w = jax.nn.softmax(logits, -1)
        return jnp.einsum("bhqk,bkhd->bqhd", w, vh).reshape(b, sq, h * d)

    with pltpu.force_tpu_interpret_mode():
        ours = fused_attention_packed(q, k, v, bias, scale, h)
    want = xla_ref(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(want), atol=4e-2)


def test_packed_attention_gradients():
    from openvivqa_tpu.ops.fused_attention import fused_attention_packed

    rng = np.random.default_rng(4)
    b, h, sq, sk, d = 1, 2, 8, 12, 8
    q = jnp.asarray(rng.normal(size=(b, sq, h * d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, sk, h * d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, sk, h * d)).astype(np.float32))
    bias = jnp.asarray(
        (rng.random((b, 1, 1, sk)) < 0.2).astype(np.float32) * MASK_VALUE
    )
    scale = 1.0 / np.sqrt(d)

    def loss_fused(q, k, v, bias):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fused_attention_packed(q, k, v, bias, scale, h) ** 2)

    def loss_ref(q, k, v, bias):
        qh = q.reshape(b, sq, h, d)
        kh = k.reshape(b, sk, h, d)
        vh = v.reshape(b, sk, h, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * scale + bias
        w = jax.nn.softmax(logits, -1)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, vh).reshape(b, sq, h * d)
        return jnp.sum(out ** 2)

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=2e-2, rtol=2e-2
        )


def test_packed_dropout_rate0_matches_packed():
    """The dropout kernel at rate 0 is the plain packed kernel (interpret
    mode stubs the TPU PRNG with zeros, so only the rate-0 path is testable
    off-chip; the full dropout numerics run on hardware via
    scripts/validate_dropout_kernel.py)."""
    from openvivqa_tpu.ops.fused_attention import (
        fused_attention_packed,
        fused_attention_packed_dropout,
    )

    b, h, sq, sk, d = 2, 2, 16, 16, 8
    rng = np.random.default_rng(6)
    q = jnp.asarray(rng.normal(size=(b, sq, h * d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, sk, h * d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, sk, h * d)).astype(np.float32))
    bias = jnp.asarray(
        (rng.random((b, 1, 1, sk)) < 0.2).astype(np.float32) * MASK_VALUE
    )
    seed = jnp.asarray([7], jnp.int32)
    scale = 1.0 / np.sqrt(d)
    with pltpu.force_tpu_interpret_mode():
        want = fused_attention_packed(q, k, v, bias, scale, h)
        got = fused_attention_packed_dropout(q, k, v, bias, seed, scale, h, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_dropout_plan_shares_fwd_bwd_partition():
    from openvivqa_tpu.ops.fused_attention import (
        dropout_attention_viable,
        plan_dropout_q_block,
    )

    # the partition defines the PRNG streams, so one plan serves both
    # passes; MMT production shapes must stay viable
    assert plan_dropout_q_block(512, 512, 768) is not None
    assert plan_dropout_q_block(384, 384, 768) is not None
    assert dropout_attention_viable(512, 512, 768, 8)
    assert not dropout_attention_viable(4096, 4096, 768, 8)


@pytest.mark.parametrize("head_bias_batch", [1, 2])
def test_packed_2bias_matches_xla(head_bias_batch):
    """The per-head-bias packed kernel (T5 relative-position / DeBERTa
    disentangled terms) reproduces the XLA reference with BOTH biases."""
    from openvivqa_tpu.ops.fused_attention import fused_attention_packed_2bias

    b, h, sq, sk, d = 2, 4, 16, 16, 8
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.normal(size=(b, sq, h * d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, sk, h * d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, sk, h * d)).astype(np.float32))
    shared = jnp.asarray(
        (rng.random((b, 1, 1, sk)) < 0.2).astype(np.float32) * MASK_VALUE
    )
    head_bias = jnp.asarray(
        rng.normal(size=(head_bias_batch, h, sq, sk)).astype(np.float32)
    )
    scale = 1.0 / np.sqrt(d)

    def xla_ref():
        qh = q.reshape(b, sq, h, d)
        kh = k.reshape(b, sk, h, d)
        vh = v.reshape(b, sk, h, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * scale
        logits = logits + shared + head_bias
        w = jax.nn.softmax(logits, -1)
        return jnp.einsum("bhqk,bkhd->bqhd", w, vh).reshape(b, sq, h * d)

    with pltpu.force_tpu_interpret_mode():
        ours = fused_attention_packed_2bias(q, k, v, shared, head_bias, scale, h)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(xla_ref()), atol=4e-2
    )


def test_packed_2bias_gradients():
    from openvivqa_tpu.ops.fused_attention import fused_attention_packed_2bias

    b, h, sq, sk, d = 1, 2, 8, 8, 8
    rng = np.random.default_rng(12)
    q = jnp.asarray(rng.normal(size=(b, sq, h * d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, sk, h * d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, sk, h * d)).astype(np.float32))
    head_bias = jnp.asarray(rng.normal(size=(1, h, sq, sk)).astype(np.float32))
    scale = 1.0 / np.sqrt(d)

    def loss_fused(q, k, v, hb):
        with pltpu.force_tpu_interpret_mode():
            out = fused_attention_packed_2bias(q, k, v, None, hb, scale, h)
        return jnp.sum(out * jnp.cos(out))

    def loss_ref(q, k, v, hb):
        qh = q.reshape(b, sq, h, d)
        kh = k.reshape(b, sk, h, d)
        vh = v.reshape(b, sk, h, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * scale + hb
        w = jax.nn.softmax(logits, -1)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, vh).reshape(b, sq, h * d)
        return jnp.sum(out * jnp.cos(out))

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, head_bias)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, head_bias)
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_), atol=5e-2)


@pytest.mark.parametrize(
    "b,h,sq,sk,d,bias_shape",
    [
        (1, 2, 32, 128, 8, None),
        (2, 2, 16, 192, 8, (2, 1, 1, 192)),
        (1, 4, 64, 256, 16, (1, 1, 64, 256)),
    ],
)
def test_streamed_attention_matches_xla(b, h, sq, sk, d, bias_shape):
    """Online-softmax key streaming reproduces the one-shot softmax."""
    from openvivqa_tpu.ops.fused_attention import (
        fused_attention_packed_streamed,
        plan_streamed_blocks,
    )

    assert plan_streamed_blocks(sq, sk, h * d, h) is not None
    rng = np.random.default_rng(21)
    q = jnp.asarray(rng.normal(size=(b, sq, h * d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, sk, h * d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, sk, h * d)).astype(np.float32))
    bias = None
    if bias_shape is not None:
        mask = rng.random(bias_shape) < 0.2
        bias = jnp.asarray(mask.astype(np.float32) * MASK_VALUE)
    scale = 1.0 / np.sqrt(d)

    def xla_ref():
        qh = q.reshape(b, sq, h, d)
        kh = k.reshape(b, sk, h, d)
        vh = v.reshape(b, sk, h, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * scale
        if bias is not None:
            logits = logits + bias
        w = jax.nn.softmax(logits, -1)
        return jnp.einsum("bhqk,bkhd->bqhd", w, vh).reshape(b, sq, h * d)

    with pltpu.force_tpu_interpret_mode():
        ours = fused_attention_packed_streamed(q, k, v, bias, scale, h)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(xla_ref()), atol=4e-2
    )


def test_streamed_engages_beyond_packed_vmem():
    """The regime the streaming kernel exists for: full-key blocks too big
    for the packed plan, streaming plan still viable."""
    from openvivqa_tpu.ops.fused_attention import (
        packed_attention_viable,
        streamed_attention_viable,
    )

    sq = sk = 1024
    hd, h = 768, 8
    assert not packed_attention_viable(sq, sk, hd, h)
    assert streamed_attention_viable(sq, sk, hd, h)


@pytest.mark.parametrize(
    "b,h,sq,sk,d,bias_shape",
    [
        (1, 2, 32, 128, 8, None),
        (2, 2, 16, 192, 8, (2, 1, 1, 192)),
        (1, 2, 64, 128, 16, (1, 1, 64, 128)),
    ],
)
def test_streamed_backward_matches_xla(b, h, sq, sk, d, bias_shape):
    """The streamed kernel's VJP (Pallas forward + analytic XLA backward —
    a full Pallas backward was measured slower everywhere, see the module
    comment) reproduces the reference gradients including dbias."""
    from openvivqa_tpu.ops.fused_attention import (
        fused_attention_packed_streamed,
    )
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(b, sq, h * d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, sk, h * d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, sk, h * d)).astype(np.float32))
    bias = None
    if bias_shape is not None:
        mask = rng.random(bias_shape) < 0.2
        bias = jnp.asarray(mask.astype(np.float32) * MASK_VALUE)
    scale = 1.0 / np.sqrt(d)
    cot = jnp.asarray(rng.normal(size=(b, sq, h * d)).astype(np.float32))

    def xla_ref(q, k, v, bias):
        qh = q.reshape(b, sq, h, d)
        kh = k.reshape(b, sk, h, d)
        vh = v.reshape(b, sk, h, d)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", qh, kh,
            preferred_element_type=jnp.float32,
        ) * scale
        if bias is not None:
            logits = logits + bias
        w = jax.nn.softmax(logits, -1)
        return jnp.einsum("bhqk,bkhd->bqhd", w, vh).reshape(b, sq, h * d)

    def loss_ours(q, k, v, bias):
        return jnp.sum(fused_attention_packed_streamed(q, k, v, bias, scale, h) * cot)

    def loss_ref(q, k, v, bias):
        return jnp.sum(xla_ref(q, k, v, bias) * cot)

    argnums = (0, 1, 2) if bias is None else (0, 1, 2, 3)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_ours, argnums=argnums)(q, k, v, bias)
    want = jax.grad(loss_ref, argnums=argnums)(q, k, v, bias)
    for g_got, g_want in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_want), atol=6e-2
        )
