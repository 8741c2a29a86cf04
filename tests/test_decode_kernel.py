"""Decode-step megakernel equivalence (interpret mode on CPU): the fused
self-attention / cross-attention / FFN step kernels must reproduce the XLA
decode path — identical beam tokens, matching log-probs — since they fuse
the exact same math (VERDICT r2 item 3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvivqa_tpu.ops.decode_step import (
    cross_attention_step_viable,
    ffn_step_viable,
    fused_cross_attention_step,
    fused_ffn_step,
    fused_self_attention_step,
    self_attention_step_viable,
)


def test_self_attention_step_matches_reference():
    rng = np.random.default_rng(0)
    bs, hd, h, T = 8, 64, 4, 6
    d = hd // h
    scale = 1.0 / np.sqrt(d)
    x = jnp.asarray(rng.normal(size=(bs, hd)).astype(np.float32))
    ws = {
        name: jnp.asarray(rng.normal(size=(hd, hd)).astype(np.float32) * 0.1)
        for name in ("wq", "wk", "wv", "wo")
    }
    bias = {
        name: jnp.asarray(rng.normal(size=(hd,)).astype(np.float32) * 0.1)
        for name in ("bq", "bk", "bv", "bo")
    }
    g = jnp.asarray(rng.normal(size=(hd,)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(hd,)).astype(np.float32) * 0.1)

    # pre-filled cache with 2 valid positions, stepping at t=2
    ck = jnp.asarray(rng.normal(size=(bs, T, hd)).astype(np.float32))
    cv = jnp.asarray(rng.normal(size=(bs, T, hd)).astype(np.float32))
    cb = jnp.zeros((bs, T), jnp.float32)
    t = jnp.asarray(2, jnp.int32)
    step_bias = jnp.zeros((bs,), jnp.float32)

    assert self_attention_step_viable(bs, T, hd)
    y, nk, nv, nb = fused_self_attention_step(
        x, ws["wq"], bias["bq"], ws["wk"], bias["bk"], ws["wv"], bias["bv"],
        ws["wo"], bias["bo"], g, b, step_bias, t, ck, cv, cb, scale, h,
        interpret=True,
    )

    # reference math
    q = x @ ws["wq"] + bias["bq"]
    k_new = x @ ws["wk"] + bias["bk"]
    v_new = x @ ws["wv"] + bias["bv"]
    ck_ref = ck.at[:, 2, :].set(k_new)
    cv_ref = cv.at[:, 2, :].set(v_new)
    np.testing.assert_allclose(np.asarray(nk), np.asarray(ck_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(nv), np.asarray(cv_ref), atol=1e-5)

    qh = q.reshape(bs, h, d)
    kh = ck_ref.reshape(bs, T, h, d)
    vh = cv_ref.reshape(bs, T, h, d)
    logits = jnp.einsum("bhd,bthd->bht", qh, kh) * scale
    future = jnp.where(jnp.arange(T) > 2, -10e4, 0.0)
    logits = logits + future[None, None, :]
    w = jax.nn.softmax(logits, axis=-1)
    attn = jnp.einsum("bht,bthd->bhd", w, vh).reshape(bs, hd)
    o = attn @ ws["wo"] + bias["bo"]
    resid = x + o
    mu = resid.mean(-1, keepdims=True)
    var = ((resid - mu) ** 2).mean(-1, keepdims=True)
    y_ref = (resid - mu) / jnp.sqrt(var + 1e-6) * g + b
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)


def test_cross_attention_step_matches_reference():
    rng = np.random.default_rng(1)
    bs, hd, h, sk = 6, 32, 2, 5
    d = hd // h
    scale = 1.0 / np.sqrt(d)
    x = jnp.asarray(rng.normal(size=(bs, hd)).astype(np.float32))
    wq = jnp.asarray(rng.normal(size=(hd, hd)).astype(np.float32) * 0.1)
    bq = jnp.asarray(rng.normal(size=(hd,)).astype(np.float32) * 0.1)
    wo = jnp.asarray(rng.normal(size=(hd, hd)).astype(np.float32) * 0.1)
    bo = jnp.asarray(rng.normal(size=(hd,)).astype(np.float32) * 0.1)
    g = jnp.ones((hd,), jnp.float32)
    b = jnp.zeros((hd,), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(bs, sk, hd)).astype(np.float32))
    ev = jnp.asarray(rng.normal(size=(bs, sk, hd)).astype(np.float32))
    eb = jnp.where(
        jnp.asarray(rng.random((bs, sk)) < 0.3), -10e4, 0.0
    ).astype(jnp.float32)

    assert cross_attention_step_viable(bs, sk, hd)
    y = fused_cross_attention_step(
        x, wq, bq, wo, bo, g, b, ek, ev, eb, scale, h, interpret=True
    )

    q = (x @ wq + bq).reshape(bs, h, d)
    kh = ek.reshape(bs, sk, h, d)
    vh = ev.reshape(bs, sk, h, d)
    logits = jnp.einsum("bhd,bshd->bhs", q, kh) * scale + eb[:, None, :]
    w = jax.nn.softmax(logits, axis=-1)
    attn = jnp.einsum("bhs,bshd->bhd", w, vh).reshape(bs, hd)
    resid = x + attn @ wo + bo
    mu = resid.mean(-1, keepdims=True)
    var = ((resid - mu) ** 2).mean(-1, keepdims=True)
    y_ref = (resid - mu) / jnp.sqrt(var + 1e-6)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)


def test_ffn_step_matches_reference():
    rng = np.random.default_rng(2)
    bs, hd, d_ff = 4, 16, 64
    x = jnp.asarray(rng.normal(size=(bs, hd)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(hd, d_ff)).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.normal(size=(d_ff,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(d_ff, hd)).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.normal(size=(hd,)).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.normal(size=(hd,)).astype(np.float32))
    b = jnp.zeros((hd,), jnp.float32)

    assert ffn_step_viable(bs, hd, d_ff)
    y = fused_ffn_step(x, w1, b1, w2, b2, g, b, interpret=True)

    hidden = jax.nn.gelu(x @ w1 + b1, approximate=False)
    resid = x + hidden @ w2 + b2
    mu = resid.mean(-1, keepdims=True)
    var = ((resid - mu) ** 2).mean(-1, keepdims=True)
    y_ref = (resid - mu) / jnp.sqrt(var + 1e-6) * g + b
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)


@pytest.fixture()
def beam_setup():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as graft
    from openvivqa_tpu.training.decode import generate

    model = graft._iterative_mcan(d_model=64, layers=2, heads=4)
    batch = graft._example_batch(3, model.vocab, n_regions=8, d_feature=64)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch
    )
    return model, batch, variables, generate


@pytest.mark.parametrize("parts", ["self,cross,ffn", "layer"])
def test_full_beam_search_kernel_vs_xla(beam_setup, monkeypatch, parts):
    """End-to-end: beam search with every decode step running through the
    stage megakernels OR the whole-layer megakernel (interpret mode)
    produces the same tokens and near-identical log-probs as the XLA
    decode path."""
    model, batch, variables, generate = beam_setup

    monkeypatch.setenv("OPENVIVQA_DECODE_KERNEL", "0")
    out_xla, lp_xla = generate(
        model, {"params": variables["params"]}, batch,
        batch_size=3, beam_size=2,
    )

    monkeypatch.setenv("OPENVIVQA_DECODE_KERNEL", "interpret")
    monkeypatch.setenv("OPENVIVQA_DECODE_KERNEL_PARTS", parts)
    out_kernel, lp_kernel = generate(
        model, {"params": variables["params"]}, batch,
        batch_size=3, beam_size=2,
    )

    np.testing.assert_array_equal(np.asarray(out_xla), np.asarray(out_kernel))
    np.testing.assert_allclose(
        np.asarray(lp_xla), np.asarray(lp_kernel), atol=1e-4
    )


def test_decode_kernel_parts_rejects_typos(monkeypatch):
    """A typo'd OPENVIVQA_DECODE_KERNEL_PARTS must fail loudly instead of
    silently disabling every fused kernel (and the beam speedup with it)."""
    from openvivqa_tpu.ops.decode_step import decode_kernel_parts

    monkeypatch.setenv("OPENVIVQA_DECODE_KERNEL_PARTS", "self cross")
    with pytest.raises(ValueError, match="unknown part"):
        decode_kernel_parts()

    monkeypatch.setenv("OPENVIVQA_DECODE_KERNEL_PARTS", "Layer")
    assert decode_kernel_parts() == frozenset({"layer"})  # case-normalized

    monkeypatch.setenv("OPENVIVQA_DECODE_KERNEL_PARTS", "self,ffn")
    assert decode_kernel_parts() == frozenset({"self", "ffn"})
