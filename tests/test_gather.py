"""ops/gather semantics: the one-hot row lookups that replace scalar-core
gathers on TPU, and the split shared/per-sample table design built on them.

These are load-bearing for bit-exactness claims: the M4C-family decode and
teacher-forced paths gather from [shared answer table ⊕ per-sample OCR
rows] as TWO lookups (PrevPredEmbeddings.embed_from_table,
text_embeddings.split_embedding_lookup) instead of materialising the
(bs, V+K, d) broadcast concat — the concat re-reads V*d*bs floats of HBM
per lookup (~500 MB at reference dims, measured ~1 ms per decode step).
The split is only sound because out-of-range ids produce all-zero rows."""

import jax
import jax.numpy as jnp
import numpy as np

from openvivqa_tpu.ops.gather import take_rows, take_rows_shared


def test_take_rows_matches_take_along_axis():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(3, 70, 5)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 70, (3, 4)).astype(np.int32))
    got = take_rows(table, ids)
    want = jnp.take_along_axis(table, ids[..., None], axis=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_take_rows_out_of_range_rows_are_zero():
    """Backend-uniform OOR semantics for the BATCHED lookup too: the raw
    take_along_axis fallback would NaN-fill ids >= N and wrap negatives —
    CPU-tested callers would behave differently on TPU's one-hot path."""
    table = jnp.ones((1, 70, 3), jnp.float32) * 5.0
    ids = jnp.asarray([[-1, 0, 69, 70, 200]], jnp.int32)
    got = np.asarray(take_rows(table, ids))
    np.testing.assert_array_equal(got[0, 0], np.zeros(3))
    np.testing.assert_array_equal(got[0, 3], np.zeros(3))
    np.testing.assert_array_equal(got[0, 4], np.zeros(3))
    np.testing.assert_array_equal(got[0, 1], np.full(3, 5.0))
    np.testing.assert_array_equal(got[0, 2], np.full(3, 5.0))


def test_take_rows_shared_in_range():
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(80, 6)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 80, (2, 5)).astype(np.int32))
    got = take_rows_shared(table, ids)
    want = jnp.take(table, ids, axis=0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_take_rows_shared_out_of_range_rows_are_zero():
    """ids < 0 or >= N must give all-zero rows (one-hot semantics) on every
    backend — split-table callers sum two lookups relying on this."""
    table = jnp.ones((64, 3), jnp.float32) * 7.0
    ids = jnp.asarray([[-2, 0, 63, 64, 200]], jnp.int32)
    got = np.asarray(take_rows_shared(table, ids))
    np.testing.assert_array_equal(got[0, 0], np.zeros(3))
    np.testing.assert_array_equal(got[0, 3], np.zeros(3))
    np.testing.assert_array_equal(got[0, 4], np.zeros(3))
    np.testing.assert_array_equal(got[0, 1], np.full(3, 7.0))
    np.testing.assert_array_equal(got[0, 2], np.full(3, 7.0))


def test_split_lookup_equals_concat_gather():
    """split_embedding_lookup == gather from the (bs, V+K, d) broadcast
    concat table, bit-for-bit, across the full [0, V+K) id range."""
    from openvivqa_tpu.models.modules.text_embeddings import (
        split_embedding_lookup,
    )

    rng = np.random.default_rng(2)
    V, K, d, bs = 67, 9, 4, 3
    fixed = jnp.asarray(rng.normal(size=(V, d)).astype(np.float32))
    oov = jnp.asarray(rng.normal(size=(bs, K, d)).astype(np.float32))
    # cover boundaries: 0 (pad), V-1, V, V+K-1
    ids = np.concatenate(
        [
            rng.integers(0, V + K, (bs, 6)),
            np.tile([[0, V - 1, V, V + K - 1]], (bs, 1)),
        ],
        axis=1,
    ).astype(np.int32)
    tokens = jnp.asarray(ids)

    got = split_embedding_lookup(fixed, oov, tokens, padding_idx=0)
    concat = jnp.concatenate(
        [jnp.broadcast_to(fixed, (bs, V, d)), oov], axis=1
    )
    want = jnp.take_along_axis(concat, tokens[..., None], axis=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_split_lookup_pad_grad_stop():
    """F.embedding parity: pad positions keep their forward value but stop
    gradients to the table rows (torch zeroes padding_idx row grads)."""
    from openvivqa_tpu.models.modules.text_embeddings import (
        split_embedding_lookup,
    )

    V, K, d, bs = 64, 4, 3, 2
    fixed = jnp.ones((V, d), jnp.float32)
    oov = jnp.ones((bs, K, d), jnp.float32)
    tokens = jnp.asarray([[0, 1], [0, V]], jnp.int32)  # pad at col 0

    def loss(f, o):
        return jnp.sum(split_embedding_lookup(f, o, tokens, padding_idx=0))

    gf, go = jax.grad(loss, argnums=(0, 1))(fixed, oov)
    # pad row (0) receives NO gradient; row 1 and the first OOV row do
    assert float(jnp.abs(gf[0]).sum()) == 0.0
    assert float(jnp.abs(gf[1]).sum()) > 0.0
    assert float(jnp.abs(go[1, 0]).sum()) > 0.0


def test_prev_pred_embeddings_split_equals_concat_reference():
    """PrevPredEmbeddings.embed_from_table (split tables) reproduces the
    concat-table gather it replaced (mmf_m4c.py:399-445 semantics)."""
    from openvivqa_tpu.models.m4c_common import PrevPredEmbeddings

    rng = np.random.default_rng(3)
    V, K, h, bs, L = 70, 6, 8, 2, 5
    ans = jnp.asarray(rng.normal(size=(V, h)).astype(np.float32))
    ocr = jnp.asarray(rng.normal(size=(bs, K, h)).astype(np.float32))
    inds = jnp.asarray(
        np.stack(
            [
                rng.integers(0, V + K, L),
                np.array([0, V - 1, V, V + K - 1, 3]),
            ]
        ).astype(np.int32)
    )

    mod = PrevPredEmbeddings(hidden_size=h, dropout=0.0)
    variables = mod.init(jax.random.PRNGKey(0), ans, ocr, inds)

    got = mod.apply(variables, ans, ocr, inds)

    # reference: LN both halves with the SAME bound params, concat, gather
    def concat_path(m, a, o, pi):
        table = jnp.concatenate(
            [
                jnp.broadcast_to(m.LayerNorm_0(a), (bs, V, h)),
                m.LayerNorm_1(o),
            ],
            axis=1,
        )
        raw = jnp.take_along_axis(table, pi[..., None], axis=1)
        positions = m.Embed_0(jnp.arange(L)[None, :])
        types = m.Embed_1((pi >= V).astype(jnp.int32))
        return raw + m.LayerNorm_2(positions + types)

    want = mod.apply(variables, ans, ocr, inds, method=concat_path)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0, atol=0
    )
