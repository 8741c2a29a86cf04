"""Decode pre-cast lever (ROADMAP: megakernel step): the fused weights and
enc K/V are cast/projected ONCE outside the decode scan via the
'decode_prep' collection instead of per step inside the scan body (XLA does
not hoist scan invariants — CLAUDE.md measured fact).

Equivalence bar: beam tokens and log-probs identical with the prep bundle
on vs off (per-step casts), since the kernel consumes value-identical
operands either way."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture()
def beam_setup():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as graft

    model = graft._iterative_mcan(d_model=64, layers=2, heads=4)
    batch = graft._example_batch(3, model.vocab, n_regions=8, d_feature=64)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch
    )
    return model, batch, {"params": variables["params"]}


def test_precast_beam_equivalence(beam_setup, monkeypatch):
    """Beam search with the pre-cast bundle matches the per-step-cast path
    exactly (interpret mode routes the layer megakernel on CPU)."""
    from openvivqa_tpu.training.decode import generate

    model, batch, variables = beam_setup
    monkeypatch.setenv("OPENVIVQA_DECODE_KERNEL", "interpret")

    monkeypatch.setenv("OPENVIVQA_DECODE_PRECAST", "0")
    out_step, lp_step = generate(model, variables, batch, batch_size=3, beam_size=2)

    monkeypatch.setenv("OPENVIVQA_DECODE_PRECAST", "1")
    out_prep, lp_prep = generate(model, variables, batch, batch_size=3, beam_size=2)

    np.testing.assert_array_equal(np.asarray(out_step), np.asarray(out_prep))
    np.testing.assert_allclose(np.asarray(lp_step), np.asarray(lp_prep), atol=1e-6)


def test_prep_bundle_created_and_enc_cache_skipped(beam_setup, monkeypatch):
    """The prep trace creates one bundle per decoder layer (weights + enc
    K/V), and the scan cache drops the 'enc_kv' buffers — the projection no
    longer lives in the carry at all."""
    from openvivqa_tpu.training.decode import init_cache_and_prep, init_cache_for

    model, batch, variables = beam_setup
    monkeypatch.setenv("OPENVIVQA_DECODE_KERNEL", "interpret")

    enc, bias = model.apply(variables, batch, method=model.encode)
    beam = 2
    enc_b = jax.tree.map(lambda x: jnp.repeat(x, beam, axis=0), enc)
    bias_b = jax.tree.map(lambda x: jnp.repeat(x, beam, axis=0), bias)

    cache, prep = init_cache_and_prep(
        model, variables, enc_b, bias_b, model.vocab.bos_idx, 3 * beam
    )
    leaves = jax.tree_util.tree_leaves_with_path(prep)
    assert leaves, "no decode_prep bundle created for a fused-viable config"
    paths = ["/".join(str(p) for p in path) for path, _ in leaves]
    assert any("enc_k" in p for p in paths)
    assert any("self_w" in p for p in paths)

    cache_paths = [
        "/".join(str(p) for p in path)
        for path, _ in jax.tree_util.tree_leaves_with_path(cache)
    ]
    assert not any("enc_kv" in p for p in cache_paths), (
        "enc K/V buffers still in the scan carry despite the prep bundle"
    )

    # the legacy single-collection trace keeps them (structure contract for
    # step_fns built without decode_prep)
    monkeypatch.setenv("OPENVIVQA_DECODE_PRECAST", "0")
    legacy = init_cache_for(
        model, variables, enc_b, bias_b, model.vocab.bos_idx, 3 * beam
    )
    legacy_paths = [
        "/".join(str(p) for p in path)
        for path, _ in jax.tree_util.tree_leaves_with_path(legacy)
    ]
    assert any("enc_kv" in p for p in legacy_paths)


def test_precast_vs_xla_decode(beam_setup, monkeypatch):
    """Pre-cast fused decode still matches the plain XLA decode path (the
    original megakernel equivalence bar, now through the prep flow)."""
    from openvivqa_tpu.training.decode import generate

    model, batch, variables = beam_setup

    monkeypatch.setenv("OPENVIVQA_DECODE_KERNEL", "0")
    out_xla, lp_xla = generate(model, variables, batch, batch_size=3, beam_size=2)

    monkeypatch.setenv("OPENVIVQA_DECODE_KERNEL", "interpret")
    monkeypatch.setenv("OPENVIVQA_DECODE_PRECAST", "1")
    out_prep, lp_prep = generate(model, variables, batch, batch_size=3, beam_size=2)

    np.testing.assert_array_equal(np.asarray(out_xla), np.asarray(out_prep))
    np.testing.assert_allclose(np.asarray(lp_xla), np.asarray(lp_prep), atol=1e-4)
