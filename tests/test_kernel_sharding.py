"""Pallas kernels under a multi-device mesh (ops/sharding.py).

Every pallas_call is GSPMD-opaque: under a sharded-batch jit GSPMD would
replicate the full batch onto every chip (VERDICT r4 item 4).  With a
registered mesh, each kernel's public wrapper shard_maps itself over the
data axis.  These tests run on the virtual 8-device CPU mesh with
interpret-mode kernels FORCED ON so the sharding<->kernel interaction is
actually traced (the previous multichip certification only ever saw the
XLA fallback), and pin sharded == unsharded outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvivqa_tpu.ops import sharding as kshard
from openvivqa_tpu.parallel.mesh import get_mesh, get_mesh_2d

H, HEADS = 32, 4


@pytest.fixture
def mesh8():
    mesh = get_mesh()
    assert mesh.devices.size == 8, "conftest must provide 8 CPU devices"
    yield mesh
    kshard.set_kernel_mesh(None)


def test_kernel_mesh_gating(mesh8):
    kshard.set_kernel_mesh(None)
    assert kshard.kernel_mesh(16) is None  # nothing registered
    kshard.set_kernel_mesh(mesh8)
    assert kshard.kernel_mesh(16) is mesh8
    assert kshard.kernel_mesh(12) is None  # 8 does not divide 12
    one = get_mesh(n_devices=1)
    kshard.set_kernel_mesh(one)
    assert kshard.kernel_mesh(16) is None  # single-device: no-op


def test_fused_ffn_step_sharded_matches_local(mesh8, monkeypatch):
    from openvivqa_tpu.ops.decode_step import fused_ffn_step

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, H)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(H, 4 * H)).astype(np.float32)) * 0.05
    b1 = jnp.zeros((4 * H,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(4 * H, H)).astype(np.float32)) * 0.05
    b2 = jnp.zeros((H,), jnp.float32)
    g = jnp.ones((H,), jnp.float32)
    b = jnp.zeros((H,), jnp.float32)

    kshard.set_kernel_mesh(None)
    want = fused_ffn_step(x, w1, b1, w2, b2, g, b, interpret=True)

    kshard.set_kernel_mesh(mesh8)
    got = fused_ffn_step(x, w1, b1, w2, b2, g, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_fused_attention_packed_sharded_matches_local(mesh8):
    from openvivqa_tpu.ops.fused_attention import _fused_attention_packed_core

    # interpret-free CPU route: exercise the shard_map wrapper around the
    # XLA-equivalent core via monkeypatch-free direct comparison of the
    # wrapper math using the core in interpret-style (the packed kernel
    # itself only lowers on TPU, so compare wrapper plumbing with the
    # pure-XLA reference instead)
    from openvivqa_tpu.ops.fused_attention import _xla_packed

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(16, 8, H)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(16, 12, H)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(16, 12, H)).astype(np.float32))
    bias = np.zeros((16, 1, 1, 12), np.float32)
    bias[:, :, :, -3:] = -10e4
    bias = jnp.asarray(bias)
    scale = 1.0 / (H // HEADS) ** 0.5

    want, _ = _xla_packed(q, k, v, bias, scale, HEADS)

    kshard.set_kernel_mesh(mesh8)
    body = lambda q_, k_, v_, b_: _xla_packed(q_, k_, v_, b_, scale, HEADS)[0]
    got = kshard.data_shard_map(
        body, mesh8,
        in_specs=(kshard.BATCH, kshard.BATCH, kshard.BATCH, kshard.BATCH),
        out_specs=kshard.BATCH,
    )(q, k, v, bias)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5
    )


def test_m4c_greedy_sharded_with_interpret_kernels(mesh8, monkeypatch):
    """The flagship path end-to-end: MMF_M4C incremental greedy with
    kernel D + fused FFN interpret-mode ON, batch sharded over the data
    axis of a 2-D (data=4, model=2) mesh — predictions must match the
    unsharded run exactly."""
    from jax.sharding import NamedSharding, PartitionSpec

    from openvivqa_tpu.builders import populate
    from openvivqa_tpu.config import ConfigNode
    from openvivqa_tpu.models.mmf_m4c import MMF_M4C

    populate()

    class Vocab:
        padding_idx, bos_idx, eos_idx, unk_idx = 0, 1, 2, 3
        max_answer_length = 6

        def __len__(self):
            return 40

    cfg = ConfigNode(
        {
            "ARCHITECTURE": "MMF_M4C",
            "D_MODEL": H,
            "DECODING_MODE": "incremental",
            "MMT": {
                "HIDDEN_SIZE": H, "NUM_HIDDEN_LAYERS": 2,
                "NUM_ATTENTION_HEADS": HEADS,
            },
            "TEXT_BERT": {"HIDDEN_SIZE": H, "NUM_HIDDEN_LAYERS": 1},
            "OBJECT_EMBEDDING": {"D_FEATURE": 12, "DROPOUT": 0.1},
            "OCR_EMBEDDING": {"D_FEATURE": 24, "DROPOUT": 0.1},
            "OCR_PTR_NET": {"HIDDEN_SIZE": H, "QUERY_KEY_SIZE": 16},
        }
    )
    model = MMF_M4C(cfg, Vocab())
    rng = np.random.default_rng(7)
    bs = 8

    def f(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32))

    q = rng.integers(4, 40, (bs, 5)).astype(np.int32)
    q[:, -1] = 0
    batch = {
        "question_tokens": jnp.asarray(q),
        "region_features": f(bs, 4, 12),
        "region_boxes": f(bs, 4, 4),
        "ocr_fasttext_features": f(bs, 3, 10),
        "ocr_rec_features": f(bs, 3, 8),
        "ocr_det_features": f(bs, 3, 6),
        "ocr_boxes": f(bs, 3, 4),
        "answer_tokens": jnp.asarray(
            rng.integers(4, 43, (bs, 6)).astype(np.int32)
        ),
    }
    variables = jax.jit(
        lambda r, b: model.init({"params": r, "dropout": r}, b, train=False)
    )(jax.random.PRNGKey(3), batch)
    params = variables["params"]

    monkeypatch.setenv("OPENVIVQA_DECODE_KERNEL", "interpret")
    kshard.set_kernel_mesh(None)
    want = model.apply({"params": params}, batch, method="greedy_decode")

    mesh = get_mesh_2d(model_parallel=2)
    kshard.set_kernel_mesh(mesh)
    spec = NamedSharding(mesh, PartitionSpec("data"))
    sharded = {k_: jax.device_put(v_, spec) for k_, v_ in batch.items()}
    got = jax.jit(
        lambda p, b: model.apply({"params": p}, b, method="greedy_decode")
    )(params, sharded)

    np.testing.assert_array_equal(
        np.asarray(got["prev_inds"]), np.asarray(want["prev_inds"])
    )
    np.testing.assert_allclose(
        np.asarray(got["scores"]), np.asarray(want["scores"]), atol=1e-5
    )


def test_fused_encoder_attention_sharded_matches_local(mesh8, monkeypatch):
    """Kernel F (ops/encoder_layer.py) under the data mesh: the sharded
    call must equal the unsharded one (each shard runs the block-diagonal
    kernel on its local samples; the plan re-derives per-shard)."""
    from openvivqa_tpu.ops.encoder_layer import fused_encoder_self_attention

    rng = np.random.default_rng(2)
    bs, seq = 16, 10
    x = jnp.asarray(rng.normal(size=(bs, seq, H)).astype(np.float32))
    kb = np.zeros((bs, seq), np.float32)
    kb[:, -2:] = -10e4
    kb = jnp.asarray(kb)
    w = {}
    for i, name in enumerate(("q", "k", "v", "o")):
        w[f"w{name}"] = (
            jnp.asarray(rng.normal(size=(H, H)).astype(np.float32)) * 0.05
        )
        w[f"b{name}"] = jnp.zeros((H,), jnp.float32)
    w["ln_scale"] = jnp.ones((H,), jnp.float32)
    w["ln_bias"] = jnp.zeros((H,), jnp.float32)
    scale = 1.0 / (H // HEADS) ** 0.5

    kshard.set_kernel_mesh(None)
    want = fused_encoder_self_attention(
        x, w, kb, scale, HEADS, 1e-12, interpret=True
    )
    kshard.set_kernel_mesh(mesh8)
    got = fused_encoder_self_attention(
        x, w, kb, scale, HEADS, 1e-12, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
