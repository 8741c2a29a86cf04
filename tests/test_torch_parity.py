"""Numerical parity vs the reference's torch modules on shared weights
(SURVEY.md §4.2): attention, FFN and the MHA wrapper produce the same
outputs to <=5e-5 (f32 cross-library) when loaded with identical weights."""

import importlib.util
import sys
import types
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvivqa_tpu.builders import populate
from openvivqa_tpu.config import ConfigNode

populate()

torch = pytest.importorskip("torch")

D, H, DK, DV, FF = 32, 4, 8, 8, 64


@pytest.fixture(scope="module")
def ref_modules():
    """Load the reference attention/FFN modules standalone (behaviour-only),
    with their package imports stubbed."""
    # stub the registry machinery the reference modules import
    class FakeRegistry:
        def register(self, obj=None, **kw):
            if obj is None:
                return lambda cls: cls
            return obj

        def get(self, name):
            raise KeyError(name)

    fake_att_builder = types.ModuleType("builders.attention_builder")
    fake_att_builder.META_ATTENTION = FakeRegistry()
    fake_att_builder.build_attention = None  # patched after load
    fake_builders = types.ModuleType("builders")
    sys.modules.setdefault("builders", fake_builders)
    sys.modules["builders.attention_builder"] = fake_att_builder

    fake_types = types.ModuleType("data_utils.types")
    fake_types.TensorOrSequence = object
    fake_types.TensorOrNone = object
    fake_du = types.ModuleType("data_utils")
    fake_du.types = fake_types
    sys.modules.setdefault("data_utils", fake_du)
    sys.modules["data_utils.types"] = fake_types

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        module = importlib.util.module_from_spec(spec)
        sys.modules[name] = module
        spec.loader.exec_module(module)
        return module

    # models.utils + containers first (attentions imports them)
    utils_mod = load("models.utils", "/root/reference/models/utils.py")
    models_pkg = types.ModuleType("models")
    modules_pkg = types.ModuleType("models.modules")
    sys.modules.setdefault("models", models_pkg)
    sys.modules.setdefault("models.modules", modules_pkg)
    sys.modules["models.utils"] = utils_mod
    containers = load(
        "models.modules.containers",
        "/root/reference/models/modules/containers.py",
    )
    sys.modules["models.modules.containers"] = containers
    attentions = load(
        "models.modules.attentions",
        "/root/reference/models/modules/attentions.py",
    )
    # the reference MHA builds its core via the registry; wire it directly
    attentions.build_attention = (
        lambda config: attentions.ScaledDotProductAttention(config)
    )
    pwff = load(
        "models.modules.pwff",
        "/root/reference/models/modules/positionwise_feed_forward.py",
    )
    return SimpleNamespace(attentions=attentions, pwff=pwff, torch=torch)


def _np(tensor):
    return tensor.detach().numpy()


def _attn_config():
    return SimpleNamespace(
        D_MODEL=D, HEAD=H, D_KEY=DK, D_VALUE=DV, D_FF=FF,
        USE_AOA=False, CAN_BE_STATEFUL=False, DROPOUT=0.0,
    )


def _attn_config_node(**over):
    base = {
        "ARCHITECTURE": "ScaledDotProductAttention",
        "HEAD": H, "D_MODEL": D, "D_KEY": DK, "D_VALUE": DV, "D_FF": FF,
        "USE_AOA": False, "CAN_BE_STATEFUL": False, "DROPOUT": 0.0,
    }
    base.update(over)
    return ConfigNode(base)


def test_scaled_dot_product_attention_parity(ref_modules):
    torch.manual_seed(0)
    ref = ref_modules.attentions.ScaledDotProductAttention(_attn_config())
    ref.eval()

    from openvivqa_tpu.models.modules.attentions import ScaledDotProductAttention

    ours = ScaledDotProductAttention(_attn_config_node())
    rng = np.random.default_rng(0)
    q = rng.normal(size=(2, 5, D)).astype(np.float32)
    kv = rng.normal(size=(2, 7, D)).astype(np.float32)
    mask = np.zeros((2, 1, 1, 7), np.float32)
    mask[:, :, :, -2:] = -10e4

    params = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv)
    )
    # copy torch weights -> flax (torch Linear stores (out,in))
    new = {
        name: {
            "kernel": _np(getattr(ref, tname).weight).T,
            "bias": _np(getattr(ref, tname).bias),
        }
        for name, tname in (
            ("fc_q", "fc_q"), ("fc_k", "fc_k"), ("fc_v", "fc_v"), ("fc_o", "fc_o"),
        )
    }
    out = ours.apply(
        {"params": new}, jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv),
        attention_bias=jnp.asarray(mask),
    )
    want, _ = ref(
        torch.tensor(q), torch.tensor(kv), torch.tensor(kv), torch.tensor(mask)
    )
    np.testing.assert_allclose(np.asarray(out), _np(want), atol=5e-5)


def test_positionwise_ffn_parity(ref_modules):
    torch.manual_seed(1)
    ref = ref_modules.pwff.PositionWiseFeedForward(_attn_config())
    ref.eval()

    from openvivqa_tpu.models.modules.ffn import PositionWiseFeedForward

    ours = PositionWiseFeedForward(_attn_config_node())
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 5, D)).astype(np.float32)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))

    params = {
        "Dense_0": {"kernel": _np(ref.fc1.weight).T, "bias": _np(ref.fc1.bias)},
        "Dense_1": {"kernel": _np(ref.fc2.weight).T, "bias": _np(ref.fc2.bias)},
        "LayerNorm_0": {
            "scale": _np(ref.layer_norm.weight),
            "bias": _np(ref.layer_norm.bias),
        },
    }
    out = ours.apply({"params": params}, jnp.asarray(x))
    want = ref(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(out), _np(want), atol=5e-5)


def test_multi_head_attention_parity(ref_modules):
    torch.manual_seed(2)
    ref = ref_modules.attentions.MultiHeadAttention(_attn_config())
    ref.eval()

    from openvivqa_tpu.models.modules.attentions import MultiHeadAttention

    ours = MultiHeadAttention(_attn_config_node())
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 6, D)).astype(np.float32)
    mask = np.zeros((2, 1, 1, 6), np.float32)
    mask[:, :, :, -1:] = -10e4

    variables = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(x), jnp.asarray(x)
    )
    core = ref.attention
    params = {
        "attention": {
            "fc_q": {"kernel": _np(core.fc_q.weight).T, "bias": _np(core.fc_q.bias)},
            "fc_k": {"kernel": _np(core.fc_k.weight).T, "bias": _np(core.fc_k.bias)},
            "fc_v": {"kernel": _np(core.fc_v.weight).T, "bias": _np(core.fc_v.bias)},
            "fc_o": {"kernel": _np(core.fc_o.weight).T, "bias": _np(core.fc_o.bias)},
        },
        "layer_norm": {
            "scale": _np(ref.layer_norm.weight),
            "bias": _np(ref.layer_norm.bias),
        },
    }
    out = ours.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
        attention_bias=jnp.asarray(mask),
    )
    want = ref(
        torch.tensor(x), torch.tensor(x), torch.tensor(x), torch.tensor(mask)
    )
    np.testing.assert_allclose(np.asarray(out), _np(want), atol=5e-5)


def test_lstm_text_embedding_conversion_matches_torch():
    """convert_text_embedding maps torch nn.LSTM gates (i,f,g,o row blocks;
    bias_ih + bias_hh summed) onto flax OptimizedLSTMCell exactly."""
    import numpy as np
    import jax.numpy as jnp

    from openvivqa_tpu.models.modules.text_embeddings import _LSTM
    from openvivqa_tpu.models.modules.torch_conversion import (
        StateDict,
        convert_text_embedding,
    )

    torch.manual_seed(0)
    d = 12
    lstm = torch.nn.LSTM(input_size=d, hidden_size=d, batch_first=True)
    proj = torch.nn.Linear(d, d)
    emb = torch.nn.Embedding(20, d)
    sd = StateDict(
        {
            **{f"te.lstm.{k}": v for k, v in lstm.state_dict().items()},
            **{f"te.proj.{k}": v for k, v in proj.state_dict().items()},
            **{f"te.embedding.{k}": v for k, v in emb.state_dict().items()},
        }
    )
    converted = convert_text_embedding(sd, "te")

    x = torch.randn(3, 7, d)
    with torch.no_grad():
        want, _ = lstm(x)
    got = _LSTM(d).apply(
        {"params": {"OptimizedLSTMCell_0": converted["_LSTM_0"]["OptimizedLSTMCell_0"]}},
        jnp.asarray(x.numpy()),
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-6)
