"""The checkpoint-migration CLI end-to-end: reference torch checkpoint ->
resumable task checkpoint -> task resumes at epoch N+1 with metadata."""

import os

import numpy as np
import pytest

from openvivqa_tpu.builders import build_task, populate
from test_mmf_e2e import _mmf_task_config
from test_mmf_m4c_parity import RefVocab, _config, _ns, ref_mmf  # noqa: F401

populate()
torch = pytest.importorskip("torch")


def test_migrate_checkpoint_roundtrip(ref_mmf, synthetic_data, tmp_path):  # noqa: F811
    base = _mmf_task_config(synthetic_data, tmp_path)
    # reference BERT stacks default to intermediate size 3072 at ANY hidden
    model_config = dict(
        _config(),
        NAME="migrated_test",
        OBJECT_EMBEDDING={"D_FEATURE": 1024, "DROPOUT": 0.0},
        OCR_EMBEDDING={"D_FEATURE": 300 + 256 + 256, "DROPOUT": 0.0},
    )
    config = base.merged({"MODEL": model_config, "TRAINING": {"MAX_EPOCHS": 9}})

    torch.manual_seed(3)
    n_vocab = _task_vocab_len(config)
    vocab_sized = type("V", (RefVocab,), {"__len__": lambda self: n_vocab})()
    ref_model = ref_mmf.MMF_M4C(_ns(dict(model_config)), vocab_sized)
    ckpt_path = str(tmp_path / "reference_best.pth")
    torch.save(
        {"state_dict": ref_model.state_dict(), "epoch": 7,
         "best_val_score": 0.5, "patience": 1},
        ckpt_path,
    )

    from openvivqa_tpu.tools.migrate_checkpoint import migrate

    last = migrate(config, ckpt_path, also_best=True)
    assert os.path.isfile(last)
    assert os.path.isfile(last.replace("last_model", "best_model"))

    # a fresh task resumes from the migrated checkpoint with metadata intact
    task = build_task(config)
    metadata = task.load_checkpoint(last)
    assert metadata["epoch"] == 7
    assert metadata["best_val_score"] == 0.5
    assert metadata["patience"] == 1
    # converted weights actually landed (classifier bias is zeros at init,
    # torch initialises it uniform nonzero)
    bias = np.asarray(task.state.params["classifier_bias"])
    want = ref_model.classifier.bias.detach().numpy()
    np.testing.assert_allclose(bias, want, atol=1e-6)


def _task_vocab_len(config):
    from openvivqa_tpu.builders import build_vocab

    return len(build_vocab(config.DATASET.VOCAB))


def test_unsupported_architectures_refuse_with_reason():
    """MMF_SAL / experimental_MMF_M4C reference checkpoints describe
    different architectures than the registry names run here; the converter
    must refuse with a layout-specific reason, not silently mis-map.
    (Standalone M4C graduated to a real converter in round 3 —
    tests/test_standalone_m4c.py.)"""
    import pytest as _pytest

    from openvivqa_tpu.config import ConfigNode
    from openvivqa_tpu.models.modules.torch_conversion import (
        convert_reference_checkpoint,
    )

    for name, needle in (
        ("MMF_SAL", "mmf_sal.py:44-88"),
        ("experimental_MMF_M4C", "experimental_mmf_m4c.py"),
        ("MMF_IterativeLoRRA", "mmf_iterative_lorra.py:66-68"),
    ):
        with _pytest.raises(NotImplementedError, match=name):
            try:
                convert_reference_checkpoint(
                    {"state_dict": {}}, ConfigNode({"ARCHITECTURE": name})
                )
            except NotImplementedError as exc:
                assert needle in str(exc)
                raise
