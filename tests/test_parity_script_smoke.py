"""The metric-parity artifact generator must keep working: run one tiny
case end to end (reference torch + this framework, 1 epoch) and require
bit-identical metrics — the north-star property (docs/PARITY_RUN.md)."""

import importlib.util
import sys

import pytest

pytest.importorskip("torch")


def test_parity_script_one_epoch(tmp_path):
    spec = importlib.util.spec_from_file_location(
        "metric_parity_run", "scripts/metric_parity_run.py"
    )
    mpr = importlib.util.module_from_spec(spec)
    sys.modules["metric_parity_run"] = mpr
    spec.loader.exec_module(mpr)

    CfgNode = mpr.install_stubs()
    sys.path.insert(0, "/root/reference")

    from openvivqa_tpu.data.synthetic import generate_synthetic_dataset

    paths = generate_synthetic_dataset(
        str(tmp_path / "data"), n_images=6, n_questions_per_image=2,
        max_scene_text=mpr.MAX_SCENE_TEXT, seed=7,
    )
    ref = mpr.run_reference(paths, 1, CfgNode, "iterative_mcan")
    ours = mpr.run_ours(paths, 1, "iterative_mcan", ref)
    report = mpr.compare("iterative_mcan", ref, ours, 1)

    assert report["max_score_delta"] == 0.0
    assert report["max_loss_delta"] < 1e-3
    agreement = report["final_generation_agreement"]
    assert agreement["identical"] == agreement["n"] > 0
