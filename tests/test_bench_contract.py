"""Driver-artifact contract for bench.py.

The round driver runs `python bench.py` and records its single JSON line
(BENCH_r{N}.json).  These tests pin the parts of that contract that do not
need a TPU: the final line is one parseable JSON object with every
RESULT_KEYS metric present (null when unmeasured), the error path still
yields parseable output with any streamed partial metrics preserved, and
every vs_baseline_* metric has a measured CPU anchor in
BASELINE_MEASURED.json (BASELINE.md: baselines must be produced, not
quoted).
"""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "bench_module", os.path.join(REPO, "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)

# vs_baseline_* result key -> anchor key in BASELINE_MEASURED.json
ANCHOR_OF = {
    "vs_baseline": "mcan_eval_samples_per_sec",
    "vs_baseline_train": "mcan_train_samples_per_sec",
    "vs_baseline_beam": "iterative_mcan_beam_eval_samples_per_sec",
    "vs_baseline_mmf_greedy": "mmf_greedy_samples_per_sec",
    "vs_baseline_iterative_greedy": "iterative_greedy_samples_per_sec",
    "vs_baseline_mmt_train": "mmt_train_samples_per_sec",
}


def test_final_json_is_one_parseable_line_with_all_keys():
    line = bench._final_json({}, None)
    assert "\n" not in line
    out = json.loads(line)
    assert out["metric"] == "mcan_eval_samples_per_sec_per_chip"
    assert out["unit"] == "samples/sec/chip"
    for key in bench.RESULT_KEYS:
        assert key in out, f"missing result key {key}"
    assert "error" not in out


def test_error_path_keeps_partials():
    partials = {"value": 123.0, "train_samples_per_sec": 45.6}
    out = json.loads(bench._final_json(partials, "attempt 1: timeout"))
    assert out["error"] == "attempt 1: timeout"
    assert out["value"] == 123.0
    assert out["train_samples_per_sec"] == 45.6
    assert out["beam_samples_per_sec"] is None  # unmeasured -> null, not absent


def test_unmeasured_value_is_null_not_zero():
    # VERDICT r3 item 1c: "no measurement" must not read as a measured 0.0.
    out = json.loads(bench._final_json({}, "tpu_unreachable: canary hang"))
    assert out["value"] is None
    assert out["vs_baseline"] is None
    assert out["error"].startswith("tpu_unreachable")


def test_deadline_budget_fits_driver_window():
    # BENCH_r03 was rc=124 (ladder overran the ~1500s kill window);
    # BENCH_r04 was the opposite failure (canary gave up with ~1,335s of
    # window unspent).  The r5 design budgets everything against ONE
    # deadline; the worst overshoot past it is a guaranteed first worker
    # attempt (MIN_ATTEMPT_S after a last-moment canary pass) plus the
    # emit reserve.
    worst_case = (
        bench.TOTAL_WINDOW_S + bench.MIN_ATTEMPT_S + bench.EMIT_RESERVE_S
    )
    assert worst_case <= 1480, worst_case
    # the canary persistence loop must leave room for a useful worker run
    assert bench.MIN_WORKER_RESERVE_S >= 2 * bench.MIN_ATTEMPT_S
    # and must be allowed to spend MOST of the window probing (the r4
    # post-mortem failure: giving up after ~165s)
    assert bench.TOTAL_WINDOW_S - bench.MIN_WORKER_RESERVE_S >= 900


def test_every_vs_baseline_metric_maps_to_an_anchor():
    vs_keys = [k for k in bench.RESULT_KEYS if k.startswith("vs_baseline")]
    assert set(vs_keys) == set(ANCHOR_OF), (
        "new vs_baseline metric without an anchor mapping — extend "
        "scripts/measure_reference_baseline.py and ANCHOR_OF"
    )
    with open(os.path.join(REPO, "BASELINE_MEASURED.json")) as handle:
        anchors = json.load(handle)
    for vs_key, anchor_key in ANCHOR_OF.items():
        assert anchors.get(anchor_key), (
            f"{vs_key} has no measured anchor {anchor_key}; run "
            "scripts/measure_reference_baseline.py"
        )
