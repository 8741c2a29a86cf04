"""Metric suite tests, incl. golden parity vs the reference's pure-Python
COCO scorers (loaded standalone from /root/reference, behaviour-only)."""

import importlib.util
import sys

import numpy as np
import pytest

from openvivqa_tpu.evaluation import (
    F1,
    Accuracy,
    Bleu,
    Cider,
    Meteor,
    Precision,
    Recall,
    Rouge,
    compute_scores,
)

GTS = {
    "0_0": ["con mèo màu đen", "một con mèo đen"],
    "0_1": ["hai người đang ngồi"],
    "1_0": ["màu đỏ"],
    "1_1": ["không có gì trên bàn"],
    "2_0": ["con mèo màu đen"],
}
GEN = {
    "0_0": ["con mèo màu đen"],
    "0_1": ["hai người đứng"],
    "1_0": ["màu xanh"],
    "1_1": ["không có gì trên bàn"],
    "2_0": ["một con chó"],
}


def _load_ref_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    module = importlib.util.module_from_spec(spec)
    sys.modules[name] = module
    spec.loader.exec_module(module)
    return module


@pytest.fixture(scope="module")
def ref_scorers():
    try:
        bleu = _load_ref_module(
            "ref_bleu_scorer", "/root/reference/evaluation/bleu/bleu_scorer.py"
        )
        cider = _load_ref_module(
            "ref_cider_scorer", "/root/reference/evaluation/cider/cider_scorer.py"
        )
        rouge = _load_ref_module(
            "ref_rouge", "/root/reference/evaluation/rouge/rouge.py"
        )
    except (ImportError, FileNotFoundError):
        pytest.skip("reference scorers unavailable")
    return bleu, cider, rouge


def test_bleu_parity(ref_scorers):
    ref_bleu_mod = ref_scorers[0]
    scorer = ref_bleu_mod.BleuScorer(n=4)
    for key in GTS:
        scorer += (GEN[key][0], GTS[key])
    ref_score, ref_scores = scorer.compute_score(option="closest", verbose=0)

    ours_score, ours_scores = Bleu().compute_score(GTS, GEN)
    np.testing.assert_allclose(ours_score, ref_score, rtol=1e-12)
    for k in range(4):
        np.testing.assert_allclose(ours_scores[k], ref_scores[k], rtol=1e-12)


def test_cider_parity(ref_scorers):
    ref_cider_mod = ref_scorers[1]
    scorer = ref_cider_mod.CiderScorer(GTS, test=GEN, n=4, sigma=6.0)
    ref_score, ref_scores = scorer.compute_score()

    ours_score, ours_scores = Cider().compute_score(GTS, GEN)
    np.testing.assert_allclose(ours_score, ref_score, rtol=1e-12)
    np.testing.assert_allclose(ours_scores, ref_scores, rtol=1e-12)


def test_rouge_parity(ref_scorers):
    ref_rouge_mod = ref_scorers[2]
    ref_score, ref_scores = ref_rouge_mod.Rouge().compute_score(GTS, GEN)
    ours_score, ours_scores = Rouge().compute_score(GTS, GEN)
    np.testing.assert_allclose(ours_score, ref_score, rtol=1e-12)
    np.testing.assert_allclose(ours_scores, ref_scores, rtol=1e-12)


def test_exact_metrics():
    acc, acc_scores = Accuracy().compute_score(GTS, GEN)
    # 0_0 matches 1 of 2 refs (0.5); 1_1 matches (1.0); others 0
    np.testing.assert_allclose(acc_scores, [0.5, 0.0, 0.0, 1.0, 0.0])
    np.testing.assert_allclose(acc, 0.3)

    prec, prec_scores = Precision().compute_score(GTS, GEN)
    rec, _ = Recall().compute_score(GTS, GEN)
    f1, f1_scores = F1().compute_score(GTS, GEN)
    assert prec_scores[3] == 1.0 and f1_scores[3] == 1.0
    # "màu xanh" vs "màu đỏ": 1 common token of 2 => P=R=F1=0.5
    np.testing.assert_allclose(prec_scores[2], 0.5)
    np.testing.assert_allclose(f1_scores[2], 0.5)


def test_meteor_basics():
    score, scores = Meteor().compute_score(GTS, GEN)
    # METEOR 1.5 semantics: a single chunk covering both sides fully has
    # zero fragmentation penalty -> identical strings score 1.0
    assert scores[3] == pytest.approx(1.0)
    assert scores[0] == pytest.approx(1.0)
    assert scores[4] < scores[0]  # mostly-wrong < exact
    assert 0.0 <= score <= 1.0


def test_meteor_15_semantics():
    from openvivqa_tpu.evaluation.meteor import _sentence_meteor

    # partial overlap, hand-computed: "màu xanh" vs "màu đỏ" matches only
    # "màu" (content words, weight delta cancels): P = R = 0.5,
    # Fmean = PR/(aP+(1-a)R) = 0.5, pen = gamma*(1/1)^beta = 0.6
    assert _sentence_meteor("màu xanh", ["màu đỏ"]) == pytest.approx(0.2)

    # the stem stage (Snowball English) credits morphological variants
    stemmed = _sentence_meteor("the cats sat", ["the cat sat"])
    exact = _sentence_meteor("the dogs sat", ["the cat sat"])
    assert stemmed > exact
    assert stemmed < 1.0  # stem weight 0.6 < exact weight 1.0

    # word-order fragmentation is penalised
    assert _sentence_meteor("sat cat the", ["the cat sat"]) < 1.0

    # function words carry (1 - delta) weight: mismatching only an article
    # hurts less than mismatching only a content word
    art = _sentence_meteor("a cat sat", ["the cat sat"])
    content = _sentence_meteor("the dog sat", ["the cat sat"])
    assert art > content


def test_compute_scores_dispatch():
    all_score, all_scores = compute_scores(GTS, GEN)
    assert set(all_score) == {
        "BLEU", "METEOR", "ROUGE", "CIDEr", "Accuracy", "Precision", "Recall", "F1",
    }
    assert len(all_score["BLEU"]) == 4
    assert len(all_scores["CIDEr"]) == len(GTS)
