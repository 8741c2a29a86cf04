"""METEOR (1.5 semantics, pure Python).

The reference shells out to the METEOR-1.5 Java jar with `-l en -norm`
(/root/reference/evaluation/meteor/meteor.py:26-27); the jar is stripped
from this checkout and the wrapper is broken as checked out (missing
`evaluation.utils` import).  This implementation follows the METEOR 1.5
scoring model (Denkowski & Lavie 2014) directly:

* matcher stages: exact (weight 1.0) then stem (weight 0.6, Snowball
  English stemmer — the same stemmer family the jar uses).  The synonym
  (WordNet) and paraphrase-table stages are ABSENT — both need data files
  shipped inside the jar; scores on stem/synonym-heavy English text will
  read slightly lower than the jar's.  Vietnamese (the primary OpenViVQA
  language) has no stem/synonym/paraphrase resources in METEOR 1.5 at all,
  so vi scores match the jar's matcher semantics exactly;
* content/function-word weighting (delta) with the standard English
  function-word list;
* en task parameters: alpha 0.85, beta 0.2, gamma 0.6, delta 0.75;
  Fmean = P*R / (alpha*P + (1-alpha)*R),
  Pen = gamma * (chunks / avg_matches)^beta,  score = (1-Pen) * Fmean;
* alignment: stage-priority one-to-one matching; ties between reference
  slots prefer the slot that continues the current chunk (the jar's beam
  search minimises chunks globally — a documented approximation).

tests/test_evaluation.py pins hand-computed values for each piece.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

ALPHA, BETA, GAMMA, DELTA = 0.85, 0.2, 0.6, 0.75
STAGE_WEIGHTS = (1.0, 0.6)  # exact, stem

# METEOR's English function-word list is frequency-derived; this is the
# standard closed-class inventory (articles, prepositions, conjunctions,
# pronouns, auxiliaries, punctuation) used for the delta weighting.
_FUNCTION_WORDS = frozenset(
    """a an the this that these those some any each every no
    i you he she it we they me him her us them my your his its our their
    mine yours hers ours theirs myself yourself himself herself itself
    ourselves themselves who whom whose which what
    and or but nor so yet for although because since unless while whereas
    if then than as of in on at by with from to into onto over under
    above below between among through during before after about against
    up down out off near
    is are was were be been being am do does did done doing have has had
    having will would shall should may might must can could
    not n't there here when where why how all both few more most other
    such only own same too very s t just don now
    . , ! ? ; : ' " ` ( ) [ ] { } -""".split()
)


def _stemmer():
    try:
        from nltk.stem.snowball import SnowballStemmer

        return SnowballStemmer("english").stem
    except Exception:  # noqa: BLE001 — nltk absent: exact-only matching
        return None


_STEM = _stemmer()


def _is_function(token: str) -> bool:
    return token.lower() in _FUNCTION_WORDS


def _align(
    hypo: List[str], ref: List[str]
) -> Tuple[List[Tuple[int, int, int]], int]:
    """Stage-priority one-to-one alignment.

    Returns (pairs, chunks) where pairs are (hypo_idx, ref_idx, stage).
    Stage 0 = exact, stage 1 = stem.  Reference-slot ties prefer
    continuing the previous chunk, then the earliest slot.
    """
    taken_ref = [False] * len(ref)
    matched_ref_for_h: List[Optional[Tuple[int, int]]] = [None] * len(hypo)

    def run_stage(stage: int, keys_h: List[str], keys_r: List[str]) -> None:
        slots: Dict[str, List[int]] = {}
        for j, key in enumerate(keys_r):
            if not taken_ref[j]:
                slots.setdefault(key, []).append(j)
        prev_r = -2
        for i, key in enumerate(keys_h):
            if matched_ref_for_h[i] is not None:
                prev_r = matched_ref_for_h[i][0]
                continue
            candidates = slots.get(key)
            if not candidates:
                continue
            # prefer the slot that continues the chunk
            if prev_r + 1 in candidates:
                j = prev_r + 1
            else:
                j = candidates[0]
            candidates.remove(j)
            taken_ref[j] = True
            matched_ref_for_h[i] = (j, stage)
            prev_r = j

    run_stage(0, hypo, ref)
    if _STEM is not None:
        run_stage(
            1, [_STEM(t) for t in hypo], [_STEM(t) for t in ref]
        )

    pairs = [
        (i, jr, stage)
        for i, hit in enumerate(matched_ref_for_h)
        if hit is not None
        for jr, stage in (hit,)
    ]
    if not pairs:
        return [], 0
    chunks = 1
    for (h_prev, r_prev, _), (h_cur, r_cur, _) in zip(pairs, pairs[1:]):
        if h_cur != h_prev + 1 or r_cur != r_prev + 1:
            chunks += 1
    return pairs, chunks


def _weighted_counts(tokens: List[str], matched_stages: Dict[int, int]):
    """(weighted matched, weighted total) with delta content weighting."""
    matched = total = 0.0
    for idx, token in enumerate(tokens):
        w = (1.0 - DELTA) if _is_function(token) else DELTA
        total += w
        stage = matched_stages.get(idx)
        if stage is not None:
            matched += w * STAGE_WEIGHTS[stage]
    return matched, total


def _sentence_meteor(hypo: str, refs: List[str]) -> float:
    h_tokens = hypo.split()
    best = 0.0
    for ref in refs:
        r_tokens = ref.split()
        if not h_tokens or not r_tokens:
            best = max(best, float(h_tokens == r_tokens))
            continue
        pairs, chunks = _align(h_tokens, r_tokens)
        if not pairs:
            continue
        h_stage = {i: s for i, _, s in pairs}
        r_stage = {j: s for _, j, s in pairs}
        wm_h, wt_h = _weighted_counts(h_tokens, h_stage)
        wm_r, wt_r = _weighted_counts(r_tokens, r_stage)
        precision = wm_h / wt_h if wt_h else 0.0
        recall = wm_r / wt_r if wt_r else 0.0
        if precision + recall == 0.0:
            continue
        f_mean = precision * recall / (
            ALPHA * precision + (1.0 - ALPHA) * recall
        )
        avg_matches = len(pairs)  # one-to-one: |m_h| == |m_r|
        # the jar zeroes fragmentation only when ONE chunk covers both
        # sides completely; any partial alignment pays gamma*(ch/m)^beta
        full_cover = (
            chunks == 1
            and len(pairs) == len(h_tokens) == len(r_tokens)
        )
        penalty = (
            0.0 if full_cover else GAMMA * (chunks / avg_matches) ** BETA
        )
        best = max(best, (1.0 - penalty) * f_mean)
    return best


class Meteor:
    def compute_score(self, gts: Dict, res: Dict) -> Tuple[float, np.ndarray]:
        assert gts.keys() == res.keys()
        scores = [_sentence_meteor(res[key][0], gts[key]) for key in gts]
        arr = np.asarray(scores)
        return float(arr.mean()), arr

    def __str__(self) -> str:
        return "METEOR"
