#!/usr/bin/env python
"""Quantify the METEOR divergence from the missing data-dependent stages.

The jar's synonym (WordNet) and paraphrase stages cannot ship here (the
reference checkout strips the jar; this image has no WordNet corpus).  The
synonym stage IS implemented (evaluation/meteor.py engages it when nltk
wordnet data is installed); this study measures what it contributes by
injecting a hand-curated synonym table over a small synonym-heavy English
corpus — an upper-bound-style estimate of how far scores sit below the
jar's on English text, and a zero-check for Vietnamese.

Writes the numbers into docs/METEOR_DIVERGENCE.md territory; run:
  python scripts/meteor_divergence_study.py
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from openvivqa_tpu.evaluation import meteor  # noqa: E402

# hand-curated WordNet-style synsets for the study corpus
_SYNSET_TABLE = {
    "sofa": {"sofa.n.01"}, "couch": {"sofa.n.01"},
    "car": {"car.n.01"}, "automobile": {"car.n.01"},
    "child": {"child.n.01"}, "kid": {"child.n.01"},
    "big": {"large.a.01"}, "large": {"large.a.01"},
    "small": {"small.a.01"}, "little": {"small.a.01"},
    "street": {"road.n.01"}, "road": {"road.n.01"},
    "picture": {"image.n.01"}, "image": {"image.n.01"},
    "begin": {"begin.v.01"}, "start": {"begin.v.01"},
    "quick": {"fast.a.01"}, "fast": {"fast.a.01"},
    "happy": {"glad.a.01"}, "glad": {"glad.a.01"},
}

# synonym-heavy English VQA-style answers: (hypothesis, reference)
EN_CORPUS = [
    ("a couch in the living room", "a sofa in the living room"),
    ("the kid rides a bicycle", "the child rides a bicycle"),
    ("a large red automobile", "a big red car"),
    ("the image shows a dog", "the picture shows a dog"),
    ("they start walking down the road", "they begin walking down the street"),
    ("a quick brown fox", "a fast brown fox"),
    ("she looks happy today", "she looks glad today"),
    ("a small house near the road", "a little house near the street"),
    ("two men on the couch", "two men on the sofa"),
    ("the automobile stops at the light", "the car stops at the light"),
]

# Vietnamese answers (no stem/synonym/paraphrase resources in METEOR 1.5):
VI_CORPUS = [
    ("hai con meo tren ghe", "hai con meo tren ghe sofa"),
    ("mot chiec xe mau do", "chiec xe hoi mau do"),
    ("nguoi dan ong doi mu", "nguoi dan ong doi non"),
    ("ba qua tao xanh", "ba qua tao mau xanh"),
]


def corpus_score(corpus):
    gts = {str(i): [ref] for i, (_, ref) in enumerate(corpus)}
    res = {str(i): [hyp] for i, (hyp, _) in enumerate(corpus)}
    score, per = meteor.Meteor().compute_score(gts, res)
    return score, per


def main():
    # --- without synonym stage (this image's default: no wordnet data) ----
    assert meteor._SYNSETS is None, "study expects no wordnet corpus"
    en_without, per_without = corpus_score(EN_CORPUS)
    vi_without, _ = corpus_score(VI_CORPUS)

    # --- with the synonym stage, via the curated table --------------------
    meteor._SYNSETS = lambda token: frozenset(
        _SYNSET_TABLE.get(token.lower(), {f"__self__:{token.lower()}"})
    )
    try:
        en_with, per_with = corpus_score(EN_CORPUS)
        vi_with, _ = corpus_score(VI_CORPUS)
    finally:
        meteor._SYNSETS = None

    print("== synonym-heavy English corpus (worst case for the gap) ==")
    for i, (hyp, ref) in enumerate(EN_CORPUS):
        print(
            f"  {per_without[i]:.4f} -> {per_with[i]:.4f}  "
            f"(+{per_with[i] - per_without[i]:.4f})  '{hyp}' vs '{ref}'"
        )
    print(f"corpus METEOR without synonym stage: {en_without:.4f}")
    print(f"corpus METEOR with synonym stage:    {en_with:.4f}")
    print(f"gap on synonym-heavy English:        {en_with - en_without:.4f} "
          f"({100 * (en_with - en_without) / en_with:.1f}% relative)")
    print()
    print("== Vietnamese corpus (jar has no vi resources) ==")
    print(f"without: {vi_without:.4f}  with: {vi_with:.4f}  "
          f"gap: {vi_with - vi_without:.4f} (must be 0)")
    assert abs(vi_with - vi_without) < 1e-12


if __name__ == "__main__":
    main()
