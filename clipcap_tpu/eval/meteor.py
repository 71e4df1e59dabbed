"""METEOR (exact + Porter-stem matching stages).

The reference scores METEOR through pycocoevalcap's Java meteor-1.5 jar
(reference utils/scoring.py:12). This is a JVM-free Python implementation
of the METEOR algorithm with the standard en parameters
(alpha=0.85, beta=0.2, gamma=0.6, delta=0.75 — the meteor-1.5 defaults)
and the exact + stem matching stages. DOCUMENTED DEVIATION: the jar's
synonym stage needs WordNet, which is not available offline; without it
scores are slightly lower than meteor-1.5's on captions with synonym
matches but move monotonically with them.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

ALPHA, BETA, GAMMA, DELTA = 0.85, 0.2, 0.6, 0.75

try:
    from nltk.stem.porter import PorterStemmer

    _STEMMER: Optional[PorterStemmer] = PorterStemmer()
except Exception:  # pragma: no cover - nltk is in the image
    _STEMMER = None


def _stem(w: str) -> str:
    return _STEMMER.stem(w) if _STEMMER is not None else w


def _align(hyp: List[str], ref: List[str]) -> Tuple[int, int, float]:
    """Greedy two-stage alignment (exact then stem). Returns
    (matches, chunks, weighted_matches_hyp) — content/function weighting is
    omitted (uniform word weight), matching meteor's behavior with an
    empty function-word list."""
    m_hyp = [-1] * len(hyp)
    used_ref = [False] * len(ref)

    def run_stage(key):
        for i, hw in enumerate(hyp):
            if m_hyp[i] >= 0:
                continue
            hk = key(hw)
            for j, rw in enumerate(ref):
                if not used_ref[j] and key(rw) == hk:
                    m_hyp[i] = j
                    used_ref[j] = True
                    break

    run_stage(lambda w: w)
    run_stage(_stem)

    matches = sum(1 for j in m_hyp if j >= 0)
    # chunks: maximal runs of adjacent matches aligned to adjacent ref pos
    chunks = 0
    prev_j = None
    for i, j in enumerate(m_hyp):
        if j < 0:
            prev_j = None
            continue
        if prev_j is None or j != prev_j + 1:
            chunks += 1
        prev_j = j
    return matches, chunks, float(matches)


def _sentence_meteor(hyp: List[str], ref: List[str]) -> float:
    if not hyp or not ref:
        return 0.0
    matches, chunks, _ = _align(hyp, ref)
    if matches == 0:
        return 0.0
    precision = matches / len(hyp)
    recall = matches / len(ref)
    fmean = precision * recall / (ALPHA * precision + (1 - ALPHA) * recall)
    frag = chunks / matches
    penalty = GAMMA * (frag**BETA)
    return (1 - penalty) * fmean


def meteor(
    gts: Dict[object, List[str]], res: Dict[object, List[str]]
) -> Tuple[float, List[float]]:
    """Max over references per image; corpus score = mean of image scores."""
    assert gts.keys() == res.keys()
    scores = []
    for img_id in gts:
        hyp = res[img_id][0].split()
        scores.append(max(_sentence_meteor(hyp, r.split()) for r in gts[img_id]))
    return sum(scores) / max(len(scores), 1), scores
