"""generate_scores — the reference's scoring entry points.

Two variants, mirroring the reference exactly:
- generate_scores (evaluate_model.py:27-63): PTB tokenize -> Bleu 1-4 +
  CIDEr, returning (corpus dict, per-image dict);
- generate_scores_full (utils/scoring.py:4-40): additionally METEOR and
  ROUGE_L (SPICE needs a Java scene-graph parser and is gated off; pass
  include_spice=True to get a clear error rather than a silent absence).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from .bleu import bleu
from .cider import cider_d
from .meteor import meteor
from .ptb_tokenizer import ptb_tokenize
from .rouge import rouge_l


def _run(gts, res, scorers) -> Tuple[Dict, Dict]:
    gts_tok = ptb_tokenize(gts)
    res_tok = ptb_tokenize(res)

    output: Dict[str, float] = {}
    img_output: Dict[object, Dict[str, float]] = {}
    img_ids = list(gts_tok.keys())

    for scorer, names in scorers:
        score, per_image = scorer(gts_tok, res_tok)
        if not isinstance(names, list):
            names, score, per_image = [names], [score], [per_image]
        for sc, scs, name in zip(score, per_image, names):
            output[name] = sc
            for img_id, s in zip(img_ids, scs):
                img_output.setdefault(img_id, {})[name] = s
    return output, img_output


def generate_scores(gts: Dict, res: Dict) -> Tuple[Dict, Dict]:
    """Bleu_1-4 + CIDEr (reference evaluate_model.py:27-63).

    gts/res: {image_id: [{"caption": str}, ...]} (res: one caption each).
    """
    scorers = [
        (lambda g, r: bleu(g, r), ["Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4"]),
        (lambda g, r: cider_d(g, r), "CIDEr"),
    ]
    return _run(gts, res, scorers)


def generate_scores_full(gts: Dict, res: Dict, include_spice: bool = False) -> Tuple[Dict, Dict]:
    """Bleu + METEOR + ROUGE_L + CIDEr (reference utils/scoring.py:4-40).

    SPICE is formally unsupported: it requires pycocoevalcap's Java
    scene-graph parser (Stanford CoreNLP), which has no Python
    reimplementation. Requesting it DEGRADES — results carry
    ``SPICE: nan`` and a warning is emitted — rather than crashing an
    evaluation run that also asked for the supported metrics.
    """
    scorers = [
        (lambda g, r: bleu(g, r), ["Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4"]),
        (lambda g, r: meteor(g, r), "METEOR"),
        (lambda g, r: rouge_l(g, r), "ROUGE_L"),
        (lambda g, r: cider_d(g, r), "CIDEr"),
    ]
    output, img_output = _run(gts, res, scorers)
    if include_spice:
        import math
        import warnings

        warnings.warn(
            "SPICE is unsupported (Java scene-graph parser); reporting NaN. "
            "See eval/scoring.py.",
            stacklevel=2,
        )
        output["SPICE"] = math.nan
        for img_id in img_output:
            img_output[img_id]["SPICE"] = math.nan
    return output, img_output
