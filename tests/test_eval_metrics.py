"""Scoring-suite tests: PTB tokenization rules, BLEU vs nltk's corpus_bleu,
CIDEr-D / ROUGE-L / METEOR properties, generate_scores plumbing.
"""

import numpy as np
import pytest

from clipcap_tpu.eval.bleu import bleu
from clipcap_tpu.eval.cider import cider_d
from clipcap_tpu.eval.meteor import meteor
from clipcap_tpu.eval.ptb_tokenizer import ptb_tokenize, ptb_tokenize_caption
from clipcap_tpu.eval.rouge import rouge_l
from clipcap_tpu.eval.scoring import generate_scores, generate_scores_full


def test_ptb_tokenize_rules():
    assert ptb_tokenize_caption("A man riding a wave.") == "a man riding a wave"
    assert ptb_tokenize_caption("Don't stop!") == "do n't stop"
    assert ptb_tokenize_caption("the cat's toy, and dog...") == "the cat 's toy and dog"
    assert ptb_tokenize_caption('He said "hello" loudly') == "he said hello loudly"
    d = ptb_tokenize({1: [{"caption": "Two dogs play."}, {"caption": "A DOG!"}]})
    assert d == {1: ["two dogs play", "a dog"]}


GTS = {
    1: ["a man riding a wave on a surfboard", "a surfer rides a big wave",
        "man surfing on the ocean", "a person on a surfboard rides a wave",
        "the man is surfing a large wave"],
    2: ["a cat sitting on a wooden bench", "a cat sits on the bench outside",
        "small cat resting on a park bench", "a kitten on a wooden seat",
        "cat lying on a bench in the park"],
}
RES_GOOD = {1: ["a man riding a wave on a surfboard"], 2: ["a cat sitting on a wooden bench"]}
RES_PART = {1: ["a man on a beach"], 2: ["a dog in the park"]}


def test_bleu_perfect_match():
    corpus, per_image = bleu(GTS, RES_GOOD)
    for b in corpus:
        assert b > 0.999
    assert len(per_image) == 4 and len(per_image[0]) == 2


def test_bleu_matches_nltk():
    from nltk.translate.bleu_score import corpus_bleu

    refs = [[r.split() for r in GTS[k]] for k in GTS]
    hyps = [RES_PART[k][0].split() for k in GTS]
    ours, _ = bleu(GTS, RES_PART)
    for n in range(1, 5):
        weights = tuple([1.0 / n] * n)
        want = corpus_bleu(refs, hyps, weights=weights)
        np.testing.assert_allclose(ours[n - 1], want, atol=2e-3)


def test_bleu_ranks_quality():
    good, _ = bleu(GTS, RES_GOOD)
    part, _ = bleu(GTS, RES_PART)
    assert all(g > p for g, p in zip(good, part))


def test_cider_perfect_and_ordering():
    corpus_good, per_img = cider_d(GTS, RES_GOOD)
    corpus_part, _ = cider_d(GTS, RES_PART)
    assert corpus_good > corpus_part >= 0
    assert len(per_img) == 2
    # exact matches score 10 per image (cos=1, len penalty=1, x10) when the
    # corpus has >1 image so idf > 0 (a 1-image corpus degenerates to 0,
    # matching pycocoevalcap)
    pair_gts = {1: ["a cat on a mat"], 2: ["two dogs chase birds quickly"]}
    pair_res = {1: ["a cat on a mat"], 2: ["two dogs chase birds quickly"]}
    score, per = cider_d(pair_gts, pair_res)
    np.testing.assert_allclose(score, 10.0, atol=1e-6)
    np.testing.assert_allclose(per, [10.0, 10.0], atol=1e-6)
    solo, _ = cider_d({1: ["a cat"]}, {1: ["a cat"]})
    assert solo == 0.0


def test_rouge_l():
    score, per = rouge_l(GTS, RES_GOOD)
    assert score > 0.999 and len(per) == 2
    part, _ = rouge_l(GTS, RES_PART)
    assert part < score


def test_meteor_properties():
    good, _ = meteor(GTS, RES_GOOD)
    part, _ = meteor(GTS, RES_PART)
    assert 0 <= part < good <= 1
    # stem matching: "surfing" vs "surf" alignment contributes
    s1, _ = meteor({1: ["a man surfing"]}, {1: ["a man surfs"]})
    s2, _ = meteor({1: ["a man surfing"]}, {1: ["a man jumping"]})
    assert s1 > s2


def test_generate_scores_interface():
    gts = {k: [{"caption": c} for c in v] for k, v in GTS.items()}
    res = {k: [{"caption": v[0]}] for k, v in RES_GOOD.items()}
    scores, img_scores = generate_scores(gts, res)
    assert set(scores) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "CIDEr"}
    assert set(img_scores[1]) == set(scores)

    full, img_full = generate_scores_full(gts, res)
    assert set(full) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR",
                         "ROUGE_L", "CIDEr", "SPICE"}
    assert 0.0 <= full["SPICE"] <= 1.0 and 0.0 <= img_full[1]["SPICE"] <= 1.0
    no_sp, _ = generate_scores_full(gts, res, include_spice=False)
    assert "SPICE" not in no_sp
    assert no_sp["CIDEr"] == full["CIDEr"]  # other metrics unaffected


def test_meteor_synonym_stage():
    """meteor-1.5's WordNet synonym stage (reference utils/scoring.py:12),
    backed by the vendored caption-domain table offline."""
    from clipcap_tpu.eval.synonyms import SynonymTable, default_table

    table = default_table()
    assert table.are_synonyms("car", "automobile")
    assert table.are_synonyms("photo", "picture")
    assert not table.are_synonyms("car", "dog")
    assert table.are_synonyms("Dog", "puppy")  # case-insensitive

    # a pure synonym substitution must outscore an unrelated word ...
    syn_sub, _ = meteor({1: ["a man rides a bicycle"]}, {1: ["a man rides a bike"]})
    unrel, _ = meteor({1: ["a man rides a bicycle"]}, {1: ["a man rides a zebra"]})
    assert syn_sub > unrel
    # ... but score below an exact match (stage weight 0.8 < 1.0)
    exact, _ = meteor({1: ["a man rides a bicycle"]}, {1: ["a man rides a bicycle"]})
    assert exact > syn_sub

    # stage ordering: exact > stem > synonym for the same slot
    stem_m, _ = meteor({1: ["a man running"]}, {1: ["a man runs"]})
    syn_m, _ = meteor({1: ["a man running"]}, {1: ["a man sprinting"]})
    assert exact > stem_m > 0 and stem_m < 1.0
    assert syn_m > 0

    # custom tables are injectable (full WordNet drops in the same way)
    custom = SynonymTable([("zebra", "bicycle")])
    forced, _ = meteor(
        {1: ["a man rides a bicycle"]}, {1: ["a man rides a zebra"]},
        synonym_table=custom,
    )
    assert forced > unrel


def test_meteor_offline_synonym_deviation_is_bounded():
    """Quantify the documented offline deviation (eval/meteor.py): synonym
    pairs OUTSIDE the vendored caption-domain table score as non-matches.

    The WordNet corpus is not installable here (nltk ships code only, no
    data — see eval/synonyms.from_nltk_wordnet), so full-WordNet synonymy
    is simulated by EXTENDING the vendored table with known WordNet pairs
    it misses. On a 9-word caption whose alignment differs by exactly one
    such pair, the measured deficit is 0.1087 METEOR per missed pair.
    This test freezes that bound: if the vendored table or the matcher
    drifts so a missed pair costs more than 0.11, it fails."""
    from clipcap_tpu.eval import synonyms as syn_mod
    from clipcap_tpu.eval.synonyms import SynonymTable, default_table

    base = default_table()
    # true WordNet synonym pairs deliberately outside the caption domain
    wordnet_pairs = [("physician", "doctor"), ("attorney", "lawyer"),
                     ("currency", "money"), ("quarrel", "argument"),
                     ("fog", "mist")]
    missing = [p for p in wordnet_pairs if not base.are_synonyms(*p)]
    assert len(missing) >= 3  # the table stays caption-domain

    gts, res = {}, {}
    for i, (a, b) in enumerate(missing):
        gts[i] = [f"a {a} appears near the old wooden fence at sunset"]
        res[i] = [f"a {b} appears near the old wooden fence at sunset"]
    vend, vend_scores = meteor(gts, res, base)
    full_table = SynonymTable(tuple(syn_mod._CAPTION_SYNSETS) + tuple(missing))
    full, full_scores = meteor(gts, res, full_table)

    # direction: missing synonymy can only LOWER the offline score
    assert full >= vend
    deltas = [f - v for f, v in zip(full_scores, vend_scores)]
    assert all(d > 0 for d in deltas)  # each pair really exercised the stage
    assert max(deltas) <= 0.11  # frozen measured bound (0.1087 per pair)


def test_spice_extraction_fixtures():
    """Pin the rule-based scene-graph extraction (eval/spice.py) on simple
    declarative captions — the tuples a dependency-parse-based extractor
    yields on these patterns (documented deviation covers the rest)."""
    from clipcap_tpu.eval.spice import extract_tuples

    cases = {
        "a man rides a red bicycle": {
            ("man",), ("bicycle",), ("bicycle", "red"),
            ("man", "rides", "bicycle"),
        },
        "a young woman is sitting on a wooden bench": {
            ("woman",), ("woman", "young"), ("bench",), ("bench", "wooden"),
            ("woman", "sitting on", "bench"),
        },
        "the car is red": {("car",), ("car", "red")},
        "a plate of food on the table": {
            ("plate",), ("food",), ("table",),
            ("plate", "of", "food"), ("food", "on", "table"),
        },
        "two dogs play with a ball in the park": {
            ("dogs",), ("ball",), ("park",),
            ("dogs", "play with", "ball"), ("ball", "in", "park"),
        },
    }
    for caption, want in cases.items():
        assert extract_tuples(caption) == frozenset(want), caption


def test_spice_scoring_model():
    """SPICE scoring invariants: perfect=1, disjoint=0, monotone in
    matched tuples, synonym matching counts."""
    from clipcap_tpu.eval.spice import spice

    gts = {1: ["a man rides a red bicycle", "a person riding a bike"],
           2: ["a cat sleeps on the sofa"]}
    perfect, _ = spice({1: ["a man rides a bicycle"]},
                       {1: ["a man rides a bicycle"]})
    assert perfect == 1.0
    disjoint, _ = spice(gts, {1: ["a plane flying in the sky"],
                              2: ["two pizzas under an umbrella"]})
    assert disjoint == 0.0

    close, _ = spice(gts, {1: ["a man riding a red bicycle"],
                           2: ["a cat sleeping on a couch"]})  # couch~sofa synonym
    far, _ = spice(gts, {1: ["a man riding a horse"],
                         2: ["a cat sleeping on a roof"]})
    assert 0.0 < far < close <= 1.0

    # synonym stage: bike ~ bicycle through the shared table
    syn, _ = spice({1: ["a man rides a bicycle"]}, {1: ["a man rides a bike"]})
    assert syn == 1.0
