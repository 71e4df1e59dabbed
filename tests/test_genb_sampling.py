"""Gen-B toolkit tests: WordPiece tokenizer vs HF BertTokenizer, the
batched heterogeneous sampler, ITM/ITC heads, ranking cascades, CLIP BPE.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clipcap_tpu.core.config import BlipTextConfig, ViTConfig
from clipcap_tpu.decode import hetero
from clipcap_tpu.models import blip_retrieval, blip_text
from clipcap_tpu.rank.cascade import threshold_cascade, two_stage_rank
from clipcap_tpu.tokenizers.wordpiece import WordPieceTokenizer
from clipcap_tpu.tokenizers.clip_bpe import CLIPTokenizer


BLIP_VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] a picture of the cat dog man surf ##board "
    "riding wave on top sitting ##s , . ! wooden bench park green grass two "
    "people walking beach with in [DEC] [ENC]"
).split()


@pytest.fixture(scope="module")
def wp_tokenizer(tmp_path_factory):
    d = tmp_path_factory.mktemp("wp")
    (d / "vocab.txt").write_text("\n".join(BLIP_VOCAB) + "\n")
    return WordPieceTokenizer.from_vocab_file(str(d / "vocab.txt"))


def test_wordpiece_matches_hf(wp_tokenizer, tmp_path):
    from transformers import BertTokenizer

    vocab_path = tmp_path / "vocab.txt"
    vocab_path.write_text("\n".join(BLIP_VOCAB) + "\n")
    hf = BertTokenizer(str(vocab_path), do_lower_case=True)
    for text in [
        "a picture of the cat",
        "Two people WALKING on the beach!",
        "a man riding a surfboard, on top of a wave.",
        "unknownword cat",
    ]:
        assert wp_tokenizer.encode(text) == hf.encode(text), text
        assert wp_tokenizer.decode(wp_tokenizer.encode(text)) == hf.decode(
            hf.encode(text), skip_special_tokens=True
        )


TEXT_CFG = BlipTextConfig(
    vocab_size=len(BLIP_VOCAB), hidden_size=32, num_layers=2, num_heads=4,
    intermediate_size=64, max_position_embeddings=64, encoder_width=24, embed_dim=16,
)


def test_hetero_sample_semantics(wp_tokenizer):
    params = blip_text.init(jax.random.PRNGKey(0), TEXT_CFG)
    image_embeds = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 24))
    min_len = np.array([2, 2, 5, 5])
    max_len = np.array([8, 8, 8, 8])
    captions, parameters, stats = hetero.sample(
        image_embeds, params, TEXT_CFG, wp_tokenizer,
        sample_count=4,
        top_p=np.array([0.9, 0.5, 0.9, 0.5]),
        top_k=0.0, typ_p=0.0,
        min_len=min_len, max_len=max_len,
        repetition_penalty=1.3,
        force_eos_log_prob=0.0,  # disabled: random model has flat eos probs
        num_runs=2,
        rng=jax.random.PRNGKey(2),
    )
    assert captions and len(captions) == len(parameters) == len(stats)
    assert len(set(captions)) == len(captions)  # unique=True dedups
    for p, s in zip(parameters, stats):
        assert p[0] in (2, 5) and p[1] == 8
        assert min(abs(p[2] - v) for v in (0.9, 0.5)) < 1e-6
        assert len(s["tokens"]) <= 9


def test_itm_itc_scores():
    vit_cfg = ViTConfig(image_size=16, patch_size=8, width=24, layers=1, heads=4,
                        mlp_ratio=2.0, output_dim=None, style="blip")
    params = blip_retrieval.init(jax.random.PRNGKey(0), vit_cfg, TEXT_CFG)
    pixels = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 16, 16))
    img = blip_retrieval.encode_image(params, vit_cfg, pixels)
    assert img.shape == (1, 5, 24)
    toks = jnp.asarray([[2, 5, 6, 7, 3], [2, 9, 10, 26, 3]])
    img2 = jnp.repeat(img, 2, axis=0)
    itm = blip_retrieval.itm_score(params, TEXT_CFG, toks, img2)
    assert itm.shape == (2,) and ((itm >= 0) & (itm <= 1)).all()
    itc = blip_retrieval.itc_score(params, TEXT_CFG, toks, img2)
    assert itc.shape == (2,) and ((itc >= -1.001) & (itc <= 1.001)).all()


def test_two_stage_rank():
    caps = ["a", "b", "c", "d", "e", "f"]
    s1 = lambda cs: [ord(c) for c in cs]  # favors later letters
    s2 = lambda cs: [-ord(c) for c in cs]  # favors earlier letters
    out = two_stage_rank(caps, s1, s2, shortlist=3, top_n=2)
    # stage1 shortlist: f, e, d; stage2 reranks ascending: d best
    assert [c for c, _ in out] == ["d", "e"]


def test_threshold_cascade_with_fallback():
    caps = ["w", "x", "y", "z"]
    stage_pass = (lambda cs: [1.0 if c in ("x", "y", "z") else 0.0 for c in cs], 0.5)
    stage_fail = (lambda cs: [0.1 * (ord(c) - ord("w")) for c in cs], 9.9)  # nobody passes
    out = threshold_cascade(caps, [stage_pass, stage_fail], fallback_fraction=0.34)
    # stage1 keeps x,y,z; stage2 falls back to top ceil(3*0.34)=2 by score: z,y
    assert out == ["z", "y"]


def test_clip_bpe_tokenize_semantics():
    merges = [("c", "a"), ("ca", "t</w>"), ("d", "o"), ("do", "g</w>"), ("t", "h"),
              ("th", "e</w>")]
    tok = CLIPTokenizer(merges)
    ids = tok.encode("The cat")
    assert tok.decode(ids) == "the cat"
    arr = tok.tokenize(["the cat", "dog"], context_length=8)
    assert arr.shape == (2, 8)
    assert arr[0, 0] == tok.sot_token
    row = [t for t in arr[0] if t != 0]
    assert row[-1] == tok.eot_token
    # truncation sets last token to eot
    long = tok.tokenize("the cat dog the cat dog the cat dog", context_length=6, truncate=True)
    assert long[0, -1] == tok.eot_token
    with pytest.raises(RuntimeError):
        tok.tokenize("the cat dog the cat dog", context_length=4)


def test_int8_blip_decoder_tracks_f32():
    """blip_text.quantize_params + the quant-dispatching linears: int8
    synthesis must track the full-precision decoder (same engine path,
    logits correlated, tokens mostly agreeing)."""
    from clipcap_tpu.decode import GenerationSettings, generate

    text_cfg = TEXT_CFG
    params = blip_text.init(jax.random.PRNGKey(7), text_cfg)
    img = jax.random.normal(jax.random.PRNGKey(8), (2, 6, text_cfg.encoder_width)) * 0.1

    q = blip_text.quantize_params(params)
    prompt = jnp.asarray(np.tile(np.array([[2, 11, 12]]), (4, 1)))
    settings = GenerationSettings(max_new_tokens=8, greedy=True, eos_token_id=3)

    lm = blip_text.decoder_lm(params, text_cfg, img, repeat=2)
    want = np.asarray(generate(lm, params, text_cfg, prompt, settings)["tokens"])
    lm8 = blip_text.decoder_lm(q, text_cfg, img, repeat=2)
    got = np.asarray(generate(lm8, q, text_cfg, prompt, settings)["tokens"])
    agree = (want == got).mean()
    assert agree >= 0.6, f"token agreement {agree}"

    # logits parity on the prefill (tighter check than greedy trajectories)
    cache = lm.init_cache(text_cfg, batch=4, max_len=12)
    ref, _ = lm.prefill(params, text_cfg, prompt, cache)
    cache8 = lm8.init_cache(text_cfg, batch=4, max_len=12)
    out8, _ = lm8.prefill(q, text_cfg, prompt, cache8)
    corr = np.corrcoef(np.asarray(ref, np.float32).ravel(),
                       np.asarray(out8, np.float32).ravel())[0, 1]
    assert corr > 0.995, corr


def test_sweep_trials_reuse_one_executable(wp_tokenizer):
    """Hyperparameter vectors are traced arguments: two sample() calls
    with different top_p/top_k/min/max values (a TPE sweep's trials) must
    hit ONE cached jitted closure — recompiling per trial costs seconds
    through the TPU relay — and still produce per-trial results."""
    from clipcap_tpu.decode.hetero import _SAMPLE_CACHE

    params = blip_text.init(jax.random.PRNGKey(0), TEXT_CFG)
    image_embeds = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 24))
    _SAMPLE_CACHE.clear()

    caps1, params1, _ = hetero.sample(
        image_embeds, params, TEXT_CFG, wp_tokenizer, sample_count=4,
        top_p=np.array([0.3, 0.5, 0.7, 0.9]), top_k=6.0,
        min_len=np.array([1, 2, 2, 3]), max_len=np.array([6, 6, 6, 6]),
        rng=jax.random.PRNGKey(0),
    )
    n_compiled = len(_SAMPLE_CACHE)
    caps2, params2, _ = hetero.sample(
        image_embeds, params, TEXT_CFG, wp_tokenizer, sample_count=4,
        top_p=np.array([0.1, 0.2, 0.4, 0.6]), top_k=3.0,
        min_len=np.array([2, 3, 3, 4]), max_len=np.array([6, 6, 6, 6]),
        rng=jax.random.PRNGKey(0),
    )
    assert len(_SAMPLE_CACHE) == n_compiled  # second trial reused the closure
    assert params1 != params2  # per-trial metadata reflects each trial's values
    assert caps1 and caps2


def test_sample_cache_evicts_lru_not_everything():
    """The executable cache bound evicts ONE least-recently-used entry —
    wiping the dict would make a sweep alternating >32 distinct static
    settings recompile its hot key (~9.4 s per compile over the relay)."""
    from clipcap_tpu.decode.hetero import _SAMPLE_CACHE, _compiled_sample

    _SAMPLE_CACHE.clear()
    try:
        hot = _compiled_sample(TEXT_CFG, None, key=(("hot", 0),), sample_count=1)
        for i in range(40):  # overflow the 32-entry bound several times
            _compiled_sample(TEXT_CFG, None, key=(("cold", i),), sample_count=1)
            # touching the hot key must refresh its recency...
            assert _compiled_sample(
                TEXT_CFG, None, key=(("hot", 0),), sample_count=1) is hot
        assert 0 < len(_SAMPLE_CACHE) <= 33  # ...and the bound still holds
    finally:
        _SAMPLE_CACHE.clear()
