"""Application-layer tests with a tiny injected world: caption_me,
prepare_human_eval (plain + multi-filter cascade), the sweep runner, the
evaluate CLI core, and the folder-inference demo.
"""

import json
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clipcap_tpu.cli.caption_me import caption_image
from clipcap_tpu.cli.evaluate import evaluate
from clipcap_tpu.cli.human_eval import prepare_human_eval
from clipcap_tpu.cli.infer import folder_demo
from clipcap_tpu.cli.sweep import run_eval, run_sweep
from clipcap_tpu.cli.synthesis import SynthesisEngine, default_grids
from clipcap_tpu.core.config import (
    BlipTextConfig,
    CaptionerConfig,
    CLIPTextConfig,
    GPT2Config,
    MapperConfig,
    ViTConfig,
)
from clipcap_tpu.eval.clip_scoring import ClipScoring
from clipcap_tpu.models import blip_retrieval, captioner, clip_text, vit
from clipcap_tpu.models.bundle import CaptionerBundle
from clipcap_tpu.rank.rankers import BLIPRanker, CLIPRanker
from clipcap_tpu.tokenizers.clip_bpe import CLIPTokenizer
from clipcap_tpu.tokenizers.wordpiece import WordPieceTokenizer

VOCAB = ("[PAD] [UNK] [CLS] [SEP] [MASK] a picture of the cat dog man on top "
         "wave surf ##board . , green park bench two people beach [DEC] [ENC]").split()


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    d = tmp_path_factory.mktemp("apps")
    (d / "vocab.txt").write_text("\n".join(VOCAB))
    wp_tok = WordPieceTokenizer.from_vocab_file(str(d / "vocab.txt"))

    blip_vit_cfg = ViTConfig(image_size=32, patch_size=16, width=24, layers=1,
                             heads=4, output_dim=None, style="blip")
    blip_text_cfg = BlipTextConfig(
        vocab_size=len(VOCAB), hidden_size=24, num_layers=1, num_heads=4,
        intermediate_size=48, max_position_embeddings=64, encoder_width=24,
        embed_dim=12)
    blip_params = blip_retrieval.init(jax.random.PRNGKey(0), blip_vit_cfg, blip_text_cfg)

    merges = [("c", "a"), ("ca", "t</w>"), ("t", "h"), ("th", "e</w>")]
    clip_tok = CLIPTokenizer(merges)
    clip_vit_cfg = ViTConfig(image_size=32, patch_size=16, width=24, layers=1,
                             heads=4, output_dim=12, style="clip")
    clip_text_cfg = CLIPTextConfig(vocab_size=max(clip_tok.encoder.values()) + 1,
                                   context_length=77, width=24, layers=1,
                                   heads=4, output_dim=12)
    clip_ranker = CLIPRanker(
        vit.init(jax.random.PRNGKey(1), clip_vit_cfg), clip_vit_cfg,
        clip_text.init(jax.random.PRNGKey(2), clip_text_cfg), clip_text_cfg,
        clip_tok,
    )
    engine = SynthesisEngine(
        blip_params=blip_params, blip_vit_cfg=blip_vit_cfg,
        blip_text_cfg=blip_text_cfg, tokenizer=wp_tok,
        clip_rankers={"ViT-L/14": clip_ranker, "RN50x64": clip_ranker},
        blip_ranker=BLIPRanker(blip_params, blip_vit_cfg, blip_text_cfg, wp_tok),
    )
    scoring = ClipScoring(clip_ranker.vit_params, clip_vit_cfg,
                          clip_ranker.text_params, clip_text_cfg, clip_tok)
    return engine, scoring, d


@pytest.fixture(scope="module")
def coco_val(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("cocoval")
    (d / "images").mkdir()
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(3):
        name = f"v{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)).save(
            d / "images" / name)
        images.append({"id": i, "file_name": name})
        for j in range(2):
            annotations.append({"image_id": i, "id": i * 10 + j,
                                "caption": f"a cat on the bench {i}."})
    (d / "cap.json").write_text(json.dumps({"images": images, "annotations": annotations}))
    return d


def test_default_grids():
    top_p, min_len, max_len = default_grids()
    assert len(top_p) == len(min_len) == len(max_len) == 40
    assert min_len.tolist() == [5] * 8 + [10] * 8 + [15] * 8 + [20] * 8 + [30] * 8
    t, m, x = default_grids(set_top_p=0.3, set_min_len=7, set_max_len=9, n=8)
    assert (t == np.float32(0.3)).all() and (m == 7).all() and (x == 9).all()


@pytest.mark.parametrize("mode", ["CLIP-ViT-L+RN50x64", "CLIP-ViT-L", "ITM", "ITC"])
def test_caption_image_modes(world, mode):
    from PIL import Image

    engine, _, _ = world
    img = Image.fromarray(np.random.default_rng(1).integers(0, 255, (40, 40, 3),
                                                            dtype=np.uint8))
    ranked, captions = caption_image(engine, img, mode=mode, sample_count=8,
                                     top_k=0, force_eos_prob=0.0, top_n=2,
                                     set_max_len=6)
    assert captions and len(ranked) <= 2
    for c, s in ranked:
        assert isinstance(c, str) and np.isfinite(s)


def test_prepare_human_eval_plain(world, coco_val, tmp_path):
    engine, _, _ = world
    out = tmp_path / "eval_plain"
    priv = prepare_human_eval(
        engine, str(coco_val / "cap.json"), str(coco_val / "images"), str(out),
        n=2, mode="CLIP-ViT-L", top_k=0, force_eos_prob=0.0,
        set_max_len=6, make_plots=True,
    )
    assert len(priv) == 2
    assert (out / "eval.html").exists()
    assert (out / "eval.csv").exists()
    assert (out / "gt.csv").exists()
    assert (out / "params.json").exists()
    assert (out / "images").is_dir()
    assert any(out.glob("score_*_hist_all.png"))
    # rerun must fail loudly (reference mkdir(exist_ok=False))
    with pytest.raises(FileExistsError):
        prepare_human_eval(engine, str(coco_val / "cap.json"),
                           str(coco_val / "images"), str(out), n=1)


def test_prepare_human_eval_multi_filter(world, coco_val, tmp_path):
    engine, _, _ = world
    out = tmp_path / "eval_mf"
    priv = prepare_human_eval(
        engine, str(coco_val / "cap.json"), str(coco_val / "images"), str(out),
        n=2, multi_filter=True, top_k=0, force_eos_prob=0.0, set_max_len=6,
    )
    assert len(priv) == 2
    for e in priv:
        assert e["synth_captions"]
        assert len(e["synth_captions"]) == len(e["synth_captions_scores_itc"])
    assert (out / "eval.html").exists()


def test_sweep_run_eval_and_random_search(world, coco_val):
    engine, _, _ = world
    scores = run_eval(engine, str(coco_val / "cap.json"), str(coco_val / "images"),
                      n=2, mode="ITC", batch_size=4, top_k=0,
                      force_eos_prob=0.0, max_len=6)
    assert set(scores) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "CIDEr"}

    sweep_cfg = {
        "metric": {"name": "Bleu_4"},
        "parameters": {
            "min_len": {"min": 1, "max": 3},
            "top_p": {"min": 0.3, "max": 0.9},
            "max_len": {"values": [6]},
            "force_eos_prob": {"values": [0.0]},
            "top_k": {"values": [0]},
            "mode": {"values": ["ITC"]},
            "batch_size": {"values": [4]},
        },
    }
    results = run_sweep(engine, sweep_cfg, str(coco_val / "cap.json"),
                        str(coco_val / "images"), trials=2, n_images=2)
    assert len(results) == 2


def test_evaluate_cli_core(world, coco_val):
    _, scoring, d = world
    from clipcap_tpu.data.preprocessing import blip_preprocess
    from clipcap_tpu.tokenizers import GPT2TokenizerWrapper
    from clipcap_tpu.tokenizers.bpe import ByteLevelBPE, bytes_to_unicode

    base = list(bytes_to_unicode().values())
    merges = [("Ġ", "a")]
    vocab = {t: i for i, t in enumerate(dict.fromkeys(
        base + ["".join(m) for m in merges] + ["<|endoftext|>"]))}
    gpt_tok = GPT2TokenizerWrapper(ByteLevelBPE(vocab, merges))

    lm_cfg = GPT2Config(vocab_size=len(vocab), n_positions=96, n_embd=24,
                        n_layer=1, n_head=4)
    map_cfg = MapperConfig(dim_clip=24, dim_embedding=24, prefix_length=2,
                           clip_length=5, num_layers=1, num_heads=2,
                           use_all_features=True)
    cap_cfg = CaptionerConfig(lm_type="gpt2", mapper=map_cfg)
    vit_cfg = ViTConfig(image_size=32, patch_size=16, width=24, layers=1,
                        heads=4, output_dim=None, style="blip")
    params = captioner.init(jax.random.PRNGKey(0), cap_cfg, lm_cfg)
    params["visual"] = vit.init(jax.random.PRNGKey(1), vit_cfg)
    bundle = CaptionerBundle(params=params, cap_cfg=cap_cfg, lm_cfg=lm_cfg,
                             tokenizer=gpt_tok, vit_cfg=vit_cfg)

    results = evaluate(
        bundle, scoring, str(coco_val / "cap.json"), str(coco_val / "images"),
        max_samples=2, nobeam_top_p=(0.1,), branching_factor=2, look_ahead=2,
        preprocess=lambda img: blip_preprocess(img, 32),
    )
    assert np.isfinite(results["validation_loss"])
    assert "nobeam" in results["sampler_scores"]
    assert "clip_guided" in results["sampler_scores"]

    # folder-inference demo over the same images (uses metadata-less jpgs)
    import os

    cwd = os.getcwd()
    os.chdir(str(coco_val))
    try:
        data = folder_demo(bundle, scoring, str(coco_val / "images"),
                           total_samples=1, use_beam_search=True)
    finally:
        os.chdir(cwd)
    assert len(data) == 1
    entry = next(iter(data.values()))
    assert "generated_captions" in entry and "scores" in entry

    # speculative decoding: a smaller draft captioner (own mapper + LM,
    # same tokenizer) must produce the target's greedy captions exactly
    d_lm_cfg = GPT2Config(vocab_size=len(vocab), n_positions=96, n_embd=12,
                          n_layer=1, n_head=2)
    d_map_cfg = MapperConfig(dim_clip=24, dim_embedding=12, prefix_length=2,
                             clip_length=5, num_layers=1, num_heads=2,
                             use_all_features=True)
    d_cap_cfg = CaptionerConfig(lm_type="gpt2", mapper=d_map_cfg)
    d_params = captioner.init(jax.random.PRNGKey(7), d_cap_cfg, d_lm_cfg)
    draft = CaptionerBundle(params=d_params, cap_cfg=d_cap_cfg,
                            lm_cfg=d_lm_cfg, tokenizer=gpt_tok)
    os.chdir(str(coco_val))
    try:
        spec = folder_demo(bundle, scoring, str(coco_val / "images"),
                           total_samples=1, use_beam_search=False,
                           draft_bundle=draft, gamma=2)
    finally:
        os.chdir(cwd)
    entry = next(iter(spec.values()))
    assert "generated_captions" in entry and len(entry["generated_captions"]) >= 1
