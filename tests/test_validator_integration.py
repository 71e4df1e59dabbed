"""End-to-end validator integration: tiny COCO on disk -> image dataset ->
samplers (no-beam batched sweep, beam, clip-guided) -> CLIP scoring ->
validation CE loss -> BLEU/CIDEr results. Exercises the whole eval stack
that the reference wires in evaluate_model.py:538-620.
"""

import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clipcap_tpu.core.config import (
    CaptionerConfig,
    CLIPTextConfig,
    GPT2Config,
    MapperConfig,
    ViTConfig,
)
from clipcap_tpu.data.coco import CocoImageDataset, CocoCaptionDataset, BatchLoader
from clipcap_tpu.data.preprocessing import blip_preprocess
from clipcap_tpu.eval.clip_scoring import ClipScoring
from clipcap_tpu.eval.samplers import (
    BeamCaptionSampler,
    ClipGuidedCaptionSampler,
    NoBeamCaptionSampler,
)
from clipcap_tpu.eval.validator import CocoCaptionValidator
from clipcap_tpu.models import captioner, clip_text, vit
from clipcap_tpu.models.bundle import CaptionerBundle
from clipcap_tpu.tokenizers import GPT2TokenizerWrapper
from clipcap_tpu.tokenizers.bpe import ByteLevelBPE, bytes_to_unicode
from clipcap_tpu.tokenizers.clip_bpe import CLIPTokenizer


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("coco")
    (d / "images").mkdir()
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(3):
        name = f"img_{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)).save(
            d / "images" / name
        )
        images.append({"id": i, "file_name": name, "coco_url": f"http://x/{name}"})
        for j in range(2):
            annotations.append(
                {"image_id": i, "caption": f"a cat sat on the mat {i} {j}.", "id": 10 * i + j}
            )
    (d / "captions.json").write_text(json.dumps({"images": images, "annotations": annotations}))
    return d


@pytest.fixture(scope="module")
def tiny_world():
    """Tiny captioner bundle + CLIP towers, all random weights."""
    base = list(bytes_to_unicode().values())
    merges = [("Ġ", "a"), ("c", "a"), ("ca", "t"), ("m", "a"), ("ma", "t"),
              ("t", "h"), ("th", "e"), ("s", "a"), ("sa", "t"), ("o", "n")]
    vocab = {t: i for i, t in enumerate(dict.fromkeys(base + ["".join(m) for m in merges] + ["<|endoftext|>"]))}
    tok = GPT2TokenizerWrapper(ByteLevelBPE(vocab, merges))

    lm_cfg = GPT2Config(vocab_size=len(vocab), n_positions=128, n_embd=32, n_layer=2, n_head=4)
    map_cfg = MapperConfig(dim_clip=24, dim_embedding=32, prefix_length=4,
                           clip_length=4, num_layers=1, num_heads=2,
                           use_all_features=True)
    cap_cfg = CaptionerConfig(lm_type="gpt2", mapper=map_cfg,
                              visual_encoder_type="BLIP")
    blip_vit_cfg = ViTConfig(image_size=32, patch_size=16, width=24, layers=1,
                             heads=4, output_dim=None, style="blip")

    k = jax.random.PRNGKey(0)
    params = captioner.init(k, cap_cfg, lm_cfg)
    params["visual"] = vit.init(jax.random.PRNGKey(1), blip_vit_cfg)
    bundle = CaptionerBundle(params=params, cap_cfg=cap_cfg, lm_cfg=lm_cfg,
                             tokenizer=tok, vit_cfg=blip_vit_cfg)

    # tiny CLIP for scoring
    clip_vit_cfg = ViTConfig(image_size=32, patch_size=16, width=24, layers=1,
                             heads=4, output_dim=16, style="clip")
    clip_text_cfg = CLIPTextConfig(vocab_size=len(vocab) + 2 + len(merges) * 0 + 600,
                                   context_length=77, width=24, layers=1, heads=4,
                                   output_dim=16)
    clip_tok = CLIPTokenizer(merges)
    clip_text_cfg = CLIPTextConfig(vocab_size=max(clip_tok.encoder.values()) + 1,
                                   context_length=77, width=24, layers=1, heads=4,
                                   output_dim=16)
    scoring = ClipScoring(
        vit.init(jax.random.PRNGKey(2), clip_vit_cfg), clip_vit_cfg,
        clip_text.init(jax.random.PRNGKey(3), clip_text_cfg), clip_text_cfg,
        clip_tok,
    )
    return bundle, scoring


def preprocess(image):
    return blip_preprocess(image, image_size=32)


def test_caption_dataset_padding(coco_dir, tiny_world):
    bundle, _ = tiny_world
    ds = CocoCaptionDataset(
        str(coco_dir / "captions.json"), str(coco_dir / "images"),
        tokenizer=bundle.tokenizer, image_transform=preprocess, max_token_length=24,
    )
    item = ds[0]
    assert item["image_tensor"].shape == (3, 32, 32)
    assert item["tokens"].shape == (24,)
    assert item["tokens"][0] == bundle.tokenizer.bos_token_id
    assert (item["tokens"] == -1).sum() > 0  # -1 padding

    loader = BatchLoader(ds, batch_size=2, shuffle=True)
    batch = next(iter(loader))
    assert batch["image_tensor"].shape == (2, 3, 32, 32)
    assert batch["tokens"].shape == (2, 24)


def test_validator_end_to_end(coco_dir, tiny_world):
    bundle, scoring = tiny_world
    dataset = CocoImageDataset(str(coco_dir / "captions.json"), str(coco_dir / "images"))
    assert len(dataset) == 3

    samplers = {
        "nobeam": NoBeamCaptionSampler(top_p_values=[0.1, 0.2], max_decode_length=8),
        "beam": BeamCaptionSampler(beam_size=2, max_decode_length=6),
        "clip_guided": ClipGuidedCaptionSampler(scoring, branching_factor=2, look_ahead=2),
    }
    validator = CocoCaptionValidator(dataset, preprocess, samplers, scoring)

    for i in range(2):
        validator.process(bundle, [dataset[i]])

    results = validator.get_results()
    assert np.isfinite(results["validation_loss"])
    assert np.isfinite(results["clip_score"])
    for sid in samplers:
        s = results["sampler_scores"][sid]
        assert set(s) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "CIDEr"}
    caps = results["captions"]
    assert len(caps) == 2
    assert {sr["sampler_id"] for sr in caps[0]["sampling_results"]} == set(samplers)

    validator.reset()
    assert validator.results["captions"] == []


def test_image_dataset_missing_file_returns_none(coco_dir):
    ds = CocoImageDataset(str(coco_dir / "captions.json"), str(coco_dir / "nowhere"))
    assert ds[0] is None


def test_clip_guided_sample_batch_matches_singles(coco_dir, tiny_world):
    """ClipGuidedCaptionSampler.sample_batch == per-image sample() (the
    batched path shares every tree dispatch / CLIP text batch across
    images — generate_clip_guided_batch; exact on CPU f32)."""
    bundle, scoring = tiny_world
    dataset = CocoImageDataset(str(coco_dir / "captions.json"), str(coco_dir / "images"))
    sampler = ClipGuidedCaptionSampler(scoring, branching_factor=2, look_ahead=2)

    items = [dataset[i] for i in range(2)]
    images = [it["image"] for it in items]
    tensors = np.stack([np.asarray(preprocess(img)) for img in images])

    singles = [sampler.sample(bundle, jnp.asarray(tensors[i]), images[i])
               for i in range(2)]
    batched = sampler.sample_batch(bundle, tensors, images)
    assert batched == singles


def test_nobeam_sample_batch_matches_singles(coco_dir, tiny_world):
    """NoBeamCaptionSampler.sample_batch == per-image sample() whenever
    the sampling is deterministic (top_p small enough to pin the top
    token) — the batched sweep's rng rows differ otherwise (documented)."""
    bundle, _ = tiny_world
    dataset = CocoImageDataset(str(coco_dir / "captions.json"), str(coco_dir / "images"))
    sampler = NoBeamCaptionSampler(top_p_values=[1e-6, 1e-6],
                                   max_decode_length=8)

    items = [dataset[i] for i in range(3)]
    images = [it["image"] for it in items]
    tensors = np.stack([np.asarray(preprocess(img)) for img in images])

    singles = [sampler.sample(bundle, jnp.asarray(tensors[i]), images[i])
               for i in range(3)]
    batched = sampler.sample_batch(bundle, tensors, images)
    assert batched == singles


def test_clip_guided_sample_batch_chunking_matches_unchunked(coco_dir, tiny_world):
    """ClipGuidedCaptionSampler.sample_batch chunks to max_rows_per_call
    tree rows (r5 layout-cliff bound); chunking must not change per-image
    captions."""
    bundle, scoring = tiny_world
    dataset = CocoImageDataset(str(coco_dir / "captions.json"), str(coco_dir / "images"))
    items = [dataset[i % 2] for i in range(3)]
    images = [it["image"] for it in items]
    tensors = np.stack([np.asarray(preprocess(img)) for img in images])

    sampler = ClipGuidedCaptionSampler(scoring, branching_factor=2, look_ahead=2)
    whole = sampler.sample_batch(bundle, tensors, images)
    sampler.max_rows_per_call = 4  # 2^2 rows/image -> 1 image per call
    chunked = sampler.sample_batch(bundle, tensors, images)
    assert chunked == whole


def test_beam_sample_batch_chunking_matches_unchunked(coco_dir, tiny_world):
    """BeamCaptionSampler.sample_batch chunks calls to max_rows_per_call
    rows (the r5-measured XLA layout cliff past ~480 rows, CLAUDE.md
    'Beam N=128 regression'); chunking must not change per-image
    captions (images are independent)."""
    bundle, _ = tiny_world
    dataset = CocoImageDataset(str(coco_dir / "captions.json"), str(coco_dir / "images"))
    items = [dataset[i % 2] for i in range(3)]
    tensors = np.stack(
        [np.asarray(preprocess(it["image"])) for it in items])

    sampler = BeamCaptionSampler(beam_size=2, max_decode_length=6)
    whole = sampler.sample_batch(bundle, tensors)
    sampler.max_rows_per_call = 2  # forces 1 image per call
    chunked = sampler.sample_batch(bundle, tensors)
    assert chunked == whole


def test_validator_batched_sampling_matches_per_image(coco_dir, tiny_world):
    """CocoCaptionValidator(batched_sampling=True) produces the same
    captions/hypotheses as the per-image path for deterministic
    samplers (beam + clip-guided exact; nobeam pinned via tiny top_p)."""
    bundle, scoring = tiny_world
    dataset = CocoImageDataset(str(coco_dir / "captions.json"), str(coco_dir / "images"))

    def make_samplers():
        return {
            "nobeam": NoBeamCaptionSampler(top_p_values=[1e-6], max_decode_length=8),
            "beam": BeamCaptionSampler(beam_size=2, max_decode_length=6),
            "clip_guided": ClipGuidedCaptionSampler(scoring, branching_factor=2,
                                                    look_ahead=2),
        }

    batch = [dataset[i] for i in range(2)]
    v_batched = CocoCaptionValidator(dataset, preprocess, make_samplers(),
                                     scoring, batched_sampling=True)
    v_single = CocoCaptionValidator(dataset, preprocess, make_samplers(),
                                    scoring, batched_sampling=False)
    v_batched.process(bundle, batch)
    v_single.process(bundle, batch)
    assert v_batched.caption_hypo == v_single.caption_hypo
    rb, rs = v_batched.get_results(), v_single.get_results()
    assert rb["captions"] == rs["captions"]
