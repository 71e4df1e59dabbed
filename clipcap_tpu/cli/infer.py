"""Folder inference demo (the reference's shutterstock demo).

Rebuild of reference inference.py:401-558 `_shutterstock_demo`: iterate a
folder of jpg+json (url/alt metadata), encode each image with the CLIP
visual tower in all-features mode (the monkeypatched all-token forward,
inference.py:422-444 — our ViT's "tokens_proj" output), map to prefix,
generate captions by beam or no-beam, CLIP-score generated vs original
text, compute corpus scores, write `{prefix}_shutterstock.json`.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import List, Optional, Tuple

import jax.numpy as jnp


def demo_generate_captions(
    bundle,
    clip_scoring,
    image,
    number_to_generate: int = 1,
    text_prefix: Optional[str] = None,
    use_beam_search: bool = False,
    draft_bundle=None,
    **generation_kwargs,
) -> Tuple[List[str], jnp.ndarray]:
    """reference inference.py:295-331: preprocess -> encode -> project ->
    beam/no-beam. Returns (captions, image CLIP features)."""
    import numpy as np

    from ..decode.beam import beam_search, best_beam_text
    from ..eval.samplers import NoBeamCaptionSampler

    image_tensor = clip_scoring.preprocess_image(image)
    # the captioner's own visual encoder produces the prefix features
    pixels = jnp.asarray(np.asarray(image_tensor))[None]
    visual_feats = bundle.encode_image(pixels)
    prefix_embed = bundle.project_prefix(visual_feats)

    prompt = prefix_embed
    if text_prefix is not None:
        toks = jnp.asarray([bundle.tokenizer.encode_text(text_prefix)])
        prompt = jnp.concatenate([prefix_embed, bundle.embed_text(toks)], axis=1)

    if draft_bundle is not None and not use_beam_search:
        # speculative greedy (decode/speculative.py): the draft bundle's
        # own mapper produces the draft-space prompt for the same image
        from ..decode.engine import trim_and_decode
        from ..decode.speculative import speculative_greedy

        if "visual" in draft_bundle.params:
            d_feats = draft_bundle.encode_image(pixels)
        else:
            # precomputed-prefix draft: reuse the target's visual features,
            # which is only meaningful when the draft mapper was trained on
            # the SAME encoder's feature space — fail loudly on a width
            # mismatch instead of crashing inside the mapper
            d_dim = draft_bundle.cap_cfg.mapper.dim_clip
            if visual_feats.shape[-1] != d_dim:
                raise ValueError(
                    f"draft bundle has no visual encoder and its mapper "
                    f"expects dim_clip={d_dim}, but the target's visual "
                    f"features are {visual_feats.shape[-1]}-wide — the "
                    f"draft needs its own encoder or a mapper trained on "
                    f"the target's feature space"
                )
            d_feats = visual_feats
        d_prompt = draft_bundle.project_prefix(d_feats)
        if text_prefix is not None:
            d_toks = jnp.asarray([draft_bundle.tokenizer.encode_text(text_prefix)])
            d_prompt = jnp.concatenate(
                [d_prompt, draft_bundle.embed_text(d_toks)], axis=1)
        out = speculative_greedy(
            bundle.lm_decode, bundle.lm_decode_params, bundle.lm_cfg,
            draft_bundle.lm_decode, draft_bundle.lm_decode_params,
            draft_bundle.lm_cfg,
            prompt, d_prompt,
            max_new_tokens=generation_kwargs.get("entry_length", 67),
            gamma=generation_kwargs.get("gamma", 4),
            eos_token_id=bundle.tokenizer.encode_text(".")[0],
            target_cache_constraint=getattr(bundle, "cache_constraint", None),
        )
        captions = trim_and_decode(out, bundle.tokenizer, strip_special=True)
    elif use_beam_search:
        out = beam_search(bundle.lm_decode, bundle.lm_decode_params, bundle.lm_cfg, prompt,
                          beam_size=generation_kwargs.get("beam_size", 5),
                          max_new_tokens=generation_kwargs.get("entry_length", 67),
                          stop_token_id=bundle.tokenizer.encode_text(".")[0],
                          cache_constraint=getattr(bundle, "cache_constraint", None))
        captions = [best_beam_text(out, bundle.tokenizer)]
    else:
        sampler = NoBeamCaptionSampler(
            top_p_values=generation_kwargs.get("top_p_values",
                                               [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
        )
        captions = sampler.generate_captions(bundle, prompt, visual_feats, image)
    captions = captions[:number_to_generate] if number_to_generate else captions
    if text_prefix is not None:
        captions = [text_prefix + c for c in captions]

    image_features = clip_scoring.embed_image(image_tensor)
    return captions, image_features


def folder_demo(
    bundle,
    clip_scoring,
    folder_path: str,
    out_filename_prefix: str = "demo_inference",
    total_samples: int = 100,
    number_to_generate: int = 1,
    text_prefix: Optional[str] = None,
    use_beam_search: bool = True,
    draft_bundle=None,
    **generation_kwargs,
) -> dict:
    import numpy as np
    from PIL import Image

    from ..eval.scoring import generate_scores_full

    samples_path = Path(folder_path)
    sample_data = {}
    scoring_gts, scoring_res, image_id_to_url = {}, {}, {}
    image_id = 0

    files = sorted(samples_path.glob("*.jpg"))[:total_samples]
    loaded = []
    for image_file in files:
        image = Image.open(image_file).convert("RGB")
        metadata_file = image_file.with_suffix(".json")
        metadata = (json.loads(metadata_file.read_text())
                    if metadata_file.exists() else {})
        loaded.append((image_file, image, metadata))

    # beam path: batch images x beams into one executable per chunk
    # (beam_search_batched) instead of the reference's one-image-at-a-time
    # loop — per-image beam leaves the chip ~99% idle (bench
    # beam_search_gpt2xl_int8). Per-image results are identical.
    batched_beam = use_beam_search and draft_bundle is None
    all_captions = {}
    if batched_beam:
        from ..decode.beam import beam_search_batched, best_beam_texts

        # 64 images x beam 5 = 320 rows is the measured throughput optimum
        # (bench beam_search_gpt2xl_int8: 54 captions/s; larger chunks hit
        # the ~480-row layout cliff — CLAUDE.md "Beam N=128 regression")
        chunk = int(generation_kwargs.get("beam_image_batch", 64))
        for lo in range(0, len(loaded), chunk):
            part = loaded[lo:lo + chunk]
            pixels = jnp.asarray(np.stack(
                [np.asarray(clip_scoring.preprocess_image(img))
                 for _, img, _ in part]))
            prompt = bundle.project_prefix(bundle.encode_image(pixels))
            if text_prefix is not None:
                toks = jnp.asarray(
                    [bundle.tokenizer.encode_text(text_prefix)] * len(part))
                prompt = jnp.concatenate(
                    [prompt, bundle.embed_text(toks)], axis=1)
            out = beam_search_batched(
                bundle.lm_decode, bundle.lm_decode_params, bundle.lm_cfg,
                prompt,
                beam_size=generation_kwargs.get("beam_size", 5),
                max_new_tokens=generation_kwargs.get("entry_length", 67),
                stop_token_id=bundle.tokenizer.encode_text(".")[0],
                cache_constraint=getattr(bundle, "cache_constraint", None),
            )
            for (image_file, _, _), text in zip(
                    part, best_beam_texts(out, bundle.tokenizer)):
                all_captions[image_file] = [text]

    for image_file, image, metadata in loaded:
        if batched_beam:
            captions = all_captions[image_file]
        else:
            captions, _ = demo_generate_captions(
                bundle, clip_scoring, image,
                number_to_generate=number_to_generate,
                text_prefix=text_prefix,
                use_beam_search=use_beam_search, draft_bundle=draft_bundle,
                **generation_kwargs,
            )
        print(image_file)
        print(captions)

        url = metadata.get("src", str(image_file))
        original_caption = metadata.get("alt", "")
        sample_data[url] = {
            "original_caption": original_caption,
            "generated_captions": captions,
        }
        scoring_res[image_id] = [{"caption": original_caption}]
        scoring_gts[image_id] = [{"caption": c} for c in captions]
        image_id_to_url[image_id] = url
        image_id += 1

    scores, img_scores = generate_scores_full(scoring_gts, scoring_res)
    print("Scores")
    print(scores)
    for img_id, s in img_scores.items():
        sample_data[image_id_to_url[img_id]]["scores"] = s

    out_path = f"{out_filename_prefix}_shutterstock.json"
    with open(out_path, "w+") as f:
        json.dump(sample_data, f)
    print(f"wrote {out_path}")
    return sample_data


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_path", required=True)
    p.add_argument("--tokenizer_vocab_dir", required=True)
    p.add_argument("--folder_path", required=True, help="folder of jpg(+json)")
    p.add_argument("--clip_model", default="ViT-B/32")
    p.add_argument("--clip_checkpoint", required=True)
    p.add_argument("--clip_merges", required=True)
    p.add_argument("--out_filename_prefix", default="demo_inference")
    p.add_argument("--total_samples", type=int, default=100)
    p.add_argument("--number_to_generate", type=int, default=1)
    p.add_argument("--text_prefix", default=None)
    p.add_argument("--no_beam", action="store_true")
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="model-axis size for tensor-parallel GPT-J decode "
                        "(heads + KV cache sharded over this many chips)")
    p.add_argument("--speculative_draft_checkpoint", default=None,
                   help="checkpoint of a small captioner (its own mapper + "
                        "LM, same tokenizer) used as the speculative-decode "
                        "draft; implies no-beam greedy decoding")
    p.add_argument("--speculative_gamma", type=int, default=4)
    p.add_argument("--int8_decode", action="store_true",
                   help="int8 weight-streaming decode (gpt2/gptj): halves "
                        "the per-token HBM stream; tokens can differ from "
                        "bf16 at quantization boundaries")
    args = p.parse_args(argv)

    from ..eval.clip_scoring import ClipScoring
    from .loading import load_captioner_bundle, load_clip_ranker

    bundle = load_captioner_bundle(args.checkpoint_path, args.tokenizer_vocab_dir)
    if args.tensor_parallel > 1:
        mesh = bundle.enable_tensor_parallel(args.tensor_parallel)
        print(f"tensor-parallel decode over mesh {dict(mesh.shape)}")
    if args.int8_decode:
        bundle.enable_int8_decode()
        print("int8 weight-streaming decode enabled")
    draft_bundle = None
    if args.speculative_draft_checkpoint:
        if args.int8_decode:
            # the int8 modules have no multi-token cached forward, so the
            # verification chunk falls back to per-token weight streaming:
            # at best one target forward per emitted token + all draft
            # work — strictly worse than plain int8 greedy
            print("warning: --int8_decode makes speculative verification "
                  "fall back to per-token forwards; expect no speedup over "
                  "plain int8 greedy")
        draft_bundle = load_captioner_bundle(
            args.speculative_draft_checkpoint, args.tokenizer_vocab_dir)
        print("speculative decoding with draft checkpoint "
              f"{args.speculative_draft_checkpoint} (gamma={args.speculative_gamma})")
    ranker = load_clip_ranker(args.clip_model, args.clip_checkpoint, args.clip_merges)
    scoring = ClipScoring(ranker.vit_params, ranker.vit_cfg, ranker.text_params,
                          ranker.text_cfg, ranker.tokenizer)
    folder_demo(bundle, scoring, args.folder_path,
                out_filename_prefix=args.out_filename_prefix,
                total_samples=args.total_samples,
                number_to_generate=args.number_to_generate,
                text_prefix=args.text_prefix,
                use_beam_search=not args.no_beam and draft_bundle is None,
                draft_bundle=draft_bundle,
                gamma=args.speculative_gamma)


if __name__ == "__main__":
    main()
