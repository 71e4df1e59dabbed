"""Checkpoint evaluation CLI.

Rebuild of reference evaluate_model.py:538-676: load a trained captioner
checkpoint, wire the COCO validator with no-beam + clip-guided samplers
and CLIP scoring, run over --max_samples validation images, print scores.
"""

from __future__ import annotations

import argparse
import json


def evaluate(
    bundle,  # models.bundle.CaptionerBundle
    clip_scoring,  # eval.clip_scoring.ClipScoring
    valid_json_path: str,
    image_folder_path: str,
    max_samples: int = 10,
    nobeam_top_p=(0.1, 0.2),
    branching_factor: int = 2,
    look_ahead: int = 4,
    preprocess=None,
    eval_batch_size: int = 8,
) -> dict:
    from ..data.coco import CocoImageDataset
    from ..data.preprocessing import blip_preprocess, clip_preprocess
    from ..eval.samplers import ClipGuidedCaptionSampler, NoBeamCaptionSampler
    from ..eval.validator import CocoCaptionValidator

    if preprocess is None:
        if bundle.vit_cfg is not None and bundle.vit_cfg.style == "blip":
            preprocess = lambda img: blip_preprocess(img, bundle.vit_cfg.image_size)
        else:
            preprocess = lambda img: clip_preprocess(img, bundle.vit_cfg.image_size)

    dataset = CocoImageDataset(valid_json_path, image_folder_path)
    validator = CocoCaptionValidator(
        dataset, preprocess,
        {
            "nobeam": NoBeamCaptionSampler(top_p_values=list(nobeam_top_p)),
            "clip_guided": ClipGuidedCaptionSampler(
                clip_scoring, branching_factor=branching_factor, look_ahead=look_ahead
            ),
        },
        clip_scoring,
    )
    # images go through the validator in chunks: samplers with a
    # sample_batch run once per chunk (beam/clip-guided are per-image
    # exact; nobeam's sampled rows match in distribution only — pass
    # eval_batch_size=1 for reference-exact image-at-a-time trajectories)
    n = min(max_samples, len(dataset))
    step = max(1, int(eval_batch_size))
    for i in range(0, n, step):
        items = [dataset[j] for j in range(i, min(i + step, n))]
        validator.process(bundle, items)
    results = validator.get_results()
    print(json.dumps(
        {k: v for k, v in results.items() if k != "captions"}, indent=2, default=float
    ))
    return results


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_path", required=True, help="orbax checkpoint dir")
    p.add_argument("--tokenizer_vocab_dir", required=True)
    p.add_argument("--clip_model", default="ViT-B/32")
    p.add_argument("--clip_checkpoint", required=True)
    p.add_argument("--clip_merges", required=True)
    p.add_argument("--valid_json_path", required=True)
    p.add_argument("--image_folder_path", required=True)
    p.add_argument("--prefix_only", action="store_true")
    p.add_argument("--max_samples", type=int, default=10)
    p.add_argument("--manual_seed", type=int, default=42)
    p.add_argument("--int8_decode", action="store_true",
                   help="int8 weight-streaming decode for the samplers "
                        "(gpt2/gptj; see models/bundle.enable_int8_decode)")
    p.add_argument("--eval_batch_size", type=int, default=8,
                   help="images per validator chunk; samplers with a "
                        "batched path run once per chunk (1 = reference-"
                        "exact image-at-a-time)")
    args = p.parse_args(argv)

    from ..eval.clip_scoring import ClipScoring
    from .loading import load_captioner_bundle, load_clip_ranker

    bundle = load_captioner_bundle(args.checkpoint_path, args.tokenizer_vocab_dir,
                                   prefix_only=args.prefix_only)
    if args.int8_decode:
        bundle.enable_int8_decode()
    ranker = load_clip_ranker(args.clip_model, args.clip_checkpoint, args.clip_merges)
    scoring = ClipScoring(ranker.vit_params, ranker.vit_cfg, ranker.text_params,
                          ranker.text_cfg, ranker.tokenizer)
    evaluate(bundle, scoring, args.valid_json_path, args.image_folder_path,
             max_samples=args.max_samples,
             eval_batch_size=args.eval_batch_size)


if __name__ == "__main__":
    main()
