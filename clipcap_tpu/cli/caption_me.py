"""caption_me — single-image caption synthesis CLI.

Rebuild of reference caption_me.py:13-138: BLIP-sample `sample_count`
candidates with per-sample min/max-length + top_p grids, rank by
--mode (CLIP-ViT-L+RN50x64 / CLIP-ViT-L / CLIP-RN50x64 / ITC / ITM),
print the top-n. The reference's two-GPU placement (deviceA/deviceB,
:49-50) becomes sequential jitted phases on the TPU.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from ..data.preprocessing import blip_preprocess
from .synthesis import SynthesisEngine


def caption_image(
    engine: SynthesisEngine,
    image,  # PIL image
    mode: str = "CLIP-ViT-L+RN50x64",
    sample_count: int = 40,
    top_k: float = 2500,
    typ_p: float = 0.0,
    force_eos_prob: float = 0.9,
    num_runs: int = 1,
    top_n: int = 3,
    seed: int = 42,
    set_top_p=None, set_min_len=None, set_max_len=None,
):
    from .synthesis import default_grids

    top_p, min_len, max_len = default_grids(set_top_p, set_min_len, set_max_len,
                                            n=sample_count)
    pixels = jnp.asarray(blip_preprocess(image, engine.blip_vit_cfg.image_size))[None]
    captions, params, stats = engine.synthesize(
        pixels, sample_count=sample_count, top_p=top_p, top_k=top_k, typ_p=typ_p,
        min_len=min_len, max_len=max_len, force_eos_prob=force_eos_prob,
        num_runs=num_runs, rng=jax.random.PRNGKey(seed),
    )
    ranked = engine.rank(image, captions, mode=mode, top_n=top_n)
    return ranked, captions


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("image", help="path of the image to caption")
    p.add_argument("--mode", default="CLIP-ViT-L+RN50x64")
    p.add_argument("--sample_count", type=int, default=40)
    p.add_argument("--top_k", type=float, default=2500)
    p.add_argument("--typ_p", type=float, default=0.0)
    p.add_argument("--force_eos_prob", type=float, default=0.9)
    p.add_argument("--num_runs", type=int, default=1)
    p.add_argument("--top_n", type=int, default=3)
    p.add_argument("--manual_seed", type=int, default=42)
    p.add_argument("--set_top_p", type=float, default=None)
    p.add_argument("--set_min_len", type=int, default=None)
    p.add_argument("--set_max_len", type=int, default=None)
    p.add_argument("--int8_decode", action="store_true",
                   help="int8 weight-streaming BLIP text decoder (rankers "
                        "keep full precision; a wash at the default 40-"
                        "candidate batch, wins for small sample_count)")
    # offline model assets
    p.add_argument("--blip_checkpoint", required=True)
    p.add_argument("--blip_vocab", required=True, help="BERT vocab.txt")
    p.add_argument("--blip_vit_variant", default="ViT-L")
    p.add_argument("--clip_vit_l_checkpoint", default=None)
    p.add_argument("--clip_merges", default=None, help="bpe_simple_vocab_16e6.txt[.gz]")
    args = p.parse_args(argv)

    from PIL import Image

    from .loading import load_blip_captioner, load_clip_ranker

    blip_params, vit_cfg, text_cfg, tokenizer = load_blip_captioner(
        args.blip_checkpoint, args.blip_vocab, vit_variant=args.blip_vit_variant
    )
    clip_rankers = {}
    if args.clip_vit_l_checkpoint:
        clip_rankers["ViT-L/14"] = load_clip_ranker(
            "ViT-L/14", args.clip_vit_l_checkpoint, args.clip_merges
        )
    from ..rank.rankers import BLIPRanker

    engine = SynthesisEngine(
        blip_params=blip_params, blip_vit_cfg=vit_cfg, blip_text_cfg=text_cfg,
        tokenizer=tokenizer, clip_rankers=clip_rankers,
        blip_ranker=BLIPRanker(blip_params, vit_cfg, text_cfg, tokenizer),
    )
    if args.int8_decode:
        engine.enable_int8_decode()

    image = Image.open(args.image).convert("RGB")
    ranked, all_captions = caption_image(
        engine, image, mode=args.mode, sample_count=args.sample_count,
        top_k=args.top_k, typ_p=args.typ_p, force_eos_prob=args.force_eos_prob,
        num_runs=args.num_runs, top_n=args.top_n, seed=args.manual_seed,
        set_top_p=args.set_top_p, set_min_len=args.set_min_len,
        set_max_len=args.set_max_len,
    )
    print(f"{len(all_captions)} distinct candidates; top {len(ranked)}:")
    for i, (caption, score) in enumerate(ranked):
        print(f"{i:02d} [{score:.3f}]: {caption}")


if __name__ == "__main__":
    main()
