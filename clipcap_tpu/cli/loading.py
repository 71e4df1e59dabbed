"""Model/world loading for the CLIs.

The reference pulls pretrained weights over the network (`clip.load`,
HF `from_pretrained`, BLIP URLs). This framework is offline-first: every
loader takes local paths — torch .pth/.bin state dicts (converted via
tools/import_weights), .npz dumps, or this framework's orbax checkpoints —
plus tokenizer asset dirs. Loaders raise actionable errors when an asset
is missing instead of attempting downloads.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from ..core.config import (
    BlipTextConfig,
    CaptionerConfig,
    CLIPTextConfig,
    ViTConfig,
)
from ..lm.registry import get_lm_config
from ..tokenizers import create_tokenizer
from ..tokenizers.clip_bpe import CLIPTokenizer
from ..tokenizers.wordpiece import WordPieceTokenizer


def load_state_dict(path: str) -> dict:
    """Load a torch .pth/.bin or numpy .npz state dict as {name: array}."""
    if path.endswith(".npz"):
        return dict(np.load(path, allow_pickle=False))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    return obj


def load_clip_ranker(clip_model: str, checkpoint: str, merges_path: str):
    """Build a CLIPRanker from an OpenAI/HF CLIP checkpoint."""
    from ..models import clip_text, vit  # noqa: F401
    from ..rank.rankers import CLIPRanker
    from ..tools.import_weights import (
        clip_text_from_hf_state_dict,
        clip_text_from_openai_state_dict,
        clip_vit_from_hf_state_dict,
        clip_vit_from_openai_state_dict,
    )

    if clip_model.startswith("RN"):
        from ..tools.import_weights import (
            clip_resnet_config_from_state_dict,
            clip_resnet_from_openai_state_dict,
        )

        sd = load_state_dict(checkpoint)
        rn_cfg = clip_resnet_config_from_state_dict(sd)
        rn_params = clip_resnet_from_openai_state_dict(sd, rn_cfg)
        width = np.asarray(sd["ln_final.weight"]).shape[0]
        layers = len({k.split(".")[2] for k in sd if k.startswith("transformer.resblocks.")})
        text_cfg = CLIPTextConfig(
            vocab_size=np.asarray(sd["token_embedding.weight"]).shape[0],
            width=width, layers=layers, heads=width // 64,
            output_dim=np.asarray(sd["text_projection"]).shape[1],
        )
        text_params = clip_text_from_openai_state_dict(sd, text_cfg)
        tokenizer = CLIPTokenizer.from_merges_file(merges_path)
        return CLIPRanker(rn_params, rn_cfg, text_params, text_cfg, tokenizer)

    vit_cfg = ViTConfig.clip_variant(clip_model)
    sd = load_state_dict(checkpoint)
    if any(k.startswith("visual.") for k in sd):
        vit_params = clip_vit_from_openai_state_dict(sd, vit_cfg)
        # text tower width from the checkpoint
        width = np.asarray(sd["ln_final.weight"]).shape[0]
        layers = len({k.split(".")[2] for k in sd if k.startswith("transformer.resblocks.")})
        text_cfg = CLIPTextConfig(
            vocab_size=np.asarray(sd["token_embedding.weight"]).shape[0],
            width=width, layers=layers, heads=width // 64,
            output_dim=np.asarray(sd["text_projection"]).shape[1],
        )
        text_params = clip_text_from_openai_state_dict(sd, text_cfg)
    else:
        vit_params = clip_vit_from_hf_state_dict(sd, vit_cfg)
        width = np.asarray(sd["text_model.final_layer_norm.weight"]).shape[0]
        layers = len({k.split(".")[3] for k in sd if k.startswith("text_model.encoder.layers.")})
        text_cfg = CLIPTextConfig(
            vocab_size=np.asarray(sd["text_model.embeddings.token_embedding.weight"]).shape[0],
            width=width, layers=layers, heads=width // 64,
            output_dim=np.asarray(sd["text_projection.weight"]).shape[0],
        )
        text_params = clip_text_from_hf_state_dict(sd, text_cfg)
    tokenizer = CLIPTokenizer.from_merges_file(merges_path)
    return CLIPRanker(vit_params, vit_cfg, text_params, text_cfg, tokenizer)


def load_blip_captioner(checkpoint: str, vocab_file: str, vit_variant: str = "ViT-L",
                        image_size: int = 384):
    """Load a BLIP caption checkpoint (reference sampling.py:330-343)."""
    from ..tools.import_weights import (
        blip_text_from_hf_state_dict,
        blip_vit_from_hf_state_dict,
    )

    sd = load_state_dict(checkpoint)
    vit_cfg = ViTConfig.blip_variant(vit_variant, image_size=image_size)
    text_cfg = BlipTextConfig(encoder_width=vit_cfg.width)
    params = {
        "visual": blip_vit_from_hf_state_dict(sd, vit_cfg, ),
        "text": blip_text_from_hf_state_dict(sd, text_cfg, prefix="text_decoder."),
    }
    tokenizer = WordPieceTokenizer.from_vocab_file(vocab_file)
    return params, vit_cfg, text_cfg, tokenizer


def load_captioner_bundle(
    checkpoint_path: str,
    tokenizer_vocab_dir: str,
    prefix_only: bool = False,  # kept for CLI parity; affects training only
):
    """Restore a trained ClipCap checkpoint (ours, orbax) into a bundle."""
    import jax

    from ..models.bundle import CaptionerBundle
    from ..train.checkpoints import load_config, restore_checkpoint

    cfg_payload = load_config(checkpoint_path)
    cap_cfg = CaptionerConfig.from_dict(cfg_payload["captioner"])
    lm_cfg = get_lm_config(cap_cfg.lm_type, cap_cfg.lm_variant).from_dict(cfg_payload["lm"])

    import jax.numpy as jnp

    state = restore_checkpoint(checkpoint_path)
    params = state["params"] if "params" in state else state
    params = jax.tree_util.tree_map(jnp.asarray, params)

    tokenizer = create_tokenizer(cap_cfg.lm_type, tokenizer_vocab_dir)
    vit_cfg = None
    if "visual" in params:
        if cap_cfg.visual_encoder_type.upper() == "BLIP":
            vit_cfg = ViTConfig.blip_variant(cap_cfg.visual_encoder_variant)
        else:
            vit_cfg = ViTConfig.clip_variant(cap_cfg.visual_encoder_variant)
    return CaptionerBundle(params=params, cap_cfg=cap_cfg, lm_cfg=lm_cfg,
                           tokenizer=tokenizer, vit_cfg=vit_cfg)
