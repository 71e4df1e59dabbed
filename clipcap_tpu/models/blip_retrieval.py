"""BLIP image-text retrieval heads: ITM and ITC scoring.

Capability-equivalent of the reference's blip_rank
(reference sampling.py:40-62): `model_blip(image, caption, match_head=
'itm'|'itc')` over the BLIP-large COCO retrieval checkpoint
(reference sampling.py:344-351). Composition:

- itm: text encoder (BERT with cross-attention to ViT tokens, first token
  replaced by the [ENC] token) -> CLS hidden -> 2-way itm_head; the match
  probability is softmax[..., 1] (reference sampling.py:55-57);
- itc: image CLS -> vision_proj, text-only CLS -> text_proj, both
  L2-normalized, cosine similarity (reference sampling.py:58-59).

Params: {"visual": vit params, "text": blip_text params,
         "vision_proj": {w,b}, "text_proj": {w,b}, "itm_head": {w,b}}.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import BlipTextConfig, ViTConfig
from . import blip_text, vit


def init(rng: jax.Array, vit_cfg: ViTConfig, text_cfg: BlipTextConfig, dtype=jnp.float32) -> dict:
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    d = text_cfg.hidden_size
    e = text_cfg.embed_dim

    def lin(key, din, dout):
        kw, kb = jax.random.split(key)
        bound = din**-0.5
        return {
            "w": jax.random.uniform(kw, (din, dout), dtype, -bound, bound),
            "b": jax.random.uniform(kb, (dout,), dtype, -bound, bound),
        }

    return {
        "visual": vit.init(k1, vit_cfg, dtype),
        "text": blip_text.init(k2, text_cfg, dtype),
        "vision_proj": lin(k3, vit_cfg.width, e),
        "text_proj": lin(k4, d, e),
        "itm_head": lin(k5, d, 2),
    }


def encode_image(params: dict, vit_cfg: ViTConfig, pixels: jnp.ndarray) -> jnp.ndarray:
    """[B, 3, H, W] -> ViT tokens [B, Tv, D]."""
    return vit.apply(params["visual"], vit_cfg, pixels, output="tokens")


def itm_score(
    params: dict,
    text_cfg: BlipTextConfig,
    tokens: jnp.ndarray,  # [B, T] with the first token already = [ENC] id
    image_embeds: jnp.ndarray,  # [B, Tv, D] from encode_image
    attention_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Match probability P(match) per pair (reference sampling.py:55-57)."""
    img_mask = jnp.ones(image_embeds.shape[:-1], jnp.int32)
    hidden = blip_text.apply(
        params["text"], text_cfg, tokens,
        attention_mask=attention_mask,
        encoder_hidden_states=image_embeds,
        encoder_attention_mask=img_mask,
        causal=False,
    )
    cls = hidden[:, 0]
    logits = jnp.dot(cls, params["itm_head"]["w"]) + params["itm_head"]["b"]
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, 1]


def itc_score(
    params: dict,
    text_cfg: BlipTextConfig,
    tokens: jnp.ndarray,  # [B, T] text-only tokens (CLS first)
    image_embeds: jnp.ndarray,  # [B, Tv, D]
    attention_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Cosine similarity of projected CLS features (reference :58-59)."""
    img_feat = jnp.dot(image_embeds[:, 0], params["vision_proj"]["w"]) + params["vision_proj"]["b"]
    hidden = blip_text.apply(
        params["text"], text_cfg, tokens, attention_mask=attention_mask, causal=False
    )
    txt_feat = jnp.dot(hidden[:, 0], params["text_proj"]["w"]) + params["text_proj"]["b"]
    img_feat = img_feat / jnp.linalg.norm(img_feat, axis=-1, keepdims=True)
    txt_feat = txt_feat / jnp.linalg.norm(txt_feat, axis=-1, keepdims=True)
    return jnp.sum(img_feat * txt_feat, axis=-1)
