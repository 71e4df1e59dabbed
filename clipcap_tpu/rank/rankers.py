"""Caption rankers: CLIP cosine similarity and BLIP ITM/ITC scores.

Rebuilds the reference's ranking primitives:
- clip_rank (reference sampling.py:23-37): CLIP-encode the image once,
  encode every candidate caption, cosine similarity. The reference loops
  captions one by one on GPU; here all captions score in one batched
  text-tower forward.
- blip_rank (reference sampling.py:40-62): BLIP-ITM match probability or
  ITC cosine per caption (mode="itm"|"itc").

The reference splits sampler and rankers across two GPUs
(caption_me.py:49-50); on TPU these run as sequential jitted phases on
one chip (or distinct mesh submeshes when sharded).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def cos_sim(a: jnp.ndarray, b: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    if normalize:
        a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
        b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    return a @ b.T


class CLIPRanker:
    """clip_rank over one image and a caption list.

    The image tower is a ViT (ViTConfig) or a ModifiedResNet
    (clip_resnet.ResNetConfig — the RN50x64 re-ranking stage of
    reference sampling.py:436-479), selected by the config type.
    """

    def __init__(self, vit_params, vit_cfg, text_params, text_cfg, tokenizer):
        from ..models import clip_resnet, clip_text, vit

        self.vit_params, self.vit_cfg = vit_params, vit_cfg
        self.text_params, self.text_cfg = text_params, text_cfg
        self.tokenizer = tokenizer
        if isinstance(vit_cfg, clip_resnet.ResNetConfig):
            self._encode_image = jax.jit(
                lambda px: clip_resnet.apply(vit_params, vit_cfg, px)
            )
        else:
            self._encode_image = jax.jit(
                lambda px: vit.apply(vit_params, vit_cfg, px, output="pooled")
            )
        self._encode_text = jax.jit(
            lambda toks: clip_text.apply(text_params, text_cfg, toks)
        )

    def image_features(self, pixels: jnp.ndarray) -> jnp.ndarray:
        return self._encode_image(pixels)

    def text_features(self, captions: Sequence[str]) -> jnp.ndarray:
        toks = jnp.asarray(self.tokenizer.tokenize(list(captions), truncate=True))
        return self._encode_text(toks)

    def rank(self, pixels: jnp.ndarray, captions: Sequence[str]) -> List[float]:
        """pixels [1, 3, H, W] -> cosine similarity per caption."""
        img = self.image_features(pixels)
        txt = self.text_features(captions)
        sims = cos_sim(txt, img)[:, 0]
        return [float(s) for s in np.asarray(jax.device_get(sims))]


class BLIPRanker:
    """blip_rank over one image and a caption list (mode itm|itc)."""

    def __init__(self, params, vit_cfg, text_cfg, tokenizer):
        from ..models import blip_retrieval

        self._br = blip_retrieval
        self.params = params
        self.vit_cfg, self.text_cfg = vit_cfg, text_cfg
        self.tokenizer = tokenizer
        self._encode_image = jax.jit(
            lambda px: blip_retrieval.encode_image(params, vit_cfg, px)
        )

    def _prep_tokens(self, captions: Sequence[str], first_token_id: Optional[int]):
        rows = [self.tokenizer.encode(c) for c in captions]
        max_len = max(len(r) for r in rows)
        toks = np.zeros((len(rows), max_len), np.int32)
        mask = np.zeros((len(rows), max_len), np.int32)
        for i, r in enumerate(rows):
            if first_token_id is not None:
                r = [first_token_id] + r[1:]
            toks[i, : len(r)] = r
            mask[i, : len(r)] = 1
        return jnp.asarray(toks), jnp.asarray(mask)

    def rank(self, pixels: jnp.ndarray, captions: Sequence[str], mode: str = "itm") -> List[float]:
        img = self._encode_image(pixels)
        img_rep = jnp.repeat(img, len(captions), axis=0)
        if mode == "itm":
            toks, mask = self._prep_tokens(captions, self.tokenizer.enc_token_id)
            scores = self._br.itm_score(self.params, self.text_cfg, toks, img_rep, mask)
        elif mode == "itc":
            toks, mask = self._prep_tokens(captions, self.tokenizer.enc_token_id)
            scores = self._br.itc_score(self.params, self.text_cfg, toks, img_rep, mask)
        else:
            raise RuntimeError(f'blip ranking mode "{mode}" not supported')
        return [float(s) for s in np.asarray(jax.device_get(scores))]
