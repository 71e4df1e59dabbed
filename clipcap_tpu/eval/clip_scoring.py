"""CLIP cosine scoring of captions against images.

Rebuild of the reference's ClipScoring (evaluate_model.py:313-352):
preprocess + encode the image with the CLIP vision tower, tokenize +
encode captions with the CLIP text tower, cosine-similarity matrix.
"""

from __future__ import annotations

from typing import List, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..data.preprocessing import clip_preprocess
from ..models import clip_text, vit


def cosine_similarity(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    return a @ b.T


class ClipScoring:
    def __init__(self, vit_params, vit_cfg, text_params, text_cfg, tokenizer):
        self.vit_params, self.vit_cfg = vit_params, vit_cfg
        self.text_params, self.text_cfg = text_params, text_cfg
        self.tokenizer = tokenizer
        self._encode_image = jax.jit(
            lambda px: vit.apply(vit_params, vit_cfg, px, output="pooled")
        )
        self._encode_text = jax.jit(
            lambda toks: clip_text.apply(text_params, text_cfg, toks)
        )

    def preprocess_image(self, image) -> np.ndarray:
        return clip_preprocess(image, image_size=self.vit_cfg.image_size)

    def tokenize(self, text: Union[str, Sequence[str]]) -> np.ndarray:
        return self.tokenizer.tokenize(text, truncate=True)

    def embed_image(self, image_tensor) -> jnp.ndarray:
        x = jnp.asarray(image_tensor)
        if x.ndim == 3:
            x = x[None]
        return self._encode_image(x).astype(jnp.float32)

    def embed_text(self, captions: Sequence[str]) -> jnp.ndarray:
        toks = jnp.asarray(self.tokenize(list(captions)))
        return self._encode_text(toks).astype(jnp.float32)

    def score_tensor(self, image_tensor, caption_tokens, method="cosine_similarity"):
        if method != "cosine_similarity":
            raise ValueError(f"Invalid value for parameter method: {method}")
        img = self.embed_image(image_tensor)
        txt = self._encode_text(jnp.asarray(caption_tokens)).astype(jnp.float32)
        return cosine_similarity(img, txt)

    def score_image(self, image, captions: Union[str, Sequence[str]]):
        """PIL image + caption(s) -> [1, n] cosine similarities."""
        return self.score_tensor(self.preprocess_image(image), self.tokenize(captions))
