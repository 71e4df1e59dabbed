"""Host-side image preprocessing (PIL decode/resize; normalize on device).

Rebuilds the reference's two transforms:
- BLIP transform (reference train.py:119-130 / sampling.py:330-343):
  BICUBIC resize to (S, S), to-tensor, normalize with CLIP stats;
- CLIP transform (what `clip.load` returns: BICUBIC resize of the short
  side to S, center crop S, normalize with the same stats).

Decode + resize are host work (PIL/libjpeg); the normalize runs in the
same numpy pass here and can be fused on-device by passing
normalize=False and using `normalize_on_device` inside a jitted pipeline.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

try:
    from PIL import Image

    _BICUBIC = Image.Resampling.BICUBIC
except Exception:  # pragma: no cover
    Image = None
    _BICUBIC = None

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def to_chw_float(image) -> np.ndarray:
    arr = np.asarray(image.convert("RGB"), np.float32) / 255.0
    return arr.transpose(2, 0, 1)  # [3, H, W]


def normalize(arr_chw: np.ndarray) -> np.ndarray:
    return (arr_chw - CLIP_MEAN[:, None, None]) / CLIP_STD[:, None, None]


def blip_preprocess(image, image_size: int = 384, do_normalize: bool = True) -> np.ndarray:
    """Square BICUBIC resize (reference train.py:121) -> [3, S, S] f32."""
    image = image.convert("RGB").resize((image_size, image_size), _BICUBIC)
    arr = to_chw_float(image)
    return normalize(arr) if do_normalize else arr


def clip_preprocess(image, image_size: int = 224, do_normalize: bool = True) -> np.ndarray:
    """Short-side resize + center crop (openai clip _transform) -> [3, S, S]."""
    image = image.convert("RGB")
    w, h = image.size
    scale = image_size / min(w, h)
    new_w, new_h = round(w * scale), round(h * scale)
    image = image.resize((new_w, new_h), _BICUBIC)
    left = (new_w - image_size) // 2
    top = (new_h - image_size) // 2
    image = image.crop((left, top, left + image_size, top + image_size))
    arr = to_chw_float(image)
    return normalize(arr) if do_normalize else arr


def clip_preprocess_u8(image, image_size: int = 224) -> np.ndarray:
    """:func:`clip_preprocess` geometry -> CHW uint8 (no float pass).

    Exactly equivalent to ``clip_preprocess(..., do_normalize=False)*255``:
    PIL's resize output is uint8, so skipping the /255 float conversion is
    lossless. This is the host->device transfer dtype of tools/preprocess
    (the axon relay caps upload bodies; uint8 quarters them).
    """
    image = image.convert("RGB")
    w, h = image.size
    scale = image_size / min(w, h)
    new_w, new_h = round(w * scale), round(h * scale)
    image = image.resize((new_w, new_h), _BICUBIC)
    left = (new_w - image_size) // 2
    top = (new_h - image_size) // 2
    image = image.crop((left, top, left + image_size, top + image_size))
    return np.asarray(image, np.uint8).transpose(2, 0, 1)


def normalize_on_device(pixels):
    """jnp normalize for device-side fusion (pixels [..., 3, H, W] in 0..1)."""
    import jax.numpy as jnp

    mean = jnp.asarray(CLIP_MEAN)[:, None, None]
    std = jnp.asarray(CLIP_STD)[:, None, None]
    return (pixels - mean) / std
