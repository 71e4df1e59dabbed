"""ctypes binding for the native JPEG decoder (native/jpeg_decoder.cpp).

One C call replaces the PIL decode -> BICUBIC resize -> center-crop host
path of the preprocessor (tools/preprocess.py, the rebuild of the
reference's create_dataset.py flow, /root/reference/README.md:5-22):
libjpeg-turbo decode with optional M/8 IDCT prescaling, PIL-style
antialiased cubic resampling (a = -0.5) fused with the crop, CHW float32
output in 0..1 (normalization stays fused on device).

Geometry matches data/preprocessing.clip_preprocess / blip_preprocess
exactly; pixel values differ only by PIL's fixed-point resampling
arithmetic (bounded in tests/test_native_jpeg.py) plus, when
``use_dct_scale=True``, the IDCT-prescale approximation.

`make -C native` builds the library; build_native() does it
programmatically. All entry points degrade gracefully (``available()``
-> False, decoders raise ImportError) when no toolchain is present.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libjpeg_decoder.so"

MODE_CLIP = 0  # short-side resize + center crop (openai clip _transform)
MODE_BLIP = 1  # square resize (reference train.py:121)

# per-image status codes from the C side
OK = 0
ERR_BAD_ARGS = -1
ERR_DECODE = -2
ERR_COLOR_SPACE = -3  # e.g. CMYK — caller should fall back to PIL


def build_native(force: bool = False) -> Optional[Path]:
    """Build libjpeg_decoder.so via make; None if no toolchain."""
    if _LIB_PATH.exists() and not force:
        return _LIB_PATH
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
    except Exception:
        return None
    return _LIB_PATH if _LIB_PATH.exists() else None


_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and build_native() is None:
        raise ImportError(
            "native JPEG decoder unavailable (build with `make -C native`)")
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.clip_jpeg_decode.restype = ctypes.c_int
    lib.clip_jpeg_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
    ]
    lib.clip_jpeg_decode_batch.restype = ctypes.c_int
    lib.clip_jpeg_decode_batch.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t),
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
    ]
    lib.clip_jpeg_decode_u8.restype = ctypes.c_int
    lib.clip_jpeg_decode_u8.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
    ]
    lib.clip_jpeg_decode_batch_u8.restype = ctypes.c_int
    lib.clip_jpeg_decode_batch_u8.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t),
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load_lib()
        return True
    except ImportError:
        return False


def decode_jpeg(data: bytes, image_size: int = 224, mode: int = MODE_CLIP,
                use_dct_scale: bool = True) -> np.ndarray:
    """Decode one JPEG -> [3, S, S] float32 in 0..1.

    Raises ValueError on undecodable input (status != 0); callers that
    need robustness use :func:`decode_jpeg_or_none` or the PIL fallback
    in tools/preprocess.py.
    """
    arr = decode_jpeg_or_none(data, image_size, mode, use_dct_scale)
    if arr is None:
        raise ValueError("native JPEG decode failed")
    return arr


def decode_jpeg_or_none(data: bytes, image_size: int = 224,
                        mode: int = MODE_CLIP,
                        use_dct_scale: bool = True) -> Optional[np.ndarray]:
    lib = _load_lib()
    out = np.empty((3, image_size, image_size), np.float32)
    status = lib.clip_jpeg_decode(
        data, len(data), image_size, mode, int(use_dct_scale),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out if status == OK else None


def decode_jpeg_u8_or_none(data: bytes, image_size: int = 224,
                           mode: int = MODE_CLIP,
                           use_dct_scale: bool = True) -> Optional[np.ndarray]:
    """Decode one JPEG -> [3, S, S] uint8, or None on failure.

    uint8 is the transfer dtype of tools/preprocess.py (the relay caps
    upload bodies; PIL's resize output is itself uint8 so this loses
    nothing vs the float path — the C side rounds its float resample).
    """
    lib = _load_lib()
    out = np.empty((3, image_size, image_size), np.uint8)
    status = lib.clip_jpeg_decode_u8(
        data, len(data), image_size, mode, int(use_dct_scale),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    return out if status == OK else None


def decode_batch(datas: Sequence[bytes], image_size: int = 224,
                 mode: int = MODE_CLIP, use_dct_scale: bool = True,
                 n_threads: int = 1):
    """Decode many JPEGs with native threads (no GIL in the C loop).

    Returns (out [N, 3, S, S] float32, status [N] int32); rows with
    status != 0 are undefined and must be skipped or PIL-retried.
    """
    lib = _load_lib()
    n = len(datas)
    blob = b"".join(datas)
    offsets = np.zeros(n, np.uintp)
    lens = np.asarray([len(d) for d in datas], np.uintp)
    if n > 1:
        np.cumsum(lens[:-1], out=offsets[1:])
    out = np.empty((n, 3, image_size, image_size), np.float32)
    status = np.empty(n, np.int32)
    lib.clip_jpeg_decode_batch(
        blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_size_t)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_size_t)), n, image_size,
        mode, int(use_dct_scale), n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return out, status


def decode_batch_u8(datas: Sequence[bytes], image_size: int = 224,
                    mode: int = MODE_CLIP, use_dct_scale: bool = True,
                    n_threads: int = 1):
    """uint8 variant of :func:`decode_batch` (transfer dtype of preprocess)."""
    lib = _load_lib()
    n = len(datas)
    blob = b"".join(datas)
    offsets = np.zeros(n, np.uintp)
    lens = np.asarray([len(d) for d in datas], np.uintp)
    if n > 1:
        np.cumsum(lens[:-1], out=offsets[1:])
    out = np.empty((n, 3, image_size, image_size), np.uint8)
    status = np.empty(n, np.int32)
    lib.clip_jpeg_decode_batch_u8(
        blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_size_t)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_size_t)), n, image_size,
        mode, int(use_dct_scale), n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return out, status
