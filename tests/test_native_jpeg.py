"""Native JPEG decoder (native/jpeg_decoder.cpp) vs the PIL reference path.

The native decoder replaces PIL decode -> BICUBIC resize -> center crop in
tools/preprocess.py (the rebuild of the reference's create_dataset.py host
loop, /root/reference/README.md:5-22). With the DCT prescale off it must
match data/preprocessing.clip_preprocess up to PIL's 8-bit fixed-point
resampling arithmetic; with it on, up to the M/8 IDCT approximation.
"""

import io

import numpy as np
import pytest

from clipcap_tpu.data import native_jpeg
from clipcap_tpu.data.preprocessing import clip_preprocess, clip_preprocess_u8

pytestmark = pytest.mark.skipif(
    not native_jpeg.available(), reason="native jpeg decoder not built")


def _jpeg_bytes(rng, w, h, quality=92, smooth=True):
    from PIL import Image

    if smooth:
        # low-frequency content: JPEG-compresses faithfully, so the
        # native-vs-PIL comparison isolates RESAMPLING error, not ringing
        small = rng.integers(0, 255, (h // 8 + 1, w // 8 + 1, 3), dtype=np.uint8)
        img = Image.fromarray(small).resize((w, h), Image.Resampling.BILINEAR)
    else:
        img = Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def _pil_reference(data, image_size):
    from PIL import Image

    img = Image.open(io.BytesIO(data)).convert("RGB")
    return clip_preprocess(img, image_size=image_size, do_normalize=False)


@pytest.mark.parametrize("w,h", [(640, 480), (480, 640), (300, 300), (224, 224)])
def test_parity_no_dct_scale(w, h):
    """Exact-geometry path: only PIL's fixed-point resample coeffs differ."""
    rng = np.random.default_rng(hash((w, h)) % 2**31)
    data = _jpeg_bytes(rng, w, h)
    ref = _pil_reference(data, 224)
    got = native_jpeg.decode_jpeg(data, 224, native_jpeg.MODE_CLIP,
                                  use_dct_scale=False)
    assert got.shape == (3, 224, 224) and got.dtype == np.float32
    diff = np.abs(got - ref)
    # PIL resamples in 8-bit fixed point and clamps each pass to uint8;
    # the native path keeps float32 between passes. Measured max ~1.5/255
    # on smooth content.
    assert diff.max() <= 6 / 255, diff.max()
    assert diff.mean() <= 1 / 255, diff.mean()


def test_parity_dct_scale_bounded():
    """M/8 IDCT prescale: different pixels, bounded drift on smooth content."""
    rng = np.random.default_rng(7)
    data = _jpeg_bytes(rng, 1280, 960)
    ref = _pil_reference(data, 224)
    got = native_jpeg.decode_jpeg(data, 224, native_jpeg.MODE_CLIP,
                                  use_dct_scale=True)
    diff = np.abs(got - ref)
    assert diff.mean() <= 4 / 255, diff.mean()
    assert diff.max() <= 40 / 255, diff.max()


def test_u8_matches_float_rounding():
    rng = np.random.default_rng(3)
    data = _jpeg_bytes(rng, 500, 400)
    f = native_jpeg.decode_jpeg(data, 224, use_dct_scale=False)
    u = native_jpeg.decode_jpeg_u8_or_none(data, 224, use_dct_scale=False)
    assert u is not None and u.dtype == np.uint8
    # round-to-nearest boundary: exactly 0.5/255 at ties, plus f32 eps
    assert np.abs(u.astype(np.float32) / 255.0 - f).max() <= 0.51 / 255


def test_u8_pil_helper_is_lossless_vs_float_path():
    """clip_preprocess_u8 == clip_preprocess * 255 exactly (PIL output IS uint8)."""
    from PIL import Image

    rng = np.random.default_rng(11)
    img = Image.fromarray(rng.integers(0, 255, (480, 640, 3), dtype=np.uint8))
    f = clip_preprocess(img, image_size=224, do_normalize=False)
    u = clip_preprocess_u8(img, image_size=224)
    assert u.dtype == np.uint8
    np.testing.assert_array_equal(u, np.round(f * 255).astype(np.uint8))


def test_batch_threaded_matches_single():
    rng = np.random.default_rng(5)
    datas = [_jpeg_bytes(rng, 256 + 32 * i, 256, smooth=False) for i in range(6)]
    out, status = native_jpeg.decode_batch(datas, 128, n_threads=3,
                                           use_dct_scale=True)
    assert status.tolist() == [0] * 6
    for i, d in enumerate(datas):
        single = native_jpeg.decode_jpeg(d, 128, use_dct_scale=True)
        np.testing.assert_array_equal(out[i], single)
    out_u8, status_u8 = native_jpeg.decode_batch_u8(datas, 128, n_threads=3,
                                                    use_dct_scale=True)
    assert status_u8.tolist() == [0] * 6
    assert np.abs(out_u8.astype(np.float32) / 255 - out).max() <= 0.5 / 255


def test_corrupt_and_exotic_inputs_fail_cleanly():
    from PIL import Image

    assert native_jpeg.decode_jpeg_or_none(b"not a jpeg", 224) is None
    assert native_jpeg.decode_jpeg_u8_or_none(b"\xff\xd8\xff\xe0garbage", 224) is None
    # truncated real JPEG
    rng = np.random.default_rng(9)
    data = _jpeg_bytes(rng, 320, 240)
    assert native_jpeg.decode_jpeg_or_none(data[: len(data) // 3], 224) is None
    # CMYK -> kErrColorSpace -> None (preprocess falls back to PIL)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).convert(
        "CMYK").save(buf, format="JPEG")
    assert native_jpeg.decode_jpeg_or_none(buf.getvalue(), 224) is None
    with pytest.raises(ValueError):
        native_jpeg.decode_jpeg(b"", 224)


def test_blip_mode_square_resize():
    from PIL import Image

    from clipcap_tpu.data.preprocessing import blip_preprocess

    rng = np.random.default_rng(13)
    data = _jpeg_bytes(rng, 400, 300)
    img = Image.open(io.BytesIO(data)).convert("RGB")
    ref = blip_preprocess(img, image_size=96, do_normalize=False)
    got = native_jpeg.decode_jpeg(data, 96, native_jpeg.MODE_BLIP,
                                  use_dct_scale=False)
    assert np.abs(got - ref).max() <= 6 / 255
