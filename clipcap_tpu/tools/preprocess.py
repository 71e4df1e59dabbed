"""Dataset preprocessor: images+captions -> {prefixes,tokens}/*.npy shards.

This rebuilds the `create_dataset.py` CLI the reference documents but no
longer contains (README.md:5-22 documents
`--input_dataset "./webdataset/{000..123}.tar" --input_format webdataset
 --wds_image_key jpg --wds_caption_key txt --clip_model ViT-B/32
 --batch_size 1024 ...`; the fork kept only the Dataset classes,
create_dataset.py:1). Output layout matches what TokenPrefixDataset reads
(reference dataset.py:86-90): `{out}/prefixes/NNNNN.npy` (f32 CLIP
embeddings) + `{out}/tokens/NNNNN.npy` (int64, -1-padded).

TPU path: host workers decode+resize (native libjpeg decoder when built,
data/native_jpeg.py, PIL fallback per image); pixels ship as CHW uint8
(lossless — PIL's resize output is itself uint8 — and 4x fewer upload
bytes through the axon relay, whose HTTP body cap 413s a 154 MB f32
batch) in <=32 MB slices; the ViT encode runs jitted per slice with the
/255 and CLIP normalization fused on device.
"""

from __future__ import annotations

import argparse
import io
import time
from pathlib import Path
from typing import Callable, Iterator, Optional, Tuple

import numpy as np

from ..core.config import ViTConfig
from ..data import native_jpeg
from ..data.coco import CocoJsonIndex, FileFolderIndex, pad_tokens
from ..data.npy_reader import write_npy_shard
from ..data.preprocessing import CLIP_MEAN, CLIP_STD, clip_preprocess_u8
from ..data.webdataset import iter_samples

# relay-safe host->device upload cap: the axon relay 413s large HTTP
# bodies (observed at a 154 MB f32 batch); uint8 pixel slices stay under
# this and the jitted encoder runs once per slice at a fixed shape
MAX_PUT_BYTES = 32 * 1024 * 1024


def _decode_image(data: bytes):
    from PIL import Image

    return Image.open(io.BytesIO(data)).convert("RGB")


def iter_pairs(input_dataset: str, input_format: str, wds_image_key: str,
               wds_caption_key: str) -> Iterator[Tuple[object, str]]:
    """Yield (image, caption) pairs from any supported input format.

    webdataset yields the image as raw encoded bytes (the decoder choice —
    native libjpeg vs PIL — happens in the worker so threads overlap);
    coco/files yield PIL images."""
    if input_format == "webdataset":
        for sample in iter_samples(input_dataset, keys=(wds_image_key, wds_caption_key)):
            yield sample[wds_image_key], sample[wds_caption_key].decode(
                "utf-8", errors="replace")
    elif input_format in ("coco", "files"):
        from PIL import Image

        if input_format == "coco":
            json_path, image_folder = input_dataset.split(":", 1)
            index = CocoJsonIndex(json_path)
            folder = Path(image_folder)
        else:
            index = FileFolderIndex(input_dataset)
            folder = None
        for i in range(len(index)):
            entry = index[i]
            path = Path(entry.image.file_name)
            if folder is not None:
                path = folder / path
            try:
                img = Image.open(path).convert("RGB")
            except Exception as err:
                print(f"Failed to load image '{path}' ({err}). Skipping.")
                continue
            yield img, entry.caption
    else:
        raise ValueError(f"unknown input_format {input_format!r}")


def make_clip_encoder(clip_model: str, checkpoint: Optional[str], pooled: bool,
                      quantize_int8: bool = False):
    """Build the jitted image encoder. With no checkpoint, weights are
    random (useful for pipeline testing; real runs pass an OpenAI/HF
    state dict path converted by tools/import_weights)."""
    import jax
    import jax.numpy as jnp

    from ..models import vit
    from .import_weights import clip_vit_from_hf_state_dict, clip_vit_from_openai_state_dict

    cfg = ViTConfig.clip_variant(clip_model)
    if checkpoint:
        sd = dict(np.load(checkpoint, allow_pickle=True)) if checkpoint.endswith(".npz") else None
        if sd is None:
            import torch

            sd = torch.load(checkpoint, map_location="cpu")
            if hasattr(sd, "state_dict"):
                sd = sd.state_dict()
        if any(k.startswith("visual.") for k in sd):
            params = clip_vit_from_openai_state_dict(sd, cfg)
        else:
            params = clip_vit_from_hf_state_dict(sd, cfg)
    else:
        print("WARNING: no --clip_checkpoint given; using random ViT weights")
        # jit the init: eager per-op dispatch through the axon relay is
        # seconds-per-op (see CLAUDE.md), one compiled call is ~1 s
        params = jax.jit(lambda k: vit.init(k, cfg))(jax.random.PRNGKey(0))

    if quantize_int8:
        # frozen-encoder int8 path (ops/quant.py): ~1.1x end-to-end encode
        # throughput at 0.9998 cosine fidelity to bf16
        params = vit.quantize_params(params)

    mode = "pooled" if pooled else "tokens_proj"
    mean = jnp.asarray(CLIP_MEAN)[:, None, None]
    std = jnp.asarray(CLIP_STD)[:, None, None]

    # params MUST be an explicit jit argument, not a closure capture: the
    # axon relay serializes closure constants into the /remote_compile
    # payload, and ~350 MB of f32 ViT weights 413s it (observed; the
    # device-array buffers travel separately when they are real args)
    @jax.jit
    def _encode(params, pixels):  # [B, 3, S, S] uint8 or float 0..1
        if pixels.dtype == jnp.uint8:
            pixels = pixels.astype(jnp.float32) / 255.0
        return vit.apply(params, cfg, (pixels - mean) / std, output=mode)

    def encode(pixels):
        return _encode(params, pixels)

    encode.handles_uint8 = True  # preprocess_dataset skips its /255 wrapper
    return encode, cfg


def preprocess_dataset(
    input_dataset: str,
    output_folder: str,
    input_format: str = "webdataset",
    wds_image_key: str = "jpg",
    wds_caption_key: str = "txt",
    clip_model: str = "ViT-B/32",
    clip_checkpoint: Optional[str] = None,
    tokenizer_model_type: str = "gpt2",
    tokenizer_vocab_dir: Optional[str] = None,
    tokenizer=None,
    batch_size: int = 256,
    max_token_length: int = 128,
    shard_size: int = 10000,
    use_all_vit_features: bool = False,
    encode_fn: Optional[Callable] = None,
    image_size: Optional[int] = None,
    num_prepro_workers: int = 0,
    quantize_int8: bool = False,
    use_native_jpeg: bool = True,
    native_dct_scale: bool = True,
    upload_workers: int = 1,
) -> dict:
    """Run preprocessing; returns {"samples": n, "shards": k, "ips": rate}."""
    import jax
    import jax.numpy as jnp

    if tokenizer is None:
        from ..tokenizers import create_tokenizer

        tokenizer = create_tokenizer(tokenizer_model_type, tokenizer_vocab_dir)
    if encode_fn is None:
        encode_fn, vit_cfg = make_clip_encoder(clip_model, clip_checkpoint,
                                               pooled=not use_all_vit_features,
                                               quantize_int8=quantize_int8)
        image_size = image_size or vit_cfg.image_size
    assert image_size is not None

    out = Path(output_folder)
    (out / "prefixes").mkdir(parents=True, exist_ok=True)
    (out / "tokens").mkdir(parents=True, exist_ok=True)

    # device-side /255 wrapper for INJECTED encode_fns (tests), which keep
    # the float-0..1 contract; make_clip_encoder handles uint8 natively
    # with its params as explicit jit args (closure captures would be
    # serialized into the relay's /remote_compile payload — HTTP 413)
    if getattr(encode_fn, "handles_uint8", False):
        encode_u8 = encode_fn
    else:
        raw_encode = encode_fn

        @jax.jit
        def encode_u8(px_u8):
            return raw_encode(px_u8.astype(jnp.float32) / 255.0)

    row_bytes = 3 * image_size * image_size  # uint8 CHW
    chunk = max(1, min(batch_size, MAX_PUT_BYTES // row_bytes))

    shard_prefixes, shard_tokens = [], []
    shard_in_flight = 0
    shard_idx = 0
    n_samples = 0
    t0 = time.time()

    def _upload_encode(pixels):
        # runs on the uploader thread: the host->device pixel transfer is
        # the bottleneck through the relay (~21 MB/s HTTP), so it must
        # overlap the decode workers, not serialize behind them
        embeds = []
        for i in range(0, len(pixels), chunk):
            part = pixels[i:i + chunk]
            n_real = len(part)
            if n_real < chunk:  # pad the tail: one executable per shape
                part = np.concatenate(
                    [part, np.zeros((chunk - n_real,) + part.shape[1:],
                                    part.dtype)])
            embeds.append(encode_u8(jnp.asarray(part))[:n_real])
        return embeds

    from concurrent.futures import ThreadPoolExecutor

    # results stay ordered whatever the worker count: shard_prefixes holds
    # futures in submit order and flush() waits on them in order. >1 only
    # pays if the relay multiplexes concurrent host->device PUTs
    # (measure before raising the default)
    uploader = ThreadPoolExecutor(max_workers=max(1, upload_workers))

    def flush():
        nonlocal shard_idx, shard_prefixes, shard_tokens, shard_in_flight
        if not shard_prefixes:
            return
        # shard_prefixes holds futures of device arrays: fetching here
        # (not per batch) keeps upload + encode pipelined with decode
        write_npy_shard(out / "prefixes" / f"{shard_idx:05d}.npy",
                        np.concatenate([np.asarray(p, np.float32)
                                        for f in shard_prefixes
                                        for p in f.result()], axis=0))
        write_npy_shard(out / "tokens" / f"{shard_idx:05d}.npy",
                        np.concatenate(shard_tokens, axis=0))
        shard_idx += 1
        shard_prefixes, shard_tokens = [], []
        shard_in_flight = 0

    batch_imgs, batch_toks = [], []
    inflight = []  # backpressure: cap pixel batches queued on the uploader

    def run_batch():
        nonlocal batch_imgs, batch_toks, n_samples, shard_in_flight
        if not batch_imgs:
            return
        fut = uploader.submit(_upload_encode, np.stack(batch_imgs))
        shard_prefixes.append(fut)
        inflight.append(fut)
        while len(inflight) > 4:  # ~4 batches of pixels held at most
            inflight.pop(0).result()
        shard_tokens.append(np.stack(batch_toks))
        n_samples += len(batch_imgs)
        shard_in_flight += len(batch_imgs)
        batch_imgs, batch_toks = [], []

    native_decode = None
    if use_native_jpeg and native_jpeg.available():
        def native_decode(data):
            return native_jpeg.decode_jpeg_u8_or_none(
                data, image_size, native_jpeg.MODE_CLIP,
                use_dct_scale=native_dct_scale)

    def prep(pair):
        img, caption = pair
        if isinstance(img, (bytes, bytearray)):
            pixels = native_decode(img) if native_decode is not None else None
            if pixels is None:  # non-JPEG / exotic colorspace / corrupt
                try:
                    img = _decode_image(img)
                except Exception as err:
                    print(f"Failed to decode sample: {err}. Skipping.")
                    return None
                pixels = clip_preprocess_u8(img, image_size=image_size)
        else:
            pixels = clip_preprocess_u8(img, image_size=image_size)
        toks = tokenizer.encode_text(caption, max_token_length=max_token_length,
                                     add_bos=True, add_eos=True)
        return pixels, pad_tokens(toks, max_token_length)

    pairs = iter_pairs(input_dataset, input_format, wds_image_key, wds_caption_key)
    if num_prepro_workers > 0:
        # parallel host decode/resize (the reference README's
        # --num_prepro_workers, README.md:13); both PIL and the native
        # decoder release the GIL so threads overlap with device dispatch
        from concurrent.futures import ThreadPoolExecutor

        executor = ThreadPoolExecutor(max_workers=num_prepro_workers)
        prepped = executor.map(prep, pairs, chunksize=8)
    else:
        prepped = map(prep, pairs)

    for item in prepped:
        if item is None:
            continue
        pixels, toks = item
        batch_imgs.append(pixels)
        batch_toks.append(toks)
        if len(batch_imgs) >= batch_size:
            run_batch()
            if shard_in_flight >= shard_size:
                flush()

    run_batch()
    flush()
    dt = max(time.time() - t0, 1e-9)
    stats = {"samples": n_samples, "shards": shard_idx, "ips": n_samples / dt}
    print(f"preprocessed {n_samples} samples into {shard_idx} shards "
          f"({stats['ips']:.1f} images/sec)")
    return stats


def main(argv=None):
    p = argparse.ArgumentParser(description="images+captions -> npy shards")
    p.add_argument("--input_dataset", required=True,
                   help='tar pattern "{000..123}.tar", "captions.json:/images" (coco), or folder (files)')
    p.add_argument("--output_folder", required=True)
    p.add_argument("--input_format", default="webdataset", choices=["webdataset", "coco", "files"])
    p.add_argument("--wds_image_key", default="jpg")
    p.add_argument("--wds_caption_key", default="txt")
    p.add_argument("--clip_model", default="ViT-B/32")
    p.add_argument("--clip_checkpoint", default=None)
    p.add_argument("--tokenizer_model_type", default="gpt2")
    p.add_argument("--tokenizer_vocab_dir", required=True)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--num_prepro_workers", type=int, default=0)
    p.add_argument("--max_token_length", type=int, default=128)
    p.add_argument("--shard_size", type=int, default=10000)
    p.add_argument("--use_all_vit_features", action="store_true")
    p.add_argument("--quantize_int8", action="store_true",
                   help="int8-quantize the frozen encoder (faster, ~1e-4 cosine error)")
    p.add_argument("--no_native_jpeg", dest="use_native_jpeg",
                   action="store_false",
                   help="force the PIL decode path (native libjpeg is the default when built)")
    p.add_argument("--no_dct_scale", dest="native_dct_scale",
                   action="store_false",
                   help="disable the native decoder's M/8 IDCT prescale (exact-PIL-geometry pixels, slower)")
    p.add_argument("--upload_workers", type=int, default=1,
                   help="concurrent host->device pixel uploads (results stay ordered)")
    args = p.parse_args(argv)
    preprocess_dataset(**vars(args))


if __name__ == "__main__":
    main()
