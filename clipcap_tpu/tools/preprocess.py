"""Dataset preprocessor: images+captions -> {prefixes,tokens}/*.npy shards.

This rebuilds the `create_dataset.py` CLI the reference documents but no
longer contains (README.md:5-22 documents
`--input_dataset "./webdataset/{000..123}.tar" --input_format webdataset
 --wds_image_key jpg --wds_caption_key txt --clip_model ViT-B/32
 --batch_size 1024 ...`; the fork kept only the Dataset classes,
create_dataset.py:1). Output layout matches what TokenPrefixDataset reads
(reference dataset.py:86-90): `{out}/prefixes/NNNNN.npy` (f32 CLIP
embeddings) + `{out}/tokens/NNNNN.npy` (int64, -1-padded).

TPU path: host workers decode+resize; the ViT encode runs as one jitted
batched forward per batch with device-side normalization fused in.
"""

from __future__ import annotations

import argparse
import io
import time
from pathlib import Path
from typing import Callable, Iterator, Optional, Tuple

import numpy as np

from ..core.config import ViTConfig
from ..data.coco import CocoJsonIndex, FileFolderIndex, pad_tokens
from ..data.npy_reader import write_npy_shard
from ..data.preprocessing import CLIP_MEAN, CLIP_STD, clip_preprocess
from ..data.webdataset import iter_samples


def _decode_image(data: bytes):
    from PIL import Image

    return Image.open(io.BytesIO(data)).convert("RGB")


def iter_pairs(input_dataset: str, input_format: str, wds_image_key: str,
               wds_caption_key: str) -> Iterator[Tuple[object, str]]:
    """Yield (PIL image, caption) pairs from any supported input format."""
    if input_format == "webdataset":
        for sample in iter_samples(input_dataset, keys=(wds_image_key, wds_caption_key)):
            try:
                img = _decode_image(sample[wds_image_key])
            except Exception as err:
                print(f"Failed to decode sample {sample['__key__']}: {err}. Skipping.")
                continue
            yield img, sample[wds_caption_key].decode("utf-8", errors="replace")
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
        params = vit.init(jax.random.PRNGKey(0), cfg)

    if quantize_int8:
        # frozen-encoder int8 path (ops/quant.py): ~1.1x end-to-end encode
        # throughput at 0.9998 cosine fidelity to bf16
        params = vit.quantize_params(params)

    mode = "pooled" if pooled else "tokens_proj"
    mean = jnp.asarray(CLIP_MEAN)[:, None, None]
    std = jnp.asarray(CLIP_STD)[:, None, None]

    @jax.jit
    def encode(pixels01):  # [B, 3, S, S] in 0..1 — normalize fused on device
        return vit.apply(params, cfg, (pixels01 - mean) / std, output=mode)

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
) -> dict:
    """Run preprocessing; returns {"samples": n, "shards": k, "ips": rate}."""
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

    shard_prefixes, shard_tokens = [], []
    shard_idx = 0
    n_samples = 0
    t0 = time.time()

    def flush():
        nonlocal shard_idx, shard_prefixes, shard_tokens
        if not shard_prefixes:
            return
        write_npy_shard(out / "prefixes" / f"{shard_idx:05d}.npy",
                        np.concatenate(shard_prefixes, axis=0))
        write_npy_shard(out / "tokens" / f"{shard_idx:05d}.npy",
                        np.concatenate(shard_tokens, axis=0))
        shard_idx += 1
        shard_prefixes, shard_tokens = [], []

    batch_imgs, batch_toks = [], []

    def run_batch():
        nonlocal batch_imgs, batch_toks, n_samples
        if not batch_imgs:
            return
        pixels = jnp.asarray(np.stack(batch_imgs))
        embeds = np.asarray(encode_fn(pixels)).astype(np.float32)
        shard_prefixes.append(embeds)
        shard_tokens.append(np.stack(batch_toks))
        n_samples += len(batch_imgs)
        batch_imgs, batch_toks = [], []

    def prep(pair):
        img, caption = pair
        pixels = clip_preprocess(img, image_size=image_size, do_normalize=False)
        toks = tokenizer.encode_text(caption, max_token_length=max_token_length,
                                     add_bos=True, add_eos=True)
        return pixels, pad_tokens(toks, max_token_length)

    pairs = iter_pairs(input_dataset, input_format, wds_image_key, wds_caption_key)
    if num_prepro_workers > 0:
        # parallel host decode/resize (the reference README's
        # --num_prepro_workers, README.md:13); PIL releases the GIL in
        # decode/resize so threads overlap with device dispatch
        from concurrent.futures import ThreadPoolExecutor

        executor = ThreadPoolExecutor(max_workers=num_prepro_workers)
        prepped = executor.map(prep, pairs, chunksize=8)
    else:
        prepped = map(prep, pairs)

    for pixels, toks in prepped:
        batch_imgs.append(pixels)
        batch_toks.append(toks)
        if len(batch_imgs) >= batch_size:
            run_batch()
            if sum(p.shape[0] for p in shard_prefixes) >= shard_size:
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
    args = p.parse_args(argv)
    preprocess_dataset(**vars(args))


if __name__ == "__main__":
    main()
