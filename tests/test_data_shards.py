"""TokenPrefixDataset semantics (reference dataset.py:76-205): exact
batch sizes, overflow across shard files, infinite wrap, normalization,
round-robin interleave.
"""

import numpy as np
import pytest

from clipcap_tpu.data import (
    MultiplePrefixDataset,
    NumpyShardReader,
    TokenPrefixDataset,
    write_npy_shard,
)


@pytest.fixture
def shard_dir(tmp_path):
    """3 shard pairs with uneven rows (7, 5, 3) = 15 samples; dim 4 prefixes."""
    rows = [7, 5, 3]
    offset = 0
    for i, r in enumerate(rows):
        prefix = np.arange(offset, offset + r, dtype=np.float32)[:, None] * np.ones((1, 4), np.float32)
        tokens = np.arange(offset, offset + r, dtype=np.int64)[:, None] * np.ones((1, 6), np.int64)
        write_npy_shard(tmp_path / "prefixes" / f"{i:03d}.npy", prefix)
        write_npy_shard(tmp_path / "tokens" / f"{i:03d}.npy", tokens)
        offset += r
    return tmp_path


def test_reader_row_ranges(shard_dir):
    with NumpyShardReader(shard_dir / "prefixes" / "000.npy") as r:
        assert r.num_rows == 7
        rows = r.get_rows(2, 5)
        assert rows.shape == (3, 4)
        np.testing.assert_array_equal(rows[:, 0], [2, 3, 4])
        with pytest.raises(IndexError):
            r.get_rows(5, 9)


def test_exact_batches_with_overflow_across_files(shard_dir):
    ds = TokenPrefixDataset(str(shard_dir), batch_size=4)
    assert len(ds) == 15 // 4
    it = iter(ds)
    seen = []
    for _ in range(6):  # more than one full pass: wraps at the end
        tokens, prefixes = next(it)
        assert tokens.shape == (4, 6) and tokens.dtype == np.int64
        assert prefixes.shape == (4, 4) and prefixes.dtype == np.float32
        seen.extend(int(x) for x in tokens[:, 0])
    # first pass covers sample ids 0..14 in order before wrapping
    # (the last 15th sample joins a batch with wrapped rows 0..)
    assert seen[:12] == list(range(12))
    assert 0 in seen[12:]  # wrap happened


def test_normalize_prefix(shard_dir):
    ds = TokenPrefixDataset(str(shard_dir), batch_size=2, normalize_prefix=True)
    _, prefixes = next(iter(ds))
    norms = np.linalg.norm(prefixes, axis=-1)
    np.testing.assert_allclose(norms[norms > 0], 1.0, atol=1e-6)


def test_multiple_prefix_round_robin(shard_dir, tmp_path):
    other = tmp_path / "other"
    write_npy_shard(other / "prefixes" / "0.npy", np.full((6, 4), 100, np.float32))
    write_npy_shard(other / "tokens" / "0.npy", np.full((6, 6), 100, np.int64))
    a = TokenPrefixDataset(str(shard_dir), batch_size=2)
    b = TokenPrefixDataset(str(other), batch_size=2)
    merged = MultiplePrefixDataset(a, b)
    assert len(merged) == len(a) + len(b)
    it = iter(merged)
    t0, _ = next(it)
    t1, _ = next(it)
    t2, _ = next(it)
    assert t0[0, 0] < 100 and t1[0, 0] == 100 and t2[0, 0] < 100


def test_shard_count_mismatch_raises(tmp_path):
    write_npy_shard(tmp_path / "prefixes" / "0.npy", np.ones((2, 4), np.float32))
    write_npy_shard(tmp_path / "tokens" / "0.npy", np.ones((2, 6), np.int64))
    write_npy_shard(tmp_path / "tokens" / "1.npy", np.ones((2, 6), np.int64))
    with pytest.raises(ValueError):
        TokenPrefixDataset(str(tmp_path), batch_size=2)
