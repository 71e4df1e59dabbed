"""Native C++ shard loader vs the Python reference reader: byte-identical
batches in the same order, across shard-file overflow and wrap-around.
"""

import numpy as np
import pytest

from clipcap_tpu.data import TokenPrefixDataset, write_npy_shard
from clipcap_tpu.data.native_loader import (
    NativeTokenPrefixDataset,
    build_native,
    make_token_prefix_dataset,
)


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("native_shards")
    rng = np.random.default_rng(0)
    rows = [7, 5, 3]
    offset = 0
    for i, r in enumerate(rows):
        prefix = rng.normal(size=(r, 6)).astype(np.float32)
        prefix[:, 0] = np.arange(offset, offset + r)
        tokens = rng.integers(-1, 100, size=(r, 4)).astype(np.int64)
        tokens[:, 0] = np.arange(offset, offset + r)
        write_npy_shard(d / "prefixes" / f"{i:03d}.npy", prefix)
        write_npy_shard(d / "tokens" / f"{i:03d}.npy", tokens)
        offset += r
    return d


def test_build():
    assert build_native() is not None


def test_native_matches_python(shard_dir):
    py = TokenPrefixDataset(str(shard_dir), batch_size=4)
    nat = NativeTokenPrefixDataset(str(shard_dir), batch_size=4)
    assert len(py) == len(nat)
    py_it, nat_it = iter(py), iter(nat)
    for _ in range(10):  # several wraps over 15 samples
        pt, pp = next(py_it)
        nt, np_ = next(nat_it)
        np.testing.assert_array_equal(pt, nt)
        np.testing.assert_array_equal(pp, np_)
    nat.close()


def test_native_normalize(shard_dir):
    nat = NativeTokenPrefixDataset(str(shard_dir), batch_size=3, normalize_prefix=True)
    _, prefixes = next(iter(nat))
    np.testing.assert_allclose(np.linalg.norm(prefixes, axis=-1), 1.0, atol=1e-5)
    nat.close()


def test_factory_fallback(tmp_path, shard_dir):
    ds = make_token_prefix_dataset(str(shard_dir), batch_size=2)
    tokens, prefixes = next(iter(ds))
    assert tokens.shape == (2, 4) and prefixes.shape == (2, 6)


def _write_pair(d, name, rows, pw=6, tw=4):
    rng = np.random.default_rng(rows)
    write_npy_shard(d / "prefixes" / name, rng.normal(size=(rows, pw)).astype(np.float32))
    write_npy_shard(d / "tokens" / name, rng.integers(0, 9, size=(rows, tw)).astype(np.int64))


def test_mismatched_shard_width_rejected(tmp_path):
    """ADVICE (medium): a later shard with a different row width must be
    rejected at construction — sizing all buffers from shard 0 would
    otherwise heap-overflow on the C++ worker thread."""
    d = tmp_path / "bad_width"
    _write_pair(d, "000.npy", 5)
    _write_pair(d, "001.npy", 5, pw=8)  # wider prefix rows
    with pytest.raises(FileNotFoundError):
        NativeTokenPrefixDataset(str(d), batch_size=2)


def test_mismatched_shard_dtype_rejected(tmp_path):
    d = tmp_path / "bad_dtype"
    _write_pair(d, "000.npy", 5)
    rng = np.random.default_rng(1)
    write_npy_shard(d / "prefixes" / "001.npy", rng.normal(size=(5, 6)).astype(np.float64))
    write_npy_shard(d / "tokens" / "001.npy", rng.integers(0, 9, size=(5, 4)).astype(np.int64))
    with pytest.raises(FileNotFoundError):
        NativeTokenPrefixDataset(str(d), batch_size=2)


def test_truncated_shard_errors_instead_of_hanging(tmp_path):
    """ADVICE (low): a shard whose header claims more rows than the file
    holds must end iteration with an error, not emit garbage rows or block
    loader_next forever."""
    d = tmp_path / "truncated"
    _write_pair(d, "000.npy", 8)
    # chop the last 2 rows of payload off the tokens file
    tok = d / "tokens" / "000.npy"
    data = tok.read_bytes()
    tok.write_bytes(data[: len(data) - 2 * 4 * 8])
    ds = it = None
    ds = NativeTokenPrefixDataset(str(d), batch_size=8)
    it = iter(ds)
    with pytest.raises(StopIteration):
        next(it)  # worker hits the short read and stops the queue
    ds.close()
