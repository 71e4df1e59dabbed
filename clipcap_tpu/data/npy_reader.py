"""Random-access .npy shard reader + writer.

Host-side equivalent of the reference's lazy numpy reader
(reference dataset.py:12-73: header parse, then seek + frombuffer row
ranges, deliberately not mmap so memory stays bounded). Header parsing
uses numpy's own `np.lib.format` API instead of the reference's regex.

A C++ prefetching reader (native/npy_loader.cpp) can be swapped in for
the hot training path; this module is the always-available fallback and
the correctness oracle for it.
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple, Union

import numpy as np


class NumpyShardReader:
    """Open one .npy file for random row-range access. Context manager."""

    def __init__(self, path: Union[str, Path]):
        self.path = Path(path)
        self.f = open(self.path, "rb")
        version = np.lib.format.read_magic(self.f)
        shape, fortran, dtype = np.lib.format._read_array_header(self.f, version)
        if fortran:
            raise ValueError(f"{path}: Fortran-ordered .npy shards are not supported")
        self.shape: Tuple[int, ...] = shape
        self.dtype = np.dtype(dtype)
        self.header_offset = self.f.tell()
        self.bytes_per_row = self.dtype.itemsize * int(np.prod(shape[1:], dtype=np.int64))

    @property
    def num_rows(self) -> int:
        return self.shape[0]

    def get_rows(self, start: int, end: int) -> np.ndarray:
        if not (0 <= start <= end <= self.num_rows):
            raise IndexError(f"rows [{start}:{end}] out of range for {self.shape}")
        length = end - start
        self.f.seek(self.header_offset + start * self.bytes_per_row)
        buf = self.f.read(length * self.bytes_per_row)
        return np.frombuffer(buf, dtype=self.dtype).reshape((length,) + self.shape[1:])

    def close(self):
        self.f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_row_count(path: Union[str, Path]) -> int:
    with open(path, "rb") as f:
        version = np.lib.format.read_magic(f)
        shape, _, _ = np.lib.format._read_array_header(f, version)
    return shape[0]


def write_npy_shard(path: Union[str, Path], array: np.ndarray) -> None:
    """Write one shard (plain .npy; the preprocess tool's output format)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.save(path, np.ascontiguousarray(array))
