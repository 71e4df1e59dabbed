"""ctypes binding for the native C++ shard loader (native/npy_loader.cpp).

Drop-in accelerated replacement for TokenPrefixDataset on the training hot
path: identical batch semantics (exact batch_size, overflow across shard
files, infinite wrap), but file IO + batch assembly run on a C++ thread
with a bounded prefetch queue, so `next()` overlaps with the train step.
Falls back to the Python reader when the shared library isn't built
(`make -C native` builds it; build_native() does it programmatically).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Iterator, Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libnpy_loader.so"


def build_native(force: bool = False) -> Optional[Path]:
    """Compile the shared library with the in-repo Makefile."""
    if _LIB_PATH.exists() and not force:
        return _LIB_PATH
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True, text=True)
    except (OSError, subprocess.CalledProcessError) as err:
        print(f"native loader build failed: {err}")
        return None
    return _LIB_PATH if _LIB_PATH.exists() else None


def _load_lib():
    if not _LIB_PATH.exists() and build_native() is None:
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                  ctypes.c_int64, ctypes.c_int]
    lib.loader_row_info.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_int64),
                                    ctypes.POINTER(ctypes.c_int64),
                                    ctypes.POINTER(ctypes.c_int64)]
    lib.loader_next.restype = ctypes.c_int
    lib.loader_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    return lib


class NativeTokenPrefixDataset:
    """Same iteration contract as data.token_prefix.TokenPrefixDataset."""

    def __init__(self, data_path: str, batch_size: int = 5,
                 normalize_prefix: bool = False, queue_depth: int = 4):
        self._lib = _load_lib()
        if self._lib is None:
            raise RuntimeError(
                "native loader unavailable (build with `make -C native`)"
            )
        path = Path(data_path)
        self.batch_size = batch_size
        self.normalize_prefix = normalize_prefix
        self._handle = self._lib.loader_create(
            str(path / "prefixes").encode(), str(path / "tokens").encode(),
            batch_size, queue_depth,
        )
        if not self._handle:
            raise FileNotFoundError(f"no valid shard pairs under {path}")
        pr, tr, n = ctypes.c_int64(), ctypes.c_int64(), ctypes.c_int64()
        self._lib.loader_row_info(self._handle, ctypes.byref(pr),
                                  ctypes.byref(tr), ctypes.byref(n))
        self.prefix_row_elems = pr.value
        self.tokens_row_elems = tr.value
        self.sample_count = n.value
        # row shapes are flattened by the C side; callers reshape as needed
        self._prefix_buf = np.empty((batch_size, self.prefix_row_elems), np.float32)
        self._tokens_buf = np.empty((batch_size, self.tokens_row_elems), np.int64)

    def __len__(self) -> int:
        return self.sample_count // self.batch_size

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        while True:
            rc = self._lib.loader_next(
                self._handle,
                self._prefix_buf.ctypes.data_as(ctypes.c_void_p),
                self._tokens_buf.ctypes.data_as(ctypes.c_void_p),
            )
            if rc != 0:
                return
            prefixes = self._prefix_buf.copy()
            tokens = self._tokens_buf.copy()
            if self.normalize_prefix:
                norms = np.linalg.norm(prefixes, axis=-1, keepdims=True)
                prefixes = prefixes / np.where(norms > 0, norms, 1.0)
            yield tokens, prefixes

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def make_token_prefix_dataset(data_path: str, batch_size: int,
                              normalize_prefix: bool = False,
                              prefer_native: bool = True):
    """Native loader when available, Python fallback otherwise."""
    if prefer_native:
        try:
            return NativeTokenPrefixDataset(data_path, batch_size, normalize_prefix)
        except (RuntimeError, FileNotFoundError) as err:
            print(f"native loader unavailable ({err}); using Python reader")
    from .token_prefix import TokenPrefixDataset

    return TokenPrefixDataset(data_path, batch_size, normalize_prefix)
