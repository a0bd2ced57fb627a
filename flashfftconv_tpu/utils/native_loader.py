"""ctypes bindings for the native C++ threaded LM batch loader (csrc/).

Builds lazily via `make -C csrc` on first use (g++ is in the image); falls
back cleanly to the pure-Python `utils.data.lm_batches` when unavailable, so
nothing hard-depends on the native component.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_SO = os.path.join(_CSRC, "libffc_dataloader.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        subprocess.run(["make", "-C", _CSRC], check=True, capture_output=True)
    lib = ctypes.CDLL(_SO)
    lib.dl_create.restype = ctypes.c_void_p
    lib.dl_create.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_uint64, ctypes.c_int,
    ]
    lib.dl_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.dl_state.restype = ctypes.c_uint64
    lib.dl_state.argtypes = [ctypes.c_void_p]
    lib.dl_restore.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.dl_num_tokens.restype = ctypes.c_int64
    lib.dl_num_tokens.argtypes = [ctypes.c_void_p]
    lib.dl_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


class NativeLMLoader:
    """Threaded, prefetching LM batch loader over an mmapped token file.

    Fault-tolerant: ``state()`` returns the consumed-batch counter;
    ``restore(counter)`` resumes the exact data order mid-stream.
    """

    def __init__(self, path: str, batch_size: int, seq_len: int,
                 seed: int = 0, is_int32: bool = False):
        lib = _load()
        self._lib = lib
        self._h = lib.dl_create(
            path.encode(), batch_size, seq_len, seed, int(is_int32)
        )
        if not self._h:
            raise OSError(f"dl_create failed for {path}")
        self.batch_size = batch_size
        self.seq_len = seq_len

    @property
    def num_tokens(self) -> int:
        return self._lib.dl_num_tokens(self._h)

    def next(self) -> tuple[np.ndarray, np.ndarray]:
        x = np.empty((self.batch_size, self.seq_len), np.int32)
        y = np.empty((self.batch_size, self.seq_len), np.int32)
        self._lib.dl_next(
            self._h,
            x.ctypes.data_as(ctypes.c_void_p),
            y.ctypes.data_as(ctypes.c_void_p),
        )
        return x, y

    def __iter__(self):
        while True:
            yield self.next()

    def state(self) -> int:
        return int(self._lib.dl_state(self._h))

    def restore(self, counter: int) -> None:
        self._lib.dl_restore(self._h, counter)

    def close(self):
        if self._h:
            self._lib.dl_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
