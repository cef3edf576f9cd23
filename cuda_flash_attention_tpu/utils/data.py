"""Training data pipeline: token shards + the native prefetching loader.

A token shard is a raw little-endian int32 file (the same no-header .bin
convention as the tensor codec in utils/io.py, reference src/utils.cpp).
`TokenLoader` yields [batch, seq_len + 1] next-token windows — feed
`batch[:, :-1]`/`batch[:, 1:]` or hand the whole array to `loss_fn`, which
shifts internally.

Two engines, bit-identical sampling (same xorshift64* stream):

  * NATIVE (cpp/dataloader.cpp via ctypes): mmap'd shard + a producer
    thread slicing into a ring of ready buffers — host input stays off the
    train step's critical path.  Used when cpp/build/libcfa_loader.so is
    present.
  * PYTHON fallback: same windows from numpy — correctness tool and
    zero-build path.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_LIB_PATHS = (
    os.path.join(_REPO, "cpp", "build", "libcfa_loader.so"),
    os.path.join(_REPO, "cpp", "build", "libcfa_loader.dylib"),
)

_MASK64 = (1 << 64) - 1


def write_token_file(path: str, tokens) -> None:
    """Raw little-endian int32 shard (no header — byte-compatible with the
    reference's .bin tensor convention)."""
    np.asarray(tokens, dtype="<i4").tofile(path)


def _xorshift64s(state: int) -> tuple[int, int]:
    """One step of xorshift64* — mirrors cpp/dataloader.cpp exactly."""
    s = state
    s ^= s >> 12
    s = (s ^ (s << 25)) & _MASK64
    s ^= s >> 27
    return s, (s * 0x2545F4914F6CDD1D) & _MASK64


def _load_native_lib():
    for p in _LIB_PATHS:
        if os.path.exists(p):
            lib = ctypes.CDLL(p)
            lib.cfa_loader_open.restype = ctypes.c_void_p
            lib.cfa_loader_open.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
            ]
            lib.cfa_loader_next.restype = ctypes.c_int
            lib.cfa_loader_next.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
            ]
            lib.cfa_loader_num_tokens.restype = ctypes.c_int64
            lib.cfa_loader_num_tokens.argtypes = [ctypes.c_void_p]
            lib.cfa_loader_close.restype = None
            lib.cfa_loader_close.argtypes = [ctypes.c_void_p]
            return lib
    return None


class TokenLoader:
    """Iterator of [batch, seq_len + 1] int32 windows over a token shard.

    ``shuffle=True`` samples window starts from the xorshift64* stream;
    ``shuffle=False`` walks the shard sequentially (wrapping).  Single
    consumer.  ``native=None`` auto-selects the C++ engine when its shared
    library is built (`ninja -C cpp/build`), else the Python fallback;
    both produce IDENTICAL batches for the same seed."""

    def __init__(self, path: str, batch: int, seq_len: int, *,
                 seed: int = 1, shuffle: bool = True, prefetch: int = 4,
                 native: bool | None = None):
        self.batch = int(batch)
        self.width = int(seq_len) + 1
        self._lib = _load_native_lib() if native in (None, True) else None
        if native is True and self._lib is None:
            raise RuntimeError(
                "native loader requested but cpp/build/libcfa_loader.so is "
                "not built (cmake -S cpp -B cpp/build -G Ninja && "
                "ninja -C cpp/build)"
            )
        seed = int(seed) & _MASK64 or 0x9E3779B97F4A7C15
        if self._lib is not None:
            self._h = self._lib.cfa_loader_open(
                path.encode(), self.batch, self.width, seed,
                1 if shuffle else 0, int(prefetch),
            )
            if not self._h:
                raise OSError(f"cannot open token shard {path!r} "
                              f"(needs > seq_len+1 tokens)")
            self.n_tokens = int(self._lib.cfa_loader_num_tokens(self._h))
            self._buf = np.empty((self.batch, self.width), np.int32)
        else:
            self._h = None
            self._tokens = np.fromfile(path, dtype="<i4")
            self.n_tokens = int(self._tokens.size)
            if self.n_tokens <= self.width:
                raise OSError(f"cannot open token shard {path!r} "
                              f"(needs > seq_len+1 tokens)")
            self._state = seed
            self._cursor = 0
            self._shuffle = bool(shuffle)

    @property
    def native(self) -> bool:
        return self._h is not None

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._h is not None:
            rc = self._lib.cfa_loader_next(
                self._h,
                self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            if rc:
                raise RuntimeError("native loader failed")
            return self._buf.copy()
        out = np.empty((self.batch, self.width), np.int32)
        for b in range(self.batch):
            if self._shuffle:
                self._state, r = _xorshift64s(self._state)
                start = r % (self.n_tokens - self.width)
            else:
                start = self._cursor
                self._cursor += self.width
                if self._cursor + self.width > self.n_tokens:
                    self._cursor = 0
            out[b] = self._tokens[start:start + self.width]
        return out

    def close(self):
        if self._h is not None:
            self._lib.cfa_loader_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
