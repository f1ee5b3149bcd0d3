"""ctypes bindings for the native fastwav decoder (fastwav.cc).

Lazily builds libfastwav.so with the bundled Makefile on first use if g++ is
available; everything degrades gracefully to the pure-numpy codec in
data/wavio.py when the native library can't be built or loaded.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libfastwav.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            # Always run make: the Makefile's libfastwav.so -> fastwav.cc
            # dependency makes it a cheap no-op when up to date, and it
            # rebuilds after source edits (an exists() check silently kept
            # loading a stale .so forever).
            subprocess.run(
                ["make", "-C", str(_DIR)], check=True,
                capture_output=True, timeout=120,
            )
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.fastwav_decode_mono.restype = ctypes.c_int
            lib.fastwav_decode_mono.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_long,
                ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.fastwav_info.restype = ctypes.c_int
            lib.fastwav_info.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_long),
            ]
            lib.fastwav_decode_batch.restype = ctypes.c_int
            lib.fastwav_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.c_long,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_long),
                ctypes.c_int,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def decode_mono(path: str | Path) -> tuple[np.ndarray, int] | None:
    """Decode to mono float32; None if the native lib is unavailable or the
    file isn't a format it handles (caller falls back to the numpy codec)."""
    lib = _load()
    if lib is None:
        return None
    path_b = str(path).encode()
    n = ctypes.c_long(0)
    sr = ctypes.c_int(0)
    # Size probe first (cheap metadata parse).
    ch = ctypes.c_int(0)
    rc = lib.fastwav_info(path_b, ctypes.byref(sr), ctypes.byref(ch), ctypes.byref(n))
    if rc != 0:
        return None
    out = np.empty(n.value, dtype=np.float32)
    rc = lib.fastwav_decode_mono(
        path_b, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_long(n.value), ctypes.byref(n), ctypes.byref(sr),
    )
    if rc != 0:
        return None
    return out[: n.value], int(sr.value)


def decode_batch(
    paths: list, target_len: int, n_threads: int = 4
) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """Parallel decode + pad/center-crop straight into a (N, target_len)
    batch buffer. Returns (batch, sample_rates, true_lengths) or None."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.zeros((n, target_len), dtype=np.float32)
    srs = np.zeros(n, dtype=np.int32)
    lens = np.zeros(n, dtype=np.int64)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    lib.fastwav_decode_batch(
        arr, n, ctypes.c_long(target_len),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        srs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        n_threads,
    )
    return out, srs, lens
