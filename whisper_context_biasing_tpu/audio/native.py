"""ctypes bindings for the native (C++) audio runtime.

``native/wcb_native.cpp`` provides WAV decode + windowed-sinc resampling + a
multithreaded batch loader. The library is built on demand with the repo
Makefile (g++, no external deps) and cached; all entry points fall back to
the pure-Python path in ``audio.io`` when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libwcb_native.so")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", _NATIVE_DIR],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.isfile(_SO_PATH)
    except Exception:
        return False


def load_library():
    """Returns the loaded library or None (toolchain/build unavailable)."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        src = os.path.join(os.path.dirname(_SO_PATH), "wcb_native.cpp")
        stale = (os.path.isfile(_SO_PATH) and os.path.isfile(src)
                 and os.path.getmtime(src) > os.path.getmtime(_SO_PATH))
        if not os.path.isfile(_SO_PATH) or stale:
            if not _build() and not os.path.isfile(_SO_PATH):
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
            lib.wcb_decode_audio.restype = ctypes.c_long
            lib.wcb_decode_audio.argtypes = [
                ctypes.c_char_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_long,
                ctypes.POINTER(ctypes.c_long),
            ]
            lib.wcb_decode_batch.restype = ctypes.c_long
            lib.wcb_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.c_int,
                ctypes.c_long, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ]
            lib.wcb_resample.restype = ctypes.c_long
            lib.wcb_resample.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ]
            lib.wcb_last_error.restype = ctypes.c_char_p
        except (OSError, AttributeError) as e:
            # truncated/incompatible binary: degrade to the Python decoders
            # instead of raising through available()
            print(f"[native] unusable {_SO_PATH}: {e}; using Python decoders")
            _build_failed = True
            return None
        _lib = lib
        return _lib


def available() -> bool:
    return load_library() is not None


def decode_audio(path: str, sample_rate: int = 16000, max_len: int = 30 * 16000 * 20
                 ) -> np.ndarray:
    """Decode one WAV to mono float32 at ``sample_rate`` (native path)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    buf = np.empty(max_len, np.float32)
    actual = ctypes.c_long(0)
    n = lib.wcb_decode_audio(
        path.encode(), sample_rate,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_len,
        ctypes.byref(actual),
    )
    if n < 0:
        raise RuntimeError(lib.wcb_last_error().decode())
    if actual.value > max_len:
        # longer than the native buffer: let the caller fall back to the
        # Python decoder rather than silently truncating
        raise RuntimeError(
            f"audio exceeds native decode capacity ({actual.value} > {max_len} "
            f"samples)")
    return buf[:n].copy()


def decode_batch(
    paths: list[str], sample_rate: int = 16000, fixed_len: int = 480000,
    num_threads: int = 0,
) -> np.ndarray:
    """Parallel decode of N files into a (N, fixed_len) zero-padded/trimmed
    float32 array (the Whisper 30 s window contract)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = len(paths)
    out = np.zeros((n, fixed_len), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.wcb_decode_batch(
        arr, n, sample_rate, fixed_len,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads,
    )
    if rc != 0:
        raise RuntimeError(
            f"batch decode failed at {paths[rc - 1]}: "
            f"{lib.wcb_last_error().decode()}"
        )
    return out
