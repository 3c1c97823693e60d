"""ctypes bindings for the native runtime (libswarmruntime.so).

Builds lazily with `make` on first use if the shared object is missing;
falls back to the pure-Python WAV reader when no compiler is available, so
the framework never hard-depends on the native path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import warnings

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libswarmruntime.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True)
        except Exception as e:  # pragma: no cover - build-env dependent
            warnings.warn(f"native runtime build failed ({e}); "
                          "using Python WAV loader")
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:  # pragma: no cover
        warnings.warn(f"native runtime load failed ({e})")
        _lib = False
        return _lib
    lib.swarm_load_wav.restype = ctypes.c_int64
    lib.swarm_load_wav.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.swarm_load_wavs.restype = ctypes.c_int
    lib.swarm_load_wavs.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return bool(_load())


def load_wav(path: str, max_frames: int | None = None) -> np.ndarray:
    """Decode one WAV's first channel to float32 (native fast path)."""
    lib = _load()
    if not lib:
        from ..utils.audio import read_wav

        return read_wav(path)[0][0]
    if max_frames is None:
        max_frames = (os.path.getsize(path) // 2) + 64
    out = np.zeros(max_frames, dtype=np.float32)
    sr = ctypes.c_int(0)
    n = lib.swarm_load_wav(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_frames, ctypes.byref(sr),
    )
    if n < 0:
        raise IOError(f"swarm_load_wav({path}) failed: {n}")
    return out[:n]


def load_wavs(paths: list[str], max_frames: int,
              n_threads: int = 4) -> np.ndarray:
    """Decode a batch of WAVs in parallel -> (len(paths), max_frames)
    float32, zero-padded."""
    lib = _load()
    if not lib:
        from ..utils.audio import read_wav

        out = np.zeros((len(paths), max_frames), dtype=np.float32)
        for i, p in enumerate(paths):
            x = read_wav(p)[0][0][:max_frames]
            out[i, : len(x)] = x
        return out
    out = np.zeros((len(paths), max_frames), dtype=np.float32)
    frames = np.zeros(len(paths), dtype=np.int64)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    rc = lib.swarm_load_wavs(
        arr, len(paths),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_frames,
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n_threads,
    )
    if rc != 0 or (frames < 0).any():
        bad = [paths[i] for i in np.flatnonzero(frames < 0)]
        raise IOError(f"swarm_load_wavs failed for {bad}")
    return out
