"""ctypes bindings for the native C++ scene loader (csrc/scene_loader.cpp).

The .so is compiled on first use with the system g++ (no pybind11 in this
image — plain C ABI + ctypes per the environment constraints) and cached
next to the source. Every entry point falls back to the NumPy path when the
toolchain or the binary is unavailable, so the framework never hard-depends
on the native component.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "csrc",
                    "scene_loader.cpp")
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "csrc",
                   "libsceneloader.so")
_HASH = _SO + ".srchash"
_lock = threading.Lock()
_lib = None
_tried = False


def _src_hash() -> str:
    import hashlib

    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _build(src_hash: str) -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
           _SRC, "-o", _SO]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
        if r.returncode != 0:
            return False
        with open(_HASH, "w") as f:
            f.write(src_hash)
        return True
    except Exception:
        return False


def _is_current() -> bool:
    """The cached .so is trusted only if its recorded source hash matches —
    mtimes are unreliable (git checkouts don't preserve them), and a stale
    or foreign binary must never be loaded silently."""
    if not os.path.exists(_SO) or not os.path.exists(_HASH):
        return False
    try:
        with open(_HASH) as f:
            return f.read().strip() == _src_hash()
    except OSError:
        return False


def get_lib():
    """Load (building from source if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not _is_current():
                if not _build(_src_hash()):
                    return None
        except OSError:
            # Source missing (e.g. a stripped install): NumPy fallback,
            # never an exception out of get_lib().
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.npy_read_f32.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long]
        lib.npy_read_f32.restype = ctypes.c_int
        lib.gather_batch_f32.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int]
        lib.gather_batch_f32.restype = ctypes.c_int
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def gather_frames(paths: list[str], frame_shape: tuple[int, ...],
                  n_threads: int = 8) -> np.ndarray:
    """Read N .npy float frames into one (N, *frame_shape) float32 array.

    Uses the multithreaded native loader when available; falls back to
    sequential np.load otherwise. All frames must share `frame_shape`.
    """
    n = len(paths)
    frame_elems = int(np.prod(frame_shape))
    out = np.empty((n,) + tuple(frame_shape), np.float32)
    lib = get_lib()
    if lib is not None:
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        rc = lib.gather_batch_f32(
            arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            frame_elems, n_threads)
        if rc == 0:
            return out
        # fall through to numpy on any native error
    for i, p in enumerate(paths):
        out[i] = np.load(p).astype(np.float32)
    return out
