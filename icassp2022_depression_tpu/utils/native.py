"""ctypes bindings for the native IO runtime (``native/wavio.cpp``).

The C++ library parses 16-bit PCM RIFF files directly and decodes a whole
corpus over a thread pool, overlapping disk IO/decode with TPU compute.
It is built on demand with ``g++`` (no pip/pybind dependency); if the
toolchain or the build is unavailable the callers fall back to the stdlib
``wave`` path in :mod:`icassp2022_depression_tpu.data.eatd` — the native
layer is an accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "wavio.cpp"
_SO = _REPO_ROOT / "native" / "build" / "libwavio.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    _SO.parent.mkdir(parents=True, exist_ok=True)
    cmd = ["g++", "-O3", "-std=c++17", "-fPIC", "-Wall", "-shared",
           "-o", str(_SO), str(_SRC), "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """The wavio library, building it on first use; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not _SO.exists() or (_SRC.exists() and
                                _SRC.stat().st_mtime > _SO.stat().st_mtime):
            if not _SRC.exists() or not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
            lib.wavio_read_info.argtypes = [ctypes.c_char_p,
                                            ctypes.POINTER(ctypes.c_int32),
                                            ctypes.POINTER(ctypes.c_int64)]
            lib.wavio_read_info.restype = ctypes.c_int
            lib.wavio_read.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_float),
                                       ctypes.c_int64,
                                       ctypes.POINTER(ctypes.c_int32)]
            lib.wavio_read.restype = ctypes.c_int
            lib.wavio_read_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int32]
            lib.wavio_read_batch.restype = ctypes.c_int
        except OSError:
            # corrupt / wrong-arch cached .so: the native layer is an
            # accelerator, never a requirement — fall back to stdlib
            _build_failed = True
            return None
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def read_wav(path) -> Tuple[np.ndarray, int]:
    """Decode one 16-bit PCM wav -> (float32 samples, sample_rate)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native wavio unavailable")
    sr = ctypes.c_int32(0)
    n = ctypes.c_int64(0)
    rc = lib.wavio_read_info(str(path).encode(), ctypes.byref(sr),
                             ctypes.byref(n))
    if rc != 0:
        raise IOError(f"wavio_read_info({path}) -> {rc}")
    out = np.empty(n.value, np.float32)
    rc = lib.wavio_read(str(path).encode(),
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        n.value, ctypes.byref(sr))
    if rc < 0:
        raise IOError(f"wavio_read({path}) -> {rc}")
    return out[:rc], sr.value


def read_wav_batch(paths: Sequence, n_threads: int = 0
                   ) -> List[Tuple[np.ndarray, int]]:
    """Decode many wavs in parallel -> [(samples, sr), ...] in input order."""
    lib = load()
    if lib is None:
        raise RuntimeError("native wavio unavailable")
    n = len(paths)
    if n == 0:
        return []
    if n_threads <= 0:
        n_threads = min(n, os.cpu_count() or 1)

    def _info(p):
        sr = ctypes.c_int32(0)
        cnt = ctypes.c_int64(0)
        # ctypes releases the GIL around the libc-bound header parse, so the
        # sizing pass threads instead of serially fopen-ing every file twice
        rc = lib.wavio_read_info(str(p).encode(), ctypes.byref(sr),
                                 ctypes.byref(cnt))
        if rc != 0:
            raise IOError(f"wavio_read_info({p}) -> {rc}")
        return cnt.value

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=n_threads) as pool:
        infos = list(pool.map(_info, paths))
    bufs = [np.empty(c, np.float32) for c in infos]

    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    c_outs = (ctypes.POINTER(ctypes.c_float) * n)(
        *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for b in bufs])
    c_caps = (ctypes.c_int64 * n)(*infos)
    c_srs = (ctypes.c_int32 * n)()
    c_lens = (ctypes.c_int64 * n)()
    rc = lib.wavio_read_batch(c_paths, n, c_outs, c_caps, c_srs, c_lens,
                              n_threads)
    if rc != 0:
        raise IOError(f"wavio_read_batch -> {rc}")
    return [(bufs[i][:c_lens[i]], int(c_srs[i])) for i in range(n)]
