# ------------------------------------------------------------------
"""Native (C++) runtime components.

The reference's host-side runtime is torch's C++ DataLoader worker pool
(SURVEY.md 2.9 N5). Here the equivalent is a small OpenMP C++ engine
compiled on first use with the system g++ (no pip dependencies; ctypes C
ABI, no pybind11): fused batch assembly for the synthetic pipeline and the
VHI elementwise core for the reanalysis label engine. Everything degrades
gracefully to the pure-numpy path when no compiler is available.
"""
# ------------------------------------------------------------------

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "datacube_engine.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _cache_dir() -> str:
    base = os.environ.get("IDEE_TPU_CACHE",
                          os.path.join(os.path.expanduser("~"), ".cache",
                                       "idee_tpu"))
    os.makedirs(base, exist_ok=True)
    return base


def _build() -> Optional[str]:
    out = os.path.join(_cache_dir(),
                       f"datacube_engine_py{sys.version_info.major}"
                       f"{sys.version_info.minor}.so")
    if (os.path.exists(out)
            and os.path.getmtime(out) >= os.path.getmtime(_SRC)):
        return out
    cmd = ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", out]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return None
    return out


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("IDEE_TPU_NO_NATIVE"):
            return None
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        i64 = ctypes.c_int64
        fp = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.synth_batch.argtypes = [fp, fp, fp, i64, i64, i64, i64, i64,
                                    i64p, u8p, u8p, i64,
                                    fp, fp, fp, fp, fp]
        lib.synth_batch.restype = None
        lib.vhi_mask.argtypes = [fp, fp, fp, i64, ctypes.c_float,
                                 ctypes.c_float, fp]
        lib.vhi_mask.restype = None
        lib.engine_version.restype = ctypes.c_int
        lib.engine_threads.restype = ctypes.c_int
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def engine_threads() -> int:
    lib = _load()
    return int(lib.engine_threads()) if lib is not None else 0


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def synth_batch(dynamic: np.ndarray, extreme: np.ndarray,
                anomaly: np.ndarray, base_idx: np.ndarray,
                flip_h: np.ndarray, flip_w: np.ndarray, delta_t: int):
    """Fused batch assembly; see datacube_engine.cpp. All inputs must be
    contiguous float32 (dynamic/anomaly [V,T,H,W], extreme [T,H,W])."""
    lib = _load()
    assert lib is not None, "native engine unavailable"
    V, T, H, W = dynamic.shape
    B = base_idx.shape[0]
    dt = delta_t
    x = np.empty((B, V, 1, dt, H, W), np.float32)
    me = np.empty((B, H, W), np.float32)
    mel = np.empty((B, H, W), np.float32)
    mel_t = np.empty((B, dt, H, W), np.float32)
    ma = np.empty((B, V, dt, H, W), np.float32)
    lib.synth_batch(
        _fptr(dynamic), _fptr(extreme), _fptr(anomaly),
        V, T, H, W, dt,
        base_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        flip_h.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        flip_w.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        B,
        _fptr(x), _fptr(me), _fptr(mel), _fptr(mel_t), _fptr(ma))
    return x, me, mel, mel_t, ma


def vhi_mask(vci: np.ndarray, tci: np.ndarray, cold: np.ndarray,
             alpha: float, threshold: float) -> np.ndarray:
    """Elementwise VHI drought core: (alpha*vci + (1-alpha)*tci) <
    threshold, cold pixels excluded."""
    lib = _load()
    assert lib is not None, "native engine unavailable"
    out = np.empty_like(vci, dtype=np.float32)
    lib.vhi_mask(_fptr(vci), _fptr(tci), _fptr(cold), vci.size,
                 float(alpha), float(threshold), _fptr(out))
    return out
