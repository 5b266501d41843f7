"""ctypes bindings for the C++ host data plane (libebfi_host.so).

Build with ``ebfi_tpu/native/build.sh``.  All entry points fall back to
the numpy implementations when the library is absent; parity is enforced
by tests.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "libebfi_host.so")
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    dp = ctypes.POINTER(ctypes.c_double)
    fp = ctypes.POINTER(ctypes.c_float)
    up = ctypes.POINTER(ctypes.c_uint8)
    lib.events_to_stack_f32.argtypes = [
        dp, dp, dp, dp, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, fp,
    ]
    lib.blurry_mean_bgr_u8.argtypes = [
        up, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, fp,
    ]
    lib.normalize_ts.argtypes = [dp, ctypes.c_int64, dp]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def events_to_stack_native(xs, ys, ts, ps, num_bins: int, sensor_size) -> np.ndarray:
    """C++ twin of ebfi_tpu.data.encodings.events_to_stack_np."""
    lib = _load()
    assert lib is not None, "libebfi_host.so not built (run native/build.sh)"
    H, W = sensor_size
    xs = np.ascontiguousarray(xs, np.float64)
    ys = np.ascontiguousarray(ys, np.float64)
    ts = np.ascontiguousarray(ts, np.float64)
    ps = np.ascontiguousarray(ps, np.float64)
    out = np.zeros((2, num_bins, H, W), np.float32)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.events_to_stack_f32(
        xs.ctypes.data_as(dp), ys.ctypes.data_as(dp),
        ts.ctypes.data_as(dp), ps.ctypes.data_as(dp),
        len(ts), num_bins, H, W,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def blurry_mean_native(frames_bgr_u8: np.ndarray) -> np.ndarray:
    """(N, H, W, 3) uint8 BGR -> (H, W, 3) float32 RGB mean / 255."""
    lib = _load()
    assert lib is not None, "libebfi_host.so not built (run native/build.sh)"
    frames = np.ascontiguousarray(frames_bgr_u8, np.uint8)
    n, H, W, _ = frames.shape
    out = np.zeros((H, W, 3), np.float32)
    lib.blurry_mean_bgr_u8(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, H, W, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
