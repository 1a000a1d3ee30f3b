"""ctypes bindings for the native host runtime (native/drba_host.cpp).

Lazily builds the shared library with the repo Makefile on first use; every
entry point has a numpy fallback so the framework runs without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdrba_host.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(
                    ["make", "-s", "libdrba_host.so"],
                    cwd=_NATIVE_DIR,
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.drba_bgr8_to_rgbf32.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ]
            lib.drba_rgbf32_to_bgr8.argtypes = list(lib.drba_bgr8_to_rgbf32.argtypes)
            lib.drba_bgr8_to_rgb8.argtypes = list(lib.drba_bgr8_to_rgbf32.argtypes)
            lib.drba_ring_create.restype = ctypes.c_void_p
            lib.drba_ring_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
            lib.drba_ring_destroy.argtypes = [ctypes.c_void_p]
            lib.drba_ring_push.restype = ctypes.c_int
            lib.drba_ring_push.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
            lib.drba_ring_pop.restype = ctypes.c_int64
            lib.drba_ring_pop.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
            lib.drba_ring_close.argtypes = [ctypes.c_void_p]
            lib.drba_ring_size.restype = ctypes.c_int64
            lib.drba_ring_size.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception as e:  # toolchain absent: numpy fallbacks take over
            from drba_tpu.utils.log import get_logger

            get_logger("drba_tpu.native").warning(
                "native host lib unavailable (%s); using numpy fallbacks", e)
            _build_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def bgr8_to_rgbf32(frame: np.ndarray, threads: int = 0) -> np.ndarray:
    """HWC BGR uint8 -> HWC RGB float32 in [0,1]."""
    lib = _load()
    h, w = frame.shape[:2]
    if lib is None:
        return frame[:, :, ::-1].astype(np.float32) / 255.0
    frame = np.ascontiguousarray(frame)
    out = np.empty((h, w, 3), np.float32)
    lib.drba_bgr8_to_rgbf32(frame.ctypes.data, out.ctypes.data, h, w, threads)
    return out


def bgr8_to_rgb8(frame: np.ndarray, out: np.ndarray | None = None,
                 threads: int = 0) -> np.ndarray:
    """HWC BGR uint8 -> RGB uint8 channel flip into a reusable buffer (the
    per-frame op feeding ffmpeg's rgb24 pipe)."""
    lib = _load()
    h, w = frame.shape[:2]
    if out is None:
        out = np.empty((h, w, 3), np.uint8)
    if lib is None:
        np.copyto(out, frame[:, :, ::-1])
        return out
    frame = np.ascontiguousarray(frame)
    lib.drba_bgr8_to_rgb8(frame.ctypes.data, out.ctypes.data, h, w, threads)
    return out


def rgbf32_to_bgr8(frame: np.ndarray, threads: int = 0) -> np.ndarray:
    """HWC RGB float32 [0,1] -> HWC BGR uint8 (truncating, tools.py:38)."""
    lib = _load()
    h, w = frame.shape[:2]
    if lib is None:
        return (np.clip(frame[:, :, ::-1], 0, 1) * 255.0).astype(np.uint8)
    frame = np.ascontiguousarray(frame, dtype=np.float32)
    out = np.empty((h, w, 3), np.uint8)
    lib.drba_rgbf32_to_bgr8(frame.ctypes.data, out.ctypes.data, h, w, threads)
    return out


class FrameRing:
    """Lock-free SPSC ring of fixed-size frames (native, bounded memory)."""

    def __init__(self, slot_bytes: int, capacity: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native host library unavailable")
        self._lib = lib
        self._ring = lib.drba_ring_create(slot_bytes, capacity)
        self._slot_bytes = slot_bytes

    def push(self, data: np.ndarray) -> int:
        data = np.ascontiguousarray(data)
        return self._lib.drba_ring_push(self._ring, data.ctypes.data, data.nbytes)

    def pop(self, out: np.ndarray) -> int:
        return int(self._lib.drba_ring_pop(self._ring, out.ctypes.data))

    def close(self) -> None:
        self._lib.drba_ring_close(self._ring)

    def __len__(self) -> int:
        return int(self._lib.drba_ring_size(self._ring))

    def __del__(self):
        try:
            self._lib.drba_ring_destroy(self._ring)
        except Exception:
            pass
