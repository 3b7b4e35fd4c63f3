"""ctypes bindings for the native host-side image pipeline (native/canvas.cpp).

Builds the shared library on first use (g++ -O3 -fopenmp) and caches it next
to the source; falls back cleanly when no compiler is available, in which
case `decode_to_canvas` keeps its pure-PIL path.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path

import numpy as np

_logger = logging.getLogger(__name__)

_SRC = Path(__file__).resolve().parents[2] / "native" / "canvas.cpp"
_LIB = _SRC.parent / "libacezero_canvas.so"
_lock = threading.Lock()
_lib_handle = None
_unavailable = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-o", str(_LIB), str(_SRC)],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as exc:
        _logger.info("Native canvas library unavailable (%s); using PIL path.", exc)
        return False


def get_lib():
    """The loaded library, or None when native support is unavailable."""
    global _lib_handle, _unavailable
    with _lock:
        if _lib_handle is not None or _unavailable:
            return _lib_handle
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                _unavailable = True
                return None
        lib = ctypes.CDLL(str(_LIB))
        lib.acz_gray_resize_center_batch.restype = ctypes.c_int
        lib.acz_gray_resize_center_batch.argtypes = [
            ctypes.c_void_p,  # rgb_packed
            ctypes.c_void_p,  # offsets (int64)
            ctypes.c_void_p,  # in_hw (int32)
            ctypes.c_void_p,  # channels (int32)
            ctypes.c_void_p,  # canvases
            ctypes.c_int,  # n
            ctypes.c_int,  # canvas_h
            ctypes.c_int,  # canvas_w
            ctypes.c_void_p,  # out_hw (int32)
        ]
        _lib_handle = lib
        return _lib_handle


def gray_resize_center_batch(
    images: list[np.ndarray], out_sizes: np.ndarray, canvas_hw: tuple[int, int]
) -> np.ndarray | None:
    """Batched fused gray+resize+center. images: list of (h, w[, c]) uint8.

    Returns (n, canvas_h, canvas_w) uint8, or None when the native library is
    unavailable (caller falls back to PIL).
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(images)
    hc, wc = canvas_hw

    flat = [np.ascontiguousarray(img) for img in images]
    offsets = np.zeros(n, np.int64)
    in_hw = np.zeros(2 * n, np.int32)
    channels = np.zeros(n, np.int32)
    pos = 0
    for i, img in enumerate(flat):
        offsets[i] = pos
        in_hw[2 * i] = img.shape[0]
        in_hw[2 * i + 1] = img.shape[1]
        channels[i] = img.shape[2] if img.ndim == 3 else 1
        pos += img.nbytes
    packed = np.concatenate([img.reshape(-1) for img in flat])
    out_hw = np.ascontiguousarray(out_sizes.astype(np.int32)).reshape(-1)
    canvases = np.zeros((n, hc, wc), np.uint8)

    rc = lib.acz_gray_resize_center_batch(
        packed.ctypes.data, offsets.ctypes.data, in_hw.ctypes.data,
        channels.ctypes.data, canvases.ctypes.data,
        n, hc, wc, out_hw.ctypes.data,
    )
    if rc != 0:
        _logger.warning("Native canvas batch failed (rc=%d); falling back.", rc)
        return None
    return canvases
