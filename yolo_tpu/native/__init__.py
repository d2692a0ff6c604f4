"""Native (C++) host-runtime components, loaded via ctypes.

Builds `libyolo_preprocess.so` from preprocess.cpp on first use (g++ -O3) and
exposes `letterbox_batch` — the native fast path the predictor uses to assemble
uint8 NHWC device batches. Falls back silently to the cv2 path when no
compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import subprocess
from pathlib import Path

import numpy as np

from yolo_tpu.utils import LOGGER

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = Path(__file__).parent
    src = here / "preprocess.cpp"
    try:
        # binary name embeds the source hash: never ship or load a stale /
        # unauditable .so — always built from the checked-in source (the .so
        # itself is gitignored)
        digest = hashlib.sha256(src.read_bytes()).hexdigest()[:12]
        so = here / f"libyolo_preprocess-{digest}.so"
        if not so.exists():
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", str(so), str(src)],
                check=True,
                capture_output=True,
                timeout=120,
            )
            LOGGER.info(f"built native preprocess library {so.name}")
        lib = ctypes.CDLL(str(so))
        lib.letterbox_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_uint8, ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        lib.batch_letterbox_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_uint8,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        _LIB = lib
    except Exception as e:  # no compiler / build failure → cv2 fallback
        LOGGER.info(f"native preprocess unavailable ({e}); using cv2 path")
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def letterbox(img: np.ndarray, dst_hw, pad_value: int = 114):
    """Native single-image letterbox → (out, ((r, r), (dw, dh)))."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    img = np.ascontiguousarray(img if img.ndim == 3 else img[..., None])
    h, w, c = img.shape
    dh, dw = dst_hw
    out = np.empty((dh, dw, c), np.uint8)
    ratio = np.zeros(2, np.float32)
    pad = np.zeros(2, np.float32)
    lib.letterbox_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), dh, dw,
        pad_value, ratio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pad.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out, ((float(ratio[0]), float(ratio[1])), (float(pad[0]), float(pad[1])))


def letterbox_batch(frames: np.ndarray, dst_hw, pad_value: int = 114):
    """Native batched letterbox: (N, h, w, c) uint8 → (N, dh, dw, c) uint8."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    frames = np.ascontiguousarray(frames)
    n, h, w, c = frames.shape
    dh, dw = dst_hw
    out = np.empty((n, dh, dw, c), np.uint8)
    ratio = np.zeros(2, np.float32)
    pad = np.zeros(2, np.float32)
    lib.batch_letterbox_u8(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), dh, dw, pad_value,
        ratio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pad.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out, ((float(ratio[0]), float(ratio[1])), (float(pad[0]), float(pad[1])))
