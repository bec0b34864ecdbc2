"""Native host library: C++ ray-batch sampler (ctypes binding).

Compiled lazily on first import with g++ (cached next to the source);
`available()` is False and callers fall back to the numpy path when no
toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ray_sampler.cpp")
_LIB_PATH = os.path.join(_HERE, "libnerface_host.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-funroll-loops", "-shared", "-fPIC", "-std=c++17",
        "-o", _LIB_PATH, _SRC,
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        ):
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None

        lib.nerface_importance_map.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ]
        lib.nerface_gumbel_topk.argtypes = [
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ]
        lib.nerface_assemble_batch.argtypes = [
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_void_p,  # background or NULL
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_void_p,  # bg out or NULL
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def importance_map(
    H: int, W: int, bbox, p: float = 0.9
) -> np.ndarray:
    """C++ variant of `sampler.build_importance_maps` for one frame."""
    lib = _load()
    out = np.empty(H * W, np.float64)
    h0, h1, w0, w1 = [int(v) for v in bbox]
    lib.nerface_importance_map(H, W, h0, h1, w0, w1, float(p), out)
    return out


def gumbel_topk(probs: np.ndarray, k: int, seed: int) -> np.ndarray:
    """Draw k indices without replacement ~ probs (Gumbel top-k)."""
    lib = _load()
    probs = np.ascontiguousarray(probs, np.float64)
    out = np.empty(k, np.int64)
    lib.nerface_gumbel_topk(probs, probs.shape[0], k, np.uint64(seed), out)
    return out


def assemble_batch(
    sel: np.ndarray,
    dirs_cam: np.ndarray,
    image_flat: np.ndarray,
    pose: np.ndarray,
    background_flat: Optional[np.ndarray] = None,
):
    """Gather + rotate the selected rays: returns (ro, rd, target, bg?)."""
    lib = _load()
    sel = np.ascontiguousarray(sel, np.int64)
    k = sel.shape[0]
    dirs_cam = np.ascontiguousarray(dirs_cam, np.float32)
    image_flat = np.ascontiguousarray(image_flat, np.float32)
    pose34 = np.ascontiguousarray(pose[:3, :4], np.float32)
    ro = np.empty((k, 3), np.float32)
    rd = np.empty((k, 3), np.float32)
    target = np.empty((k, 3), np.float32)
    if background_flat is not None:
        background_flat = np.ascontiguousarray(background_flat[:, :3], np.float32)
        bg = np.empty((k, 3), np.float32)
        bg_ptr = bg.ctypes.data_as(ctypes.c_void_p)
        src_ptr = background_flat.ctypes.data_as(ctypes.c_void_p)
    else:
        bg = None
        bg_ptr = None
        src_ptr = None
    lib.nerface_assemble_batch(
        sel, k, dirs_cam, image_flat, image_flat.shape[-1], src_ptr,
        pose34, ro, rd, target, bg_ptr,
    )
    return ro, rd, target, bg
