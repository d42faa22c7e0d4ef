"""Native host-side data pipeline (C++ via ctypes).

Covers the host hot loops that feed the TPU compute path — PFM decoding,
the DTU depth pyramid, multi-threaded ray-batch gathering, and ImageNet
normalization. Compiled on first import (g++ -O3 -shared); every entry
point has a numpy fallback so the framework works without a toolchain.

Usage:
    from mvsnerf_tpu import native
    native.available()          # -> bool
    native.pfm_decode(raw)      # bytes -> (H, W[, 3]) float32
    native.dtu_depth_pipeline(depth, down, value_scale)
    native.ray_gather(rays, rgbs, idx)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "src", "mvsnerf_native.cc")
_LIB_PATH = os.path.join(_HERE, "libmvsnerf_native.so")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-o", _LIB_PATH, _SRC, "-lpthread"],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) or \
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        c_i64 = ctypes.c_int64
        c_f32p = ctypes.POINTER(ctypes.c_float)
        lib.pfm_decode.restype = ctypes.c_int
        lib.pfm_decode.argtypes = [ctypes.c_char_p, c_i64, c_f32p,
                                   ctypes.POINTER(c_i64),
                                   ctypes.POINTER(c_i64)]
        lib.dtu_depth_pipeline.restype = ctypes.c_int
        lib.dtu_depth_pipeline.argtypes = [c_f32p, c_i64, c_i64,
                                           ctypes.c_double, ctypes.c_double,
                                           c_f32p, c_i64, c_i64]
        lib.ray_gather.restype = ctypes.c_int
        lib.ray_gather.argtypes = [c_f32p, c_f32p,
                                   ctypes.POINTER(c_i64), c_i64, c_i64,
                                   c_i64, c_i64, c_f32p, c_f32p,
                                   ctypes.c_int]
        lib.imagenet_normalize.restype = ctypes.c_int
        lib.imagenet_normalize.argtypes = [c_f32p, c_i64]
        lib.resize_nearest_f32.restype = ctypes.c_int
        lib.resize_nearest_f32.argtypes = [c_f32p, c_i64, c_i64, c_f32p,
                                           c_i64, c_i64]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def pfm_decode(raw: bytes):
    """PFM bytes -> (H, W) or (H, W, 3) float32 (top-down rows)."""
    lib = _load()
    if lib is None:
        from ..data.common import read_pfm
        import io as _io
        import tempfile
        with tempfile.NamedTemporaryFile(suffix=".pfm") as f:
            f.write(raw)
            f.flush()
            return read_pfm(f.name)[0]
    # size upper bound: parse dims cheaply from the header in python
    lines = raw.split(b"\n", 3)
    w, h = (int(x) for x in lines[1].split())
    channels = 3 if lines[0].strip() == b"PF" else 1
    out = np.empty(h * w * channels, np.float32)
    oh, ow = ctypes.c_int64(), ctypes.c_int64()
    rc = lib.pfm_decode(raw, len(raw), _fptr(out), ctypes.byref(oh),
                        ctypes.byref(ow))
    if rc < 0:
        raise ValueError("pfm_decode failed")
    shape = (h, w, 3) if rc == 3 else (h, w)
    return out.reshape(shape)


def dtu_depth_pipeline(depth: np.ndarray, down: float = 1.0,
                       value_scale: float = 1.0):
    """DTU GT depth pyramid: x0.5 nearest -> crop [44:556, 80:720] ->
    downSample -> value scale (reference data/dtu.py:116-127)."""
    lib = _load()
    out_h = int(round(512 * down))
    out_w = int(round(640 * down))
    if lib is None:
        from ..data.common import resize_nearest
        d = resize_nearest(depth, 0.5, 0.5)[44:556, 80:720]
        if down != 1.0:
            d = resize_nearest(d, out_wh=(out_w, out_h))
        return (d * value_scale).astype(np.float32)
    depth = np.ascontiguousarray(depth, np.float32)
    out = np.empty((out_h, out_w), np.float32)
    rc = lib.dtu_depth_pipeline(_fptr(depth), depth.shape[0], depth.shape[1],
                                down, value_scale, _fptr(out), out_h, out_w)
    if rc != 0:
        raise ValueError("dtu_depth_pipeline failed (input too small?)")
    return out


def ray_gather(rays: np.ndarray, rgbs: np.ndarray, idx: np.ndarray,
               num_threads: int = 4):
    """Batched gather: (rays[idx], rgbs[idx]) with a multi-threaded copy."""
    lib = _load()
    if lib is None:
        return rays[idx], rgbs[idx]
    rays = np.ascontiguousarray(rays, np.float32)
    rgbs = np.ascontiguousarray(rgbs, np.float32)
    idx = np.ascontiguousarray(idx, np.int64)
    m = len(idx)
    out_rays = np.empty((m, rays.shape[1]), np.float32)
    out_rgbs = np.empty((m, rgbs.shape[1]), np.float32)
    lib.ray_gather(_fptr(rays), _fptr(rgbs),
                   idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                   len(rays), m, rays.shape[1], rgbs.shape[1],
                   _fptr(out_rays), _fptr(out_rgbs), num_threads)
    return out_rays, out_rgbs


def imagenet_normalize_inplace(img: np.ndarray):
    """(..., 3) float32 in [0,1] -> ImageNet normalized, in place."""
    lib = _load()
    if lib is None:
        from ..data.common import normalize_imagenet
        img[:] = normalize_imagenet(img)
        return img
    flat = np.ascontiguousarray(img, np.float32)
    lib.imagenet_normalize(_fptr(flat), flat.size // 3)
    img[:] = flat.reshape(img.shape)
    return img
