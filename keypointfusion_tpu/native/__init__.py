"""ctypes bindings for the native preprocessing core (src/preprocess.cc).

Builds the shared library on first import (g++ -O3 -shared -fPIC) and
caches it next to the source; falls back cleanly when no toolchain is
available (`available()` returns False and callers use the numpy path in
data/preprocessing.py)."""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import Optional, Tuple

import numpy as np

_SRC = osp.join(osp.dirname(__file__), 'src', 'preprocess.cc')
_LIB = osp.join(osp.dirname(__file__), 'src', 'libkpf_preprocess.so')

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ['g++', '-O3', '-shared', '-fPIC', '-o', _LIB, _SRC],
            check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not osp.exists(_LIB) or osp.getmtime(_LIB) < osp.getmtime(_SRC):
        if not _build():
            return None
    lib = ctypes.CDLL(_LIB)
    f32p = np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')
    lib.crop_normalize.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, f32p, f32p, f32p, ctypes.c_int,
        f32p, f32p]
    lib.crop_normalize.restype = ctypes.c_int
    lib.depth_to_pcl.argtypes = [
        f32p, ctypes.c_int, f32p, f32p, f32p, f32p, ctypes.c_float, f32p]
    lib.depth_to_pcl.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def crop_normalize(depth: np.ndarray, center_uvd, cube, cam,
                   img_size: int = 128) -> Tuple[np.ndarray, np.ndarray]:
    """Fused crop+z-threshold+normalize. Returns (crop_nl [S,S], M [3,3])."""
    lib = _load()
    if lib is None:
        raise RuntimeError('native preprocessing unavailable')
    depth = np.ascontiguousarray(depth, np.float32)
    out = np.empty((img_size, img_size), np.float32)
    M = np.empty((3, 3), np.float32)
    rc = lib.crop_normalize(
        depth, depth.shape[0], depth.shape[1],
        np.ascontiguousarray(center_uvd, np.float32),
        np.ascontiguousarray(cube, np.float32),
        np.ascontiguousarray(cam, np.float32), img_size, out, M)
    if rc != 0:
        raise ValueError(f'crop_normalize failed with code {rc}')
    return out, M


def depth_to_pcl(crop_nl: np.ndarray, M, cam, com3d, cube,
                 flip: float = 1.0) -> np.ndarray:
    """Valid crop pixels → normalized camera xyz [N,3]."""
    lib = _load()
    if lib is None:
        raise RuntimeError('native preprocessing unavailable')
    crop_nl = np.ascontiguousarray(crop_nl, np.float32)
    s = crop_nl.shape[0]
    out = np.empty((s * s, 3), np.float32)
    n = lib.depth_to_pcl(
        crop_nl, s, np.ascontiguousarray(M, np.float32),
        np.ascontiguousarray(cam, np.float32),
        np.ascontiguousarray(com3d, np.float32),
        np.ascontiguousarray(cube, np.float32), float(flip), out)
    if n < 0:
        raise ValueError('depth_to_pcl failed')
    return out[:n].copy()
