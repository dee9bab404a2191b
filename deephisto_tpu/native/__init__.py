"""Native (C++) host library loader.

Builds ``libdeephisto_native.so`` from ``src/native.cpp`` on first import
(g++ -O3 -fopenmp), caches it next to the source, and exposes the C ABI via
ctypes. Everything degrades gracefully: when the toolchain or the build is
unavailable, ``AVAILABLE`` is False and callers fall back to numpy.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "src" / "native.cpp"
_LIB = Path(__file__).parent / "libdeephisto_native.so"

AVAILABLE = False
_lib = None


def _build() -> bool:
    try:
        cmd = [
            "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
            "-std=c++17", str(_SRC), "-o", str(_LIB),
        ]
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        return r.returncode == 0
    except Exception:
        return False


def _load() -> None:
    global _lib, AVAILABLE
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return
    lib.clip_area_boxes.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p,
    ]
    lib.polygon_areas.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
    ]
    lib.extract_patches.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p,
    ]
    lib.native_version.restype = ctypes.c_int
    lib.omp_thread_count.restype = ctypes.c_int
    _lib = lib
    AVAILABLE = True


_load()


def clip_area_boxes_native(vertices: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """Exact polygon∩box areas, C++/OpenMP. Same contract as
    geometry.polygon.clip_area_boxes."""
    v = np.ascontiguousarray(vertices, dtype=np.float64)
    b = np.ascontiguousarray(boxes, dtype=np.float64)
    out = np.empty((len(b),), dtype=np.float64)
    _lib.clip_area_boxes(
        v.ctypes.data, len(v), b.ctypes.data, len(b), out.ctypes.data
    )
    return out


def polygon_areas_native(padded_verts: np.ndarray) -> np.ndarray:
    v = np.ascontiguousarray(padded_verts, dtype=np.float64)
    P, V = v.shape[0], v.shape[1]
    out = np.empty((P,), dtype=np.float64)
    _lib.polygon_areas(v.ctypes.data, P, V, out.ctypes.data)
    return out


def extract_patches_native(
    image: np.ndarray, coords: np.ndarray, patch_size: int
) -> np.ndarray:
    """Parallel host patch extraction from an HWC uint8 layer (works on
    memory-mapped arrays)."""
    img = image if image.flags["C_CONTIGUOUS"] else np.ascontiguousarray(image)
    if img.shape[0] < patch_size or img.shape[1] < patch_size:
        raise ValueError(
            f"layer {img.shape[:2]} smaller than patch_size {patch_size}; the "
            "native extractor cannot read past the mapping"
        )
    # defensive clamp (fresh writable copy): OOB coords would make the C++
    # memcpy read outside the mapping (garbage or SIGSEGV on mmap'd layers)
    c = np.array(coords, dtype=np.int32, copy=True)
    np.clip(c[:, 0], 0, max(0, img.shape[0] - patch_size), out=c[:, 0])
    np.clip(c[:, 1], 0, max(0, img.shape[1] - patch_size), out=c[:, 1])
    out = np.empty((len(c), patch_size, patch_size, 3), dtype=np.uint8)
    _lib.extract_patches(
        img.ctypes.data, img.shape[0], img.shape[1], c.ctypes.data, len(c),
        patch_size, out.ctypes.data,
    )
    return out


def omp_threads() -> int:
    return _lib.omp_thread_count() if AVAILABLE else 1
