"""Native host-runtime loader.

Compiles st_native.cpp with the system toolchain on first use (cached under
~/.cache/smart_tree_tpu) and binds it via ctypes. Every entry point has a
numpy fallback, so the package works without a compiler; the native path
keeps the host input pipeline off the critical path at multi-million-point
scale (np.unique(axis=0) costs seconds there).
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

_SRC = Path(__file__).with_name("st_native.cpp")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[ctypes.CDLL]:
    src = _SRC.read_text()
    tag = hashlib.sha256(src.encode()).hexdigest()[:16]
    cache = Path(os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache"))
    cache = cache / "smart_tree_tpu"
    cache.mkdir(parents=True, exist_ok=True)
    so = cache / f"st_native_{tag}.so"
    if not so.exists():
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC",
            "-std=c++17", str(_SRC), "-o", str(so),
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception as e:  # pragma: no cover - toolchain-dependent
            log.info("native build unavailable (%s); using numpy fallbacks", e)
            return None
    lib = ctypes.CDLL(str(so))
    lib.st_voxelize.restype = ctypes.c_int64
    lib.st_voxelize.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.st_cube_filter.restype = ctypes.c_int64
    lib.st_cube_filter.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_float,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.st_block_ids.restype = ctypes.c_int64
    lib.st_block_ids.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        if os.environ.get("SMART_TREE_TPU_NO_NATIVE") == "1":
            _LIB = None
        else:
            try:
                _LIB = _build()
            except Exception as e:  # pragma: no cover
                log.info("native load failed (%s)", e)
                _LIB = None
    return _LIB


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def voxelize(
    xyz: np.ndarray, voxel: float, origin: np.ndarray
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(coords int32 [M,3] lex-sorted, first int64 [M]) or None if no lib."""
    lib = get_lib()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(xyz, np.float32)
    origin = np.ascontiguousarray(origin, np.float32)
    n = len(xyz)
    coords = np.empty((n, 3), np.int32)
    first = np.empty(n, np.int64)
    m = lib.st_voxelize(
        _fptr(xyz), n, ctypes.c_float(voxel), _fptr(origin),
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        first.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if m < 0:
        return None
    return coords[:m].copy(), first[:m].copy()


def cube_filter(xyz: np.ndarray, centre, size: float) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(xyz, np.float32)
    centre = np.ascontiguousarray(centre, np.float32)
    mask = np.empty(len(xyz), np.uint8)
    lib.st_cube_filter(
        _fptr(xyz), len(xyz), _fptr(centre), ctypes.c_float(size),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return mask.astype(bool)


def block_ids(
    xyz: np.ndarray, block_size: float
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = get_lib()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(xyz, np.float32)
    n = len(xyz)
    ids = np.empty(n, np.int64)
    bc = np.empty((n, 3), np.int32)
    m = lib.st_block_ids(
        _fptr(xyz), n, ctypes.c_float(block_size),
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        bc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if m < 0:
        return None
    return ids, bc[:m].copy()
