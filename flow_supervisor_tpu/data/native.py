"""ctypes bindings for the native IO library (native/libfst_io.so).

Falls back to the numpy readers in ``flow_supervisor_tpu.data.io`` when the
library isn't built. Build with ``sh native/build.sh``.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libfst_io.so",
)
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.fst_flo_dims.argtypes = [ctypes.c_char_p, i32p]
        lib.fst_read_flo.argtypes = [ctypes.c_char_p, f32p, ctypes.c_int32, ctypes.c_int32]
        lib.fst_ppm_dims.argtypes = [ctypes.c_char_p, i32p]
        lib.fst_read_ppm.argtypes = [ctypes.c_char_p, f32p, ctypes.c_int32, ctypes.c_int32]
        lib.fst_pfm_dims.argtypes = [ctypes.c_char_p, i32p]
        lib.fst_read_pfm.argtypes = [
            ctypes.c_char_p, f32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32
        ]
        lib.fst_read_flo_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32, f32p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.fst_read_ppm_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32, f32p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ]
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def read_flo(path: str) -> np.ndarray:
    lib = _load()
    if lib is None:
        from flow_supervisor_tpu.data.io import read_flo as np_read

        return np_read(path)
    dims = (ctypes.c_int32 * 2)()
    if lib.fst_flo_dims(path.encode(), dims) != 0:
        raise ValueError(f"invalid .flo: {path}")
    h, w = dims[0], dims[1]
    out = np.empty((h, w, 2), np.float32)
    if lib.fst_read_flo(path.encode(), _fptr(out), h, w) != 0:
        raise IOError(f"failed reading {path}")
    return out


def read_ppm(path: str) -> np.ndarray:
    lib = _load()
    if lib is None:
        from flow_supervisor_tpu.data.io import read_image

        return read_image(path)
    dims = (ctypes.c_int32 * 2)()
    if lib.fst_ppm_dims(path.encode(), dims) != 0:
        raise ValueError(f"invalid .ppm: {path}")
    h, w = dims[0], dims[1]
    out = np.empty((h, w, 3), np.float32)
    if lib.fst_read_ppm(path.encode(), _fptr(out), h, w) != 0:
        raise IOError(f"failed reading {path}")
    return out


def read_pfm(path: str) -> np.ndarray:
    lib = _load()
    if lib is None:
        from flow_supervisor_tpu.data.io import read_pfm as np_read

        return np.ascontiguousarray(np_read(path)).astype(np.float32)
    dims = (ctypes.c_int32 * 3)()
    if lib.fst_pfm_dims(path.encode(), dims) != 0:
        raise ValueError(f"invalid .pfm: {path}")
    h, w, c = dims[0], dims[1], dims[2]
    out = np.empty((h, w, c) if c > 1 else (h, w), np.float32)
    if lib.fst_read_pfm(path.encode(), _fptr(out), h, w, c) != 0:
        raise IOError(f"failed reading {path}")
    return out


def read_flo_batch(paths: Sequence[str], h: int, w: int, threads: int = 4):
    lib = _load()
    out = np.empty((len(paths), h, w, 2), np.float32)
    if lib is None:
        from flow_supervisor_tpu.data.io import read_flo as np_read

        for i, p in enumerate(paths):
            out[i] = np_read(p)
        return out
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    fails = lib.fst_read_flo_batch(arr, len(paths), _fptr(out), h, w, threads)
    if fails:
        raise IOError(f"{fails} files failed to load")
    return out
