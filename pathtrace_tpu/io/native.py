"""ctypes bindings to the native IO library (pathtrace_tpu/native/ptio.cpp).

Auto-builds ``libptio.so`` with the sibling Makefile on first use if a
toolchain is available; every entry point degrades to the pure-Python
implementations in io/exr.py / io/bmp.py when the library can't be built
or loaded, so the framework never hard-depends on a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libptio.so"))
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"],
            cwd=os.path.abspath(_NATIVE_DIR),
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """The native library, building it on demand; None if unavailable."""
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.ptio_write_exr.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_void_p),
        ctypes.c_int,
    ]
    lib.ptio_write_exr.restype = ctypes.c_int
    lib.ptio_read_exr_header.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_char_p, ctypes.c_int,
    ]
    lib.ptio_read_exr_header.restype = ctypes.c_int
    lib.ptio_read_exr.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float)]
    lib.ptio_read_exr.restype = ctypes.c_int
    lib.ptio_write_bmp.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
    ]
    lib.ptio_write_bmp.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return load_library() is not None


_COMP_CODES = {"none": 0, "zips": 1, "zip": 3}


def write_exr_native(path, channels: Dict[str, np.ndarray], compression="zip") -> bool:
    """Native EXR write; returns False if the library is unavailable."""
    lib = load_library()
    if lib is None:
        return False
    names = sorted(channels.keys())
    planes = [
        np.ascontiguousarray(np.asarray(channels[n], np.float32)) for n in names
    ]
    h, w = planes[0].shape
    for n, p in zip(names, planes):
        if p.shape != (h, w):
            raise ValueError(f"channel {n} shape {p.shape} != {(h, w)}")
    c_names = (ctypes.c_char_p * len(names))(*[n.encode() for n in names])
    c_planes = (ctypes.c_void_p * len(names))(
        *[p.ctypes.data_as(ctypes.c_void_p) for p in planes]
    )
    rc = lib.ptio_write_exr(
        str(path).encode(), w, h, len(names), c_names, c_planes,
        _COMP_CODES[compression],
    )
    if rc != 0:
        raise IOError(f"ptio_write_exr({path}) failed with code {rc}")
    return True


def read_exr_native(path) -> Optional[Dict[str, np.ndarray]]:
    """Native EXR read; returns None if the library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    nc = ctypes.c_int()
    names_buf = ctypes.create_string_buffer(16384)
    rc = lib.ptio_read_exr_header(
        str(path).encode(), ctypes.byref(w), ctypes.byref(h), ctypes.byref(nc),
        names_buf, len(names_buf),
    )
    if rc != 0:
        raise IOError(f"ptio_read_exr_header({path}) failed with code {rc}")
    names = names_buf.value.decode().split("\n")
    out = np.empty((nc.value, h.value, w.value), np.float32)
    rc = lib.ptio_read_exr(
        str(path).encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    )
    if rc != 0:
        raise IOError(f"ptio_read_exr({path}) failed with code {rc}")
    return {name: out[i] for i, name in enumerate(names)}


def write_bmp_native(path, rgb: np.ndarray) -> bool:
    """Native BMP write of [H, W, 3] uint8; False if unavailable."""
    lib = load_library()
    if lib is None:
        return False
    img = np.ascontiguousarray(rgb, np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("write_bmp_native expects [H, W, 3] uint8")
    rc = lib.ptio_write_bmp(
        str(path).encode(), w, h, img.ctypes.data_as(ctypes.c_char_p)
    )
    if rc != 0:
        raise IOError(f"ptio_write_bmp({path}) failed with code {rc}")
    return True
