"""ctypes wrapper around the C reference library (test-only oracle).

Builds /root/reference (generic backend only, no AVX2) into a shared library
under build/ and exposes ``scale_simple`` plus the reference's internal LUT
symbols.  Pinning to the generic backend makes the oracle deterministic
across machines (the AVX2 backend is behaviorally equivalent but we don't
want runtime CPU dispatch in the ground truth).

The reference sources are never copied into this repo; they are compiled
in-place from the read-only checkout.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

REF_DIR = Path(os.environ.get("SMOLSCALE_REF_DIR", "/root/reference"))
BUILD_DIR = Path(__file__).resolve().parent.parent / "build"
LIB_PATH = BUILD_DIR / "libsmolscale_ref.so"


def _build() -> Path:
    BUILD_DIR.mkdir(exist_ok=True)
    srcs = [REF_DIR / "smolscale.c", REF_DIR / "smolscale-generic.c"]
    if not LIB_PATH.exists() or any(
        s.stat().st_mtime > LIB_PATH.stat().st_mtime for s in srcs
    ):
        subprocess.run(
            ["gcc", "-O2", "-fPIC", "-shared", *map(str, srcs), "-o", str(LIB_PATH)],
            check=True,
        )
    return LIB_PATH


_lib = None


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(str(_build()))
        _lib.smol_scale_simple.restype = None
        _lib.smol_scale_simple.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.c_void_p, ctypes.c_int,
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.c_uint8,
        ]
    return _lib


def lut(name: str, count: int, dtype) -> np.ndarray:
    """Read an exported LUT symbol (e.g. ``_smol_from_srgb_lut``) from the .so."""
    lib = get_lib()
    addr = ctypes.cast(getattr(lib, name), ctypes.c_void_p).value
    buf = (ctypes.c_uint8 * (count * np.dtype(dtype).itemsize)).from_address(addr)
    return np.frombuffer(bytes(buf), dtype=dtype).copy()


def n_bytes_of(pixel_type: int) -> int:
    return 3 if pixel_type >= 8 else 4


def scale_simple(
    pixels_in: np.ndarray,
    pixel_type_in: int,
    width_out: int,
    height_out: int,
    pixel_type_out: int,
    with_srgb: bool = False,
) -> np.ndarray:
    """Run the C reference ``smol_scale_simple`` (smolscale.c:957-985)."""
    lib = get_lib()
    nb_in = n_bytes_of(pixel_type_in)
    nb_out = n_bytes_of(pixel_type_out)
    h_in, w_in = pixels_in.shape[:2]
    assert pixels_in.dtype == np.uint8
    if pixels_in.ndim == 3:
        assert pixels_in.shape[2] == nb_in
        flat_in = np.ascontiguousarray(pixels_in).reshape(h_in, w_in * nb_in)
    else:
        flat_in = np.ascontiguousarray(pixels_in)
    out = np.empty((height_out, width_out * nb_out), dtype=np.uint8)
    lib.smol_scale_simple(
        flat_in.ctypes.data_as(ctypes.c_void_p), pixel_type_in,
        w_in, h_in, w_in * nb_in,
        out.ctypes.data_as(ctypes.c_void_p), pixel_type_out,
        width_out, height_out, width_out * nb_out,
        1 if with_srgb else 0,
    )
    return out.reshape(height_out, width_out, nb_out)
