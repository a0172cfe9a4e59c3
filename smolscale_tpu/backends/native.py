"""Native C++ CPU backend (host-side production path).

Wraps native/smolscale_cpu.cpp via ctypes: the planner + row engine +
threaded batch executor, byte-identical to the TPU backends.  Built on
demand with g++ (tables.inc is generated from smolscale_tpu.luts so all
backends share one numeric source of truth).
"""

from __future__ import annotations

import ctypes
import subprocess
import sys
import threading
from pathlib import Path

import numpy as np

from ..plan import ScalePlan

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_BUILD_DIR = Path(__file__).resolve().parent.parent.parent / "build"
_LIB_PATH = _BUILD_DIR / "libsmolscale_cpu.so"
_lock = threading.Lock()
_lib = None


def build() -> Path:
    src = _NATIVE_DIR / "smolscale_cpu.cpp"
    inc = _NATIVE_DIR / "tables.inc"
    gen = _NATIVE_DIR / "gen_tables.py"
    _BUILD_DIR.mkdir(exist_ok=True)
    if not inc.exists() or inc.stat().st_mtime < gen.stat().st_mtime:
        subprocess.run([sys.executable, str(gen)], check=True, capture_output=True)
    if (
        not _LIB_PATH.exists()
        or _LIB_PATH.stat().st_mtime < src.stat().st_mtime
        or _LIB_PATH.stat().st_mtime < inc.stat().st_mtime
    ):
        # -march=native first (BMI/addressing codegen on top of the AVX2
        # intrinsics: +1-6% per cell on the bench host), then -mavx2, then
        # plain -O3 (the engine has scalar fallbacks everywhere)
        for arch in (["-march=native"], ["-mavx2"], []):
            cmd = ["g++", "-O3", *arch, "-fPIC", "-shared", "-std=c++17",
                   str(src), "-o", str(_LIB_PATH), "-lpthread"]
            try:
                subprocess.run(cmd, check=True, capture_output=True)
                break
            except subprocess.CalledProcessError:
                if not arch:
                    raise
    return _LIB_PATH


def _get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(str(build()))
            lib.sst_plan_new.restype = ctypes.c_void_p
            lib.sst_plan_new.argtypes = [ctypes.c_int] * 7
            lib.sst_plan_free.argtypes = [ctypes.c_void_p]
            for name in ("sst_scale", "sst_scale_rows", "sst_scale_threaded"):
                getattr(lib, name).restype = None
            lib.sst_scale.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64,
            ]
            lib.sst_scale_rows.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ]
            lib.sst_scale_threaded.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
            ]
            _lib = lib
    return _lib


class _NativePlan:
    """Owns the native plan object; cached per ScalePlan key."""

    def __init__(self, plan: ScalePlan):
        lib = _get_lib()
        self._lib = lib
        self.ptr = lib.sst_plan_new(
            plan.width_in, plan.height_in, plan.width_out, plan.height_out,
            int(plan.pixel_type_in), int(plan.pixel_type_out),
            1 if plan.with_srgb else 0,
        )
        if not self.ptr:
            raise ValueError("invalid plan parameters")

    def __del__(self):  # pragma: no cover
        if getattr(self, "ptr", None):
            self._lib.sst_plan_free(self.ptr)
            self.ptr = None


_plan_cache: dict = {}


def _native_plan(plan: ScalePlan) -> _NativePlan:
    np_ = _plan_cache.get(plan.key)
    if np_ is None:
        np_ = _plan_cache[plan.key] = _NativePlan(plan)
    return np_


def _prep(plan: ScalePlan, img: np.ndarray):
    """Validate input; pass strided row views straight through.

    The C engine takes a rowstride (smol_scale_simple's rowstride_in,
    smolscale.h:47-52), so a subimage view of a larger canvas — any uint8
    array whose pixels are contiguous within a row — is scaled zero-copy.
    Other layouts (negative strides, channel slices) are copied.
    """
    expect = (plan.height_in, plan.width_in, plan.meta_in.n_bytes)
    if img.shape != expect:
        raise ValueError(f"input shape {img.shape} != {expect}")
    nb = plan.meta_in.n_bytes
    if (
        img.dtype == np.uint8
        and img.strides[1] == nb
        and img.strides[2] == 1
        and img.strides[0] >= plan.width_in * nb
    ):
        return img, img.strides[0]
    flat = np.ascontiguousarray(img, dtype=np.uint8)
    return flat, plan.width_in * plan.meta_in.n_bytes


def _prep_out(plan: ScalePlan, out, n_rows: int):
    """Caller-provided output buffer (smol_scale_batch_full's outrows_dest
    + rowstride_out): validated strided view, or a fresh dense array."""
    nb = plan.meta_out.n_bytes
    if out is None:
        out = np.empty((n_rows, plan.width_out, nb), dtype=np.uint8)
        return out, plan.width_out * nb
    if out.shape != (n_rows, plan.width_out, nb) or out.dtype != np.uint8:
        raise ValueError(
            f"out must be uint8 {(n_rows, plan.width_out, nb)}, "
            f"got {out.dtype} {out.shape}"
        )
    if not (
        out.strides[1] == nb
        and out.strides[2] == 1
        and out.strides[0] >= plan.width_out * nb
    ):
        raise ValueError("out rows must be pixel-contiguous (row views ok)")
    return out, out.strides[0]


def scale(plan: ScalePlan, img: np.ndarray, n_threads: int = 1,
          out: np.ndarray | None = None) -> np.ndarray:
    lib = _get_lib()
    nplan = _native_plan(plan)
    flat, stride_in = _prep(plan, img)
    out, stride_out = _prep_out(plan, out, plan.height_out)
    if n_threads == 1:
        lib.sst_scale(
            nplan.ptr, flat.ctypes.data_as(ctypes.c_void_p), stride_in,
            out.ctypes.data_as(ctypes.c_void_p), stride_out,
        )
    else:
        lib.sst_scale_threaded(
            nplan.ptr, flat.ctypes.data_as(ctypes.c_void_p), stride_in,
            out.ctypes.data_as(ctypes.c_void_p), stride_out, n_threads,
        )
    return out


def scale_rows(
    plan: ScalePlan, img: np.ndarray, first_out_row: int, n_out_rows: int,
    out: np.ndarray | None = None,
) -> np.ndarray:
    # The C engine walks [first, first+n) straight into the precalc arrays;
    # enforce the row-range contract here (the xla/numpy backends clamp).
    first_out_row = int(first_out_row)
    n_out_rows = int(n_out_rows)
    if (
        first_out_row < 0
        or n_out_rows < 0
        or first_out_row + n_out_rows > plan.height_out
    ):
        raise ValueError(
            f"row range [{first_out_row}, {first_out_row + n_out_rows}) "
            f"outside [0, {plan.height_out})"
        )
    lib = _get_lib()
    nplan = _native_plan(plan)
    flat, stride_in = _prep(plan, img)
    out, stride_out = _prep_out(plan, out, n_out_rows)
    lib.sst_scale_rows(
        nplan.ptr, flat.ctypes.data_as(ctypes.c_void_p), stride_in,
        out.ctypes.data_as(ctypes.c_void_p), stride_out,
        int(first_out_row), int(n_out_rows),
    )
    return out
