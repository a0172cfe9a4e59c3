#!/usr/bin/env python
"""Head-to-head: native C++ engine vs the reference's AVX2 backend.

Round-2 VERDICT item 2: the reference's AVX2 backend
(smolscale-avx2.c:1342-1784, runtime-dispatched when the CPU supports it)
is the strongest CPU competitor for this exact contract, and the repo had
only ever measured against the *generic* backend.  This probe builds the
reference twice — generic-only (the oracle build) and with
-DSMOL_WITH_AVX2 (Makefile:35-42) — and times both against the native
engine (sst_scale, single thread) on bench.sh-style recipes
(bench.sh:41-52: proportional resizes of FHD/UHD canvases) plus a
format-conversion sample (test.c:1055-1107's 10x10 matrix, reduced dims).

Metric: pps = (in_px + out_px) / elapsed, the reference's own
(test.c:219-224); min-of-reps per cell (test.c:320-340).  Prints one JSON
line per cell plus geomean ratios.  Single-core VM: all engines run one
thread, so this is an ILP/SIMD comparison, not a parallelism one.

Usage: python benchmarks/native_vs_avx2.py [--quick] [--json out.json]
"""

from __future__ import annotations

import argparse
import ctypes
import json
import math
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from smolscale_tpu.backends import native
from smolscale_tpu.formats import PixelType
from smolscale_tpu.plan import ScalePlan

REF_DIR = Path("/root/reference")
BUILD_DIR = Path(__file__).resolve().parent.parent / "build"


def _build_ref(avx2: bool) -> Path:
    """Compile the reference in-place into build/ (sources never copied)."""
    tag = "avx2" if avx2 else "generic"
    lib_path = BUILD_DIR / f"libsmolscale_ref_{tag}.so"
    BUILD_DIR.mkdir(exist_ok=True)
    srcs = ["smolscale.c", "smolscale-generic.c"] + (
        ["smolscale-avx2.c"] if avx2 else []
    )
    if lib_path.exists() and all(
        (REF_DIR / s).stat().st_mtime < lib_path.stat().st_mtime for s in srcs
    ):
        return lib_path
    objs = []
    for s in srcs:
        obj = BUILD_DIR / f"ref_{tag}_{s.replace('.c', '.o')}"
        flags = ["-O2", "-fPIC"]
        if avx2:
            flags.append("-DSMOL_WITH_AVX2")
        if s == "smolscale-avx2.c":
            flags.append("-mavx2")
        subprocess.run(
            ["gcc", *flags, "-c", str(REF_DIR / s), "-o", str(obj)], check=True
        )
        objs.append(str(obj))
    subprocess.run(
        ["gcc", "-shared", *objs, "-o", str(lib_path)], check=True
    )
    return lib_path


def _wrap(lib_path: Path):
    lib = ctypes.CDLL(str(lib_path))
    lib.smol_scale_simple.restype = None
    lib.smol_scale_simple.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_void_p, ctypes.c_int,
        ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_uint8,
    ]
    return lib


def _nb(pt: int) -> int:
    return 3 if pt >= 8 else 4


def _ref_call(lib, flat, out, tin, wi, hi, wo, ho, tout, srgb):
    lib.smol_scale_simple(
        flat.ctypes.data_as(ctypes.c_void_p), tin, wi, hi, wi * _nb(tin),
        out.ctypes.data_as(ctypes.c_void_p), tout, wo, ho, wo * _nb(tout),
        1 if srgb else 0,
    )


def bench_cell(libs, name, wi, hi, tin, wo, ho, tout, srgb, reps, rng):
    img = rng.integers(0, 256, (hi, wi, _nb(tin)), np.uint8)
    plan = ScalePlan(wi, hi, wo, ho, tin, tout, srgb)
    pps = (wi * hi + wo * ho) / 1e6
    flat = np.ascontiguousarray(img).reshape(hi, wi * _nb(tin))
    out = np.empty((ho, wo * _nb(tout)), np.uint8)
    # INTERLEAVED reps: generic, avx2 and native take one rep each per
    # round so ambient CPU drift on the single-core VM hits all three
    # engines equally -- sequential per-engine timing skewed full-run
    # ratios by up to 1.5x on the fast conversion cells.
    native.scale(plan, img)  # warm (plan build, lib load)
    _ref_call(libs["generic"], flat, out, int(tin), wi, hi, wo, ho,
              int(tout), srgb)
    _ref_call(libs["avx2"], flat, out, int(tin), wi, hi, wo, ho,
              int(tout), srgb)
    t_gen = t_avx = t_nat = math.inf
    for _ in range(max(1, reps // 3)):
        for _ in range(3):  # blocks of 3: drift-fair, engine stays warm
            t0 = time.perf_counter()
            _ref_call(libs["generic"], flat, out, int(tin), wi, hi, wo, ho,
                      int(tout), srgb)
            t_gen = min(t_gen, time.perf_counter() - t0)
        for _ in range(3):
            t0 = time.perf_counter()
            _ref_call(libs["avx2"], flat, out, int(tin), wi, hi, wo, ho,
                      int(tout), srgb)
            t_avx = min(t_avx, time.perf_counter() - t0)
        for _ in range(3):
            t0 = time.perf_counter()
            native.scale(plan, img)
            t_nat = min(t_nat, time.perf_counter() - t0)
    rec = {
        "cell": name,
        "pps_generic": round(pps / t_gen, 1),
        "pps_avx2": round(pps / t_avx, 1),
        "pps_native": round(pps / t_nat, 1),
        "native_vs_avx2": round(t_avx / t_nat, 3),
        "native_vs_generic": round(t_gen / t_nat, 3),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    libs = {
        "generic": _wrap(_build_ref(False)),
        "avx2": _wrap(_build_ref(True)),
    }
    rng = np.random.default_rng(0)
    reps = 5 if args.quick else 12
    results = []

    # bench.sh:42-43 proportional recipes (reduced step count)
    P = PixelType
    scales = [0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 1.1, 1.5, 2.0]
    if args.quick:
        scales = [0.1, 0.5, 0.9, 1.5]
    tiers = [(1920, 1080, "fhd"), (3840, 2160, "uhd")]
    if not args.quick:
        tiers.append((7680, 4320, "8k"))  # bench.sh:44 (scale capped at 1.0)
    for wi, hi, tag in tiers:
        for s in scales:
            if tag in ("uhd", "8k") and s > 1.0:
                continue  # bench.sh:44 caps 8K at 1.0; we cap UHD likewise
            wo, ho = max(1, int(wi * s)), max(1, int(hi * s))
            results.append(bench_cell(
                libs, f"{tag} rgba premul x{s}", wi, hi,
                P.RGBA8_PREMULTIPLIED, wo, ho, P.RGBA8_PREMULTIPLIED,
                False, reps, rng))

    # representative conversion / gamma cells
    extra = [
        ("fhd bgra unassoc->rgba premul x0.5", 1920, 1080,
         P.BGRA8_UNASSOCIATED, 960, 540, P.RGBA8_PREMULTIPLIED, False),
        ("fhd rgb24 x0.33", 1920, 1080, P.RGB8, 640, 360, P.RGB8, False),
        ("fhd unassoc premul16 x0.25", 1920, 1080,
         P.RGBA8_UNASSOCIATED, 480, 270, P.RGBA8_UNASSOCIATED, False),
        ("fhd srgb-linear x0.25", 1920, 1080,
         P.RGBA8_PREMULTIPLIED, 480, 270, P.RGBA8_PREMULTIPLIED, True),
    ]
    for name, wi, hi, tin, wo, ho, tout, srgb in extra:
        results.append(bench_cell(
            libs, name, wi, hi, tin, wo, ho, tout, srgb, reps, rng))

    # conversion-matrix sample (test.c:1055-1107, reduced to 1024^2->1023^2)
    types = list(P) if not args.quick else [P.RGBA8_PREMULTIPLIED, P.RGB8]
    for tin in types:
        for tout in types:
            results.append(bench_cell(
                libs, f"conv {tin.name}->{tout.name}", 1024, 1024,
                tin, 1023, 1023, tout, False, max(3, reps - 4), rng))

    def geomean(key):
        vals = [r[key] for r in results]
        return round(math.exp(sum(math.log(v) for v in vals) / len(vals)), 3)

    summary = {
        "cells": len(results),
        "geomean_native_vs_avx2": geomean("native_vs_avx2"),
        "geomean_native_vs_generic": geomean("native_vs_generic"),
    }
    print(json.dumps(summary), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"cells": results, "summary": summary}, f, indent=1)


if __name__ == "__main__":
    main()
