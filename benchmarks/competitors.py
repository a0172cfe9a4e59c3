#!/usr/bin/env python
"""Competitor benchmark: the native engine vs the image-scaling libraries
available in this environment (Pillow, OpenCV, torch CPU).

The analogue of the reference's competitor harness (test.c:1404-1611 +
bench.sh:3-19, which wraps GDK-Pixbuf, libswscale, Pixman, SDL_gfx, Skia
and stb_image_resize): same task, each library driven through its own
recommended good-quality resize mode, so this compares *libraries on the
task*, not identical algorithms -- exactly the upstream methodology.

Modes per library (documented so the comparison is honest):
  - smol-native : this repo's C++ engine (bilinear+halvings / box,
                  bit-exact to hpjansson/smolscale's generic backend)
  - pillow      : PIL Image.resize, BILINEAR (BOX would undersample on
                  large downscales the same way; BILINEAR matches the
                  upstream filter class)
  - opencv      : cv2.resize, INTER_AREA for downscale (OpenCV's
                  documented recommendation), INTER_LINEAR for upscale;
                  cv2.setNumThreads(1)
  - torch-cpu   : F.interpolate bilinear, antialias=True on downscale
                  (torch's recommended quality mode), 1 thread
  - stb         : stb_image_resize (vendored in the READ-ONLY reference
                  checkout, never copied here), compiled in place like
                  tests/oracle.py does, driven with exactly the
                  reference harness's parameters (test.c:976-986:
                  stbir_resize_uint8_generic, ALPHA_PREMULTIPLIED,
                  EDGE_ZERO, FILTER_BOX, COLORSPACE_LINEAR)

Metric: pps = (in_px + out_px) / elapsed, min over reps (test.c:219-224,
320-340).  Single-threaded everywhere: the host VM has one core.

Usage: python benchmarks/competitors.py [--quick] [--json PATH]
"""

import argparse
import ctypes
import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from smolscale_tpu.plan import ScalePlan  # noqa: E402
from smolscale_tpu.backends import native  # noqa: E402

REF_DIR = Path("/root/reference")
BUILD_DIR = Path(__file__).resolve().parent.parent / "build"

_STB_SHIM = r"""
#include <math.h>
#define STB_IMAGE_RESIZE_IMPLEMENTATION
#include "stb_image_resize.h"

int stb_resize_rgba(const unsigned char *in, int w, int h,
                    unsigned char *out, int wo, int ho)
{
    /* the reference harness's stb invocation (test.c:976-986) */
    return stbir_resize_uint8_generic(in, w, h, 0, out, wo, ho, 0, 4, 0,
                                      STBIR_FLAG_ALPHA_PREMULTIPLIED,
                                      STBIR_EDGE_ZERO,
                                      STBIR_FILTER_BOX,
                                      STBIR_COLORSPACE_LINEAR,
                                      NULL);
}
"""


# pin of the header this harness compiles (advisor round 4: the checkout
# is untrusted content; refuse to build anything but the audited bytes)
_STB_SHA256 = "6a0e75adbabb48df9031c2e39ccd97437bb226fe31e7d4a01c7bf70a18d32ec6"


def _build_stb():
    """Compile the reference's vendored stb_image_resize.h in place (like
    tests/oracle.py builds the oracle) into build/libstb_resize.so."""
    import hashlib

    BUILD_DIR.mkdir(exist_ok=True)
    so = BUILD_DIR / "libstb_resize.so"
    src = BUILD_DIR / "stb_shim.c"
    hdr = REF_DIR / "stb_image_resize.h"
    got = hashlib.sha256(hdr.read_bytes()).hexdigest()
    if got != _STB_SHA256:
        raise RuntimeError(
            f"stb_image_resize.h hash {got} != pinned {_STB_SHA256}; "
            "refusing to compile an unaudited header"
        )
    if not so.exists() or hdr.stat().st_mtime > so.stat().st_mtime:
        src.write_text(_STB_SHIM)
        subprocess.run(
            ["gcc", "-O2", "-march=native", "-fPIC", "-shared",
             f"-I{REF_DIR}", str(src), "-o", str(so), "-lm"],
            check=True,
        )
    lib = ctypes.CDLL(str(so))
    lib.stb_resize_rgba.restype = ctypes.c_int
    lib.stb_resize_rgba.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]

    def run(rgba, wo, ho):
        h, w = rgba.shape[:2]
        out = np.empty((ho, wo, 4), dtype=np.uint8)
        rc = lib.stb_resize_rgba(
            rgba.ctypes.data_as(ctypes.c_void_p), w, h,
            out.ctypes.data_as(ctypes.c_void_p), wo, ho,
        )
        assert rc == 1
        return out

    return run


def _best(fn, reps):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = min(best, dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from PIL import Image
    import cv2
    import torch
    import torch.nn.functional as F

    cv2.setNumThreads(1)
    torch.set_num_threads(1)
    stb = _build_stb()

    reps = 3 if args.quick else 10
    scales = [0.1, 0.25, 0.5, 0.9, 1.5] if args.quick else [
        0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 1.25, 1.5, 2.0]
    sizes = [("fhd", 1920, 1080), ("uhd", 3840, 2160)]
    rng = np.random.default_rng(7)

    results = []
    for sname, w, h in sizes:
        rgba = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        for s in scales:
            wo, ho = max(1, round(w * s)), max(1, round(h * s))
            plan = ScalePlan(w, h, wo, ho, 0, 0, False)  # RGBA premul
            pil_img = Image.fromarray(rgba, "RGBA")
            tt = torch.from_numpy(rgba).permute(2, 0, 1)[None].float()
            down = s < 1.0
            cv_interp = cv2.INTER_AREA if down else cv2.INTER_LINEAR

            cell = {"cell": f"{sname} rgba x{s}", "w": w, "h": h,
                    "wo": wo, "ho": ho}
            px = w * h + wo * ho

            t = _best(lambda: native.scale(plan, rgba), reps)
            cell["pps_smol_native"] = round(px / t / 1e6, 1)
            t = _best(
                lambda: pil_img.resize((wo, ho), Image.BILINEAR), reps)
            cell["pps_pillow"] = round(px / t / 1e6, 1)
            t = _best(
                lambda: cv2.resize(rgba, (wo, ho), interpolation=cv_interp),
                reps)
            cell["pps_opencv"] = round(px / t / 1e6, 1)
            t = _best(
                lambda: F.interpolate(tt, (ho, wo), mode="bilinear",
                                      antialias=down), reps)
            cell["pps_torch_cpu"] = round(px / t / 1e6, 1)
            t = _best(lambda: stb(rgba, wo, ho), reps)
            cell["pps_stb"] = round(px / t / 1e6, 1)

            for k in ("pillow", "opencv", "torch_cpu", "stb"):
                cell[f"native_vs_{k}"] = round(
                    cell["pps_smol_native"] / cell[f"pps_{k}"], 3)
            results.append(cell)
            print(json.dumps(cell), flush=True)

    def geomean(key):
        v = [c[key] for c in results]
        return round(float(np.exp(np.mean(np.log(v)))), 3)

    summary = {
        "cells": len(results),
        "geomean_native_vs_pillow": geomean("native_vs_pillow"),
        "geomean_native_vs_opencv": geomean("native_vs_opencv"),
        "geomean_native_vs_torch_cpu": geomean("native_vs_torch_cpu"),
        "geomean_native_vs_stb": geomean("native_vs_stb"),
    }
    print(json.dumps(summary), flush=True)
    if args.json:
        Path(args.json).write_text(
            json.dumps({"cells": results, "summary": summary}, indent=1))


if __name__ == "__main__":
    main()
