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

Metric: pps = (in_px + out_px) / elapsed, min over reps (test.c:219-224,
320-340).  Single-threaded everywhere: the host VM has one core.

Usage: python benchmarks/competitors.py [--quick] [--json PATH]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from smolscale_tpu.plan import ScalePlan  # noqa: E402
from smolscale_tpu.backends import native  # noqa: E402


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

            for k in ("pillow", "opencv", "torch_cpu"):
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
    }
    print(json.dumps(summary), flush=True)
    if args.json:
        Path(args.json).write_text(
            json.dumps({"cells": results, "summary": summary}, indent=1))


if __name__ == "__main__":
    main()
