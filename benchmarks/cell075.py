"""Single-cell head-to-head probe for the x0.75 bilinear-0h loss band.

Times the fhd/uhd/8k rgba-premul x0.75 cells (the only consistent
native-vs-reference-AVX2 losses) with the same block-of-3 interleaved
methodology as native_vs_avx2.py, so kernel experiments get a fast,
drift-fair readout without the full 125-cell sweep.
"""
import sys, time, math, json
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))
import numpy as np
from smolscale_tpu.plan import ScalePlan
from smolscale_tpu.formats import PixelType
from smolscale_tpu.backends import native
from native_vs_avx2 import _build_ref, _wrap, _ref_call, _nb


def main():
    libs = {"avx2": _wrap(_build_ref(True))}
    rng = np.random.default_rng(0)
    P = PixelType
    cells = [
        ("fhd x0.75", 1920, 1080, 1440, 810),
        ("uhd x0.75", 3840, 2160, 2880, 1620),
        ("8k x0.75", 7680, 4320, 5760, 3240),
        ("fhd x0.25", 1920, 1080, 480, 270),
        ("fhd x0.9", 1920, 1080, 1728, 972),
    ]
    if "--quick" in sys.argv:
        cells = cells[:2]
    for name, wi, hi, wo, ho in cells:
        tin = tout = P.RGBA8_PREMULTIPLIED
        img = rng.integers(0, 256, (hi, wi, 4), np.uint8)
        plan = ScalePlan(wi, hi, wo, ho, tin, tout, False)
        flat = np.ascontiguousarray(img).reshape(hi, wi * 4)
        out = np.empty((ho, wo * 4), np.uint8)
        native.scale(plan, img)
        _ref_call(libs["avx2"], flat, out, int(tin), wi, hi, wo, ho,
                  int(tout), False)
        t_avx = t_nat = math.inf
        for _ in range(10):
            for _ in range(3):
                t0 = time.perf_counter()
                _ref_call(libs["avx2"], flat, out, int(tin), wi, hi, wo,
                          ho, int(tout), False)
                t_avx = min(t_avx, time.perf_counter() - t0)
            for _ in range(3):
                t0 = time.perf_counter()
                native.scale(plan, img)
                t_nat = min(t_nat, time.perf_counter() - t0)
        pps = (wi * hi + wo * ho) / 1e6
        print(json.dumps({
            "cell": name,
            "pps_avx2": round(pps / t_avx, 1),
            "pps_native": round(pps / t_nat, 1),
            "native_vs_avx2": round(t_avx / t_nat, 3),
            "ms_native": round(t_nat * 1e3, 3),
            "ms_avx2": round(t_avx * 1e3, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
