"""Narrow16 native-mode regression tests.

The native engine runs S128 bilinear plans whose true intermediates fit
u16 on uint16 worker rows (native/smolscale_cpu.cpp, Plan.narrow16):
PREMUL16-compressed plans (unassoc->unassoc, smolscale.c:751-758) with
<=1 halving per axis, and every PREMUL8 linear-light plan.  The u16 lerp
is a mulhi/mullo split with a borrow correction (lerp16_wide) and 1h
ladders fold with a carry-free floor average (avg_epu16 minus the carry
bit).  These tests pin that mode bit-exact against the numpy semantic
reference across the stride classes the SIMD paths specialize on
(stride-2 even ratios, stride-1 runs, mixed pairs, scalar tails).
"""

import numpy as np
import pytest

from smolscale_tpu.backends import native, numpy_ref
from smolscale_tpu.formats import PixelType
from smolscale_tpu.plan import ScalePlan

U = [
    PixelType.RGBA8_UNASSOCIATED,
    PixelType.BGRA8_UNASSOCIATED,
    PixelType.ARGB8_UNASSOCIATED,
    PixelType.ABGR8_UNASSOCIATED,
]


def _img(rng, h, w, nb):
    return rng.integers(0, 256, (h, w, nb), dtype=np.uint8)


def _check(wi, hi, wo, ho, tin, tout, srgb, seed=0):
    rng = np.random.default_rng(seed)
    nb = 3 if tin in (PixelType.RGB8, PixelType.BGR8) else 4
    img = _img(rng, hi, wi, nb)
    plan = ScalePlan(wi, hi, wo, ho, tin, tout, with_srgb=srgb)
    got = native.scale(plan, img)
    want = numpy_ref.scale(plan, img)
    np.testing.assert_array_equal(got, want)


# -- PREMUL16 compressed (unassoc->unassoc): 0h stride classes --------------

@pytest.mark.parametrize("wi,hi,wo,ho", [
    (128, 96, 64, 48),      # exact 2:1 both axes (lerp_stride2)
    (128, 96, 127, 95),     # near-1:1 (stride-1 runs, run4)
    (160, 120, 120, 90),    # 4:3 mixed pairs (1,1,2 strides)
    (96, 64, 150, 100),     # upscale (repeated pairs)
    (97, 63, 61, 45),       # odd dims (scalar tails)
    (5, 3, 4, 2),           # tiny (all-scalar)
])
@pytest.mark.parametrize("tin,tout", [(U[0], U[1]), (U[2], U[3])])
def test_premul16_0h(wi, hi, wo, ho, tin, tout):
    _check(wi, hi, wo, ho, tin, tout, False)


# -- PREMUL16 compressed: 1h ladders (floor-average fold) -------------------

@pytest.mark.parametrize("wi,hi,wo,ho", [
    (192, 128, 48, 32),     # exact 4:1 (fused in-register 1h, stride2)
    (148, 92, 40, 25),      # non-integer 1h (two-pass scratch ladder)
    (200, 120, 51, 59),     # 1h H x 0h V mix
    (120, 200, 59, 51),     # 0h H x 1h V mix
    (9, 9, 3, 3),           # 1h with scalar tails
])
def test_premul16_1h_floor_average(wi, hi, wo, ho):
    for t in range(2):
        _check(wi, hi, wo, ho, U[t], U[3 - t], False, seed=t)


def test_premul16_2h_stays_exact():
    # 8:1-class plans (2 halvings) exceed the narrow16 bound and must fall
    # back to the int32 worker -- still bit-exact
    _check(256, 200, 32, 25, U[0], U[1], False)


# -- PREMUL8 linear-light (sRGB): gather unpack + u16 rows ------------------

@pytest.mark.parametrize("wi,hi,wo,ho", [
    (128, 96, 64, 48),      # 2:1
    (192, 128, 48, 32),     # 4:1 (1h ladders both axes)
    (256, 192, 40, 30),     # ~6:1 (2h ladders)
    (160, 120, 120, 90),    # mixed strides
    (96, 64, 150, 100),     # upscale
    (33, 17, 20, 11),       # scalar tails
])
@pytest.mark.parametrize("tin,tout", [
    (PixelType.RGBA8_PREMULTIPLIED, PixelType.RGBA8_PREMULTIPLIED),
    (PixelType.BGRA8_UNASSOCIATED, PixelType.RGB8),
    (PixelType.ARGB8_PREMULTIPLIED, PixelType.ABGR8_UNASSOCIATED),
])
def test_linear_light(wi, hi, wo, ho, tin, tout):
    _check(wi, hi, wo, ho, tin, tout, True)


def test_premul16_linear_stays_int32():
    # unassoc->unassoc WITH sRGB: linear PREMUL16 colors exceed u16, the
    # plan must stay on the int32 worker -- bit-exactness is the witness
    _check(128, 96, 80, 60, U[0], U[2], True)


# -- box axes are excluded from narrow16 (24-bit accumulators) --------------

@pytest.mark.parametrize("srgb", [False, True])
def test_box_plans_stay_exact(srgb):
    _check(400, 300, 30, 22, U[0], U[1], srgb)   # ~13:1 box both axes
    _check(400, 96, 30, 64, U[1], U[0], srgb)    # box H x bilinear V
