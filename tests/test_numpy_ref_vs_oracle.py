"""Bit-exactness of the numpy reference backend vs the C oracle.

This is the port of the reference's conformance strategy (SURVEY.md §4):
verify.c-style semantic vectors plus test.c's solid-color invariance, all
strengthened to *bit-exact* comparison against the compiled generic backend.
"""

import numpy as np
import pytest

import oracle
from smolscale_tpu.backends import numpy_ref
from smolscale_tpu.plan import ScalePlan

RNG = np.random.default_rng(0xC0FFEE)


def run_case(wi, hi, wo, ho, ti, to, srgb, rng=RNG):
    nbi = 3 if ti >= 8 else 4
    img = rng.integers(0, 256, size=(hi, wi, nbi), dtype=np.uint8)
    ref = oracle.scale_simple(img, ti, wo, ho, to, srgb)
    got = numpy_ref.scale(ScalePlan(wi, hi, wo, ho, ti, to, srgb), img)
    assert np.array_equal(ref, got), (
        f"{wi}x{hi}->{wo}x{ho} t{ti}->t{to} srgb={srgb}: "
        f"{np.count_nonzero(ref.astype(int) - got.astype(int))}/{ref.size} bytes differ"
    )


@pytest.mark.parametrize("srgb", [False, True])
@pytest.mark.parametrize("ti", range(10))
@pytest.mark.parametrize("to", range(10))
def test_full_type_matrix(ti, to, srgb):
    # Downscale and upscale cover both bilinear directions + halvings.
    run_case(33, 17, 9, 6, ti, to, srgb)
    run_case(12, 14, 40, 30, ti, to, srgb)


SIZES = [
    (64, 64, 16, 16),   # bilinear 1h both axes
    (64, 64, 63, 63),   # bilinear 0h
    (100, 80, 10, 8),   # box both axes
    (33, 7, 5, 9),      # 2h x 0h-up mix
    (300, 5, 2, 5),     # box x copy
    (1, 1, 4, 4),       # one x one
    (1, 7, 5, 3),       # one x bilinear
    (7, 1, 3, 5),       # bilinear x one
    (64, 64, 64, 64),   # copy
    (2, 2, 1, 1),       # minimal bilinear
    (2600, 4, 10, 4),   # deep box H
    (4, 2600, 4, 10),   # deep box V
    (2000, 3, 7, 3),    # >255:1 -> 128bpp box H
    (3, 2000, 3, 7),    # >255:1 -> 128bpp box V
    (9000, 2, 1, 2),    # >8191:1 srgb cutoff
    (513, 509, 511, 510),
]


@pytest.mark.parametrize("wi,hi,wo,ho", SIZES)
@pytest.mark.parametrize(
    "ti,to,srgb",
    [
        (0, 0, False), (4, 4, False), (4, 0, False), (0, 8, False),
        (8, 5, False), (0, 0, True), (4, 4, True), (4, 0, True),
        (0, 8, True), (5, 9, True),
    ],
)
def test_size_sweep(wi, hi, wo, ho, ti, to, srgb):
    run_case(wi, hi, wo, ho, ti, to, srgb)


@pytest.mark.parametrize("dim", [1, 2, 255, 65535])
def test_extreme_dims(dim):
    # Saturation-style extremes (verify.c:343-395 sizes {1,2,65534,65535}).
    run_case(dim, 1, 1, 1, 0, 0, False)
    run_case(2, dim, 3, 2, 4, 4, False)


def test_solid_color_invariance():
    # test.c:1119-1298: scaling a constant image reproduces the constant
    # exactly at any size -- catches weight-normalization/boundary bugs.
    color = np.array([10, 200, 30, 255], dtype=np.uint8)
    for wi, hi, wo, ho in [(100, 100, 17, 31), (7, 9, 200, 300), (1000, 3, 9, 2)]:
        img = np.broadcast_to(color, (hi, wi, 4)).copy()
        got = numpy_ref.scale(ScalePlan(wi, hi, wo, ho, 0, 0, False), img)
        assert (got == color).all()


def test_saturation_no_overflow():
    # verify.c:343-395: all-0xff input stays 0xff through any scale factor.
    # Asserted on the premultiplied path; the unassociated->unassociated
    # PREMUL16 path at deep box ratios is *not* saturation-exact even in the
    # reference (oracle equality for it is covered by the sweeps above).
    # (Deep box ratios like 250:1 lose a ULP even in the reference -- its
    # verify.c checks specific size sets -- so we assert the bilinear and
    # moderate-box classes here and rely on oracle equality elsewhere.)
    for wi, hi, wo, ho in [(30, 30, 7, 9), (64, 64, 5, 5), (3, 3, 400, 400)]:
        for srgb in (False, True):
            img = np.full((hi, wi, 4), 0xFF, dtype=np.uint8)
            got = numpy_ref.scale(ScalePlan(wi, hi, wo, ho, 0, 0, srgb), img)
            assert (got == 0xFF).all(), (wi, hi, wo, ho, srgb)


def test_row_batch_equals_full():
    # smol_scale_batch contract: any outrow subrange matches the full run.
    plan = ScalePlan(97, 83, 31, 29, 4, 0, False)
    img = RNG.integers(0, 256, size=(83, 97, 4), dtype=np.uint8)
    full = numpy_ref.scale(plan, img)
    got = np.concatenate(
        [numpy_ref.scale_rows(plan, img, r, min(7, 29 - r)) for r in range(0, 29, 7)]
    )
    assert np.array_equal(full, got)
