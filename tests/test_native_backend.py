"""Native C++ CPU engine: bit-exactness vs the C oracle, threading, rows."""

import numpy as np
import pytest

import oracle
from smolscale_tpu.backends import native
from smolscale_tpu.plan import ScalePlan

RNG = np.random.default_rng(2024)


@pytest.mark.parametrize("srgb", [False, True])
@pytest.mark.parametrize("ti", range(10))
@pytest.mark.parametrize("to", range(10))
def test_native_type_matrix(ti, to, srgb):
    for wi, hi, wo, ho in [(33, 17, 9, 6), (12, 14, 40, 30)]:
        nbi = 3 if ti >= 8 else 4
        img = RNG.integers(0, 256, (hi, wi, nbi), dtype=np.uint8)
        ref = oracle.scale_simple(img, ti, wo, ho, to, srgb)
        got = native.scale(ScalePlan(wi, hi, wo, ho, ti, to, srgb), img)
        assert np.array_equal(ref, got)


@pytest.mark.parametrize(
    "wi,hi,wo,ho",
    [(100, 80, 10, 8), (300, 5, 2, 5), (2000, 3, 7, 3), (1, 7, 5, 3),
     (64, 64, 64, 64), (4096, 16, 256, 2)],
)
def test_native_filters(wi, hi, wo, ho):
    img = RNG.integers(0, 256, (hi, wi, 4), dtype=np.uint8)
    for ti, to, srgb in [(0, 0, False), (4, 4, True)]:
        ref = oracle.scale_simple(img, ti, wo, ho, to, srgb)
        got = native.scale(ScalePlan(wi, hi, wo, ho, ti, to, srgb), img)
        assert np.array_equal(ref, got)


def test_native_threaded_and_rows():
    plan = ScalePlan(97, 83, 31, 29, 4, 0, False)
    img = RNG.integers(0, 256, (83, 97, 4), dtype=np.uint8)
    full = oracle.scale_simple(img, 4, 31, 29, 0, False)
    assert np.array_equal(full, native.scale(plan, img, n_threads=4))
    assert np.array_equal(full[7:20], native.scale_rows(plan, img, 7, 13))


def test_native_plan_validation():
    with pytest.raises(ValueError):
        native.scale(ScalePlan(8, 8, 4, 4, 0, 0, False),
                     np.zeros((8, 8, 3), dtype=np.uint8))


def test_native_deep_ratio_overflow_band():
    """PREMUL16/linear accumulators near 2**32: the int32 S128 lanes must
    recover exact values via unsigned reinterpretation (mod-2**32 wrap)."""
    import oracle
    from smolscale_tpu.backends import native
    from smolscale_tpu.plan import ScalePlan
    import numpy as np

    cases = [
        (5000, 2, 1, 2, 4, 4, True),
        (40000, 2, 1, 2, 4, 4, False),
        (65535, 1, 1, 1, 4, 4, False),
        (2, 65535, 2, 1, 5, 5, False),
        (3, 8191, 1, 1, 4, 6, True),
    ]
    for c in cases:
        wi, hi, wo, ho, ti, to, srgb = c
        plan = ScalePlan(wi, hi, wo, ho, ti, to, srgb)
        img = np.full((hi, wi, 4), 255, np.uint8)
        ref = oracle.scale_simple(img, ti, wo, ho, to, srgb)
        assert np.array_equal(ref, native.scale(plan, img)), c
