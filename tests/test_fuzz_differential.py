"""Randomized differential fuzzing: numpy-reference vs the C oracle.

Seeded and bounded (the reference's check-mode analogue of exhaustive size
sweeps, test.c:1194-1298, traded for randomized coverage of the full
(dims x types x srgb) space).  Every case must be byte-identical.
"""

import numpy as np
import pytest

import oracle
from smolscale_tpu.backends import numpy_ref, xla
from smolscale_tpu.plan import ScalePlan

N_CASES = 60


def _random_case(rng):
    # log-uniform dims biased to exercise every filter class
    def dim():
        kind = rng.integers(0, 5)
        if kind == 0:
            return int(rng.integers(1, 4))
        if kind == 1:
            return int(rng.integers(4, 64))
        if kind == 2:
            return int(rng.integers(64, 512))
        if kind == 3:
            return int(rng.integers(512, 3000))
        return int(rng.integers(1, 2) * rng.integers(3000, 9000))

    wi, hi = dim(), min(dim(), 512)  # cap area for runtime
    wo, ho = dim(), min(dim(), 512)
    wo, ho = min(wo, 2048), min(ho, 2048)
    ti = int(rng.integers(0, 10))
    to = int(rng.integers(0, 10))
    srgb = bool(rng.integers(0, 2))
    return wi, hi, wo, ho, ti, to, srgb


@pytest.mark.parametrize("seed", range(N_CASES))
def test_fuzz_case(seed):
    rng = np.random.default_rng(1000 + seed)
    wi, hi, wo, ho, ti, to, srgb = _random_case(rng)
    nbi = 3 if ti >= 8 else 4
    img = rng.integers(0, 256, (hi, wi, nbi), dtype=np.uint8)
    ref = oracle.scale_simple(img, ti, wo, ho, to, srgb)
    plan = ScalePlan(wi, hi, wo, ho, ti, to, srgb)
    got = numpy_ref.scale(plan, img)
    assert np.array_equal(ref, got), (
        f"{wi}x{hi}->{wo}x{ho} t{ti}->t{to} srgb={srgb}"
    )
    # the int32 compute path must match ground truth too (ADVICE r1: the
    # fixed-case XLA list never reached the deep-ratio overflow band)
    got_xla = np.asarray(xla.scale(plan, img))
    assert np.array_equal(ref, got_xla), (
        f"xla: {wi}x{hi}->{wo}x{ho} t{ti}->t{to} srgb={srgb}"
    )


# Deep box ratios (4096:1 .. 65535:1) with unassociated formats: PREMUL16
# lanes (<= 65025, or 521985 linear) over huge spans drive the box
# accumulator past 2**31 -- the band where the old mul_shift_round24 split
# overflowed (ADVICE r1, high).  Checked on both XLA paths.
_DEEP_CASES = [
    (5000, 2, 1, 2, 4, 4, True),  # advisor repro: 92 vs 97 pre-fix
    (40000, 2, 1, 2, 4, 4, False),  # advisor repro: alpha 92 vs 255 pre-fix
    (4113, 3, 1, 1, 4, 5, True),
    (8191, 2, 1, 1, 6, 7, True),
    (65535, 1, 1, 1, 4, 4, False),
    (33000, 2, 1, 2, 7, 4, False),
    (2, 65535, 2, 1, 5, 5, False),  # vertical deep span
    (3, 8191, 1, 1, 4, 6, True),
]


@pytest.mark.parametrize("case", _DEEP_CASES, ids=str)
@pytest.mark.parametrize("mxu", [False, True], ids=["gather", "mxu"])
def test_deep_ratio_overflow_band(case, mxu):
    wi, hi, wo, ho, ti, to, srgb = case
    rng = np.random.default_rng(hash(case) & 0xFFFF)
    nbi = 3 if ti >= 8 else 4
    img = rng.integers(128, 256, (hi, wi, nbi), dtype=np.uint8)
    img[..., -1] = 255  # saturated alpha maximizes the accumulator
    ref = oracle.scale_simple(img, ti, wo, ho, to, srgb)
    plan = ScalePlan(wi, hi, wo, ho, ti, to, srgb)
    assert np.array_equal(ref, numpy_ref.scale(plan, img))
    old = xla._FORCE_MXU
    xla._FORCE_MXU = mxu
    try:
        got = np.asarray(xla.scale(plan, img))
    finally:
        xla._FORCE_MXU = old
    assert np.array_equal(ref, got), f"{case} mxu={mxu}"
