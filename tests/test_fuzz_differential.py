"""Randomized differential fuzzing: numpy-reference vs the C oracle.

Seeded and bounded (the reference's check-mode analogue of exhaustive size
sweeps, test.c:1194-1298, traded for randomized coverage of the full
(dims x types x srgb) space).  Every case must be byte-identical.
"""

import numpy as np
import pytest

import oracle
from smolscale_tpu.backends import numpy_ref
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
    got = numpy_ref.scale(ScalePlan(wi, hi, wo, ho, ti, to, srgb), img)
    assert np.array_equal(ref, got), (
        f"{wi}x{hi}->{wo}x{ho} t{ti}->t{to} srgb={srgb}"
    )
