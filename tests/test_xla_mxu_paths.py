"""Exactness of the MXU (one-hot/segment matmul) formulations, forced on CPU.

On TPU these paths replace gathers/cumsums with exact bf16 matmuls (0/1
matrices, values <= 255 per limb, f32 accumulation); tests force them on so
the numerics are covered without hardware.
"""

import numpy as np
import pytest

from smolscale_tpu.backends import numpy_ref, xla
from smolscale_tpu.plan import ScalePlan

RNG = np.random.default_rng(123)


@pytest.fixture(autouse=True)
def force_mxu():
    xla._FORCE_MXU = True
    xla._jitted.cache_clear()
    yield
    xla._FORCE_MXU = None
    xla._jitted.cache_clear()


@pytest.mark.parametrize(
    "wi,hi,wo,ho,ti,to,srgb",
    [
        (33, 17, 9, 6, 0, 0, False),    # bilinear both axes, 64bpp
        (12, 14, 40, 30, 0, 0, False),  # upscale
        (100, 80, 10, 8, 0, 0, False),  # non-uniform box
        (100, 80, 10, 8, 4, 4, True),   # box, 128bpp limbs (srgb+premul16)
        (2000, 3, 7, 3, 4, 4, False),   # deep box, premul16 wide values
        (5, 9, 33, 7, 0, 8, True),      # bilinear 128bpp linear
        (64, 64, 16, 16, 0, 0, False),  # halvings
    ],
)
def test_mxu_paths_exact(wi, hi, wo, ho, ti, to, srgb):
    nbi = 3 if ti >= 8 else 4
    img = RNG.integers(0, 256, (hi, wi, nbi), dtype=np.uint8)
    plan = ScalePlan(wi, hi, wo, ho, ti, to, srgb)
    want = numpy_ref.scale(plan, img)
    got = xla.scale(plan, img)
    assert np.array_equal(want, got), (plan.x.filter.name, plan.y.filter.name)


@pytest.mark.parametrize(
    "wi,hi,wo,ho,ti,to,srgb",
    [
        (2048, 64, 683, 17, 0, 0, False),   # banded bilinear H (2h ladder)
        (64, 2048, 17, 683, 0, 0, False),   # banded bilinear V
        (4096, 8, 300, 8, 0, 0, False),     # banded box H
        (8, 4096, 8, 300, 0, 0, False),     # banded box V
        (1024, 32, 768, 9, 4, 4, True),     # banded, 128bpp limb split
    ],
)
def test_banded_paths_exact(wi, hi, wo, ho, ti, to, srgb):
    img = RNG.integers(0, 256, (hi, wi, 4), np.uint8)
    plan = ScalePlan(wi, hi, wo, ho, ti, to, srgb)
    want = numpy_ref.scale(plan, img)
    got = xla.scale(plan, img)
    assert np.array_equal(want, got)
