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
