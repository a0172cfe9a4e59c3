"""Fused 128bpp non-sRGB kernel: bit-exactness in interpreter mode."""

from unittest import mock

import numpy as np
import pytest
from jax.experimental import pallas as pl

from smolscale_tpu.backends import numpy_ref
from smolscale_tpu.formats import AlphaType
from smolscale_tpu.ops import pallas_128
from smolscale_tpu.plan import ScalePlan

RNG = np.random.default_rng(777)
_ORIG = pl.pallas_call


def _interp_call(*a, **k):
    return _ORIG(*a, **k, interpret=True)


@pytest.mark.parametrize(
    "wi,hi,wo,ho,ti,to",
    [
        (512, 256, 96, 56, 4, 4),    # PREMUL16, 2h ladder both axes
        (512, 256, 96, 56, 5, 6),    # PREMUL16, reorders
        (256, 256, 200, 190, 7, 4),  # PREMUL16, 0h upscale-ish
        (1100, 300, 80, 100, 4, 5),  # PREMUL16, box H x bilinear V
        (900, 1100, 70, 90, 6, 7),   # PREMUL16, non-integer box x box
        (600, 2, 2, 1, 4, 4),        # PREMUL16 deep-ish box (300:1)
        (520, 300, 2, 40, 0, 0),     # deep box H (260:1) -> S128 PREMUL8
        (16, 600, 8, 2, 4, 0),       # deep box V, unassoc in -> premul
        (300, 280, 1, 1, 0, 4),      # deep box both (to 1x1)
        (1024, 512, 128, 64, 4, 4),  # uniform 2h ladder (d=2, f=128) both
        (2048, 160, 8, 16, 4, 4),    # uniform integer box H (256:1), V 10:1
    ],
)
def test_pallas_128_exact(wi, hi, wo, ho, ti, to):
    plan = ScalePlan(wi, hi, wo, ho, ti, to, False)
    assert plan.storage.name == "S128" and plan.gamma.name == "SRGB_COMPRESSED"
    assert pallas_128.applicable(plan), (wi, hi, wo, ho, ti, to)
    pallas_128._built.cache_clear()
    img = RNG.integers(0, 256, (2, hi, wi, plan.meta_in.n_bytes), dtype=np.uint8)
    with mock.patch.object(pl, "pallas_call", _interp_call):
        got = np.asarray(pallas_128.scale_fn(plan, img))
    want = np.stack([numpy_ref.scale(plan, img[i]) for i in range(2)])
    assert np.array_equal(want, got)
    pallas_128._built.cache_clear()


def test_low_alpha_color_preserved():
    # the PREMUL16 raison d'etre (smolscale.c:751-758): at 16-bit internal
    # precision a low-alpha pixel's color survives unassoc->unassoc
    # filtering (PREMUL8 would quantize 200*1/256 to 1 and unpremul to junk)
    plan = ScalePlan(64, 64, 32, 32, 4, 4, False)
    assert plan.internal_alpha == AlphaType.PREMUL16
    assert pallas_128.applicable(plan)
    img = np.zeros((64, 64, 4), dtype=np.uint8)
    img[..., 0] = 200  # red
    img[..., 3] = 1    # nearly transparent
    pallas_128._built.cache_clear()
    with mock.patch.object(pl, "pallas_call", _interp_call):
        got = np.asarray(pallas_128.scale_fn(plan, img))
    assert np.array_equal(got, numpy_ref.scale(plan, img))
    assert (np.abs(got[..., 0].astype(int) - 200) <= 1).all(), got[0, 0]
    pallas_128._built.cache_clear()


def test_gate():
    # premul->premul plans are 64bpp; sRGB plans belong to pallas_srgb
    assert not pallas_128.applicable(ScalePlan(512, 256, 96, 56, 0, 0, False))
    assert not pallas_128.applicable(ScalePlan(512, 256, 96, 56, 4, 4, True))
    # deep box past the VMEM budget falls back to XLA
    assert not pallas_128.applicable(ScalePlan(65535, 64, 1, 64, 4, 4, False))
