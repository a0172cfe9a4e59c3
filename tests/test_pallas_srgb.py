"""Fused sRGB (128bpp) kernel: bit-exactness in interpreter mode."""

from unittest import mock

import numpy as np
import pytest
from jax.experimental import pallas as pl

from smolscale_tpu.backends import numpy_ref
from smolscale_tpu.ops import pallas_srgb
from smolscale_tpu.plan import ScalePlan

RNG = np.random.default_rng(4242)
_ORIG = pl.pallas_call


def _interp_call(*a, **k):
    return _ORIG(*a, **k, interpret=True)


@pytest.mark.parametrize(
    "wi,hi,wo,ho,ti,to",
    [
        (512, 256, 96, 56, 4, 4),    # PREMUL16-linear, 2h ladder
        (512, 256, 96, 56, 4, 0),    # PREMUL8-linear, unassoc->premul
        (512, 256, 96, 56, 0, 0),    # PREMUL8-linear, premul in (unpremul LUT)
        (512, 256, 96, 56, 2, 5),    # premul in -> unassoc out
        (256, 256, 200, 190, 5, 6),  # 0h, reorders
        (1100, 300, 80, 100, 4, 4),  # box H x bilinear V
        (1024, 512, 128, 64, 4, 4),  # uniform 2h ladder (d=2, f=128) both
        (1024, 512, 128, 64, 0, 0),  # uniform ladder, premul in (inv-div LUT)
        (1024, 300, 128, 30, 8, 8),  # 24bpp, uniform ladder H x 10:1 box V
        (1000, 1024, 100, 128, 4, 4),  # general H x uniform ladder V
    ],
)
def test_pallas_srgb_exact(wi, hi, wo, ho, ti, to):
    plan = ScalePlan(wi, hi, wo, ho, ti, to, True)
    assert pallas_srgb.applicable(plan)
    pallas_srgb._built.cache_clear()
    img = RNG.integers(
        0, 256, (2, hi, wi, plan.meta_in.n_bytes), dtype=np.uint8
    )
    with mock.patch.object(pl, "pallas_call", _interp_call):
        got = np.asarray(pallas_srgb.scale_fn(plan, img))
    want = np.stack([numpy_ref.scale(plan, img[i]) for i in range(2)])
    assert np.array_equal(want, got)
    pallas_srgb._built.cache_clear()


def test_gate():
    # no-srgb plans belong to the 64bpp kernels
    assert not pallas_srgb.applicable(ScalePlan(512, 256, 96, 56, 4, 4, False))


@pytest.mark.parametrize(
    "ti,to",
    [
        (8, 8),  # RGB24->RGB24: direct pack variant (to_srgb of premul-linear)
        (8, 9),  # RGB24->BGR24: reversed variant (unpremuls properly)
        (0, 8),  # premul 32bpp -> 24bpp, reversed variant
        (4, 9),  # unassoc 32bpp -> 24bpp, direct variant
        (8, 4),  # 24bpp -> unassoc 32bpp
        (9, 0),  # 24bpp -> premul 32bpp
    ],
)
def test_pallas_srgb_24bpp_exact(ti, to):
    plan = ScalePlan(512, 256, 96, 56, ti, to, True)
    assert pallas_srgb.applicable(plan)
    pallas_srgb._built.cache_clear()
    nb = plan.meta_in.n_bytes
    img = RNG.integers(0, 256, (2, 256, 512, nb), dtype=np.uint8)
    with mock.patch.object(pl, "pallas_call", _interp_call):
        got = np.asarray(pallas_srgb.scale_fn(plan, img))
    want = np.stack([numpy_ref.scale(plan, img[i]) for i in range(2)])
    assert np.array_equal(want, got)
    pallas_srgb._built.cache_clear()


@pytest.mark.parametrize(
    "wi,hi,wo,ho,ti,to",
    [
        (512, 256, 96, 56, 8, 8),     # RGB24->RGB24 dense ladder (6b class)
        (512, 256, 96, 56, 9, 9),     # BGR24
        (512, 256, 96, 56, 8, 4),     # 24bpp -> unassoc 32bpp (PREMUL16)
        (1024, 300, 128, 30, 8, 0),   # uniform ladder H x 10:1 box V -> 32bpp
        (333, 200, 111, 40, 8, 8),    # ragged dims, box V
    ],
)
def test_pallas_srgb_planes_exact(wi, hi, wo, ho, ti, to):
    """Channel-major u8 planes feed for 24bpp sRGB inputs through the
    dispatcher: the inv-div gather and premul factors constant-fold."""
    import jax

    from smolscale_tpu.backends import xla

    plan = ScalePlan(wi, hi, wo, ho, ti, to, True)
    assert pallas_srgb.applicable(plan) and plan.meta_in.n_bytes == 3
    pallas_srgb._built_planes.cache_clear()
    img = RNG.integers(0, 256, (2, hi, wi, 3), dtype=np.uint8)
    xla._FORCE_PALLAS = True
    xla._RGB24_PLANES = True
    try:
        with mock.patch.object(pl, "pallas_call", _interp_call):
            got = np.asarray(jax.jit(lambda v: xla.scale_fn(plan, v))(img))
    finally:
        xla._FORCE_PALLAS = None
        xla._RGB24_PLANES = False
        pallas_srgb._built_planes.cache_clear()
    want = np.stack([numpy_ref.scale(plan, img[i]) for i in range(2)])
    assert np.array_equal(want, got)
