"""Planner decision parity (pick_filter_params smolscale.c:427-478,
get_implementations mode rules smolscale.c:751-770)."""

import numpy as np
import pytest

from smolscale_tpu.formats import AlphaType, GammaType, PixelType, StorageType
from smolscale_tpu.plan import FilterType, ScalePlan, pick_filter_params, precalc_bilinear, precalc_boxes


@pytest.mark.parametrize(
    "dim_in,dim_out,expect_filter,expect_storage",
    [
        (100, 100, FilterType.COPY, StorageType.S64),
        (1, 50, FilterType.ONE, StorageType.S64),
        (1, 1, FilterType.ONE, StorageType.S64),
        (801, 100, FilterType.BOX, StorageType.S64),  # ratio just over 8
        (800, 100, FilterType.BILINEAR_2H, StorageType.S64),  # exactly 8 -> bilinear
        (25501, 100, FilterType.BOX, StorageType.S128),  # over 255
        (25500, 100, FilterType.BOX, StorageType.S64),  # exactly 255
        (199, 100, FilterType.BILINEAR_0H, StorageType.S64),
        (201, 100, FilterType.BILINEAR_1H, StorageType.S64),
        (50, 100, FilterType.BILINEAR_0H, StorageType.S64),
    ],
)
def test_pick_filter_params(dim_in, dim_out, expect_filter, expect_storage):
    filt, storage, halvings, dim_bilin = pick_filter_params(dim_in, dim_out, False)
    assert filt == expect_filter
    assert storage == expect_storage
    if filt.is_bilinear:
        assert dim_bilin == dim_out << halvings
        assert dim_bilin < dim_in or dim_in <= dim_out


def test_srgb_forces_128():
    _, storage, _, _ = pick_filter_params(100, 100, True)
    assert storage == StorageType.S128


def test_premul16_rule():
    p = ScalePlan(10, 10, 5, 5, PixelType.RGBA8_UNASSOCIATED, PixelType.BGRA8_UNASSOCIATED)
    assert p.internal_alpha == AlphaType.PREMUL16
    assert p.storage == StorageType.S128
    p2 = ScalePlan(10, 10, 5, 5, PixelType.RGBA8_UNASSOCIATED, PixelType.RGBA8_PREMULTIPLIED)
    assert p2.internal_alpha == AlphaType.PREMUL8
    assert p2.storage == StorageType.S64


def test_srgb_ratio_cutoff():
    # Over 8191:1 the planner silently disables linear-light processing
    # (smolscale.c:760-770) but keeps 128bpp storage.
    p = ScalePlan(9000, 2, 1, 2, PixelType.RGBA8_PREMULTIPLIED,
                  PixelType.RGBA8_PREMULTIPLIED, with_srgb=True)
    assert p.gamma == GammaType.SRGB_COMPRESSED
    assert p.storage == StorageType.S128


def test_precalc_bilinear_bounds():
    for dim_in, dim_out in [(100, 37), (37, 100), (2, 65535), (65535, 8192)]:
        off, fac = precalc_bilinear(dim_in, dim_out)
        assert off.min() >= 0 and off.max() <= dim_in - 2
        assert fac.min() >= 0 and fac.max() <= 256
        assert (np.diff(off) >= 0).all()


def test_precalc_boxes_bounds():
    for dim_in, dim_out in [(100, 10), (65535, 3), (4096, 256), (81, 10)]:
        ofs, frac, strides, span_mul = precalc_boxes(dim_in, dim_out)
        assert ofs.shape == (dim_out + 1,)
        assert (np.diff(ofs) >= 0).all()
        assert ofs.max() <= dim_in - 1
        assert frac.min() >= 0 and frac.max() <= 255
        assert span_mul > 0
        # Walk consumption never exceeds the input row
        consumed = 1 + int(strides.sum()) + (dim_out - 1) + (1 if frac[-1] > 0 else 0)
        assert consumed <= dim_in


def test_dim_validation():
    with pytest.raises(ValueError):
        ScalePlan(0, 10, 5, 5, PixelType.RGB8, PixelType.RGB8)
    with pytest.raises(ValueError):
        ScalePlan(10, 70000, 5, 5, PixelType.RGB8, PixelType.RGB8)
