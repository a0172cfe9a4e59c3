"""LUT parity with the C reference (smolscale.c:87-262, 276-421)."""

import numpy as np
import pytest

import oracle
from smolscale_tpu import luts


@pytest.mark.parametrize(
    "name,sym,count,dtype",
    [
        ("FROM_SRGB", "_smol_from_srgb_lut", 256, np.uint16),
        ("TO_SRGB", "_smol_to_srgb_lut", 2048, np.uint8),
        ("INV_DIV_P8", "_smol_inv_div_p8_lut", 256, np.uint32),
        ("INV_DIV_P8L", "_smol_inv_div_p8l_lut", 256, np.uint32),
        ("INV_DIV_P16", "_smol_inv_div_p16_lut", 256, np.uint32),
        ("INV_DIV_P16L", "_smol_inv_div_p16l_lut", 256, np.uint32),
    ],
)
def test_lut_matches_reference(name, sym, count, dtype):
    ref = oracle.lut(sym, count, dtype).astype(np.int64)
    ours = getattr(luts, name)
    assert np.array_equal(ref, ours)


def test_srgb_roundtrip_exact():
    # The reference guarantees to_srgb[from_srgb[i]] == i (smolscale.c:81-82).
    assert np.array_equal(luts.TO_SRGB[luts.FROM_SRGB], np.arange(256))


def test_lossless_inv_div_top_roundtrip():
    # p16/p16l invert exactly at the top of the range for every alpha.
    a = np.arange(1, 256, dtype=np.int64)
    assert ((0xFF * a * luts.INV_DIV_P16[a]) >> 16 == 0xFF).all()
    assert ((0x7FF * a * luts.INV_DIV_P16L[a]) >> 19 == 0x7FF).all()
