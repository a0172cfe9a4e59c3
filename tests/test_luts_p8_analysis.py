"""Analysis of the hand-tuned lossy inverse-division tables (VERDICT r3
item 8): demonstrate that the embedded p8/p8l values are NOT reproducible
by the reference's published generator rule, nor by the natural
error-minimization criteria its tuning comment suggests.

The reference ships a generator only for the LOSSLESS tables
(tools/gen-inv-div.c:3-40: seed (2^21 + i/2)/i - 100, then anchor the top
of the value range to round-trip exactly), which luts._gen_inv_div_lut
reproduces byte-for-byte for p16/p16l (test_luts.py).  For the LOSSY p8
and p8l tables the comment says only that values are "tuned to minimize
the error and overhead" (smolscale.c:268-273); no generator is shipped.
This module pins the negative results of reverse-engineering that tuning,
with concrete witnesses, so luts.py's embedded data blocks are documented
contract constants rather than unexplained magic.  The byte-equality of
the embedded data against the reference's own symbols stays enforced by
test_luts.py's oracle checks.
"""

import numpy as np

from smolscale_tpu import luts

U = np.arange(256, dtype=np.int64)


def _premul_p8(u, a):
    # premul_u_to_p8 (generic.c:238-244)
    return (((u + 1) * (a + 1) - 1) >> 8) & 0xFF


def _roundtrip_err(a, f, metric):
    v = _premul_p8(U, a)
    r = (v * f) >> luts.INVERTED_DIV_SHIFT_P8
    e = np.abs(r - U)
    return int(e.sum()) if metric == "L1" else int((e * e).sum())


def test_p8_not_the_published_lossless_rule():
    """The shipped lossless rule (gen-inv-div.c), applied with the p8
    shift, does not reproduce the p8 table: the lossless anchor condition
    (0xff*i*f)>>shift == 0xff is impossible at shift 13 for most i (the
    quantization is too coarse), and where a nearest analogue exists it
    disagrees with the shipped values."""
    # direct application: generate with max 0xff / shift 13 and compare
    lossless = luts._gen_inv_div_lut(0xFF, luts.INVERTED_DIV_SHIFT_P8)
    agree = int((lossless == luts.INV_DIV_P8).sum())
    assert agree < 32, agree  # nowhere near the 256 a generator would give


def test_p8_not_roundtrip_error_minimal():
    """The shipped p8 entries are not the global L1- or L2-minimizing
    multipliers of the premul->unpremul round trip either (neither the
    lowest nor the highest argmin): witnesses at small alpha, where the
    shipped values sit far ABOVE the error-optimal band.

    (Search evidence, 2026-08-19: over f in [1, 2^21] the L2-optimal
    band with highest-f tie-break matches only 197/255 entries; the
    same misses appear for L1 and for five premultiplication variants
    including round(u*a/255).  The misses below are stable witnesses.)
    """
    witnesses = {
        # a: (shipped, (optimal band lo, hi) for BOTH L1 and L2)
        2: (929791, (901120, 905215)),
        3: (652629, (630784, 641706)),
        4: (501759, (483328, 485375)),
        5: (406323, (393216, 394854)),
    }
    for a, (shipped, (lo, hi)) in witnesses.items():
        assert int(luts.INV_DIV_P8[a]) == shipped  # table pin
        for metric in ("L1", "L2"):
            e_ship = _roundtrip_err(a, shipped, metric)
            e_opt = _roundtrip_err(a, hi, metric)
            assert e_opt < e_ship, (a, metric)
            # and the shipped value is OUTSIDE the optimal band
            assert not (lo <= shipped <= hi), a


def test_p8_partial_structure_documented():
    """What structure the p8 table DOES have: for small alpha every entry
    is the maximal f preserving its top-value mapping, f = (K*2^13-1)//a
    with K = ((a*f)>>13)+1 -- but only for 48 of 255 entries, so it is a
    property, not the generator.  Pinned so a future exact
    reverse-engineering has a tested starting point."""
    hold = 0
    for a in range(1, 256):
        f = int(luts.INV_DIV_P8[a])
        k = ((a * f) >> 13) + 1
        if (k * 8192 - 1) // a == f:
            hold += 1
    assert hold == 48, hold


def test_p8l_top_anchor_structure():
    """The p8l table is 'maximal f preserving the top premultiplied
    value's mapping' for 194/255 entries (anchor vmax =
    premul_ul_to_p8l(2047, a), shift 10) -- again a partial property,
    not a generator; pinned as documentation."""
    hold = 0
    for a in range(1, 256):
        f = int(luts.INV_DIV_P8L[a])
        vmax = ((2048 * ((a << 3) + 1) - 1) >> 11)
        k = ((vmax * f) >> 10) + 1
        if (k * 1024 - 1) // vmax == f:
            hold += 1
    assert hold == 194, hold
