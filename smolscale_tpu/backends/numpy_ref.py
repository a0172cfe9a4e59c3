"""Reference backend: exact per-channel-plane model of the scaling pipeline.

This is the semantic specification the TPU backends are tested against, and
itself validated bit-for-bit against the C reference's generic backend (see
tests/test_exact_vs_oracle.py).

Representation: instead of the reference's packed-u64 SWAR lanes
(4x16-bit "64bpp" / 2x32-bit "128bpp", smolscale-private.h:52-62 region),
we keep one int64 numpy plane per channel, canonical order [c0,c1,c2,alpha].
Every SWAR operation in the generic backend is lane-exact (the masks and
value-range invariants prevent cross-lane carries; e.g. the bilinear lerp
satisfies p*F + q*(256-F) <= 255*256 per 16-bit lane), so per-channel
arithmetic with identical operation order reproduces identical values.
Channel *reordering* never changes values (all lanes are filtered
identically, alpha always in the last slot), so the reference's repack-chain
search (smolscale.c:647-719) reduces to byte permutations at unpack/pack.

Operation-order provenance is cited per function.  Dtype is int64
throughout: the largest intermediate (box accumulator x span multiplier)
is < 2**41, far from overflow.
"""

from __future__ import annotations

import numpy as np

from .. import luts
from ..formats import AlphaType, GammaType, StorageType
from ..plan import FilterType, ScalePlan

_I64 = np.int64


# ----------------------------------------------------------------------------
# Fixed-point primitives (generic backend, smolscale-generic.c:185-318)
# ----------------------------------------------------------------------------

def premul_p8(v, a):
    """(v+1)*(a+1)-1 >> 8 trick (premul_u_to_p8_64bpp, generic.c:238-244)."""
    return (((v + 1) * (a + 1) - 1) >> 8) & 0xFF


def unpremul_p8(v, a):
    """v * inv_div_p8[a] >> 13 (unpremul_p8_to_u_128bpp, generic.c:227-236)."""
    return (v * luts.INV_DIV_P8[a] >> luts.INVERTED_DIV_SHIFT_P8) & 0xFF


def premul_p8l(l, a):
    """11-bit linear premul (premul_ul_to_p8l_128bpp, generic.c:261-269)."""
    return (((l + 1) * ((a << 3) + 1) - 1) >> 11) & 0x7FF


def unpremul_p8l(v, a):
    """(unpremul_p8l_to_ul_128bpp, generic.c:271-280)."""
    return (v * luts.INV_DIV_P8L[a] >> luts.INVERTED_DIV_SHIFT_P8L) & 0x7FF


def unpremul_p16(v, a):
    """(unpremul_p16_to_u_128bpp, generic.c:290-299)."""
    return (v * luts.INV_DIV_P16[a] >> luts.INVERTED_DIV_SHIFT_P16) & 0xFF


def unpremul_p16l(v, a):
    """(unpremul_p16l_to_ul_128bpp, generic.c:309-318)."""
    return (v * luts.INV_DIV_P16L[a] >> luts.INVERTED_DIV_SHIFT_P16L) & 0x7FF


def from_srgb(v):
    return luts.FROM_SRGB[v]


def to_srgb(v):
    return luts.TO_SRGB[v]


# ----------------------------------------------------------------------------
# Unpack: bytes -> internal channel planes
# ----------------------------------------------------------------------------

def unpack(plan: ScalePlan, img: np.ndarray) -> np.ndarray:
    """(H, W, n_bytes) u8 -> (4, H, W) int64 internal planes.

    Covers the unpack half of the repack matrix
    (smolscale-generic.c:349-752); the specific conversion is selected by
    (input alpha, internal alpha, gamma) exactly as find_repacks would.
    """
    meta = plan.meta_in
    img = img.astype(_I64)
    chans = [None, None, None, None]
    for byte_pos, ch in enumerate(meta.layout):
        chans[ch] = img[..., byte_pos]
    a = chans[3] if meta.has_alpha else np.full(img.shape[:2], 255, dtype=_I64)
    color = chans[:3]

    ia, g = plan.internal_alpha, plan.gamma
    in_premul = meta.alpha == AlphaType.PREMUL8

    if ia == AlphaType.PREMUL8 and g == GammaType.SRGB_COMPRESSED:
        out_c = color if in_premul else [premul_p8(c, a) for c in color]
        out_a = a
    elif ia == AlphaType.PREMUL8 and g == GammaType.SRGB_LINEAR:
        # premul in: unpremul -> linear -> re-premul at 11 bits
        # (repack_row_*_PREMUL8_COMPRESSED_to_*_128_PREMUL8_LINEAR,
        #  generic.c:488-502, 522-535); unassoc in: generic.c:683-706.
        if in_premul:
            out_c = [premul_p8l(from_srgb(unpremul_p8(c, a)), a) for c in color]
        else:
            out_c = [premul_p8l(from_srgb(c), a) for c in color]
        out_a = a
    elif ia == AlphaType.PREMUL16 and g == GammaType.SRGB_COMPRESSED:
        # (unpack_pixel_*_u_to_*_p16_128bpp, generic.c:616-634, 708-726)
        out_c = [c * a for c in color]
        out_a = (a << 8) | 0x80
    else:  # PREMUL16 LINEAR (generic.c:636-660, 728-752)
        out_c = [from_srgb(c) * a for c in color]
        out_a = (a << 8) | 0x80
    return np.stack(out_c + [out_a]).astype(_I64)


# ----------------------------------------------------------------------------
# Pack: internal channel planes -> bytes
# ----------------------------------------------------------------------------

def pack(plan: ScalePlan, planes: np.ndarray) -> np.ndarray:
    """(4, h, w) int64 internal planes -> (h, w, n_bytes) u8.

    Covers the pack half of the repack matrix (generic.c:754-1164),
    including two reference asymmetries we reproduce deliberately:

    * 128bpp PREMUL8 LINEAR -> 24bpp premul output applies the to-sRGB LUT
      to the *premultiplied linear* values without unpremultiplying first
      (generic.c:922-935 passes row_in, not t, at line 929), unlike the
      32bpp output path (generic.c:1096-1109) which unpremuls, compresses
      and re-premultiplies.
    """
    meta = plan.meta_out
    ia, g = plan.internal_alpha, plan.gamma
    out_premul = meta.alpha == AlphaType.PREMUL8
    color = [planes[i] for i in range(3)]
    alpha_plane = planes[3]

    if ia == AlphaType.PREMUL8:
        a = alpha_plane & 0xFF
        if g == GammaType.SRGB_COMPRESSED:
            out_c = color if out_premul else [unpremul_p8(c, a) for c in color]
        else:  # LINEAR
            if out_premul:
                if meta.n_bytes == 3:
                    if plan.pack24_linear_direct:
                        # Reference asymmetry: to_srgb of premul-linear
                        # without unpremultiplying (generic.c:922-935).
                        out_c = [to_srgb(c & 0x7FF) for c in color]
                    else:
                        # The 321-ordered twin unpremultiplies properly
                        # (generic.c:1010-1023).
                        out_c = [to_srgb(unpremul_p8l(c, a)) for c in color]
                else:
                    out_c = [
                        premul_p8(to_srgb(unpremul_p8l(c, a)), a) for c in color
                    ]
            else:
                out_c = [to_srgb(unpremul_p8l(c, a)) for c in color]
    else:  # PREMUL16 (output is always unassociated here)
        a = (alpha_plane >> 8) & 0xFF
        if g == GammaType.SRGB_COMPRESSED:
            out_c = [unpremul_p16(c, a) for c in color]
        else:
            out_c = [to_srgb(unpremul_p16l(c, a)) for c in color]

    out = np.empty(planes.shape[1:] + (meta.n_bytes,), dtype=np.uint8)
    chans = out_c + [a]
    for byte_pos, ch in enumerate(meta.layout):
        out[..., byte_pos] = (chans[ch] & 0xFF).astype(np.uint8)
    return out


# ----------------------------------------------------------------------------
# Filters.  All operate on (4, H, W) planes; W is the filtered axis for the
# horizontal pass, rows for the vertical pass.
# ----------------------------------------------------------------------------

def _lerp(p, q, f, mask):
    """((p - q) * F >> 8) + q, the packed lerp (generic.c:1317, 1704 etc.).

    int64 arithmetic shift is floor division, matching the lane-exact
    behavior of the u64 SWAR form.
    """
    return ((((p - q) * f) >> 8) + q) & mask


def hfilter(plan: ScalePlan, planes: np.ndarray) -> np.ndarray:
    """(4, H, W_in) -> (4, H, W_out) along the last axis."""
    ax = plan.x
    mask = plan.working_mask
    filt = ax.filter
    if filt == FilterType.COPY:
        return planes
    if filt == FilterType.ONE:
        return np.repeat(planes[:, :, :1], ax.dim_out, axis=2)
    if filt.is_bilinear:
        n = ax.halvings
        off = ax.offsets
        f = ax.factors.astype(_I64)
        p = planes[:, :, off]
        q = planes[:, :, off + 1]
        samples = _lerp(p, q, f, mask)  # (4, H, dim_bilin)
        if n == 0:
            return samples
        s = samples.reshape(samples.shape[0], samples.shape[1], ax.dim_out, 1 << n)
        return (s.sum(axis=3) >> n) & mask
    return _box_axis(planes, ax, mask, plan.storage, axis_is_vertical=False)


def vfilter(plan: ScalePlan, hrows: np.ndarray) -> np.ndarray:
    """(4, H_in, W_out) -> (4, H_out, W_out) along the row axis."""
    ay = plan.y
    mask = plan.working_mask
    filt = ay.filter
    if filt == FilterType.COPY:
        return hrows
    if filt == FilterType.ONE:
        return np.repeat(hrows[:, :1, :], ay.dim_out, axis=1)
    if filt.is_bilinear:
        n = ay.halvings
        off = ay.offsets
        f = ay.factors.astype(_I64)
        p = hrows[:, off, :]
        q = hrows[:, off + 1, :]
        samples = _lerp(p, q, f[None, :, None], mask)
        if n == 0:
            return samples
        s = samples.reshape(samples.shape[0], ay.dim_out, 1 << n, samples.shape[2])
        return (s.sum(axis=2) >> n) & mask
    # BOX: transpose so the filtered axis is last, reuse the walk, transpose back.
    out = _box_axis(
        hrows.transpose(0, 2, 1), ay, mask, plan.storage, axis_is_vertical=True
    )
    return out.transpose(0, 2, 1)


def _scale_span(acc, span_mul, storage):
    """Box normalization: (acc * span_mul + 2**23) >> 24, then lane mask.

    scale_64bpp (generic.c:1231-1245) masks to 8 bits; scale_128bpp_half
    (generic.c:1247-1261) masks to 16 bits.
    """
    out_mask = 0xFF if storage == StorageType.S64 else 0xFFFF
    return ((acc * span_mul + (1 << 23)) >> 24) & out_mask


def _box_axis(planes, ax, mask, storage, axis_is_vertical):
    """Box filter along the last axis of ``planes`` (4, rows, dim_in).

    Horizontal semantics follow interp_horizontal_boxes_{64,128}bpp
    (generic.c:1427-1556): a sequential span walk carrying the left
    fractional remainder.  Vertical semantics follow scale_outrow_box_*
    (generic.c:2112-2260): per-outrow edge weighting.  The two differ in
    edge-weight details (the 128bpp vertical path weights its last row by
    w2-1, generic.c:2248), hence the flag.
    """
    n_out = ax.dim_out
    out = np.zeros(planes.shape[:2] + (n_out,), dtype=_I64)

    if not axis_is_vertical:
        # Sequential walk, mirroring the C pointer arithmetic exactly.
        strides = ax.strides
        fracs = ax.factors
        pos = 1
        left = (planes[:, :, 0] * 256 >> 8) & mask  # weight_pixel(.., 256)
        for j in range(n_out - 1):
            n = int(strides[j])
            acc = planes[:, :, pos : pos + n].sum(axis=2) + left
            r = planes[:, :, pos + n]
            f = int(fracs[j])
            s = r * f
            acc = acc + ((s >> 8) & mask)
            left = (((r << 8) - r - s) >> 8) & mask
            out[:, :, j] = _scale_span(acc, ax.span_mul, storage)
            pos += n + 1
        # Final box (generic.c:1468-1478)
        n = int(strides[n_out - 1])
        acc = planes[:, :, pos : pos + n].sum(axis=2) + left
        pos += n
        f = int(fracs[n_out - 1])
        if f > 0:
            acc = acc + ((planes[:, :, pos] * f >> 8) & mask)
        out[:, :, n_out - 1] = _scale_span(acc, ax.span_mul, storage)
        return out

    # Vertical box
    ofs = ax.offsets
    fracs = ax.factors
    dim_in = ax.dim_in
    for i in range(n_out):
        y0, y1 = int(ofs[i]), int(ofs[i + 1])
        w1 = 256 if i == 0 else 255 - int(fracs[i - 1])
        w2 = int(fracs[i])
        first = (planes[:, :, y0] * w1 >> 8) & mask
        acc = first
        if storage == StorageType.S64:
            # scale_outrow_box_64bpp + scale_and_weight_edge_rows_box_64bpp
            # (generic.c:2042-2161): q = (r*w2)>>8 even when w2 == 0.
            if w2 or y1 < dim_in:
                r = planes[:, :, y1]
            else:
                r = np.zeros_like(first)
            acc = acc + ((r * w2 >> 8) & mask)
            if y1 > y0 + 1:
                acc = acc + planes[:, :, y0 + 1 : y1].sum(axis=2)
        else:
            # scale_outrow_box_128bpp (generic.c:2198-2260): last row
            # weighted by w2-1 ("subtract 1 to avoid overflow", line 2248).
            if y1 > y0 + 1:
                acc = acc + planes[:, :, y0 + 1 : y1].sum(axis=2)
            if w2 > 0:
                acc = acc + ((planes[:, :, y1] * (w2 - 1) >> 8) & mask)
        out[:, :, i] = _scale_span(acc, ax.span_mul, storage)
    return out


# ----------------------------------------------------------------------------
# Entry points
# ----------------------------------------------------------------------------

def scale(plan: ScalePlan, img: np.ndarray) -> np.ndarray:
    """Scale one image: (H_in, W_in, n_bytes_in) u8 -> (H_out, W_out, n_bytes_out) u8."""
    expect = (plan.height_in, plan.width_in, plan.meta_in.n_bytes)
    if img.shape != expect:
        raise ValueError(
            f"input shape {img.shape} does not match plan "
            f"(H_in, W_in, n_bytes_in) = {expect} for "
            f"{plan.pixel_type_in.name}"
        )
    planes = unpack(plan, img)
    hrows = hfilter(plan, planes)
    vout = vfilter(plan, hrows)
    return pack(plan, vout)


def scale_rows(
    plan: ScalePlan, img: np.ndarray, first_out_row: int, n_out_rows: int
) -> np.ndarray:
    """Row-batch API analogue (smol_scale_batch_full, smolscale.c:998-1008).

    Output rows are independent units (the reference's thread-parallel
    contract, smolscale.h:70-74), so computing a slice equals slicing the
    full computation.
    """
    return scale(plan, img)[first_out_row : first_out_row + n_out_rows]
