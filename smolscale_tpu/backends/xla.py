"""JAX/XLA backend: the TPU compute path, bit-exact to the reference.

Pipeline (one fused jitted program per :class:`ScalePlan`):

    u8 bytes -> unpack (channel permute + alpha/gamma conversion)
             -> horizontal filter -> vertical filter -> pack -> u8 bytes

Data layout is per-channel planes shaped (..., 4, H, W) -- stored uint8
between stages for 64bpp plans (values <= 255; 4x less HBM traffic) and
int32 for 128bpp; the lane (last) axis is the image width for the
horizontal pass and XLA fuses the elementwise chains.  All arithmetic uses
the proven 32-bit formulations in :mod:`smolscale_tpu.ops.fixedpoint`; all
plan arrays (gather indices, weights, LUTs) are closed over as compile-time
constants, the analogue of the reference's SmolScaleCtx precalc
(smolscale.c:816-870).  On TPU, plans the fused Pallas kernels cover are
dispatched there (scale_fn); this module is the always-correct fallback and
the CPU-testable reference for them.

Leading batch dimensions are supported everywhere (ops use negative axes),
so ``scale`` accepts (H, W, C) or (B, H, W, C).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import luts
from ..formats import AlphaType, GammaType, StorageType
from ..ops import fixedpoint as fp
from ..plan import FilterType, ScalePlan

# numpy int32 at module load; converted lazily inside traces so importing
# this module never initializes a JAX backend.
_LUT = {
    "from_srgb": np.asarray(luts.FROM_SRGB, dtype=np.int32),
    "to_srgb": np.asarray(luts.TO_SRGB, dtype=np.int32),
    "inv_p8": np.asarray(luts.INV_DIV_P8, dtype=np.int32),
    "inv_p8l": np.asarray(luts.INV_DIV_P8L, dtype=np.int32),
    "inv_p16": np.asarray(luts.INV_DIV_P16, dtype=np.int32),
    "inv_p16l": np.asarray(luts.INV_DIV_P16L, dtype=np.int32),
}


def _take(lut, idx):
    """Table lookup: XLA gather off-TPU; on TPU a two-level select.

    TPU gathers lower to near-scalar code; instead factor the table as
    (n_hi, n_lo) and contract two small one-hots on the VPU:
        lut[i] = sum_h [i>>k == h] * (sum_l [i&m == l] * T[h, l])
    Exact: one-hot products and 16/32-wide sums of a single nonzero term
    are exact in f32, and every table value < 2**22 is f32-representable.
    Measured ~30x faster than gather for the sRGB unpack path.
    """
    if not _use_mxu():
        return jnp.take(jnp.asarray(lut), idx, axis=0)
    n = len(lut)
    n_lo = 16 if n <= 256 else 32
    shift = n_lo.bit_length() - 1
    n_hi = n // n_lo
    t2d = jnp.asarray(np.asarray(lut).reshape(n_hi, n_lo).astype(np.float32))
    hi = idx >> shift
    lo = idx & (n_lo - 1)
    oh_hi = (hi[..., None] == jnp.arange(n_hi, dtype=idx.dtype)).astype(jnp.float32)
    # HIGHEST precision: TPU would otherwise run this tiny contraction in
    # bf16, which cannot represent table values >= 2**8 exactly.
    rows = jnp.einsum(
        "...h,hl->...l", oh_hi, t2d, precision=jax.lax.Precision.HIGHEST
    )
    oh_lo = lo[..., None] == jnp.arange(n_lo, dtype=idx.dtype)
    return jnp.sum(jnp.where(oh_lo, rows, 0.0), axis=-1).astype(jnp.int32)


# -- fixed-point alpha/gamma primitives (jnp mirrors of numpy_ref) -----------

def _premul_p8(v, a):
    return (((v + 1) * (a + 1) - 1) >> 8) & 0xFF


def _unpremul_p8(v, a):
    return fp.mul_shift_small(v, _take(_LUT["inv_p8"], a), luts.INVERTED_DIV_SHIFT_P8) & 0xFF


def _premul_p8l(l, a):
    return (((l + 1) * ((a << 3) + 1) - 1) >> 11) & 0x7FF


def _unpremul_p8l(v, a):
    return fp.mul_shift_small(v, _take(_LUT["inv_p8l"], a), luts.INVERTED_DIV_SHIFT_P8L) & 0x7FF


def _unpremul_p16(v, a):
    return fp.mul_shift_u32(v, _take(_LUT["inv_p16"], a), luts.INVERTED_DIV_SHIFT_P16) & 0xFF


def _unpremul_p16l(v, a):
    return fp.mul_shift_p16l(v, _take(_LUT["inv_p16l"], a)) & 0x7FF


# -- unpack / pack ------------------------------------------------------------

def _extract_channels(plan: ScalePlan, img):
    """Split (..., H, W, nb) u8 into 4 int32 channel planes (..., H, W).

    4-byte formats avoid a strided minor-axis slice (slow layout change on
    TPU) by bitcasting each pixel to one u32 and shift-masking: TPU/XLA
    bitcast of a trailing (4,) u8 axis is little-endian, so byte k is bits
    [8k, 8k+8) -- asserted in tests/test_xla_backend.py.
    """
    meta = plan.meta_in
    chans = [None] * 4
    if img.dtype == jnp.uint32:
        # already-packed pixels (one u32 per pixel): no bitcast needed
        px = img
        for byte_pos, ch in enumerate(meta.layout):
            chans[ch] = ((px >> (8 * byte_pos)) & jnp.uint32(0xFF)).astype(jnp.int32)
    elif meta.n_bytes == 4:
        px = jax.lax.bitcast_convert_type(img, jnp.uint32)
        for byte_pos, ch in enumerate(meta.layout):
            chans[ch] = ((px >> (8 * byte_pos)) & jnp.uint32(0xFF)).astype(jnp.int32)
    else:
        x = img.astype(jnp.int32)
        for byte_pos, ch in enumerate(meta.layout):
            chans[ch] = x[..., byte_pos]
    return chans


def _unpack(plan: ScalePlan, img):
    """(..., H, W, nb) u8 -> (..., 4, H, W) int32 (see numpy_ref.unpack)."""
    meta = plan.meta_in
    chans = _extract_channels(plan, img)
    if meta.has_alpha:
        a = chans[3]
    else:
        a = jnp.full(img.shape[:-1], 255, dtype=jnp.int32)
    color = chans[:3]
    ia, g = plan.internal_alpha, plan.gamma
    in_premul = meta.alpha == AlphaType.PREMUL8

    if ia == AlphaType.PREMUL8 and g == GammaType.SRGB_COMPRESSED:
        out_c = color if in_premul else [_premul_p8(c, a) for c in color]
        out_a = a
    elif ia == AlphaType.PREMUL8 and g == GammaType.SRGB_LINEAR:
        if in_premul:
            out_c = [
                _premul_p8l(_take(_LUT["from_srgb"], _unpremul_p8(c, a)), a)
                for c in color
            ]
        else:
            out_c = [_premul_p8l(_take(_LUT["from_srgb"], c), a) for c in color]
        out_a = a
    elif ia == AlphaType.PREMUL16 and g == GammaType.SRGB_COMPRESSED:
        out_c = [c * a for c in color]
        out_a = (a << 8) | 0x80
    else:
        out_c = [_take(_LUT["from_srgb"], c) * a for c in color]
        out_a = (a << 8) | 0x80
    planes = jnp.stack(out_c + [out_a], axis=-3)
    # 64bpp lane values are <= 255: store inter-stage planes as uint8 so the
    # (HBM-bound) filter pipeline moves 4x less data; arithmetic casts back
    # to 32-bit inside each op.
    if plan.storage == StorageType.S64:
        planes = planes.astype(jnp.uint8)
    return planes


def _pack(plan: ScalePlan, planes):
    """(..., 4, h, w) int planes -> (..., h, w, nb) u8 (see numpy_ref.pack)."""
    planes = planes.astype(jnp.int32)
    meta = plan.meta_out
    ia, g = plan.internal_alpha, plan.gamma
    out_premul = meta.alpha == AlphaType.PREMUL8
    color = [planes[..., i, :, :] for i in range(3)]
    alpha_plane = planes[..., 3, :, :]

    if ia == AlphaType.PREMUL8:
        a = alpha_plane & 0xFF
        if g == GammaType.SRGB_COMPRESSED:
            out_c = color if out_premul else [_unpremul_p8(c, a) for c in color]
        else:
            if out_premul:
                if meta.n_bytes == 3:
                    if plan.pack24_linear_direct:
                        out_c = [_take(_LUT["to_srgb"], c & 0x7FF) for c in color]
                    else:
                        out_c = [
                            _take(_LUT["to_srgb"], _unpremul_p8l(c, a)) for c in color
                        ]
                else:
                    out_c = [
                        _premul_p8(_take(_LUT["to_srgb"], _unpremul_p8l(c, a)), a)
                        for c in color
                    ]
            else:
                out_c = [_take(_LUT["to_srgb"], _unpremul_p8l(c, a)) for c in color]
    else:
        a = (alpha_plane >> 8) & 0xFF
        if g == GammaType.SRGB_COMPRESSED:
            out_c = [_unpremul_p16(c, a) for c in color]
        else:
            out_c = [_take(_LUT["to_srgb"], _unpremul_p16l(c, a)) for c in color]

    chans = out_c + [a]
    if meta.n_bytes == 4:
        # Assemble each pixel as one u32 (little-endian byte order) and
        # bitcast back to 4 bytes -- avoids a minor-axis interleave.
        px = jnp.zeros(chans[0].shape, dtype=jnp.uint32)
        for byte_pos, ch in enumerate(meta.layout):
            px = px | ((chans[ch] & 0xFF).astype(jnp.uint32) << (8 * byte_pos))
        return jax.lax.bitcast_convert_type(px, jnp.uint8)
    ordered = [chans[ch] & 0xFF for ch in meta.layout]
    return jnp.stack(ordered, axis=-1).astype(jnp.uint8)


# -- box walk index arrays (plan-time, numpy) ---------------------------------

def _box_h_arrays(ax):
    """Convert the C pointer walk (interp_horizontal_boxes, generic.c:1443-1478)
    into static gather/segment arrays: per output j,
      out_j = (in[left_idx]*left_w >> 8) + segsum(mid) + (in[right_idx]*F >> 8)
    with F forced to 0 on the final output when the reference skips the read.
    """
    n_out = ax.dim_out
    strides = ax.strides
    fracs = ax.factors
    left_idx = np.zeros(n_out, dtype=np.int32)
    left_w = np.zeros(n_out, dtype=np.int32)
    right_idx = np.zeros(n_out, dtype=np.int32)
    mid_start = np.zeros(n_out, dtype=np.int32)
    pos = 1
    left_idx[0], left_w[0] = 0, 256
    for j in range(n_out):
        mid_start[j] = pos
        pos += int(strides[j])
        if j < n_out - 1:
            right_idx[j] = pos
            pos += 1
            left_idx[j + 1] = right_idx[j]
            left_w[j + 1] = 255 - int(fracs[j])
        else:
            # Final box: the fractional pixel is only read when F > 0
            # (generic.c:1472-1475); clamp the index, F=0 zeroes the term.
            right_idx[j] = min(pos, ax.dim_in - 1)
    return dict(
        left_idx=left_idx,
        left_w=left_w,
        right_idx=right_idx,
        mid_start=mid_start,
        mid_len=strides.astype(np.int32),
        fracs=fracs.astype(np.int32),
    )


def _box_v_arrays(ax):
    """Vertical box edge arrays (scale_outrow_box_*, generic.c:2112-2260)."""
    n_out = ax.dim_out
    ofs = ax.offsets
    fracs = ax.factors
    first_idx = ofs[:n_out].astype(np.int32)
    last_idx = np.minimum(ofs[1 : n_out + 1], ax.dim_in - 1).astype(np.int32)
    w1 = np.concatenate([[256], 255 - fracs[:-1]]).astype(np.int32)
    w2 = fracs.astype(np.int32)
    mid_start = (ofs[:n_out] + 1).astype(np.int32)
    mid_len = np.maximum(ofs[1 : n_out + 1] - ofs[:n_out] - 1, 0).astype(np.int32)
    return dict(
        first_idx=first_idx, last_idx=last_idx, w1=w1, w2=w2,
        mid_start=mid_start, mid_len=mid_len,
    )


# -- MXU-backed exact gathers / segment sums ----------------------------------
#
# TPU dislikes real gathers; any 0/1 matrix applied to integer planes is an
# *exact* computation on the MXU: values <= 255 are exact in bfloat16 and
# span sums <= 2**24 are exact in f32.  Wider (128bpp) values are split into
# 8-bit limbs, three exact matmuls, recombined in int32 (per-limb sums stay
# <= 255 * 8191 < 2**21; the 8191:1 sRGB cutoff bounds span lengths).
# This replaces the reference's AVX2 hand-gathers (avx2.c:1424-1448) with
# the unit the hardware actually likes.

_FORCE_MXU = None  # None = auto (TPU only); tests set True/False


def _use_mxu() -> bool:
    if _FORCE_MXU is not None:
        return _FORCE_MXU
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def _apply_01_matrix(planes, mat_bf16, axis, wide):
    """Exact planes @ M along ``axis`` for a 0/1 matrix M (numpy bf16)."""
    m = jnp.asarray(mat_bf16)

    def mm(x_i32):
        xb = x_i32.astype(jnp.bfloat16)
        if axis == -1:
            y = jax.lax.dot_general(
                xb, m, (((xb.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:  # axis == -2: contract the row axis, keep minor axis minor
            y = jnp.einsum(
                "...hw,hk->...kw", xb, m, preferred_element_type=jnp.float32
            )
        return y.astype(jnp.int32)

    if not wide:
        return mm(planes)
    lo = mm(planes & 0xFF)
    mid = mm((planes >> 8) & 0xFF)
    hi = mm(planes >> 16)
    return (
        lo.astype(jnp.uint32)
        + (mid.astype(jnp.uint32) << 8)
        + (hi.astype(jnp.uint32) << 16)
    ).astype(jnp.int32)


def _onehot_cols(idx, depth):
    m = np.zeros((depth, len(idx)), dtype=np.float32)
    m[np.asarray(idx), np.arange(len(idx))] = 1.0
    return m.astype(jnp.bfloat16)


def _segment_cols(starts, lengths, depth):
    m = np.zeros((depth, len(starts)), dtype=np.float32)
    for j, (s, l) in enumerate(zip(np.asarray(starts), np.asarray(lengths))):
        m[s : s + l, j] = 1.0
    return m.astype(jnp.bfloat16)


# -- filters ------------------------------------------------------------------

def _bilinear_axis(planes, ax, mask, axis):
    off = jnp.asarray(ax.offsets, dtype=jnp.int32)
    f = jnp.asarray(ax.factors, dtype=jnp.int32)
    if _use_mxu():
        wide = mask != 0xFF
        both = np.concatenate(
            [
                _onehot_cols(ax.offsets, ax.dim_in),
                _onehot_cols(ax.offsets + 1, ax.dim_in),
            ],
            axis=1,
        )
        pq = _apply_01_matrix(planes, both, axis, wide)
        n_b = ax.dim_bilin
        if axis == -1:
            p, q = pq[..., :n_b], pq[..., n_b:]
        else:
            p, q = pq[..., :n_b, :], pq[..., n_b:, :]
    else:
        p = jnp.take(planes, off, axis=axis)
        q = jnp.take(planes, off + 1, axis=axis)
    fshape = [1] * planes.ndim
    fshape[axis] = ax.dim_bilin
    samples = fp.lerp256(p, q, f.reshape(fshape), mask)
    n = ax.halvings
    if n == 0:
        return samples
    shape = list(samples.shape)
    shape[axis] = ax.dim_out
    shape.insert(axis + 1 if axis >= 0 else planes.ndim + axis + 1, 1 << n)
    s = samples.reshape(shape)
    red_axis = axis + 1 if axis >= 0 else planes.ndim + axis + 1
    return (jnp.sum(s, axis=red_axis) >> n) & mask


def _box_uniform_applicable(ax) -> bool:
    """True for integer-ratio box plans: every span has the same whole-pixel
    stride (except the final span, one short due to the dim_in-1 clamp at
    precalc_boxes_array generic.c:105-110) and all edge fractions are 0."""
    s = ax.strides
    if ax.dim_out < 2 or (ax.factors != 0).any():
        return False
    if (s[:-1] != s[0]).any() or s[-1] not in (s[0], s[0] - 1):
        return False
    # exact tiling: dim_in == dim_out * (stride+1), true for integer ratios
    return ax.dim_out * (int(s[0]) + 1) == ax.dim_in


def _box_uniform(planes, ax, mask, storage, axis):
    """Integer-ratio box filter as a pure reshape-reduce (no gathers).

    Equivalent to the general walk when all fracs are 0: output j is
      (v[left_j] * w)>>8 + sum(v[left_j+1 : left_j+R])        R = stride+1
    with w = 256 for j=0 (weight_pixel identity) and 255 otherwise (the
    carry (r*255 - r*0)>>8 of generic.c:1462 == weight256(r, 255)); the
    right-edge q is 0.  The reference drops the final input element of the
    axis when the last span is clamped short (generic.c:105-110); we
    replicate by subtracting the over-included element from the last group.
    """
    # Grouping from index 0 makes every span self-contained: group j =
    # v[j*r : (j+1)*r] where g[j,0] is span j's left/carry pixel (the
    # previous span's fractional boundary) and g[j,1:r] its whole pixels.
    # No padding, one layout-friendly minor-dim split.
    assert axis in (-1, -2)
    r = int(ax.strides[0]) + 1
    n_out = ax.dim_out
    last_short = int(ax.strides[-1]) == r - 2

    if axis == -1:
        g = planes.reshape(planes.shape[:-1] + (n_out, r))
        mids = jnp.sum(g[..., 1:].astype(jnp.int32), axis=-1)
        if last_short:
            # reference drops the final input element (precalc clamp,
            # generic.c:105-110)
            mids = mids.at[..., -1].add(-g[..., -1, r - 1].astype(jnp.int32))
        first = g[..., 0]
        w = jnp.full((n_out,), 255, dtype=jnp.int32).at[0].set(256)
        left = fp.weight256(first, w, mask)
    else:
        w_minor = planes.shape[-1]
        g = planes.reshape(planes.shape[:-2] + (n_out, r, w_minor))
        mids = jnp.sum(g[..., 1:, :].astype(jnp.int32), axis=-2)
        if last_short:
            mids = mids.at[..., -1, :].add(-g[..., -1, r - 1, :].astype(jnp.int32))
        first = g[..., 0, :]
        w = jnp.full((n_out, 1), 255, dtype=jnp.int32).at[0].set(256)
        left = fp.weight256(first, w, mask)

    acc = left + mids
    out_mask = 0xFF if storage == StorageType.S64 else 0xFFFF
    return fp.mul_shift_round24(acc, jnp.int32(ax.span_mul)) & out_mask


def _box_h(planes, ax, mask, storage):
    if _box_uniform_applicable(ax):
        return _box_uniform(planes, ax, mask, storage, axis=-1)
    arrs = _box_h_arrays(ax)
    n_out = ax.dim_out
    lw = jnp.asarray(arrs["left_w"]).reshape((1,) * (planes.ndim - 1) + (-1,))
    rf = jnp.asarray(arrs["fracs"]).reshape((1,) * (planes.ndim - 1) + (-1,))
    if _use_mxu():
        combined = np.concatenate(
            [
                _segment_cols(arrs["mid_start"], arrs["mid_len"], ax.dim_in),
                _onehot_cols(arrs["left_idx"], ax.dim_in),
                _onehot_cols(arrs["right_idx"], ax.dim_in),
            ],
            axis=1,
        )
        y = _apply_01_matrix(planes, combined, -1, mask != 0xFF)
        mids = y[..., :n_out]
        left_v = y[..., n_out : 2 * n_out]
        right_v = y[..., 2 * n_out :]
    else:
        left_v = jnp.take(planes, jnp.asarray(arrs["left_idx"]), axis=-1)
        right_v = jnp.take(planes, jnp.asarray(arrs["right_idx"]), axis=-1)
        mids = fp.segsum_cumsum(
            planes, jnp.asarray(arrs["mid_start"]), jnp.asarray(arrs["mid_len"]),
            axis=-1,
        )
    acc = fp.weight256(left_v, lw, mask) + mids + fp.weight256(right_v, rf, mask)
    out_mask = 0xFF if storage == StorageType.S64 else 0xFFFF
    return fp.mul_shift_round24(acc, jnp.int32(ax.span_mul)) & out_mask


def _box_v(planes, ax, mask, storage):
    if _box_uniform_applicable(ax):
        return _box_uniform(planes, ax, mask, storage, axis=-2)
    arrs = _box_v_arrays(ax)
    n_out = ax.dim_out
    bshape = (1,) * (planes.ndim - 2) + (-1, 1)
    if _use_mxu():
        combined = np.concatenate(
            [
                _segment_cols(arrs["mid_start"], arrs["mid_len"], ax.dim_in),
                _onehot_cols(arrs["first_idx"], ax.dim_in),
                _onehot_cols(arrs["last_idx"], ax.dim_in),
            ],
            axis=1,
        )
        y = _apply_01_matrix(planes, combined, -2, mask != 0xFF)
        mids = y[..., :n_out, :]
        first_rows = y[..., n_out : 2 * n_out, :]
        last_rows = y[..., 2 * n_out :, :]
    else:
        first_rows = jnp.take(planes, jnp.asarray(arrs["first_idx"]), axis=-2)
        last_rows = jnp.take(planes, jnp.asarray(arrs["last_idx"]), axis=-2)
        mids = fp.segsum_cumsum(
            planes, jnp.asarray(arrs["mid_start"]), jnp.asarray(arrs["mid_len"]),
            axis=-2,
        )
    first = fp.weight256(first_rows, jnp.asarray(arrs["w1"]).reshape(bshape), mask)
    w2 = jnp.asarray(arrs["w2"]).reshape(bshape)
    if storage == StorageType.S64:
        # q = (r * w2) >> 8 even when w2 == 0 (generic.c:2042-2068).
        last = fp.weight256(last_rows, w2, mask)
    else:
        # 128bpp weights the last row by w2-1 and skips it when w2 == 0
        # (generic.c:2240-2253).
        last = jnp.where(w2 > 0, fp.weight256(last_rows, jnp.maximum(w2 - 1, 0), mask), 0)
    acc = first + mids + last
    out_mask = 0xFF if storage == StorageType.S64 else 0xFFFF
    return fp.mul_shift_round24(acc, jnp.int32(ax.span_mul)) & out_mask


def _store_dtype(plan: ScalePlan, x):
    """Inter-stage storage: uint8 for 64bpp lanes (values <= 255)."""
    if plan.storage == StorageType.S64 and x.dtype != jnp.uint8:
        return x.astype(jnp.uint8)
    return x


def _hfilter(plan: ScalePlan, planes):
    ax = plan.x
    mask = plan.working_mask
    if ax.filter == FilterType.COPY:
        return planes
    if ax.filter == FilterType.ONE:
        reps = [1] * planes.ndim
        reps[-1] = ax.dim_out
        return jnp.tile(planes[..., :1], reps)
    if ax.filter.is_bilinear:
        return _store_dtype(plan, _bilinear_axis(planes, ax, mask, axis=-1))
    return _store_dtype(plan, _box_h(planes, ax, mask, plan.storage))


def _vfilter(plan: ScalePlan, planes):
    ay = plan.y
    mask = plan.working_mask
    if ay.filter == FilterType.COPY:
        return planes
    if ay.filter == FilterType.ONE:
        reps = [1] * planes.ndim
        reps[-2] = ay.dim_out
        return jnp.tile(planes[..., :1, :], reps)
    if ay.filter.is_bilinear:
        return _store_dtype(plan, _bilinear_axis(planes, ay, mask, axis=-2))
    return _store_dtype(plan, _box_v(planes, ay, mask, plan.storage))


# -- windowed row ranges (smol_scale_batch analogue / row sharding) -----------
#
# The reference's parallel contract (smolscale.h:70-74; smol-mt harness
# test.c:839-883): output-row ranges are independent work units; each worker
# re-scales the input rows its range depends on rather than communicating.
# Here a "shard" computes output rows [shard_id*n_rows, +n_rows) from a
# statically-sized input-row window selected by dynamic slice; all per-shard
# filter tables are stacked into (n_shards, ...) constants indexed by the
# traced shard id, so one compiled program serves every shard.

class RowShardTables:
    """Static per-shard tables for windowed vertical filtering.

    By default shard s covers output rows [s*ceil(h_out/n_shards), ...);
    pass ``row_ranges`` (list of (first, count) with equal counts) for
    explicit ranges, e.g. a single arbitrary range for scale_rows.
    """

    def __init__(self, plan: ScalePlan, n_shards: int, row_ranges=None):
        ay = plan.y
        self.plan = plan
        self.n_shards = n_shards
        if row_ranges is None:
            self.n_rows = -(-plan.height_out // n_shards)  # ceil
            row_ranges = [
                (min(s * self.n_rows, plan.height_out - 1), self.n_rows)
                for s in range(n_shards)
            ]
        else:
            assert len(row_ranges) == n_shards
            counts = {c for _, c in row_ranges}
            assert len(counts) == 1, "all ranges must have equal counts"
            self.n_rows = row_ranges[0][1]
        self.row_ranges = row_ranges
        n = self.n_rows

        def v_window(first, count):
            """Input row range [start, stop) for output rows [first, first+count)."""
            last = min(first + count, plan.height_out)
            if ay.filter == FilterType.COPY:
                return first, last
            if ay.filter == FilterType.ONE:
                return 0, 1
            if ay.filter.is_bilinear:
                k = ay.halvings
                b0, b1 = first << k, last << k
                return int(ay.offsets[b0]), int(ay.offsets[b1 - 1]) + 2
            return int(ay.offsets[first]), min(int(ay.offsets[last]) + 1, ay.dim_in)

        starts, stops = [], []
        for s in range(n_shards):
            first = row_ranges[s][0]
            a, b = v_window(first, n)
            starts.append(a)
            stops.append(b)
        self.window_h = max(b - a for a, b in zip(starts, stops))
        # Clamp window starts downward so slices stay in bounds without
        # padding the (potentially huge) input: relative indices below are
        # computed against the clamped start, so results are unchanged.
        if self.window_h <= plan.height_in:
            lim = plan.height_in - self.window_h
            starts = [min(a, lim) for a in starts]
        self.in_start = np.asarray(starts, dtype=np.int32)
        # padded input height so every dynamic slice is in bounds
        self.pad_h = max(plan.height_in, max(starts) + self.window_h)

        def clamp_row(j):
            return min(j, plan.height_out - 1)

        if ay.filter.is_bilinear:
            k = ay.halvings
            off = np.zeros((n_shards, n << k), dtype=np.int32)
            fac = np.zeros((n_shards, n << k), dtype=np.int32)
            for s in range(n_shards):
                for j in range(n << k):
                    b = min((row_ranges[s][0] << k) + j, (plan.height_out << k) - 1)
                    off[s, j] = int(ay.offsets[b]) - starts[s]
                    fac[s, j] = int(ay.factors[b])
            self.off, self.fac = off, fac
        elif ay.filter == FilterType.BOX:
            fi = np.zeros((n_shards, n), dtype=np.int32)
            li = np.zeros((n_shards, n), dtype=np.int32)
            w1 = np.zeros((n_shards, n), dtype=np.int32)
            w2 = np.zeros((n_shards, n), dtype=np.int32)
            ms = np.zeros((n_shards, n), dtype=np.int32)
            ml = np.zeros((n_shards, n), dtype=np.int32)
            for s in range(n_shards):
                for j in range(n):
                    i = clamp_row(row_ranges[s][0] + j)
                    y0, y1 = int(ay.offsets[i]), int(ay.offsets[i + 1])
                    fi[s, j] = y0 - starts[s]
                    li[s, j] = min(y1, ay.dim_in - 1) - starts[s]
                    w1[s, j] = 256 if i == 0 else 255 - int(ay.factors[i - 1])
                    w2[s, j] = int(ay.factors[i])
                    ms[s, j] = y0 + 1 - starts[s]
                    ml[s, j] = max(y1 - y0 - 1, 0)
            self.first_idx, self.last_idx = fi, li
            self.w1, self.w2, self.mid_start, self.mid_len = w1, w2, ms, ml
        elif ay.filter == FilterType.COPY:
            rows = np.zeros((n_shards, n), dtype=np.int32)
            for s in range(n_shards):
                for j in range(n):
                    rows[s, j] = clamp_row(row_ranges[s][0] + j) - starts[s]
            self.rows = rows


def _vfilter_tbl(plan: ScalePlan, n_rows: int, tbl: dict, planes):
    """Vertical filter over a window from traced per-row tables.

    ``tbl`` holds (n_rows,)-shaped traced arrays whose names depend on the
    filter (off/fac for bilinear, first_idx/last_idx/w1/w2/mid_start/mid_len
    for box, rows for copy); shared by the per-shard and traced-row-range
    paths.
    """
    ay = plan.y
    mask = plan.working_mask
    if ay.filter == FilterType.ONE:
        reps = [1] * planes.ndim
        reps[-2] = n_rows
        return jnp.tile(planes[..., :1, :], reps)
    if ay.filter == FilterType.COPY:
        return jnp.take(planes, tbl["rows"], axis=-2)
    if ay.filter.is_bilinear:
        off, fac = tbl["off"], tbl["fac"]
        p = jnp.take(planes, off, axis=-2)
        q = jnp.take(planes, off + 1, axis=-2)
        samples = fp.lerp256(p, q, fac[:, None], mask)
        k = ay.halvings
        if k == 0:
            return samples
        shape = list(samples.shape)
        shape[-2:] = [n_rows, 1 << k, samples.shape[-1]]
        return (jnp.sum(samples.reshape(shape), axis=-2) >> k) & mask
    # BOX
    first = fp.weight256(
        jnp.take(planes, tbl["first_idx"], axis=-2), tbl["w1"][:, None], mask
    )
    last_rows = jnp.take(planes, tbl["last_idx"], axis=-2)
    w2 = tbl["w2"][:, None]
    if plan.storage == StorageType.S64:
        last = fp.weight256(last_rows, w2, mask)
    else:
        last = jnp.where(w2 > 0, fp.weight256(last_rows, jnp.maximum(w2 - 1, 0), mask), 0)
    mids = fp.segsum_cumsum(planes, tbl["mid_start"], tbl["mid_len"], axis=-2)
    acc = first + mids + last
    out_mask = 0xFF if plan.storage == StorageType.S64 else 0xFFFF
    return fp.mul_shift_round24(acc, jnp.int32(plan.y.span_mul)) & out_mask


def _vfilter_windowed(plan: ScalePlan, tables: RowShardTables, planes, shard_id):
    """Vertical filter over a window, using per-shard traced tables."""
    ay = plan.y
    t = tables
    tbl = {}
    if ay.filter == FilterType.COPY:
        tbl["rows"] = jnp.take(jnp.asarray(t.rows), shard_id, axis=0)
    elif ay.filter.is_bilinear:
        tbl["off"] = jnp.take(jnp.asarray(t.off), shard_id, axis=0)
        tbl["fac"] = jnp.take(jnp.asarray(t.fac), shard_id, axis=0)
    elif ay.filter == FilterType.BOX:
        for k, arr in [
            ("first_idx", t.first_idx), ("last_idx", t.last_idx),
            ("w1", t.w1), ("w2", t.w2),
            ("mid_start", t.mid_start), ("mid_len", t.mid_len),
        ]:
            tbl[k] = jnp.take(jnp.asarray(arr), shard_id, axis=0)
    return _vfilter_tbl(plan, tables.n_rows, tbl, planes)


class RowRangeTables:
    """Full per-output-row vertical tables for a traced-first row range.

    One compiled program per (plan, n): any output-row range
    [first, first+n) is served by dynamic gathers into these full arrays,
    so streaming N chunks costs one compile instead of N (the reference's
    smol_scale_batch contract, smolscale.h:74-82, where the ctx is built
    once and any row subrange is a cheap call).
    """

    def __init__(self, plan: ScalePlan, n: int):
        ay = plan.y
        self.plan, self.n = plan, n
        h_out, h_in = plan.height_out, plan.height_in
        assert 1 <= n <= h_out
        nf = h_out - n + 1  # valid first values
        f = np.arange(nf, dtype=np.int64)
        if ay.filter == FilterType.ONE:
            self.window_h = 1
            starts = np.zeros(nf, np.int64)
        elif ay.filter == FilterType.COPY:
            self.window_h = n
            starts = f.copy()
        elif ay.filter.is_bilinear:
            k = ay.halvings
            off = np.asarray(ay.offsets, np.int64)
            self.off_full = off.astype(np.int32)
            self.fac_full = np.asarray(ay.factors, np.int32)
            starts = off[f << k]
            stops = off[((f + n) << k) - 1] + 2
            self.window_h = int((stops - starts).max())
        else:  # BOX
            off = np.asarray(ay.offsets, np.int64)
            y0 = off[:h_out]
            y1 = off[1 : h_out + 1]
            fac = np.asarray(ay.factors, np.int64)[:h_out]
            self.y0_full = y0.astype(np.int32)
            self.li_full = np.minimum(y1, ay.dim_in - 1).astype(np.int32)
            self.w1_full = np.concatenate(
                [[256], 255 - fac[: h_out - 1]]
            ).astype(np.int32)
            self.w2_full = fac.astype(np.int32)
            self.ms_full = (y0 + 1).astype(np.int32)
            self.ml_full = np.maximum(y1 - y0 - 1, 0).astype(np.int32)
            starts = y0[f]
            last = np.minimum(f + n, h_out)
            stops = np.minimum(off[last] + 1, ay.dim_in)
            self.window_h = int((stops - starts).max())
        if self.window_h <= h_in:
            starts = np.minimum(starts, h_in - self.window_h)
        self.starts = starts.astype(np.int32)
        self.pad_h = max(h_in, int(starts.max()) + self.window_h)

    def traced(self, first):
        """(start, tbl): traced window start + per-row tables for ``first``."""
        ay = self.plan.y
        n, h_out = self.n, self.plan.height_out
        start = jnp.take(jnp.asarray(self.starts), first)
        tbl = {}
        if ay.filter == FilterType.COPY:
            idx = jnp.minimum(first + jnp.arange(n), h_out - 1)
            tbl["rows"] = idx - start
        elif ay.filter.is_bilinear:
            k = ay.halvings
            bidx = jnp.minimum(
                (first << k) + jnp.arange(n << k), (h_out << k) - 1
            )
            tbl["off"] = jnp.take(jnp.asarray(self.off_full), bidx) - start
            tbl["fac"] = jnp.take(jnp.asarray(self.fac_full), bidx)
        elif ay.filter == FilterType.BOX:
            idx = jnp.minimum(first + jnp.arange(n), h_out - 1)
            tbl["first_idx"] = jnp.take(jnp.asarray(self.y0_full), idx) - start
            tbl["last_idx"] = jnp.take(jnp.asarray(self.li_full), idx) - start
            tbl["w1"] = jnp.take(jnp.asarray(self.w1_full), idx)
            tbl["w2"] = jnp.take(jnp.asarray(self.w2_full), idx)
            tbl["mid_start"] = jnp.take(jnp.asarray(self.ms_full), idx) - start
            tbl["mid_len"] = jnp.take(jnp.asarray(self.ml_full), idx)
        return start, tbl


def row_shard_fn(plan: ScalePlan, tables: RowShardTables, img_padded, shard_id):
    """Compute output rows [shard_id*n_rows, +n_rows) from a padded image.

    ``img_padded`` must have height tables.pad_h (pad with anything; padded
    rows only feed discarded or zero-weighted outputs).  Traceable in
    shard_id -- one program serves all shards.
    """
    start = jnp.take(jnp.asarray(tables.in_start), shard_id)
    window = jax.lax.dynamic_slice_in_dim(
        img_padded, start, tables.window_h, axis=img_padded.ndim - 3
    )
    planes = _unpack(plan, window)
    hrows = _hfilter(plan, planes)
    vout = _vfilter_windowed(plan, tables, hrows, shard_id)
    return _pack(plan, vout)


def row_range_fn(plan: ScalePlan, tables: RowRangeTables, img_padded, first):
    """Compute output rows [first, first+n) with a *traced* first row.

    ``img_padded`` must have height tables.pad_h.  One program per
    (plan, n); the row range moves without recompiling.
    """
    start, tbl = tables.traced(first)
    window = jax.lax.dynamic_slice_in_dim(
        img_padded, start, tables.window_h, axis=img_padded.ndim - 3
    )
    planes = _unpack(plan, window)
    hrows = _hfilter(plan, planes)
    vout = _vfilter_tbl(plan, tables.n, tbl, hrows)
    return _pack(plan, vout)


def pad_rows(plan: ScalePlan, tables, img):
    extra = tables.pad_h - plan.height_in
    if extra == 0:
        return img
    pad = [(0, 0)] * img.ndim
    pad[img.ndim - 3] = (0, extra)
    return jnp.pad(img, pad)


# -- entry points -------------------------------------------------------------

_FORCE_PALLAS = None  # None = auto (TPU + applicable), False = never
_RGB24_PLANES = True  # channel-major u8 planes feed for 24bpp inputs.
# Validated on v5e (benchmarks/probe_planes.py, all bit-exact through the
# full dispatch): wins every 24bpp class over the pad+bitcast u32 feed --
# 3a 32.6->64.8 Gpix/s, 3b 31.9->42.4, 16:1 box 34.3->65.5, 6b sRGB
# 11.9->17.4, ragged deep 29.8->57.8, uniform deep 83.1->211.9, sRGB
# ragged deep 18.8->39.6.  The moveaxis transpose costs ~2 HBM passes
# where pad-to-32bpp + u8->u32 bitcast costs ~3 plus 33% more window DMA
# and the synthesized alpha's filter work.

# 24bpp types mapped to byte-compatible 32bpp premultiplied surrogates
# (RGB8 bytes == first 3 bytes of RGBA; BGR8 == first 3 of BGRA).
_SURROGATE_4B = {8: 0, 9: 1}


def _adapt_24bpp(plan: ScalePlan):
    """Surrogate 4-byte plan for 24bpp endpoints, or None.

    Valid because the 24bpp unpack is exactly the 32bpp premul unpack with
    a constant 0xff alpha channel, and that channel is filtered like any
    other; dropping it at pack recovers the 24bpp output byte-for-byte.
    """
    ti, to = int(plan.pixel_type_in), int(plan.pixel_type_out)
    if plan.meta_in.n_bytes == 4 and plan.meta_out.n_bytes == 4:
        return None
    sti = _SURROGATE_4B.get(ti, ti)
    sto = _SURROGATE_4B.get(to, to)
    from ..formats import get_meta

    if get_meta(sti).n_bytes != 4 or get_meta(sto).n_bytes != 4:
        return None
    sp = ScalePlan(
        plan.width_in, plan.height_in, plan.width_out, plan.height_out,
        sti, sto, plan.with_srgb,
    )
    # surrogate must make identical planner decisions
    if (
        sp.storage != plan.storage
        or sp.internal_alpha != plan.internal_alpha
        or sp.gamma != plan.gamma
    ):
        return None
    return sp, plan.meta_in.n_bytes == 3, plan.meta_out.n_bytes == 3


def scale_fn(plan: ScalePlan, img, post_fn=None):
    """Traceable scale: (..., H, W, nb_in) u8 -> (..., h, w, nb_out) u8.

    Auto-dispatches to the fused Pallas kernel on TPU when the plan
    qualifies (ops.pallas_box.applicable); otherwise the XLA op graph.
    This is the analogue of the reference's runtime backend dispatch
    (get_implementations, smolscale.c:724-814).

    ``post_fn``, if given, must be a traceable function applied to the
    uint8 output inside the same compiled program -- the fused analogue of
    the reference's per-row user callback (SmolPostRowFunc,
    smolscale.h:37-39, installed by smol_scale_new_full): rows are the
    output's second-to-minor axis, and the callback composes with the
    scale without any host round-trip.
    """
    out = _scale_fn_impl(plan, img)
    return post_fn(out) if post_fn is not None else out


def _scale_fn_impl(plan: ScalePlan, img):
    from ..ops import (
        pallas_128, pallas_bilinear, pallas_box, pallas_deep, pallas_srgb,
    )

    packed = img.dtype == jnp.uint32  # (.., H, W) u32 pixel view, 4B formats
    use_pallas = _FORCE_PALLAS
    if use_pallas is None:
        try:
            on_tpu = jax.default_backend() == "tpu"
        except RuntimeError:  # pragma: no cover
            on_tpu = False
        use_pallas = on_tpu and img.ndim in ((2, 3) if packed else (3, 4))
    if use_pallas and pallas_box.applicable(plan):
        return pallas_box.scale_fn(plan, img)
    if use_pallas and pallas_bilinear.applicable(plan):
        return pallas_bilinear.scale_fn(plan, img)
    if use_pallas and pallas_srgb.applicable(plan):
        if (
            _RGB24_PLANES
            and plan.meta_in.n_bytes == 3
            and img.dtype != jnp.uint32
        ):
            return pallas_srgb.scale_fn_planes(plan, jnp.moveaxis(img, -1, -3))
        return pallas_srgb.scale_fn(plan, img)
    if use_pallas and pallas_128.applicable(plan):
        return pallas_128.scale_fn(plan, img)
    if use_pallas and pallas_deep.applicable(plan):
        if (
            _RGB24_PLANES
            and plan.meta_in.n_bytes == 3
            and img.dtype != jnp.uint32
        ):
            return pallas_deep.scale_fn_planes(plan, jnp.moveaxis(img, -1, -3))
        return pallas_deep.scale_fn(plan, img)
    if use_pallas:
        adapted = _adapt_24bpp(plan)
        if adapted is not None:
            sp, pad_in, slice_out = adapted
            kern = next(
                (
                    kk
                    for kk in (pallas_box, pallas_bilinear)
                    if kk.applicable(sp)
                ),
                None,
            )
            if kern is not None:
                if (
                    _RGB24_PLANES
                    and pad_in
                    and kern in (pallas_bilinear, pallas_box)
                    and img.dtype != jnp.uint32
                ):
                    # channel-major u8 planes feed: skips the on-device
                    # pad-to-32bpp + u32 bitcast relayout and the
                    # synthesized alpha channel's HBM/filter work
                    pls = jnp.moveaxis(img, -1, -3)
                    out = kern.scale_fn_planes(sp, pls, skip_alpha=slice_out)
                    return out[..., :3] if slice_out else out
                x = img
                if pad_in:
                    # alpha byte = 255: the reference unpacks 24bpp with
                    # alpha 0xff and filters it like any channel
                    # (unpack_pixel_123_*, generic.c:353-358), so the
                    # surrogate 32bpp run is bit-identical.
                    pad = [(0, 0)] * img.ndim
                    pad[-1] = (0, 1)
                    x = jnp.pad(img, pad, constant_values=255)
                out = kern.scale_fn(sp, x)
                return out[..., :3] if slice_out else out
    planes = _unpack(plan, img)
    hrows = _hfilter(plan, planes)
    vout = _vfilter(plan, hrows)
    return _pack(plan, vout)


@functools.cache
def _jitted(plan: ScalePlan, post_fn=None):
    return jax.jit(functools.partial(scale_fn, plan, post_fn=post_fn))


def scale(plan: ScalePlan, img, post_fn=None) -> np.ndarray:
    expect = (plan.height_in, plan.width_in, plan.meta_in.n_bytes)
    if tuple(np.shape(img)[-3:]) != expect:
        raise ValueError(
            f"input shape {np.shape(img)} does not match plan {expect}"
        )
    if (
        isinstance(img, np.ndarray)
        and plan.meta_in.n_bytes == 4
        and img.dtype == np.uint8
    ):
        # free host-side u32 pixel view: skips the on-device u8->u32 bitcast,
        # which is a full tiled-layout relayout copy on TPU
        img = np.ascontiguousarray(img).view(np.uint32)[..., 0]
    img = jnp.asarray(img)
    return np.asarray(_jitted(plan, post_fn)(img))


@functools.cache
def _jitted_rows(plan: ScalePlan, n: int, post_fn=None):
    # Windowed execution: only the input rows this range depends on are
    # unpacked and filtered (the smol_scale_batch recompute-at-edges
    # trade-off, smolscale.c:512-530).  The first row is traced, so
    # streaming a full image in n-row chunks compiles exactly once.
    tables = RowRangeTables(plan, n)

    def fn(img, first):
        padded = pad_rows(plan, tables, img)
        out = row_range_fn(plan, tables, padded, first)
        return post_fn(out) if post_fn is not None else out

    return jax.jit(fn)


def _pallas_rows_ok(plan: ScalePlan) -> bool:
    """True when the fused Pallas row-range kernel should serve scale_rows
    (TPU + 64bpp general-kernel plan; other classes keep the windowed
    op-graph path)."""
    from ..ops import pallas_bilinear

    use_pallas = _FORCE_PALLAS
    if use_pallas is None:
        try:
            use_pallas = jax.default_backend() == "tpu"
        except RuntimeError:  # pragma: no cover
            use_pallas = False
    return bool(use_pallas) and pallas_bilinear.applicable(plan)


@functools.cache
def _jitted_rows_fused(plan: ScalePlan, first: int, n: int, post_fn=None):
    # Unlike the op-graph path (_jitted_rows, which traces ``first`` and
    # compiles once per chunk height), the fused Pallas program bakes the
    # (first, n) range into its static gather tables, so EACH DISTINCT
    # range compiles its own program (~seconds cold) and stays cached
    # here.  A fixed-stride streaming sweep -- the intended use -- costs
    # height_out/n compiles on first contact and zero after; callers
    # generating many unaligned ad-hoc ranges should prefer a fixed chunk
    # grid (or the op-graph path via _FORCE_PALLAS=False) to keep compile
    # count and cache growth bounded.
    from ..ops import pallas_bilinear

    def fn(img):
        out = pallas_bilinear.scale_rows_fn(plan, img, first, n)
        return post_fn(out) if post_fn is not None else out

    return jax.jit(fn)


def scale_rows(plan: ScalePlan, img, first_out_row: int, n_out_rows: int,
               post_fn=None) -> np.ndarray:
    """post_fn, if given, is fused into the chunk's compiled program (the
    per-row-range streaming analogue of SmolPostRowFunc).

    Compile-cost note: on TPU, qualifying plans take the fused Pallas
    row-range kernel, which specializes on (first_out_row, n_out_rows) --
    one compile per distinct range, cached thereafter.  Stream with a
    fixed chunk grid for one compile per grid position total."""
    first, n = int(first_out_row), int(n_out_rows)
    if first < 0 or n < 1 or first + n > plan.height_out:
        raise ValueError(
            f"row range [{first}, {first + n}) outside [0, {plan.height_out})"
        )
    if _pallas_rows_ok(plan):
        x = img
        if (
            isinstance(x, np.ndarray)
            and plan.meta_in.n_bytes == 4
            and x.dtype == np.uint8
        ):
            # free host u32 pixel view (skips the on-device relayout copy)
            x = np.ascontiguousarray(x).view(np.uint32)[..., 0]
        return np.asarray(
            _jitted_rows_fused(plan, first, n, post_fn)(jnp.asarray(x))
        )
    img = jnp.asarray(img)
    return np.asarray(_jitted_rows(plan, n, post_fn)(img, jnp.int32(first)))
