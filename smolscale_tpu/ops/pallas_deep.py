"""Fused Pallas kernels for deep box downscales (integer and ragged spans).

The whole-window kernels (pallas_box and the shared tile geometry of
pallas_bilinear/srgb/128) need an output row's entire vertical span
resident in VMEM, which fails past roughly 64:1 on wide images; the
reference instead streams rows through a running accumulator
(scale_outrow_box_*, generic.c:2112-2260).  This kernel is that
accumulator as a Pallas grid: ``(batch, out_row, chunk)`` walks each
output row's span in C-row chunks (C an 8-aligned divisor of the row
ratio, so input blocks pipeline through plain BlockSpecs with automatic
double buffering), H-box-scales each chunk's rows with one 0/1 int8
span-sum matmul, accumulates the chunk's partial V sum into a VMEM
scratch that persists across the chunk axis, and on the span's final
chunk normalizes and emits int32 channel planes.  Packing -- including
the 128bpp deep-box storage rule and PREMUL16 unassociated output
(unpremul_p16, generic.c:290-299) -- reuses the shared XLA ``_pack`` on
output-sized data.

Covers the >255:1 deep-box class (128bpp storage, smolscale.c:437-446)
and the 64..255:1 64bpp band where pallas_box's whole-span row groups
exceed VMEM, for both gammas: sRGB-linear plans run the same prologue as
pallas_srgb (dynamic-gather linearization + premultiply) before the H
box.  Non-integer ratios take the ragged variants: the chunk-centric
kernel (_built_chunked) walks the image once with each chunk's rows
classified into the (at most two) spans it intersects, and the
span-centric kernel (_built_general, kept for spans shorter than a
chunk) walks each span in C-aligned pipelined chunks; both run the
edge-folded biased-limb H matmuls (raw packed-byte limbs for
compressed-gamma premultiplied inputs) and the reference's per-storage
V edge weights (w2 for 64bpp, w2-1 with a w2==0 skip for 128bpp,
generic.c:2112-2260).

Exactness: integer-ratio spans have all edge fractions 0, so the span
walk collapses to the uniform identities of backends/xla._box_uniform --
first pixel/row of every span weighted 255/256 ((v*255)>>8 ==
v - ((v+255)>>8), identity 256 on the global first), the final
element/row dropped when the last span is clamped short
(precalc_boxes_array generic.c:105-110) -- and V accumulation is int32
mod 2**32 (exactly the reference's 32-bit lanes), so chunking the sum
cannot change results.  Box normalization uses the proven uint32
mul_shift_round24.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats import AlphaType, GammaType, StorageType
from ..ops import fixedpoint as fp
from ..plan import FilterType, ScalePlan
from . import pallas_bilinear as pg  # _span_mm_i8, _round_up

_ABLATE = None  # timing-only knob: "nohmm" | "noclass" | "nounpack" |
# "novred" (skip the chunk-centric V weighted reduce) | "nofilter"
# (unpack+H+V all skipped: the DMA/store floor);
# "general" forces the row-centric kernel where chunk-centric would run


def _chunk_budget(plan: ScalePlan) -> int:
    """Per-chunk VMEM budget.  The linear-light prologue's dynamic-gather
    slices hold several (C, w_pad)-sized temporaries live at once; past
    ~0.5 MB chunks the Mosaic compiler runs out of scoped VMEM on wide
    images (crash-verified at 3542..7561 px wide), so wide linear plans
    take smaller, more numerous chunks.  Narrow (<= 2048 px) linear plans
    fit 1 MB chunks: twice the rows per grid step amortizes the gather
    broadcasts and doubles the stacked matmuls' M tile."""
    if plan.gamma == GammaType.SRGB_LINEAR:
        w_pad = pg._round_up(plan.width_in, 128)
        return 2**20 if w_pad <= 2048 else 2**19
    return 2 * 2**20


def _chunk_rows(plan: ScalePlan):
    """(C, k): chunk height and chunks per span, or None.

    C must divide the row ratio (so every chunk lies inside one span) and
    be 8-aligned (Mosaic input-block tiling); ~2 MB double-buffered blocks
    measured best for the streaming kernels.
    """
    r_y = int(plan.y.strides[0]) + 1
    w_pad = pg._round_up(plan.width_in, 128)
    cap = max(8, _chunk_budget(plan) // (w_pad * 4) // 8 * 8)
    if r_y % 8:
        return None
    best = 0
    for c in range(8, min(r_y, cap) + 1, 8):
        if r_y % c == 0:
            best = c
    if best == 0:
        return None
    return best, r_y // best


def _base_applicable(plan: ScalePlan) -> bool:
    return (
        plan.gamma in (GammaType.SRGB_COMPRESSED, GammaType.SRGB_LINEAR)
        and plan.internal_alpha in (AlphaType.PREMUL8, AlphaType.PREMUL16)
        and plan.meta_in.n_bytes in (3, 4)
        and plan.meta_out.n_bytes in (3, 4)
        and plan.x.filter == FilterType.BOX
        and plan.y.filter == FilterType.BOX
        and plan.width_out >= 2
        and plan.height_out >= 2
        # full-output VMEM block (dynamic row stores): keep it small
        and 4 * plan.height_out * pg._round_up(plan.width_out, 128) * 4
        <= 2 * 2**20
    )


def _uniform_deep(plan: ScalePlan) -> bool:
    from ..backends.xla import _box_uniform_applicable  # avoid cycle

    return (
        _box_uniform_applicable(plan.x)
        and _box_uniform_applicable(plan.y)
        and _chunk_rows(plan) is not None
    )


def applicable(plan: ScalePlan) -> bool:
    if not _base_applicable(plan):
        return False
    return _uniform_deep(plan) or _general_chunk(plan) is not None


def _general_chunk(plan: ScalePlan):
    """(C, k) for the ragged-span path: chunk height and the chunk count
    covering the tallest span from its C-aligned base (chunks need not
    divide spans -- rows outside [first, y1] are weight-0 by
    classification; C-aligned bases let the BlockSpec pipeline fetch
    chunks as plain blocks)."""
    from ..backends.xla import _box_v_arrays

    w_pad = pg._round_up(plan.width_in, 128)
    cap = min(512, max(8, _chunk_budget(plan) // (w_pad * 4) // 8 * 8))
    bv = _box_v_arrays(plan.y)
    ofs = np.asarray(plan.y.offsets, dtype=np.int64)

    # C-aligned bases waste up to C-1 rows per span; pick the C (multiple
    # of 8 up to the VMEM cap) minimizing fetched rows plus a per-step
    # overhead charge (~64 row-equivalents per grid step keeps tiny C from
    # exploding the step count), ties to the larger C
    best = None
    for C in range(8, cap + 1, 8):
        rbase = (bv["first_idx"] // C) * C
        span = ofs[1:] - rbase + 1  # last V read is raw ofs[i+1]
        k = int(-(-int(span.max()) // C))
        if k > 4096:
            continue
        key = (k * (C + 64), -C)
        if best is None or key < best[0]:
            best = (key, C, k)
    if best is None:
        return None
    return best[1], best[2]


def _unpack_plane(px, a_vals, inv_vals, ch_lane, in_layout, premul16,
                  in_premul, linear, tbl, planes=False):
    """One channel plane from packed u32 pixels, including the linear-light
    prologue when the plan is sRGB (mirrors pallas_srgb's kernel exactly:
    unpremultiply via the alpha-indexed inv-div factor, linearize through
    the dynamic-gather LUT, re-premultiply at 16 or 11 bits).

    With ``planes`` the input is channel-major (3, C, W) u8 (24bpp
    plans); ``a_vals`` is the python int 255 and ``inv_vals`` the scalar
    inv_div_p8[255], so the premul factors constant-fold."""
    from . import pallas_srgb

    byte_pos = in_layout.index(ch_lane)
    if ch_lane == 3:
        if planes:
            const = ((255 << 8) | 0x80) if premul16 else 255
            return jnp.full(px.shape[-2:], const, jnp.int32)
        # PREMUL16 alpha rides as (a<<8)|0x80 (generic.c:616-634)
        return ((a_vals << 8) | 0x80) if premul16 else a_vals
    if planes:
        v8 = px[byte_pos].astype(jnp.int32)
        if linear and not premul16:
            # constant-alpha-255 composite folded into table row 1
            # (pallas_srgb._lut_tables): one gather replaces
            # unpremul + linearize + premul_ul_to_p8l
            return pallas_srgb.lut_gather(v8, tbl[1:2], None)
    else:
        v8 = ((px >> (8 * byte_pos)) & jnp.uint32(0xFF)).astype(jnp.int32)
    if linear:
        if in_premul:
            # unpremul_p8 (generic.c:227-236): v*inv>>13, v*inv < 2**29
            v8 = ((v8 * inv_vals) >> 13) & 0xFF
        l11 = pallas_srgb.lut_gather(v8, tbl[0:1], None)
        if premul16:
            return l11 * a_vals  # <= 2047*255 < 2**19
        # premul_ul_to_p8l (generic.c:261-269)
        return (((l11 + 1) * ((a_vals << 3) + 1) - 1) >> 11) & 0x7FF
    if premul16:
        return v8 * a_vals  # <= 65025 (generic.c:616-634)
    if in_premul:
        return v8
    # premul_u_to_p8 (generic.c:238-244)
    return (((v8 + 1) * (a_vals + 1) - 1) >> 8) & 0xFF


def _alpha_unused(plan: ScalePlan) -> bool:
    """True when xla._pack never reads the alpha plane: 24bpp output
    packs only channels 0..2, and the color transform is alpha-free for
    PREMUL8 plans that keep premultiplied colors (compressed gamma) or
    LUT the 11-bit linear values straight (plan.pack24_linear_direct,
    generic.c:922-935).  Everything else (PREMUL16, indirect linear)
    unpremultiplies through the filtered alpha."""
    return (
        plan.meta_out.n_bytes == 3
        and plan.internal_alpha == AlphaType.PREMUL8
        and (
            plan.gamma == GammaType.SRGB_COMPRESSED
            or plan.pack24_linear_direct
        )
    )


def _planes_consts(plan: ScalePlan):
    """(a_vals, inv_vals) trace-time constants for the channel-major u8
    planes feed: the synthesized 24bpp alpha is 255 everywhere, so the
    premul factors and the alpha-indexed inv-div gather constant-fold."""
    from ..luts import INV_DIV_P8

    linear = plan.gamma == GammaType.SRGB_LINEAR
    in_premul = plan.meta_in.alpha == AlphaType.PREMUL8
    inv = int(INV_DIV_P8[255]) if (linear and in_premul) else None
    return 255, inv


def _make_kernel(plan: ScalePlan, C: int, k: int, w_pad: int, w_out_pad: int,
                 planes: bool = False):
    in_layout = plan.meta_in.layout
    if plan.meta_in.n_bytes == 3:
        # 24bpp input arrives padded with a synthesized 255 alpha
        # (unpack_pixel_123_*, generic.c:353-358)
        in_layout = in_layout + (3,)
    alpha_byte = in_layout.index(3)
    assert not planes or plan.meta_in.n_bytes == 3
    skip_a = planes and _alpha_unused(plan)
    premul16 = plan.internal_alpha == AlphaType.PREMUL16
    in_premul = plan.meta_in.alpha == AlphaType.PREMUL8
    r_x = int(plan.x.strides[0]) + 1
    w_out, h_out = plan.width_out, plan.height_out
    span_mul_x = int(plan.x.span_mul)
    span_mul_y = int(plan.y.span_mul)
    # working masks: 8-bit lanes for 64bpp, 16-bit halves for 128bpp
    # (values never exceed them for compressed-gamma box averages)
    norm_mask = 0xFF if plan.storage == StorageType.S64 else 0xFFFF
    h_last_short = int(plan.x.strides[-1]) == r_x - 2
    r_y = int(plan.y.strides[0]) + 1
    v_last_short = int(plan.y.strides[-1]) == r_y - 2
    linear = plan.gamma == GammaType.SRGB_LINEAR
    # Cheapest exact span-matmul form per value bound: compressed bytes
    # (<= 255) take ONE biased-8 limb, compressed PREMUL16 (<= 65025) two
    # (vs two/three 7-bit limbs); linear P8L (<= 2047) the unbiased split
    # pair; linear PREMUL16 (< 2**19) keeps three 7-bit limbs (three
    # biased limbs cost more prep for the same matmul count).
    if linear:
        mm_mode = ("i8", 3) if premul16 else ("u7", 7)
    else:
        mm_mode = ("i8b", 2 if premul16 else 1)
    def kernel(x_ref, m_ref, corr_ref, tbl_ref, o_ref, acc_ref):
        oi = pl.program_id(1)
        c = pl.program_id(2)
        px = x_ref[0]  # (C, w_pad) u32, or (3, C, w_pad) u8 with planes
        m8 = m_ref[...]
        tbl = tbl_ref[...]
        lane = jax.lax.broadcasted_iota(jnp.int32, (C, w_pad), 1)
        span_first = (lane % r_x == 0) & (lane > 0)

        if planes:
            a_vals, inv_vals = _planes_consts(plan)
        else:
            a_vals = (
                (px >> (8 * alpha_byte)) & jnp.uint32(0xFF)
            ).astype(jnp.int32)
            inv_vals = None
            if linear and in_premul:
                from . import pallas_srgb

                inv_vals = pallas_srgb.lut_gather(a_vals, tbl[2:3], tbl[3:4])
        for ch_lane in range(4):
            if skip_a and ch_lane == 3:
                continue
            ch = _unpack_plane(px, a_vals, inv_vals, ch_lane, in_layout,
                               premul16, in_premul, linear, tbl,
                               planes=planes)
            # H: fold the 255/256 span-first weight into the input
            adj = ch - jnp.where(span_first, (ch + 255) >> 8, 0)
            if h_last_short:
                adj = jnp.where(lane == w_out * r_x - 1, 0, adj)
            kind, arg = mm_mode
            if kind == "i8b":
                # PREMUL16 alpha rides as (a<<8)|0x80 <= 65408 (2 limbs,
                # same as the colors); plain P8 alpha is a byte too
                y = pg._span_mm_i8b(adj, m8, corr_ref[...], arg)
            elif kind == "u7":
                # linear P8L colors <= 2047; the alpha plane is <= 255,
                # still < 2**14, so the same split is exact
                y = pg._span_mm_u7(adj, m8, arg)
            else:
                y = pg._span_mm_i8(adj, m8, arg)
            hrow = fp.mul_shift_round24(y, jnp.int32(span_mul_x)) & norm_mask
            # V: chunk partial sum; span-first row weighted on chunk 0
            h0 = hrow[0:1]
            h0w = jnp.where(
                (c == 0) & (oi > 0), h0 - ((h0 + 255) >> 8), h0
            )
            part = h0w + jnp.sum(hrow[1:], axis=0, keepdims=True)
            if v_last_short:
                part = part - jnp.where(
                    (oi == h_out - 1) & (c == k - 1), hrow[C - 1 : C], 0
                )

            @pl.when(c == 0)
            def _init():
                acc_ref[ch_lane : ch_lane + 1, :] = part

            @pl.when(c > 0)
            def _accum():
                acc_ref[ch_lane : ch_lane + 1, :] = (
                    acc_ref[ch_lane : ch_lane + 1, :] + part
                )

            @pl.when(c == k - 1)
            def _emit():
                acc = acc_ref[ch_lane : ch_lane + 1, :]
                o_ref[0, ch_lane, pl.ds(oi, 1)] = (
                    fp.mul_shift_round24(acc, jnp.int32(span_mul_y))
                    & norm_mask
                )

    return kernel


def _span_matrix(plan: ScalePlan, w_pad: int, w_out_pad: int):
    """0/1 span-sum matrix (w_pad, w_out_pad) int8; the final-element drop
    and edge weights are folded into the kernel's input instead."""
    r_x = int(plan.x.strides[0]) + 1
    m = np.zeros((w_pad, w_out_pad), dtype=np.int8)
    for j in range(plan.width_out):
        lo = j * r_x
        m[lo : min(lo + r_x, w_pad), j] = 1
    return m


@functools.cache
def _built(plan: ScalePlan, batch: int, planes: bool = False):
    C, k = _chunk_rows(plan)
    w_in, h_in = plan.width_in, plan.height_in
    w_out, h_out = plan.width_out, plan.height_out
    w_pad = pg._round_up(w_in, 128)
    w_out_pad = pg._round_up(w_out, 128)
    kernel = _make_kernel(plan, C, k, w_pad, w_out_pad, planes=planes)
    m = _span_matrix(plan, w_pad, w_out_pad)
    # per-column bias correction for the biased-limb compressed path
    # (zeros when the kernel's mm_mode doesn't read it)
    premul16 = plan.internal_alpha == AlphaType.PREMUL16
    if plan.gamma == GammaType.SRGB_LINEAR:
        corr = np.zeros((1, w_out_pad), dtype=np.int32)
    else:
        corr = pg._wrap_i32(
            m.astype(np.int64).sum(0)
            * pg._span_bias_factor(2 if premul16 else 1)
        )[None, :]
    grid = (batch, h_out, k)

    if planes:
        px_spec = pl.BlockSpec(
            (1, 3, C, w_pad),
            lambda b, oi, c, _k=k: (b, 0, oi * _k + c, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        px_spec = pl.BlockSpec(
            (1, C, w_pad),
            lambda b, oi, c, _k=k: (b, oi * _k + c, 0),
            memory_space=pltpu.VMEM,
        )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (batch, 4, h_out, w_out_pad), jnp.int32
        ),
        grid=grid,
        in_specs=[
            px_spec,
            pl.BlockSpec(
                (w_pad, w_out_pad), lambda b, oi, c: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, w_out_pad), lambda b, oi, c: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (4, 128), lambda b, oi, c: (0, 0), memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            # full-output block per batch element (deep plans have tiny
            # outputs); rows land via a dynamic sublane store, so the
            # block needs no 8-divisible row tiling
            (1, 4, h_out, w_out_pad), lambda b, oi, c: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((8, w_out_pad), jnp.int32)],
    )

    pad_in = plan.meta_in.n_bytes == 3

    def fn(imgs_u8):
        from ..backends.xla import _pack

        if planes:  # channel-major (B, 3, H, W) u8 planes, no relayout
            px = imgs_u8
            if w_pad != w_in:
                px = jnp.pad(
                    px, [(0, 0), (0, 0), (0, 0), (0, w_pad - w_in)]
                )
        elif imgs_u8.dtype == jnp.uint32:  # pre-packed pixel view
            px = imgs_u8
        else:
            if pad_in:
                pad = [(0, 0)] * (imgs_u8.ndim - 1) + [(0, 1)]
                imgs_u8 = jnp.pad(imgs_u8, pad, constant_values=255)
            px = jax.lax.bitcast_convert_type(imgs_u8, jnp.uint32)
        if not planes and w_pad != w_in:
            px = jnp.pad(px, [(0, 0), (0, 0), (0, w_pad - w_in)])
        from . import pallas_srgb

        out = call(px, jnp.asarray(m), jnp.asarray(corr),
                   jnp.asarray(pallas_srgb._lut_tables()))
        return _pack(plan, out[:, :, :, :w_out])

    return fn


def _accum_emit(acc_ref, o_ref, ch_lane, part, c, oi, k, span_mul_y,
                norm_mask):
    """Chunk partial-sum accumulate + final span-normalized row emit."""

    @pl.when(c == 0)
    def _init():
        acc_ref[ch_lane : ch_lane + 1, :] = part

    @pl.when(c > 0)
    def _accum():
        acc_ref[ch_lane : ch_lane + 1, :] = (
            acc_ref[ch_lane : ch_lane + 1, :] + part
        )

    @pl.when(c == k - 1)
    def _emit():
        acc = acc_ref[ch_lane : ch_lane + 1, :]
        o_ref[0, ch_lane, pl.ds(oi, 1)] = (
            fp.mul_shift_round24(acc, jnp.int32(span_mul_y)) & norm_mask
        )


def _make_general_kernel(plan: ScalePlan, C: int, k: int, w_pad: int,
                         w_out_pad: int, planes: bool = False):
    """Ragged-span variant: V spans are irregular (non-integer ratios), so
    chunks start at the span's C-aligned base (BlockSpec-pipelined via the
    scalar-prefetched block index, so the pipeline double-buffers the
    fetches) and every row classifies itself against the span's
    [first, y1] bounds with the reference's edge weights --
    scale_outrow_box_64bpp uses w2 on the last row, the 128bpp variant
    w2-1 with a w2 == 0 skip (generic.c:2112-2260); rows outside the span
    (or in the zero padding past the image) contribute nothing.

    H runs edge-folded with biased 8-bit-limb int8 matmuls
    (pallas_bilinear._span_mm_i8b): block A = {left-weighted}+mids on the
    lw-folded input, block R = right one-hots on the raw input with the
    per-output fractional weight applied AFTER the gather (saves a full
    window-sized weight pass)."""
    in_layout = plan.meta_in.layout
    if plan.meta_in.n_bytes == 3:
        in_layout = in_layout + (3,)
    alpha_byte = in_layout.index(3)
    assert not planes or (plan.meta_in.n_bytes == 3 and _ABLATE is None)
    skip_a = planes and _alpha_unused(plan)
    premul16 = plan.internal_alpha == AlphaType.PREMUL16
    in_premul = plan.meta_in.alpha == AlphaType.PREMUL8
    h_out = plan.height_out
    span_mul_x = int(plan.x.span_mul)
    span_mul_y = int(plan.y.span_mul)
    s64 = plan.storage == StorageType.S64
    norm_mask = 0xFF if s64 else 0xFFFF
    wmask_i = 0xFF if s64 else 0xFFFFFF
    linear = plan.gamma == GammaType.SRGB_LINEAR
    # biased 8-bit limbs: byte values (compressed P8) take 1, 16-bit
    # (PREMUL16 compressed) and 11-bit (P8L linear) take 2, PREMUL16
    # linear (< 2**19) takes 3
    if premul16:
        nl8 = 3 if linear else 2
    else:
        nl8 = 2 if linear else 1
    # raw-px path: compressed-gamma premultiplied(-class) input needs no
    # per-channel transform, so the biased matmul limb IS the packed
    # channel byte -- one 4-pass limb prep feeds all three matmuls
    # ({left}+mids / left / right one-hots) and BOTH edges are corrected
    # after the gather; the whole unpack + input-weight stage disappears
    raw = (not linear) and (not premul16) and in_premul

    def kernel(s_ref, x_ref, m_ref, hf_ref, tbl_ref, o_ref, acc_ref):
        oi = pl.program_id(1)
        c = pl.program_id(2)
        px = x_ref[0]
        m8 = m_ref[...]
        tbl = tbl_ref[...]
        wmask = jnp.uint32(wmask_i)
        lw = hf_ref[0:1, :]
        rf = hf_ref[1:2, :w_out_pad].astype(jnp.uint32)
        corr_a = hf_ref[2:3, :w_out_pad]
        corr_r = hf_ref[3:4, :w_out_pad]
        lw_out = hf_ref[4:5, :w_out_pad].astype(jnp.uint32)
        corr_l = hf_ref[5:6, :w_out_pad]

        first_i = s_ref[oi, 1]
        y1 = s_ref[oi, 2]
        w1 = s_ref[oi, 3].astype(jnp.uint32)
        w2 = s_ref[oi, 4]
        rows = (
            s_ref[oi, 5] * C
            + c * C
            + jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
        )

        if planes:
            a_vals, inv_vals = _planes_consts(plan)
        else:
            a_vals = (
                (px >> (8 * alpha_byte)) & jnp.uint32(0xFF)
            ).astype(jnp.int32)
            inv_vals = None
            if linear and in_premul:
                from . import pallas_srgb

                inv_vals = pallas_srgb.lut_gather(a_vals, tbl[2:3], tbl[3:4])
        for ch_lane in range(4):
            if skip_a and ch_lane == 3:
                continue
            if raw and _ABLATE is None:
                byte_pos = in_layout.index(ch_lane)
                if planes and ch_lane == 3:
                    # synthesized 255 alpha: constant biased operand
                    biased = jnp.full(px.shape[-2:], 127, jnp.int8)
                elif planes:
                    # xor + truncating cast == byte - 128 (see the
                    # PREMUL16 fast path / _span_mm_i8b)
                    biased = (px[byte_pos] ^ jnp.uint8(0x80)).astype(jnp.int8)
                else:
                    biased = (
                        (px >> (8 * byte_pos)) ^ jnp.uint32(0x80)
                    ).astype(jnp.int8)

                def mm(mat):
                    return jnp.dot(
                        biased, mat, preferred_element_type=jnp.int32
                    )

                if _h_lane_packed(plan):
                    # lane-packed A|L|R single matmul (see the chunk
                    # kernel's twin; _ragged_h_tables packs the blocks)
                    y3 = mm(m8) + corr_a
                    w_o = plan.width_out
                    y_a = y3
                    y_l = jnp.roll(y3, -w_o, axis=1)
                    y_r = jnp.roll(y3, -2 * w_o, axis=1)
                else:
                    y_a = mm(m8[:, :w_out_pad]) + corr_a
                    y_l = mm(m8[:, w_out_pad : 2 * w_out_pad]) + corr_l
                    y_r = mm(m8[:, 2 * w_out_pad :]) + corr_r
                y = (
                    y_a
                    - y_l
                    + ((y_l.astype(jnp.uint32) * lw_out >> 8) & wmask
                       ).astype(jnp.int32)
                    + ((y_r.astype(jnp.uint32) * rf >> 8) & wmask
                       ).astype(jnp.int32)
                )
                hrow = fp.mul_shift_round24(y, jnp.int32(span_mul_x)) & norm_mask
            else:
                if _ABLATE == "nounpack":
                    ch = px.astype(jnp.int32) & 0xFF
                else:
                    ch = _unpack_plane(px, a_vals, inv_vals, ch_lane,
                                       in_layout, premul16, in_premul,
                                       linear, tbl, planes=planes)
                if _ABLATE == "nohmm":
                    hrow = ch[:, :w_out_pad]
                else:
                    if linear and ch_lane == 3 and not raw:
                        # alpha fits fewer limbs than linearized colors
                        nl = 2 if premul16 else 1
                        ca = hf_ref[6:7, :w_out_pad]
                        cr = hf_ref[7:8, :w_out_pad]
                    else:
                        nl, ca, cr = nl8, corr_a, corr_r
                    if _h_lane_packed(plan):
                        # lane-packed A|L|R single matmul per limb with
                        # post-gather left weight (see the chunk kernel's
                        # twin); ca is the group's PACKED correction row
                        if linear and not premul16 and nl == nl8:
                            y3 = pg._span_mm_u7(ch, m8, 7)
                        else:
                            y3 = pg._span_mm_i8b(ch, m8, ca, nl)
                        w_o = plan.width_out
                        y_l = jnp.roll(y3, -w_o, axis=1)
                        y_r = jnp.roll(y3, -2 * w_o, axis=1)
                        y = (
                            y3
                            - y_l
                            + ((y_l.astype(jnp.uint32) * lw_out >> 8)
                               & wmask).astype(jnp.int32)
                            + ((y_r.astype(jnp.uint32) * rf >> 8)
                               & wmask).astype(jnp.int32)
                        )
                    else:
                        adj = fp.weight256(ch, lw, wmask_i)
                        mr = (m8[:, w_out_pad : 2 * w_out_pad]
                              if raw else m8[:, w_out_pad:])
                        if linear and not premul16 and nl == nl8:
                            # P8L colors <= 2047: unbiased split limbs
                            # (pg._span_mm_u7), 2 prep ops, no correction
                            y_a = pg._span_mm_u7(adj, m8[:, :w_out_pad], 7)
                            y_r = pg._span_mm_u7(ch, mr, 7)
                        else:
                            y_a = pg._span_mm_i8b(
                                adj, m8[:, :w_out_pad], ca, nl
                            )
                            y_r = pg._span_mm_i8b(ch, mr, cr, nl)
                        y = y_a + (
                            (y_r.astype(jnp.uint32) * rf >> 8) & wmask
                        ).astype(jnp.int32)
                    hrow = fp.mul_shift_round24(
                        y, jnp.int32(span_mul_x)
                    ) & norm_mask
            if _ABLATE == "noclass":
                part = jnp.sum(hrow, axis=0, keepdims=True)
                _accum_emit(acc_ref, o_ref, ch_lane, part, c, oi, k,
                            span_mul_y, norm_mask)
                continue
            # V: per-row classification against the span bounds (additive,
            # so a one-row span counts its row as first AND last)
            hu = hrow.astype(jnp.uint32)
            contrib = jnp.where((rows > first_i) & (rows < y1), hrow, 0)
            contrib = contrib + jnp.where(
                rows == first_i,
                ((hu * w1 >> 8) & wmask).astype(jnp.int32),
                0,
            )
            if s64:
                contrib = contrib + jnp.where(
                    rows == y1,
                    ((hu * w2.astype(jnp.uint32) >> 8) & wmask).astype(
                        jnp.int32
                    ),
                    0,
                )
            else:
                w2m = jnp.maximum(w2 - 1, 0).astype(jnp.uint32)
                contrib = contrib + jnp.where(
                    (rows == y1) & (w2 > 0),
                    ((hu * w2m >> 8) & wmask).astype(jnp.int32),
                    0,
                )
            part = jnp.sum(contrib, axis=0, keepdims=True)
            _accum_emit(acc_ref, o_ref, ch_lane, part, c, oi, k,
                        span_mul_y, norm_mask)

    return kernel


def _h_lane_packed(plan: ScalePlan) -> bool:
    """True when the ragged-H stage packs its A/L/R blocks into one
    128-lane matrix (tiny w_out otherwise wastes the lane tile 2-3x).

    The left edge weight is applied POST-gather in this mode (like the
    raw path always did): block L is a one-hot, so exactly one element
    feeds each output's left term and ``(y_l * lw >> 8) & mask`` equals
    the in-fold ``weight256`` of that element -- every flavor's A and R
    blocks then contract the SAME operand and pack into one matmul per
    limb.  Both kernels and the table builder derive this from the plan
    so it never needs threading."""
    return 3 * plan.width_out <= 128


def _ragged_h_tables(plan: ScalePlan, w_pad: int, w_out_pad: int):
    """(m3, hf, raw): edge-folded ragged-H matrices + weight/correction
    rows, shared by the span-centric and chunk-centric ragged kernels.

    Block A = {left-weighted}+mids (lw folded into the input, identity
    256 on interiors), block R = right one-hots with the fractional
    weight applied after the gather.  The raw-px path adds a left
    one-hot block L and corrects BOTH edges post-gather.  All blocks
    ride biased 8-bit-limb int8 matmuls (_span_mm_i8b) with static
    per-column corrections.
    """
    from ..backends.xla import _box_h_arrays

    w_out = plan.width_out
    premul16 = plan.internal_alpha == AlphaType.PREMUL16
    linear = plan.gamma == GammaType.SRGB_LINEAR
    in_premul = plan.meta_in.alpha == AlphaType.PREMUL8
    nl8 = (3 if linear else 2) if premul16 else (2 if linear else 1)
    raw = (not linear) and (not premul16) and in_premul
    packed = _h_lane_packed(plan)
    bh = _box_h_arrays(plan.x)
    n_blk = 3 if raw else 2  # raw adds the left one-hot block
    if packed:
        # The A, L and R blocks all contract the SAME operand in packed
        # mode (the left weight applies post-gather, _h_lane_packed), and
        # tiny w_out wastes the 128-lane output tile per block: pack A at
        # lanes [0, w_out), L at [w_out, 2w_out), R at [2w_out, 3w_out)
        # into ONE (w_pad, 128) matrix -- the kernels run one matmul per
        # limb and lane-roll L/R back into place (ablation: the block
        # matmuls were 41% of the 9b chunk kernel's runtime at w_out=12)
        m3 = np.zeros((w_pad, w_out_pad), dtype=np.int8)
        l_off, r_off = w_out, 2 * w_out
    else:
        m3 = np.zeros((w_pad, n_blk * w_out_pad), dtype=np.int8)
        l_off, r_off = w_out_pad, (2 if raw else 1) * w_out_pad
    hf = np.zeros((8, w_pad), dtype=np.int32)
    hf[0, :] = 256  # lw map identity (fold path)
    for j in range(w_out):
        ms, ml = int(bh["mid_start"][j]), int(bh["mid_len"][j])
        li, ri = int(bh["left_idx"][j]), int(bh["right_idx"][j])
        m3[ms : ms + ml, j] = 1
        m3[li, j] = 1
        m3[ri, r_off + j] = 1
        if raw or packed:
            m3[li, l_off + j] = 1
            hf[4, j] = int(bh["left_w"][j])
        else:
            hf[0, li] = int(bh["left_w"][j])
        hf[1, j] = int(bh["fracs"][j])
    # corrections live mod 2**32 (the accumulator contract); wrap to int32
    def _corr(block, bias=pg._span_bias_factor(nl8)):
        v = (block.astype(np.int64).sum(0) * bias) & 0xFFFFFFFF
        return v.astype(np.uint32).astype(np.int32)

    if packed:
        # per-column corrections pack the same way the blocks do; the
        # linear alpha plane's lower-limb corrections ride row 6
        hf[2, :w_out_pad] = _corr(m3)
        if linear:
            hf[6, :w_out_pad] = _corr(
                m3, pg._span_bias_factor(2 if premul16 else 1)
            )
        return m3, hf, raw
    hf[2, :w_out_pad] = _corr(m3[:, :w_out_pad])
    hf[3, :w_out_pad] = _corr(m3[:, r_off : r_off + w_out_pad])
    if raw:
        hf[5, :w_out_pad] = _corr(m3[:, w_out_pad : 2 * w_out_pad])
    elif linear:
        # the alpha plane needs fewer limbs than the linearized colors
        # (<= 255 for P8L, <= 65408 for PREMUL16); rows 6/7 carry its
        # block-A/R corrections at that limb count
        ba = pg._span_bias_factor(2 if premul16 else 1)
        hf[6, :w_out_pad] = _corr(m3[:, :w_out_pad], ba)
        hf[7, :w_out_pad] = _corr(m3[:, r_off : r_off + w_out_pad], ba)
    return m3, hf, raw


@functools.cache
def _built_general(plan: ScalePlan, batch: int, planes: bool = False):
    from ..backends.xla import _box_v_arrays

    C, k = _general_chunk(plan)
    w_in, h_in = plan.width_in, plan.height_in
    w_out, h_out = plan.width_out, plan.height_out
    w_pad = pg._round_up(w_in, 128)
    w_out_pad = pg._round_up(w_out, 128)
    m3, hf, _raw = _ragged_h_tables(plan, w_pad, w_out_pad)

    bv = _box_v_arrays(plan.y)
    ofs = np.asarray(plan.y.offsets, dtype=np.int64)
    scal = np.zeros((h_out, 6), dtype=np.int32)
    scal[:, 1] = bv["first_idx"]
    scal[:, 2] = ofs[1 : h_out + 1]  # raw y1 (padded rows read as zeros)
    scal[:, 3] = bv["w1"]
    scal[:, 4] = bv["w2"]
    scal[:, 5] = bv["first_idx"] // C  # C-aligned base block index
    h_pad = max(
        pg._round_up(h_in, 8), (int(scal[:, 5].max()) + k) * C
    )

    kernel = _make_general_kernel(plan, C, k, w_pad, w_out_pad,
                                  planes=planes)
    grid = (batch, h_out, k)

    if planes:
        px_spec = pl.BlockSpec(
            (1, 3, C, w_pad),
            lambda b, oi, c, s: (b, 0, s[oi, 5] + c, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        px_spec = pl.BlockSpec(
            (1, C, w_pad),
            lambda b, oi, c, s: (b, s[oi, 5] + c, 0),
            memory_space=pltpu.VMEM,
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            # chunk blocks addressed through the scalar-prefetched base
            # block index: the pipeline double-buffers the fetches (the
            # old manual-DMA form serialized a VMEM copy per chunk)
            px_spec,
            pl.BlockSpec(
                m3.shape, lambda b, oi, c, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, w_pad), lambda b, oi, c, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (4, 128), lambda b, oi, c, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, h_out, w_out_pad), lambda b, oi, c, *_: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((8, w_out_pad), jnp.int32),
        ],
    )

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (batch, 4, h_out, w_out_pad), jnp.int32
        ),
        grid_spec=grid_spec,
    )

    pad_in = plan.meta_in.n_bytes == 3

    def fn(imgs_u8):
        from ..backends.xla import _pack

        if planes:  # channel-major (B, 3, H, W) u8 planes, no relayout
            px = imgs_u8
            if w_pad != w_in or h_pad != h_in:
                px = jnp.pad(
                    px,
                    [(0, 0), (0, 0), (0, h_pad - h_in), (0, w_pad - w_in)],
                )
        elif imgs_u8.dtype == jnp.uint32:
            px = imgs_u8
        else:
            if pad_in:
                pad = [(0, 0)] * (imgs_u8.ndim - 1) + [(0, 1)]
                imgs_u8 = jnp.pad(imgs_u8, pad, constant_values=255)
            px = jax.lax.bitcast_convert_type(imgs_u8, jnp.uint32)
        if not planes and (w_pad != w_in or h_pad != h_in):
            px = jnp.pad(
                px, [(0, 0), (0, h_pad - h_in), (0, w_pad - w_in)]
            )
        from . import pallas_srgb

        out = call(
            jnp.asarray(scal), px, jnp.asarray(m3), jnp.asarray(hf),
            jnp.asarray(pallas_srgb._lut_tables()),
        )
        return _pack(plan, out[:, :, :, :w_out])

    return fn


def _chunk_centric(plan: ScalePlan):
    """(C, n_chunks) for the chunk-centric ragged walk, or None.

    Requires every V span to be at least C rows tall (then a chunk
    intersects at most two spans), which holds across the deep band; the
    chunks tile the image exactly once -- no per-span base alignment, no
    re-fetched overlap rows, and one grid step per chunk instead of
    k per output row.
    """
    from ..backends.xla import _box_v_arrays

    w_pad = pg._round_up(plan.width_in, 128)
    cap = min(512, max(8, _chunk_budget(plan) // (w_pad * 4) // 8 * 8))
    bv = _box_v_arrays(plan.y)
    ofs = np.asarray(plan.y.offsets, dtype=np.int64)
    first = np.asarray(bv["first_idx"], dtype=np.int64)
    y1 = ofs[1 : plan.height_out + 1]
    min_d = int((y1 - first).min())
    C = min(cap, (min_d // 8) * 8)
    if C < 8:
        return None
    n_chunks = -(-plan.height_in // C)
    return C, n_chunks


def _make_chunk_kernel(plan: ScalePlan, C: int, w_pad: int, w_out_pad: int,
                       planes: bool = False, ni: int = 1):
    """Chunk-centric ragged deep box: grid (batch, chunk) walks the image
    once; each chunk's rows classify into the (at most two) spans the
    chunk intersects -- candidate A always, candidate B when the next
    span starts inside the chunk.  Span state lives in a 2-slot (per
    lane) accumulator keyed by span parity; a span is initialized by the
    chunk containing its first row and emitted (normalized) by the chunk
    containing its last.  The per-row edge-weight classification
    (scale_outrow_box_*, generic.c:2112-2260) folds into ONE combined
    per-row weight vector shared by all four channels: every span is at
    least C >= 8 rows tall (the _chunk_centric gate), so the
    first/interior/last predicates are mutually exclusive and
    ``w = 256*[interior] + w1*[first] + w2'*[last]`` makes each row's
    contribution exactly ``(h * w >> 8) & mask`` -- interior rows are the
    identity (h*256 >> 8 == h, and h <= norm_mask <= wmask), edge rows the
    reference's truncating weight, and weight 0 drops the row."""
    in_layout = plan.meta_in.layout
    if plan.meta_in.n_bytes == 3:
        in_layout = in_layout + (3,)
    alpha_byte = in_layout.index(3)
    assert not planes or (plan.meta_in.n_bytes == 3 and _ABLATE is None)
    skip_a = planes and _alpha_unused(plan)
    n_stack = 3 if skip_a else 4
    premul16 = plan.internal_alpha == AlphaType.PREMUL16
    in_premul = plan.meta_in.alpha == AlphaType.PREMUL8
    span_mul_x = int(plan.x.span_mul)
    span_mul_y = int(plan.y.span_mul)
    s64 = plan.storage == StorageType.S64
    norm_mask = 0xFF if s64 else 0xFFFF
    wmask_i = 0xFF if s64 else 0xFFFFFF
    linear = plan.gamma == GammaType.SRGB_LINEAR
    nl8 = (3 if linear else 2) if premul16 else (2 if linear else 1)
    raw = (not linear) and (not premul16) and in_premul

    def kernel(s_ref, x_ref, m_ref, hf_ref, tbl_ref, o_ref, acc_ref):
        c = pl.program_id(1)
        m8 = m_ref[...]
        tbl = tbl_ref[...]
        wmask = jnp.uint32(wmask_i)
        lw = hf_ref[0:1, :]
        rf = hf_ref[1:2, :w_out_pad].astype(jnp.uint32)
        corr_a = hf_ref[2:3, :w_out_pad]
        corr_r = hf_ref[3:4, :w_out_pad]
        lw_out = hf_ref[4:5, :w_out_pad].astype(jnp.uint32)
        corr_l = hf_ref[5:6, :w_out_pad]
        rows = c * C + jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)

        def span_weights(first_i, y1_i, w1, w2p):
            # channel-independent combined row weight (see docstring);
            # spans are >= C rows so the three predicates never overlap
            wv = jnp.where((rows > first_i) & (rows < y1_i), 256, 0)
            wv = wv + jnp.where(rows == first_i, w1, 0)
            wv = wv + jnp.where(rows == y1_i, w2p, 0)
            return wv.astype(jnp.uint32)

        # candidate A: scal cols [0]=idx [1]=first [2]=y1 [3]=w1
        # [4]=w2' [5]=init [6]=emit; candidate B (next span starting
        # inside this chunk): [7]=valid(==init) [8]=idx [9]=first
        # [10]=y1 [11]=w1 [12]=w2' -- B's span is at least C rows so it
        # never emits here
        idx_a = s_ref[c, 0]
        idx_b = s_ref[c, 8]
        wv_a = span_weights(s_ref[c, 1], s_ref[c, 2], s_ref[c, 3],
                            s_ref[c, 4])
        wv_b = span_weights(s_ref[c, 9], s_ref[c, 10], s_ref[c, 11],
                            s_ref[c, 12])

        def one(px, img):
            if planes:
                a_vals, inv_vals = _planes_consts(plan)
            else:
                a_vals = (
                    (px >> (8 * alpha_byte)) & jnp.uint32(0xFF)
                ).astype(jnp.int32)
                inv_vals = None
                if linear and in_premul:
                    from . import pallas_srgb

                    inv_vals = pallas_srgb.lut_gather(a_vals, tbl[2:3], tbl[3:4])

            # Channel-stacked H matmuls: all four planes concatenate along
            # sublanes into one tall operand, so each limb's span matmul runs
            # once at M = 4C (3C + separate alpha when the linear alpha takes
            # fewer limbs) instead of four times at M = C -- same MACs, far
            # better MXU M-tile utilization at the small chunk heights the
            # VMEM budget forces (ablation: the 14 small matmuls were ~60% of
            # the srgb-ragged kernel's critical path).  The per-column bias
            # corrections are row-independent, so they apply to the stacked
            # result unchanged.
            if raw and _ABLATE is None:
                if planes:
                    # channel plane -> biased limb directly (xor + truncating
                    # cast == byte - 128); the synthesized 255 alpha (when
                    # packed at all) is the constant 127 limb
                    srcs = [
                        (px[in_layout.index(l)] ^ jnp.uint8(0x80)
                         ).astype(jnp.int8)
                        for l in range(3)
                    ]
                    if not skip_a:
                        srcs.append(
                            jnp.full(px.shape[-2:], 127, jnp.int8)
                        )
                    biased = jnp.concatenate(srcs, axis=0)
                else:
                    biased = jnp.concatenate(
                        [
                            ((px >> (8 * in_layout.index(l))) ^ jnp.uint32(0x80)
                             ).astype(jnp.int8)
                            for l in range(4)
                        ],
                        axis=0,
                    )

                def mm(mat):
                    return jnp.dot(biased, mat, preferred_element_type=jnp.int32)

                if _h_lane_packed(plan):
                    # one lane-packed matmul (A | L | R at w_out offsets,
                    # _ragged_h_tables); lane-roll L/R back over [0, w_out).
                    # Lanes >= w_out carry garbage from here on -- harmless,
                    # lanes are independent and the host slices to w_out
                    y3 = mm(m8) + corr_a
                    w_o = plan.width_out
                    y_a = y3
                    y_l = jnp.roll(y3, -w_o, axis=1)
                    y_r = jnp.roll(y3, -2 * w_o, axis=1)
                else:
                    y_a = mm(m8[:, :w_out_pad]) + corr_a
                    y_l = mm(m8[:, w_out_pad : 2 * w_out_pad]) + corr_l
                    y_r = mm(m8[:, 2 * w_out_pad :]) + corr_r
                y = (
                    y_a
                    - y_l
                    + ((y_l.astype(jnp.uint32) * lw_out >> 8) & wmask
                       ).astype(jnp.int32)
                    + ((y_r.astype(jnp.uint32) * rf >> 8) & wmask
                       ).astype(jnp.int32)
                )
                hrow_s = fp.mul_shift_round24(y, jnp.int32(span_mul_x)) & norm_mask
                hrows = [hrow_s[l * C : (l + 1) * C] for l in range(n_stack)]
            elif (premul16 and not linear and not planes
                  and _h_lane_packed(plan)
                  and _ABLATE in (None, "fp_noswar", "fp_nomm", "novred")):
                # PREMUL16-compressed fast path (generic.c:616-634 storage):
                # ONE u32 multiply forms TWO channels' v*a products in
                # independent 16-bit halves (v*a <= 65025 < 2**16, no
                # carry-over), replacing two per-channel extract+multiply
                # streams; and the (a<<8)|0x80 alpha word's low biased limb
                # is identically zero (0x80 - 128), so the limb-0 matmul
                # stacks only the three color planes -- the shared 2-limb
                # bias correction row already restores the 128*colsum the
                # constant 0x80 limb truly contributes, exactly.
                a_u = a_vals.astype(jnp.uint32)
                pb = (0, 2) if alpha_byte in (1, 3) else (1, 3)
                sb = next(b for b in range(4)
                          if b != alpha_byte and b not in pb)
                rp = (px if pb[0] == 0 else px >> 8) & jnp.uint32(0x00FF00FF)
                # biased bytes via ONE xor + truncating int8 casts: the cast
                # keeps the low byte two's-complement, so (x ^ 0x80..80 as
                # int8 per byte) == byte - 128 with no mask/subtract passes
                if _ABLATE == "fp_noswar":  # timing-only: skip the products
                    rp = rp ^ jnp.uint32(0x80808080)
                    rs = (px >> (8 * sb)) ^ jnp.uint32(0x8080)
                else:
                    rp = (rp * a_u) ^ jnp.uint32(0x80808080)
                    rs = (((px >> (8 * sb)) & jnp.uint32(0xFF)) * a_u
                          ) ^ jnp.uint32(0x8080)

                def _lb(v):
                    return v.astype(jnp.int8)

                l0 = {in_layout[pb[0]]: _lb(rp),
                      in_layout[pb[1]]: _lb(rp >> 16),
                      in_layout[sb]: _lb(rs)}
                l1 = {in_layout[pb[0]]: _lb(rp >> 8),
                      in_layout[pb[1]]: _lb(rp >> 24),
                      in_layout[sb]: _lb(rs >> 8),
                      3: _lb(a_vals ^ 128)}

                # ONE dot for both limbs: the 4 hi-limb planes and 3
                # lo-limb planes (alpha's lo limb is the constant 0x80,
                # restored by the correction row) stack along M, so the
                # (w_pad, 128) operand streams once instead of twice
                ym = jnp.dot(
                    jnp.concatenate(
                        [l1[l] for l in range(4)] + [l0[l] for l in range(3)],
                        axis=0,
                    ),
                    m8, preferred_element_type=jnp.int32,
                )
                y1m, y0m = ym[: 4 * C], ym[4 * C :]
                y3 = jnp.concatenate(
                    [(y1m[: 3 * C] << 8) + y0m, y1m[3 * C :] << 8], axis=0
                ) + corr_a
                w_o = plan.width_out
                y_l = jnp.roll(y3, -w_o, axis=1)
                y_r = jnp.roll(y3, -2 * w_o, axis=1)
                y = (
                    y3
                    - y_l
                    + ((y_l.astype(jnp.uint32) * lw_out >> 8) & wmask
                       ).astype(jnp.int32)
                    + ((y_r.astype(jnp.uint32) * rf >> 8) & wmask
                       ).astype(jnp.int32)
                )
                hrow_s = fp.mul_shift_round24(y, jnp.int32(span_mul_x)) & norm_mask
                hrows = [hrow_s[l * C : (l + 1) * C] for l in range(4)]
            else:
                if _ABLATE in ("nounpack", "nofilter"):
                    chs = [px.astype(jnp.int32) & 0xFF for _ in range(4)]
                else:
                    chs = [
                        _unpack_plane(px, a_vals, inv_vals, l, in_layout,
                                      premul16, in_premul, linear, tbl,
                                      planes=planes)
                        for l in range(n_stack)
                    ]
                if _ABLATE in ("nohmm", "nofilter"):
                    hrows = [ch[:, :w_out_pad] & norm_mask for ch in chs]
                else:
                    # linear alpha fits fewer limbs than the linearized colors
                    a_nl = (2 if premul16 else 1) if linear else nl8
                    if skip_a or a_nl == nl8:
                        groups = [(jnp.concatenate(chs, axis=0), nl8,
                                   corr_a, corr_r)]
                    else:
                        groups = [
                            (jnp.concatenate(chs[:3], axis=0), nl8,
                             corr_a, corr_r),
                            (chs[3], a_nl, hf_ref[6:7, :w_out_pad],
                             hf_ref[7:8, :w_out_pad]),
                        ]
                    ys = []
                    for g, nl, ca, cr in groups:
                        if _h_lane_packed(plan):
                            # one lane-packed matmul per limb (A | L | R at
                            # w_out offsets); the left weight applies
                            # post-gather like the raw path -- exact because
                            # block L is a one-hot (see _h_lane_packed).
                            # ca is this group's PACKED correction row
                            if linear and not premul16 and nl == nl8:
                                y3 = pg._span_mm_u7(g, m8, 7)
                            else:
                                y3 = pg._span_mm_i8b(g, m8, ca, nl)
                            w_o = plan.width_out
                            y_l = jnp.roll(y3, -w_o, axis=1)
                            y_r = jnp.roll(y3, -2 * w_o, axis=1)
                            y = (
                                y3
                                - y_l
                                + ((y_l.astype(jnp.uint32) * lw_out >> 8)
                                   & wmask).astype(jnp.int32)
                                + ((y_r.astype(jnp.uint32) * rf >> 8)
                                   & wmask).astype(jnp.int32)
                            )
                        else:
                            adj = fp.weight256(g, lw, wmask_i)
                            mr = (m8[:, w_out_pad : 2 * w_out_pad]
                                  if raw else m8[:, w_out_pad:])
                            if linear and not premul16 and nl == nl8:
                                # P8L colors <= 2047: unbiased split limbs
                                y_a = pg._span_mm_u7(adj, m8[:, :w_out_pad], 7)
                                y_r = pg._span_mm_u7(g, mr, 7)
                            else:
                                y_a = pg._span_mm_i8b(
                                    adj, m8[:, :w_out_pad], ca, nl
                                )
                                y_r = pg._span_mm_i8b(g, mr, cr, nl)
                            y = y_a + (
                                (y_r.astype(jnp.uint32) * rf >> 8) & wmask
                            ).astype(jnp.int32)
                        ys.append(
                            fp.mul_shift_round24(y, jnp.int32(span_mul_x))
                            & norm_mask
                        )
                    hrows = [ys[0][l * C : (l + 1) * C] for l in range(3)]
                    if not skip_a:
                        hrows.append(
                            ys[-1][0:C] if len(ys) > 1
                            else ys[0][3 * C : 4 * C]
                        )
            for ch_lane in range(n_stack):
                hrow = hrows[ch_lane]
                hu = hrow.astype(jnp.uint32)
                if _ABLATE in ("novred", "nofilter"):
                    part_a = hrow[:1, :]  # timing-only: skip the V reduce
                elif _ABLATE == "noclass":
                    part_a = jnp.sum(hrow, axis=0, keepdims=True)
                else:
                    part_a = jnp.sum(
                        ((hu * wv_a >> 8) & wmask).astype(jnp.int32),
                        axis=0, keepdims=True,
                    )
                row_a = img * 8 + ch_lane * 2 + jax.lax.rem(idx_a, 2)

                @pl.when(s_ref[c, 5] == 1)
                def _init_a():
                    acc_ref[pl.ds(row_a, 1), :] = part_a

                @pl.when(s_ref[c, 5] == 0)
                def _acc_a():
                    acc_ref[pl.ds(row_a, 1), :] = (
                        acc_ref[pl.ds(row_a, 1), :] + part_a
                    )

                @pl.when(s_ref[c, 6] == 1)
                def _emit_a():
                    acc = acc_ref[pl.ds(row_a, 1), :]
                    o_ref[img, ch_lane, pl.ds(idx_a, 1)] = (
                        fp.mul_shift_round24(acc, jnp.int32(span_mul_y))
                        & norm_mask
                    )

                if _ABLATE in ("noclass", "novred", "nofilter"):
                    part_b = part_a
                else:
                    part_b = jnp.sum(
                        ((hu * wv_b >> 8) & wmask).astype(jnp.int32),
                        axis=0, keepdims=True,
                    )
                row_b = img * 8 + ch_lane * 2 + jax.lax.rem(idx_b, 2)

                @pl.when(s_ref[c, 7] == 1)
                def _init_b():
                    acc_ref[pl.ds(row_b, 1), :] = part_b


        for img in range(ni):
            one(x_ref[img], img)

    return kernel


@functools.cache
def _built_chunked(plan: ScalePlan, batch: int, planes: bool = False):
    from ..backends.xla import _box_v_arrays

    C, n_chunks = _chunk_centric(plan)
    w_in, h_in = plan.width_in, plan.height_in
    w_out, h_out = plan.width_out, plan.height_out
    w_pad = pg._round_up(w_in, 128)
    w_out_pad = pg._round_up(w_out, 128)
    m3, hf, _raw = _ragged_h_tables(plan, w_pad, w_out_pad)

    bv = _box_v_arrays(plan.y)
    ofs = np.asarray(plan.y.offsets, dtype=np.int64)
    first = np.asarray(bv["first_idx"], dtype=np.int64)
    y1 = ofs[1 : h_out + 1]
    w1 = np.asarray(bv["w1"], dtype=np.int64)
    w2 = np.asarray(bv["w2"], dtype=np.int64)
    s128 = plan.storage == StorageType.S128
    w2p = np.maximum(w2 - 1, 0) if s128 else w2

    scal = np.zeros((n_chunks, 16), dtype=np.int32)
    for c in range(n_chunks):
        lo, hi = c * C, (c + 1) * C - 1
        # candidate A = the FIRST span intersecting the chunk: smallest i
        # with y1_i >= lo.  (Defining it via first_i <= lo loses a span
        # whose final row falls exactly on the chunk boundary -- the next
        # span starts on that same shared row, and the ending span's
        # w2-weighted last row and its emit were silently dropped.  Found
        # by hardware fuzz: 1842x1538->10x15 srgb, span y1 = 512 = 8*C.)
        ia = int(np.searchsorted(y1, lo, side="left"))
        ia = max(0, min(ia, h_out - 1))
        scal[c, 0] = ia
        scal[c, 1] = first[ia]
        scal[c, 2] = y1[ia]
        scal[c, 3] = w1[ia]
        scal[c, 4] = w2p[ia]
        scal[c, 5] = 1 if first[ia] >= lo else 0
        scal[c, 6] = 1 if lo <= y1[ia] <= hi else 0
        ib = ia + 1
        valid_b = ib <= h_out - 1 and first[ib] <= hi
        scal[c, 7] = 1 if valid_b else 0
        if valid_b:
            scal[c, 8] = ib
            scal[c, 9] = first[ib]
            scal[c, 10] = y1[ib]
            scal[c, 11] = w1[ib]
            scal[c, 12] = w2p[ib]
        else:
            # inert candidate: bounds no row can match
            scal[c, 8] = 0
            scal[c, 9] = -2
            scal[c, 10] = -2

    h_pad = n_chunks * C
    # Two images per grid step for the PREMUL16-compressed class: its
    # ablation shows no single stage above ~8% of runtime (the kernel is
    # per-step pipeline-bound at the span-capped C), so halve the step
    # count instead -- each step DMAs two images' chunks and unrolls the
    # pipeline over both, with per-image accumulator rows (img*8 offset).
    ni = 2 if (
        not planes
        and plan.internal_alpha == AlphaType.PREMUL16
        and plan.gamma == GammaType.SRGB_COMPRESSED
        and _h_lane_packed(plan)
        and batch % 2 == 0
    ) else 1
    kernel = _make_chunk_kernel(plan, C, w_pad, w_out_pad, planes=planes,
                                ni=ni)
    grid = (batch // ni, n_chunks)
    scratch = [pltpu.VMEM((8 * ni, w_out_pad), jnp.int32)]

    if planes:
        px_spec = pl.BlockSpec(
            (1, 3, C, w_pad), lambda b, c, *_: (b, 0, c, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        px_spec = pl.BlockSpec(
            (ni, C, w_pad), lambda b, c, *_: (b, c, 0),
            memory_space=pltpu.VMEM,
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            px_spec,
            pl.BlockSpec(
                m3.shape, lambda b, c, *_: (0, 0), memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, w_pad), lambda b, c, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (4, 128), lambda b, c, *_: (0, 0), memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (ni, 4, h_out, w_out_pad), lambda b, c, *_: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=scratch,
    )

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (batch, 4, h_out, w_out_pad), jnp.int32
        ),
        grid_spec=grid_spec,
    )

    pad_in = plan.meta_in.n_bytes == 3

    def fn(imgs_u8):
        from ..backends.xla import _pack

        if planes:  # channel-major (B, 3, H, W) u8 planes, no relayout
            px = imgs_u8
            if w_pad != w_in or h_pad != h_in:
                px = jnp.pad(
                    px,
                    [(0, 0), (0, 0), (0, h_pad - h_in), (0, w_pad - w_in)],
                )
        elif imgs_u8.dtype == jnp.uint32:
            px = imgs_u8
        else:
            if pad_in:
                pad = [(0, 0)] * (imgs_u8.ndim - 1) + [(0, 1)]
                imgs_u8 = jnp.pad(imgs_u8, pad, constant_values=255)
            px = jax.lax.bitcast_convert_type(imgs_u8, jnp.uint32)
        if not planes and (w_pad != w_in or h_pad != h_in):
            px = jnp.pad(
                px, [(0, 0), (0, h_pad - h_in), (0, w_pad - w_in)]
            )
        from . import pallas_srgb

        out = call(
            jnp.asarray(scal), px, jnp.asarray(m3), jnp.asarray(hf),
            jnp.asarray(pallas_srgb._lut_tables()),
        )
        return _pack(plan, out[:, :, :, :w_out])

    return fn


def scale_fn(plan: ScalePlan, imgs):
    """(B, H, W, 4) u8 (or packed (B, H, W) u32) -> (B, h, w, nb_out) u8.
    Caller checks applicable()."""
    squeeze = imgs.ndim == (2 if imgs.dtype == jnp.uint32 else 3)
    if squeeze:
        imgs = imgs[None]
    if _uniform_deep(plan):
        build = _built
    elif _chunk_centric(plan) is not None and _ABLATE != "general":
        # ablation knobs apply inside whichever kernel naturally runs;
        # "general" additionally forces the row-centric kernel
        build = _built_chunked
    else:
        build = _built_general
    out = build(plan, imgs.shape[0])(imgs)
    return out[0] if squeeze else out


def scale_fn_planes(plan: ScalePlan, pls):
    """Channel-major (B, 3, H, W) u8 planes -> (B, h, w, nb_out) u8.
    24bpp-input deep plans only; caller checks applicable().  Skips the
    pad-to-32bpp + u32 bitcast relayout, and the synthesized 255 alpha
    constant-folds (dropped outright when _alpha_unused)."""
    squeeze = pls.ndim == 3
    if squeeze:
        pls = pls[None]
    if _uniform_deep(plan):
        build = _built
    elif _chunk_centric(plan) is not None and _ABLATE != "general":
        build = _built_chunked
    else:
        build = _built_general
    out = build(plan, pls.shape[0], planes=True)(pls)
    return out[0] if squeeze else out
