"""Fused Pallas TPU kernel for integer-ratio box downscaling (the headline
thumbnail path: e.g. RGBA 4096^2 -> 256^2).

One kernel fuses the whole per-tile pipeline in VMEM -- unpack (u32
shift/mask), horizontal box, vertical box, pack -- so HBM traffic is just
the u8 input once plus the tiny output, where the XLA path materializes
~16 bytes of int32 intermediates per input pixel.

Key reformulations (all bit-exact to the generic C backend):

* Horizontal whole-span sums ride the MXU as an **int8 matmul** (2x the
  bf16 rate on v5e): per channel, ``Y = (x' - 128)_i8 @ S_i8`` where S is
  the 0/1 span-sum matrix (col j sums input columns [j*R, (j+1)*R), minus
  the final element the reference's precalc clamp drops, generic.c:105-110);
  the -128 offset is undone arithmetically (+128 * colsum, a static
  per-column constant).  Integer matmuls are exact by construction.
* The reference weights each span's first pixel by 255/256 with truncation
  (the carry (r*255 - r*0)>>8 of generic.c:1462).  For 8-bit x,
  (x*255)>>8 == x - [x > 0], so the left-edge adjustment is applied to the
  *input* (x' = x - [span-first lane & x > 0], span 0 exempt) and rides
  through the span sum -- no boundary-gather matrix needed at all.
* The vertical pass applies the same identity on already-normalized 8-bit
  rows with a sublane reshape-reduce; the final input row of the image is
  dropped like the reference does.
* Box normalization (acc*span_mul + 2**23) >> 24 uses the proven int32
  split (ops.fixedpoint.mul_shift_round24).

Applicability: each axis is either integer-ratio box (uniform strides,
zero fracs) or COPY (identity, dim_in == dim_out -- the reference's
interp_horizontal_copy / scale_outrow_copy, generic.c:1594-1611,
2302-2318), with at least one box axis; 64bpp storage (internal PREMUL8),
4-byte pixel formats.  A COPY H axis has no H span matmul; its V box
contracts on the MXU instead (_vspan_matrix -- the full-width
reshape-reduce was 3.4x slower, the (rows_t, ry, w) reshape being a
sublane relayout of the whole block).  A COPY V axis passes the h-row
through.  Unassociated *input* is premultiplied in-kernel; unassociated
*output* is handled by an output-sized XLA epilogue (unpremul_p8 at pack,
generic.c:227-236).  Everything else falls back to the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats import AlphaType, StorageType
from ..ops import fixedpoint as fp
from ..plan import FilterType, ScalePlan


def _axis_ok(ax) -> bool:
    from ..backends.xla import _box_uniform_applicable  # avoid cycle

    if ax.filter == FilterType.COPY:
        return True
    return ax.filter == FilterType.BOX and _box_uniform_applicable(ax)


def applicable(plan: ScalePlan) -> bool:
    return (
        plan.storage == StorageType.S64
        and plan.internal_alpha == AlphaType.PREMUL8
        and plan.meta_in.n_bytes == 4
        and plan.meta_out.n_bytes == 4
        and _axis_ok(plan.x)
        and _axis_ok(plan.y)
        # at least one box axis: pure COPYxCOPY repacks stay on XLA
        and FilterType.BOX in (plan.x.filter, plan.y.filter)
        # VMEM budget: int8 span matrix + input tile (the block-diagonal
        # chunked matrix is compact: 128 columns regardless of w_out; a
        # COPY H axis instead carries the (rows_t, rows_t*ry) V-span
        # matrix, bounded inside _pick_rows_t)
        and plan.width_in % 128 == 0
        and (
            plan.x.filter == FilterType.COPY
            or plan.width_in
            * (_CHUNK_COLS if _span_chunks(plan.x) > 1 else plan.width_out)
            < 4 * 2**20
        )
        and _pick_rows_t(plan) is not None
    )


_CHUNK_COLS = 128  # one MXU column tile per block-diagonal chunk


def _span_chunks(ax) -> int:
    """Block-diagonal column chunks for the span matmul (1 = dense).

    Uniform integer-ratio spans never cross a 128-output-column boundary:
    chunk c's columns [128c, 128(c+1)) read only lanes
    [c*r*128, (c+1)*r*128).  Splitting the matmul into per-chunk
    (M, r*128) @ (r*128, 128) products cuts the MXU work by w_out/128 --
    the dense form pays full K against every 128-wide column tile -- and
    is bit-identical because the dropped off-diagonal blocks are all
    zero.  Lane slices at r*128 multiples keep Mosaic's 128-alignment."""
    w_out = ax.dim_out
    if w_out > _CHUNK_COLS and w_out % _CHUNK_COLS == 0:
        return w_out // _CHUNK_COLS
    return 1


def _span_matrix(ax):
    """S: 0/1 span-sum matrix.  Dense (W, w_out) int8, or -- when
    _span_chunks splits the matmul -- the compact (W, 128) stack of the
    block-diagonal chunks (rows [c*K_c, (c+1)*K_c) hold chunk c's
    columns)."""
    w_in, w_out = ax.dim_in, ax.dim_out
    r = w_in // w_out
    m = np.zeros((w_in, w_out), dtype=np.int8)
    for j in range(w_out):
        lo, hi = j * r, (j + 1) * r
        if j == w_out - 1:
            hi -= 1  # the reference drops the final input element
        m[lo:hi, j] = 1
    n_c = _span_chunks(ax)
    if n_c == 1:
        return m
    k_c = w_in // n_c
    mc = np.zeros((w_in, _CHUNK_COLS), dtype=np.int8)
    for c in range(n_c):
        mc[c * k_c : (c + 1) * k_c, :] = m[
            c * k_c : (c + 1) * k_c,
            c * _CHUNK_COLS : (c + 1) * _CHUNK_COLS,
        ]
    return mc


def _vspan_matrix(rows_t: int, ry: int):
    """Mv: (rows_t, rows_t*ry) 0/1 matrix contracting each V span's ry
    rows on the MXU (COPY-H plans, where there is no H matmul to shrink
    the width first: the full-width VPU reshape-reduce measured 2.9 ms vs
    0.86 ms for the matmul form on the 4096^2->4096x256 strip -- the
    (rows_t, ry, w) reshape is a sublane relayout of the whole block).
    Every row holds exactly ry ones; the per-row edge adjustments
    (255/256 span-first weight, the image's final-input-row drop) fold
    into the *input* before the matmul exactly like the H path, so the
    biased -128 offset is undone by the uniform +128*ry per output row."""
    m = np.zeros((rows_t, rows_t * ry), dtype=np.int8)
    for j in range(rows_t):
        m[j, j * ry : (j + 1) * ry] = 1
    return m


def _make_kernel(plan: ScalePlan, rows_t: int, planes=False,
                 skip_alpha=False):
    """Kernel over one (batch, row-group) tile.

    Block shapes: x_ref (1, rows_t*Ry, W) u32; m_ref (W, w_out) int8;
    o_ref (1, rows_t, w_out) u32.  With ``planes`` x_ref is
    (1, 3, rows_t*Ry, W) u8 channel-major (24bpp input; plane p =
    surrogate byte p, alpha is the synthesized constant 255 and is
    skipped outright under ``skip_alpha``, i.e. 24bpp output).
    """
    w_in, w_out = plan.x.dim_in, plan.x.dim_out
    h_out = plan.y.dim_out
    h_copy = plan.x.filter == FilterType.COPY
    v_copy = plan.y.filter == FilterType.COPY
    rx = w_in // w_out  # 1 for COPY (dim_in == dim_out)
    ry = plan.y.dim_in // plan.y.dim_out
    n_chunks = 0 if h_copy else _span_chunks(plan.x)
    in_layout = plan.meta_in.layout
    out_layout = plan.meta_out.layout
    span_mul_x = int(plan.x.span_mul)
    span_mul_y = int(plan.y.span_mul)

    unassoc_in = plan.meta_in.alpha == AlphaType.UNASSOCIATED
    alpha_byte = in_layout.index(3)
    assert not planes or (alpha_byte == 3 and not unassoc_in)

    v_mm = h_copy and not v_copy  # MXU V-span matmul (see _vspan_matrix)

    def body(px, m8, o_ref, g):
        # px: (rows_t*ry, w_in) u32, or (3, rows_t*ry, w_in) u8
        if v_mm:
            # input-row index in the whole image: span-first rows (255/256
            # weight) and the final input row (reference precalc drop) are
            # folded into the matmul operand
            row_l = jax.lax.broadcasted_iota(
                jnp.int32, (rows_t * ry, w_in), 0
            )
            grow = g * (rows_t * ry) + row_l
            vspan_first = (row_l % ry == 0) & (grow > 0)
            last_in_row = h_out * ry - 1
        elif not v_copy:
            # output-row index in the whole image, for edge-weight selection
            row_ids = g * rows_t + jax.lax.broadcasted_iota(
                jnp.int32, (rows_t, w_out), 0
            )
        if not h_copy:
            lane = jax.lax.broadcasted_iota(jnp.int32, (rows_t * ry, w_in), 1)
            adj_lane = (lane > 0) & (lane % rx == 0)  # span-first, 0 exempt
            col_last = (
                jax.lax.broadcasted_iota(jnp.int32, (1, w_out), 1) == w_out - 1
            )

        if planes:
            a_vals = None
        else:
            a_vals = (
                (px >> (8 * alpha_byte)) & jnp.uint32(0xFF)
            ).astype(jnp.int32)
        out_px = jnp.zeros((rows_t, w_out), dtype=jnp.uint32)
        for byte_pos in range(4):
            if planes:
                if byte_pos == alpha_byte:
                    if skip_alpha:
                        continue
                    ch_vals = jnp.full((rows_t * ry, w_in), 255, jnp.int32)
                else:
                    ch_vals = px[byte_pos].astype(jnp.int32)
            else:
                ch_vals = (
                    (px >> (8 * byte_pos)) & jnp.uint32(0xFF)
                ).astype(jnp.int32)
            if unassoc_in and byte_pos != alpha_byte:
                # premultiply in-kernel (premul_u_to_p8, generic.c:238-244)
                ch_vals = (((ch_vals + 1) * (a_vals + 1) - 1) >> 8) & 0xFF
            if h_copy:
                # interp_horizontal_copy (generic.c:1594-1611): the h-row
                # is the unpacked (premultiplied) channel itself
                hrow = ch_vals
            else:
                # left-edge weight folded into the input: identity for span
                # 0, x - [x>0] otherwise; rides through the span sum exactly
                chp = ch_vals - (adj_lane & (ch_vals > 0)).astype(jnp.int32)
                xb = (chp ^ 128).astype(jnp.int8)  # xor-cast == chp - 128
                if n_chunks > 1:
                    k_c = w_in // n_chunks
                    y = jnp.concatenate(
                        [
                            jnp.dot(
                                xb[:, c * k_c : (c + 1) * k_c],
                                m8[c * k_c : (c + 1) * k_c, :],
                                preferred_element_type=jnp.int32,
                            )
                            for c in range(n_chunks)
                        ],
                        axis=1,
                    )
                else:
                    y = jnp.dot(xb, m8, preferred_element_type=jnp.int32)
                # undo the -128 offset: colsum is rx per span column (rx-1
                # for the final span, whose last element the matrix drops)
                acc = y + (128 * rx) - jnp.where(col_last, 128, 0)
                hrow = fp.mul_shift_round24(acc, jnp.int32(span_mul_x)) & 0xFF
            if v_copy:
                # scale_outrow_copy (generic.c:2302-2318)
                out_ch = hrow
            elif v_mm:
                # MXU span contraction: subtract the span-first 255/256
                # identity ((v*255)>>8 == v - [v>0]) and zero the dropped
                # final input row IN THE OPERAND, then bias to int8; the
                # dropped row's -128 bias is restored by the uniform
                # +128*ry (its adjusted value is 0, so it contributes
                # nothing) -- additively identical to the reshape-reduce
                # form, hence bit-exact
                adjv = hrow - (vspan_first & (hrow > 0)).astype(jnp.int32)
                adjv = jnp.where(grow == last_in_row, 0, adjv)
                yb = jnp.dot(
                    m8, (adjv ^ 128).astype(jnp.int8),  # == adjv - 128
                    preferred_element_type=jnp.int32,
                )
                accv = yb + 128 * ry
                out_ch = (
                    fp.mul_shift_round24(accv, jnp.int32(span_mul_y)) & 0xFF
                )
            else:
                # vertical: groups of ry rows
                gv = hrow.reshape(rows_t, ry, w_out)
                fsv = jnp.sum(gv, axis=1)
                first = gv[:, 0, :]
                accv = fsv - jnp.where(
                    (row_ids > 0) & (first > 0), jnp.int32(1), jnp.int32(0)
                )
                # drop the image's final input row (reference precalc clamp)
                accv = accv - jnp.where(
                    row_ids == h_out - 1, gv[:, ry - 1, :], 0
                )
                out_ch = (
                    fp.mul_shift_round24(accv, jnp.int32(span_mul_y)) & 0xFF
                )
            # place channel into its output byte
            out_byte = out_layout.index(in_layout[byte_pos])
            out_px = out_px | (out_ch.astype(jnp.uint32) << (8 * out_byte))
        o_ref[0] = out_px

    # every reachable form carries a matrix operand now: box-H plans the
    # span-sum matrix, COPY-H plans the V-span contraction matrix
    # (applicable() guarantees at least one box axis)
    def kernel(x_ref, m_ref, o_ref):
        body(x_ref[0], m_ref[...], o_ref, pl.program_id(1))

    return kernel


def _pick_rows_t(plan: ScalePlan):
    """Output rows per grid step, or None if no Mosaic-legal tiling fits.

    Mosaic requires the output row-block to be 8-aligned unless it spans
    the whole output, so valid choices are divisors of h_out that are
    multiples of 8, or h_out itself (single group) within a looser budget.
    """
    h_out = plan.y.dim_out
    ry = plan.y.dim_in // h_out
    # 4 MB input blocks: measured best on v5e (2.70 ms vs 2.80 at 2 MB for
    # the 4096->256 headline); double-buffered they stay well inside VMEM.
    # Unassociated INPUT premultiplies in-kernel, and its extra live
    # window-sized temporaries (a_vals held across channels + the premul
    # intermediates) hit a Mosaic scoped-VMEM cliff on wide blocks: on-chip
    # fuzz (seed 20260823 --boxchunk) crashed the compiler at 3.87-4.13 MB
    # blocks while 3.19 MB passed, so those plans cap at 3.25 MB (larger
    # ones fall back to the XLA path).
    budget = 4 * 2**20
    if plan.meta_in.alpha == AlphaType.UNASSOCIATED:
        budget = 3_407_872  # 3.25 MB
    h_copy = plan.x.filter == FilterType.COPY
    if h_copy:
        # no H matmul means the per-channel int32 temporaries stay full
        # width (the box-H kernel shrinks them to w_out columns): the live
        # set is ~4.5x the block, and a 4 MB block OOMs the 16 MB scoped
        # VMEM (17.95M measured on 4096^2->4096x256).  On top of that the
        # kernel holds the resident (rows_t, rows_t*ry) int8 V-span matrix
        # plus the full-width (rows_t, W) int32 matmul result; _fits_copy_h
        # bounds those per candidate so tall-output plans (e.g.
        # 128x16016->128x1001: rows_t=1001, ry=16 -> 15.3 MB matrix) fall
        # back to XLA instead of crashing Mosaic at compile time.
        budget = min(budget, 2 * 2**20)

    def _fits_copy_h(t: int) -> bool:
        if not h_copy:
            return True
        return t * t * ry + t * plan.width_in * 4 <= 2 * 2**20

    budget_rows = max(1, budget // (plan.width_in * 4 * ry))
    for t in range(min(budget_rows, h_out), 0, -1):
        if h_out % t == 0 and (t % 8 == 0 or t == h_out) and _fits_copy_h(t):
            return t
    if plan.width_in * 4 * plan.y.dim_in <= 8 * 2**20 and _fits_copy_h(h_out):
        return h_out  # whole output in one block
    return None


def _unpremul_epilogue(plan: ScalePlan, px):
    """Unassociated-output pack on the kernel's packed-u32 result.

    The kernel emits internal premultiplied channels already placed in the
    output byte layout; this output-sized XLA step applies
    ``(v * inv_div_p8[a]) >> 13`` per color (unpremul_p8_to_u_128bpp,
    generic.c:227-236) through the proven two-level LUT select.
    """
    from ..backends import xla  # local: xla imports this module for dispatch
    from .. import luts

    out_layout = plan.meta_out.layout
    alpha_byte = out_layout.index(3)
    a = ((px >> (8 * alpha_byte)) & jnp.uint32(0xFF)).astype(jnp.int32)
    inv = xla._take(xla._LUT["inv_p8"], a)
    res = a.astype(jnp.uint32) << (8 * alpha_byte)
    for byte_pos in range(4):
        if byte_pos == alpha_byte:
            continue
        v = ((px >> (8 * byte_pos)) & jnp.uint32(0xFF)).astype(jnp.int32)
        u = fp.mul_shift_small(v, inv, luts.INVERTED_DIV_SHIFT_P8) & 0xFF
        res = res | (u.astype(jnp.uint32) << (8 * byte_pos))
    return res


@functools.cache
def _built(plan: ScalePlan, batch: int):
    h_out = plan.y.dim_out
    ry = plan.y.dim_in // plan.y.dim_out
    rows_t = _pick_rows_t(plan)
    h_copy = plan.x.filter == FilterType.COPY
    m = _vspan_matrix(rows_t, ry) if h_copy else _span_matrix(plan.x)
    kernel = _make_kernel(plan, rows_t)
    grid = (batch, h_out // rows_t)

    in_specs = [
        pl.BlockSpec(
            (1, rows_t * ry, plan.width_in),
            lambda b, g: (b, g, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(m.shape, lambda b, g: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, h_out, plan.width_out), jnp.uint32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, rows_t, plan.width_out), lambda b, g: (b, g, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    unassoc_out = plan.meta_out.alpha == AlphaType.UNASSOCIATED

    def fn(imgs):
        # (B, H, W, 4) u8 or packed (B, H, W) u32 -> kernel -> (B, h, w, 4) u8.
        # Callers that hold host memory should pass the (free) u32 view: the
        # on-device u8->u32 bitcast is a full tiled-layout copy on TPU
        # (measured ~0.9 ms on the 512 MB headline batch).
        if imgs.dtype == jnp.uint32:
            px = imgs
        else:
            px = jax.lax.bitcast_convert_type(imgs, jnp.uint32)
        out = call(px, jnp.asarray(m))
        if unassoc_out:
            out = _unpremul_epilogue(plan, out)
        return jax.lax.bitcast_convert_type(out, jnp.uint8)

    return fn


def scale_fn(plan: ScalePlan, imgs):
    """(B, H, W, 4) u8 (or packed (B, H, W) u32) -> (B, h, w, 4) u8.
    Caller checks applicable()."""
    squeeze = imgs.ndim == (2 if imgs.dtype == jnp.uint32 else 3)
    if squeeze:
        imgs = imgs[None]
    out = _built(plan, imgs.shape[0])(imgs)
    return out[0] if squeeze else out


@functools.cache
def _built_planes(plan: ScalePlan, batch: int, skip_alpha: bool):
    """Channel-major u8 planes variant of _built for 24bpp inputs: no
    pad-to-32bpp + bitcast relayout, 25% less block DMA, constant alpha
    (skipped when the output drops it)."""
    h_out = plan.y.dim_out
    ry = plan.y.dim_in // plan.y.dim_out
    rows_t = _pick_rows_t(plan)
    h_copy = plan.x.filter == FilterType.COPY
    m = _vspan_matrix(rows_t, ry) if h_copy else _span_matrix(plan.x)
    kernel = _make_kernel(plan, rows_t, planes=True, skip_alpha=skip_alpha)
    grid = (batch, h_out // rows_t)

    in_specs = [
        pl.BlockSpec(
            (1, 3, rows_t * ry, plan.width_in),
            lambda b, g: (b, 0, g, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(m.shape, lambda b, g: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (batch, h_out, plan.width_out), jnp.uint32
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, rows_t, plan.width_out), lambda b, g: (b, g, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    unassoc_out = plan.meta_out.alpha == AlphaType.UNASSOCIATED
    assert not (skip_alpha and unassoc_out)

    def fn(pls):
        out = call(pls, jnp.asarray(m))
        if unassoc_out:
            out = _unpremul_epilogue(plan, out)
        return jax.lax.bitcast_convert_type(out, jnp.uint8)

    return fn


def scale_fn_planes(plan: ScalePlan, pls, skip_alpha: bool):
    """Channel-major (B, 3, H, W) u8 planes -> (B, h, w, 4) u8.  ``plan``
    is the 4-byte surrogate (xla._adapt_24bpp); caller checks
    applicable()."""
    squeeze = pls.ndim == 3
    if squeeze:
        pls = pls[None]
    out = _built_planes(plan, pls.shape[0], skip_alpha)(pls)
    return out[0] if squeeze else out
