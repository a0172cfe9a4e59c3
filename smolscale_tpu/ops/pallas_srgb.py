"""Fused Pallas kernel for the sRGB-linear (128bpp) pipeline.

The linear-light path (with_srgb=True, smolscale.c:844 + the 128bpp storage
rule smolscale.c:437) is LUT-heavy: every *input* pixel's channels pass
through the 256-entry sRGB->11-bit-linear table (smolscale.c:87-111) before
filtering.  The lookup runs on the VPU's dynamic-gather unit: Mosaic lowers
lane-axis take_along_axis at exactly 128 lanes to tpu.DynamicGatherOp, so
each 128-lane window slice gathers from both 128-entry table halves and
selects on the index's top bit (~6 VPU ops per lookup; round 2's one-hot
MXU matmul + masked-reduce pipeline needed ~80 and was the single largest
cost in the round-2 ablation, 4.4 of 8.25 ms on config 6).

Scope (config-6 class): gamma LINEAR, 24/32bpp in/out, every alpha combo
(internal PREMUL16 when input and output are both unassociated, otherwise
PREMUL8-linear; premultiplied inputs unpremultiply in-kernel via the
alpha-indexed inv-div LUT; 24bpp inputs arrive padded with a synthesized
255 alpha); filters bilinear/box per axis under the same geometry as the
general kernel.  The filter stage reuses the general kernel's tile geometry
with 3x8-bit limb-split gather matmuls (values up to 2**24).  Packing
(unpremultiply + to-sRGB on *output*-sized data) stays in the XLA path:
the kernel emits filtered int32 planes, so the reference's asymmetric
24bpp linear pack variants (generic.c:922-935 vs 1010-1023) come for free
from the shared pack.

>8191:1 ratios (compressed-gamma fallback) go to XLA; box-x-box is fused
too since round 2 (the round-1 scoped-VMEM overflow came from the slab
scratch buffers, which the whole-window LUT removed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import luts
from ..formats import AlphaType, GammaType, StorageType
from ..plan import FilterType, ScalePlan
from . import pallas_bilinear as pg  # shared tile geometry


_ABLATE = None  # timing-only kernel ablation knob (benchmarks/probe_srgb_ablate)


def applicable(plan: ScalePlan) -> bool:
    if not (
        plan.storage == StorageType.S128
        and plan.gamma == GammaType.SRGB_LINEAR
        and plan.meta_in.n_bytes in (3, 4)
        and plan.meta_out.n_bytes in (3, 4)
        and (plan.x.filter.is_bilinear or plan.x.filter == FilterType.BOX)
        and (plan.y.filter.is_bilinear or plan.y.filter == FilterType.BOX)
    ):
        return False
    return _geo(plan) is not None


def _dense_ladder(ax) -> bool:
    """Bilinear axis whose samples need the dense gather matmul (stride or
    fraction varies, so the uniform-ladder fast path can't take it)."""
    if not ax.filter.is_bilinear:
        return False
    o = np.asarray(ax.offsets)
    f = np.asarray(ax.factors)
    if len(o) < 2:
        return True
    d = int(o[1] - o[0])
    return not (d >= 2 and (np.diff(o) == d).all() and (f == f[0]).all())


def _geo(plan: ScalePlan):
    # Tighter tiles than the 64bpp kernel: every gather matmul here runs 3
    # limb passes and values are 4-byte, so the real VMEM/code footprint is
    # ~3x the geometry's estimate.  Dense-ladder-x-dense-ladder plans (the
    # 6b class) are grid-step-bound at t=16 and take a larger row group
    # (measured 3.33 -> 2.95 ms on 1920x1080->400x225); box-bearing plans
    # stay small -- their 3*jc_out matrices blow the 16 MB scoped-VMEM
    # limit at larger budgets (compile-verified on chip).
    if _dense_ladder(plan.x) and _dense_ladder(plan.y):
        g = pg._geometry(plan, jc_out_max=128, budget_mb=6, t_max=32,
                         uniform_ok=True, v_chunk_ok=False)
        if g is not None:
            return g
    from ..backends.xla import _box_uniform_applicable

    if all(
        ax.filter == FilterType.BOX and _box_uniform_applicable(ax)
        for ax in (plan.x, plan.y)
    ):
        # uniform box x box has NO 3*jc_out box matrices (plain span-sum
        # matrix, reshape-reduce V), so the larger row group is safe;
        # measured 1.272 -> 1.158 ms on config 6 (2048^2->256^2 sRGB, v5e)
        g = pg._geometry(plan, jc_out_max=128, budget_mb=6, t_max=32,
                         uniform_ok=True, v_chunk_ok=False)
        if g is not None and g["h_uniform"] and g["v_uniform"]:
            return g
    return pg._geometry(plan, jc_out_max=128, budget_mb=4, t_max=16,
                        uniform_ok=True, v_chunk_ok=False)


def _lut_tables():
    """(4, 128) int32 table pack for the VPU dynamic-gather unit.

    Row 0 holds BOTH from_srgb halves (11-bit values, smolscale.c:87):
    entry l = t[l] | (t[l+128] << 16), so one gather + a top-bit shift
    replaces two gathers + a select.  inv_div_p8 entries reach 2**21
    (smolscale.c:276) and don't pack; rows 2/3 are its halves.

    Row 1 packs the WHOLE constant-alpha-255 P8L channel transform of the
    24bpp planes feed: unpremul_p8 at a=255 ((v*inv_div_p8[255])>>13, the
    identity -- verified exhaustively), from_srgb, then premul_ul_to_p8l
    at a=255 (((l+1)*2041-1)>>11, generic.c:261-269) composed per entry at
    table-build time.  Folded values top out at 2040 (11 bits), so both
    halves pack like row 0 and the planes kernels replace
    unpremul + gather + premul (~8 VPU ops/element) with ONE gather.
    """
    t = np.zeros((4, 128), dtype=np.int32)
    fs = np.asarray(luts.FROM_SRGB, dtype=np.int64)
    t[0] = (fs[:128] | (fs[128:] << 16)).astype(np.int32)
    inv255 = int(luts.INV_DIV_P8[255])
    v = np.arange(256, dtype=np.int64)
    l11 = fs[((v * inv255) >> 13) & 0xFF]
    f255 = (((l11 + 1) * ((255 << 3) + 1) - 1) >> 11) & 0x7FF
    t[1] = (f255[:128] | (f255[128:] << 16)).astype(np.int32)
    t[2] = luts.INV_DIV_P8[:128]
    t[3] = luts.INV_DIV_P8[128:]
    return t


def lut_gather(idx_2d, row_lo, row_hi):
    """256-entry table[idx] on the VPU dynamic-gather unit.

    Mosaic lowers lane-axis take_along_axis to tpu.DynamicGatherOp only at
    exactly 128 lanes with equal src/idx shapes, so each 128-lane slice of
    the window gathers from the 128-entry table row(s).  With ``row_hi``
    None the table's two halves are packed 16/16 into one int32 row
    (_lut_tables) and a top-bit shift extracts the half; otherwise two
    gathers select on the index's top bit.  ~6 VPU ops/lookup, vs ~80 for
    the round-2 one-hot-matmul + masked-reduce pipeline it replaced
    (measured 30+ vs 19 Glookup/s standalone; no MXU traffic at all).
    """
    r, c = idx_2d.shape
    src_lo = jnp.broadcast_to(row_lo, (r, 128))
    src_hi = None if row_hi is None else jnp.broadcast_to(row_hi, (r, 128))
    parts = []
    for k in range(c // 128):
        sl = idx_2d[:, k * 128 : (k + 1) * 128]
        lo7 = sl & 127
        g_lo = jnp.take_along_axis(src_lo, lo7, axis=1)
        if row_hi is None:  # both halves packed 16/16 in one row
            parts.append((g_lo >> ((sl >> 7) << 4)) & 0xFFFF)
        else:
            g_hi = jnp.take_along_axis(src_hi, lo7, axis=1)
            parts.append(jnp.where(sl < 128, g_lo, g_hi))
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]


def _make_kernel(plan: ScalePlan, geo, planes=False):
    """``planes``: channel-major (B, 3, H, W) u8 feed for 24bpp inputs;
    the synthesized 255 alpha becomes trace-time constants (the
    alpha-indexed inv-div gather and the premul factors fold away)."""
    in_layout = plan.meta_in.layout
    if plan.meta_in.n_bytes == 3:
        # 24bpp input arrives padded with a synthesized 255 alpha at byte 3
        # (unpack_pixel_123_*, generic.c:353-358 filters it like any channel)
        in_layout = in_layout + (3,)
    alpha_byte = in_layout.index(3)
    assert not planes or plan.meta_in.n_bytes == 3
    premul16 = plan.internal_alpha == AlphaType.PREMUL16
    kh, kv = geo["kh"], geo["kv"]
    t, tv = geo["t"], geo["t"] << kv
    jc, jc_out = geo["jc"], geo["jc_out"]
    win_r, win_c = geo["win_r"], geo["win_c"]
    h_is_box, v_is_box = geo["h_is_box"], geo["v_is_box"]
    span_mul_x, span_mul_y = geo["span_mul_x"], geo["span_mul_y"]
    MASK = 0xFFFFFF  # 128bpp working mask (generic.c:1350 etc.)

    in_premul = plan.meta_in.alpha == AlphaType.PREMUL8
    # limb counts by value bound: PREMUL16-linear colors reach 2047*255 <
    # 2**20 (3 limbs); P8L values <= 2047 and the alpha plane <= 65408 need
    # 2.  The V gather sees H output: box-normalized <= 0xFFFF (2 limbs),
    # bilinear bounded by its inputs (convexity).
    def h_limbs(lane):
        # the alpha plane tops at 65408 even under PREMUL16 -> 2 limbs
        return 3 if (premul16 and lane != 3) else 2

    def v_limbs(lane):
        return 2 if (h_is_box or not premul16 or lane == 3) else 3

    def kernel(rs_ref, cs_ref, x_any, mh_ref, hfac_ref, mv_ref, vfac_ref,
               tbl_ref, o_ref, xwin, sem):
        gr = pl.program_id(1)
        gc = pl.program_id(2)
        cs = pl.multiple_of(cs_ref[gc], 128)
        px = pg._window_dma(
            rs_ref, cs_ref, x_any, xwin, sem, win_r, win_c,
            pl.program_id(0), gr, gc, planes=planes,
        )
        mh = mh_ref[0]
        mv = mv_ref[0]
        tbl = tbl_ref[...]

        if planes:
            # synthesized alpha == 255 everywhere: the inv-div factor is
            # the trace-time scalar inv_div_p8[255] and the premul factors
            # fold into constants (XLA constant-folds the arithmetic)
            a_vals = None
            ascratch_vals = int(luts.INV_DIV_P8[255]) if in_premul else None
        else:
            a_vals = (
                (px >> (8 * alpha_byte)) & jnp.uint32(0xFF)
            ).astype(jnp.int32)
            if in_premul:
                # alpha-indexed inverse-division factor for unpremultiplying
                # premultiplied inputs before linearization (generic.c:488-502)
                ascratch_vals = lut_gather(a_vals, tbl[2:3], tbl[3:4])
        for lane in range(4):
            byte_pos = in_layout.index(lane)
            if lane == 3:
                # alpha plane: (a<<8)|0x80 for PREMUL16
                # (unpack_pixel_*_p16, generic.c:616-626), plain a for P8L
                if planes:
                    const = ((255 << 8) | 0x80) if premul16 else 255
                    ch = jnp.full((win_r, win_c), const, jnp.int32)
                else:
                    ch = ((a_vals << 8) | 0x80) if premul16 else a_vals
            elif planes and not premul16 and _ABLATE is None:
                # 24bpp planes: the constant-alpha-255 unpremul ->
                # linearize -> premul_ul_to_p8l composite is ONE gather
                # from the folded table row (see _lut_tables row 1)
                ch = lut_gather(px[byte_pos].astype(jnp.int32),
                                tbl[1:2], None)
            else:
                if planes:
                    v8 = px[byte_pos].astype(jnp.int32)
                else:
                    v8 = (
                        (px >> (8 * byte_pos)) & jnp.uint32(0xFF)
                    ).astype(jnp.int32)
                if in_premul:
                    # unpremul_p8 (generic.c:227-236): v*inv>>13, v*inv < 2**29
                    v8 = ((v8 * ascratch_vals) >> 13) & 0xFF
                if _ABLATE in ("nolut", "nofilter"):
                    l11 = v8
                else:
                    l11 = lut_gather(v8, tbl[0:1], None)
                a_term = 255 if planes else a_vals
                if premul16:
                    ch = l11 * a_term  # <= 2047*255 < 2**19
                else:
                    # premul_ul_to_p8l (generic.c:261-269)
                    ch = (((l11 + 1) * ((a_term << 3) + 1) - 1) >> 11) & 0x7FF

            # H filter (shared wide stages, pallas_bilinear)
            if _ABLATE == "gatherall":
                # timing-only: skip filters but SUM all column slices so
                # no gather is dead-code-eliminated (the plain nohmm slice
                # lets Mosaic trim the chain to 1/(win_c/jc_out) of the
                # gathers -- it measured below nolut, which is impossible)
                s = sum(
                    ch[:, k * 128 : (k + 1) * 128]
                    for k in range(win_c // 128)
                )[: geo["win_r"], : geo["jc_out"]]
            elif _ABLATE in ("nohmm", "nofilter"):
                s = ch[: geo["win_r"], : geo["jc_out"]]
            elif geo["h_uniform"]:
                # PREMUL16 values < 2**20 need 3 int8 limbs; P8L < 2**11
                # takes the u7 split pair (see _uniform_span_mm)
                s = pg._h_uniform_stage(
                    ch, mh, hfac_ref, geo, cs, plan.width_out, span_mul_x,
                    0xFFFF, 3 if premul16 else 2,
                )
            elif geo["h_lad"] is not None:
                s = pg._h_uniform_ladder_stage(
                    ch, mh, hfac_ref, geo, MASK, 3 if premul16 else 2
                )
            elif geo["h_lmap"]:
                # lerped values stay within the input bound (convexity):
                # PREMUL16 < 2**19 -> 3 7-bit limbs, P8L <= 2047 -> 2
                s = pg._h_lerpmap_stage(
                    ch, mh, hfac_ref, geo, MASK, geo["l8_in"]
                )
            elif h_is_box:
                s = pg._h_box_fold_stage(
                    ch, mh, hfac_ref, geo, span_mul_x, MASK, 0xFFFF,
                    geo["l8_in"],
                )
            else:
                sp = None if geo["h_spans"] is None else geo["h_spans"][0]
                y = pg._gather_mm(ch, mh, h_limbs(lane), spans=sp)
                s = pg._h_stage_i32(y, hfac_ref, geo, span_mul_x, MASK, 0xFFFF)
            if _ABLATE in ("novmm", "nohmm", "nofilter", "gatherall"):
                sv = s[: geo["t"], :]
            elif geo["v_uniform"]:
                sv = pg._v_uniform_stage(
                    s, geo, gr, plan.height_out, span_mul_y, MASK, 0xFFFF
                )
            elif geo["v_lad"] is not None:
                sv = pg._v_uniform_ladder_stage(s, geo, MASK)
            elif geo["v_lmap"]:
                # box-H output <= 0xFFFF needs 3 limbs like PREMUL16
                sv = pg._v_lerpmap_stage(
                    s, mv, vfac_ref, geo, MASK, geo["l8_v"]
                )
            elif v_is_box:
                sv = pg._v_box_fold_stage(
                    s, mv, vfac_ref, geo, span_mul_y, MASK, 0xFFFF,
                    geo["l8_v"],
                )
            else:
                yv = pg._gather_mm(s, mv, v_limbs(lane), transpose=True)
                sv = pg._v_stage_i32(yv, vfac_ref, geo, span_mul_y, MASK, 0xFFFF)
            o_ref[0, lane] = sv

    return kernel


@functools.cache
def _built(plan: ScalePlan, batch: int):
    geo = _geo(plan)
    kernel = _make_kernel(plan, geo)
    t, jc_out = geo["t"], geo["jc_out"]
    grid = (batch, geo["n_rg"], geo["n_ct"])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (1,) + geo["mh"].shape[1:],
                lambda b, gr, gc, *_: (gc, 0, 0), memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1,) + geo["hfac"].shape[1:],
                lambda b, gr, gc, *_: (gc, 0, 0), memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1,) + geo["mv"].shape[1:],
                lambda b, gr, gc, *_: (gr, 0, 0), memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1,) + geo["vfac"].shape[1:],
                lambda b, gr, gc, *_: (gr, 0, 0), memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (4, 128), lambda b, gr, gc, *_: (0, 0), memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, t, jc_out), lambda b, gr, gc, *_: (b, 0, gr, gc),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, geo["win_r"], geo["win_c"]), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (batch, 4, geo["h_out_pad"], geo["w_out_pad"]), jnp.int32
        ),
        grid_spec=grid_spec,
    )

    h_in, w_in = plan.height_in, plan.width_in
    h_out, w_out = plan.height_out, plan.width_out
    tables = _lut_tables()

    pad_in = plan.meta_in.n_bytes == 3

    def fn(imgs_u8):
        from ..backends.xla import _pack

        if imgs_u8.dtype == jnp.uint32:  # pre-packed pixel view
            px = imgs_u8
        else:
            if pad_in:
                pad = [(0, 0)] * (imgs_u8.ndim - 1) + [(0, 1)]
                imgs_u8 = jnp.pad(imgs_u8, pad, constant_values=255)
            px = jax.lax.bitcast_convert_type(imgs_u8, jnp.uint32)
        if geo["h_pad"] != h_in or geo["w_pad"] != w_in:
            px = jnp.pad(
                px,
                [(0, 0), (0, geo["h_pad"] - h_in), (0, geo["w_pad"] - w_in)],
            )
        planes = call(
            jnp.asarray(geo["rstart"]), jnp.asarray(geo["cstart"]), px,
            jnp.asarray(geo["mh"]), jnp.asarray(geo["hfac"]),
            jnp.asarray(geo["mv"]), jnp.asarray(geo["vfac"]),
            jnp.asarray(tables),
        )
        planes = planes[:, :, :h_out, :w_out]
        return _pack(plan, planes)

    return fn


def scale_fn(plan: ScalePlan, imgs):
    """(B, H, W, nb_in) u8 -> (B, h, w, nb_out) u8.  Caller checks applicable()."""
    squeeze = imgs.ndim == (2 if imgs.dtype == jnp.uint32 else 3)
    if squeeze:
        imgs = imgs[None]
    out = _built(plan, imgs.shape[0])(imgs)
    return out[0] if squeeze else out


@functools.cache
def _built_planes(plan: ScalePlan, batch: int):
    """Channel-major u8 planes variant of _built for 24bpp inputs: no
    pad-to-32bpp + bitcast relayout, 25% less window DMA, and the
    alpha-indexed inv-div gather plus premul factors constant-fold."""
    geo = _geo(plan)
    kernel = _make_kernel(plan, geo, planes=True)
    t, jc_out = geo["t"], geo["jc_out"]
    grid = (batch, geo["n_rg"], geo["n_ct"])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (1,) + geo["mh"].shape[1:],
                lambda b, gr, gc, *_: (gc, 0, 0), memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1,) + geo["hfac"].shape[1:],
                lambda b, gr, gc, *_: (gc, 0, 0), memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1,) + geo["mv"].shape[1:],
                lambda b, gr, gc, *_: (gr, 0, 0), memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1,) + geo["vfac"].shape[1:],
                lambda b, gr, gc, *_: (gr, 0, 0), memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (4, 128), lambda b, gr, gc, *_: (0, 0), memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, t, jc_out), lambda b, gr, gc, *_: (b, 0, gr, gc),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 3, geo["win_r"], geo["win_c"]), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (batch, 4, geo["h_out_pad"], geo["w_out_pad"]), jnp.int32
        ),
        grid_spec=grid_spec,
    )

    h_in, w_in = plan.height_in, plan.width_in
    h_out, w_out = plan.height_out, plan.width_out
    tables = _lut_tables()

    def fn(pls):
        from ..backends.xla import _pack

        if geo["h_pad"] != h_in or geo["w_pad"] != w_in:
            pls = jnp.pad(
                pls,
                [(0, 0), (0, 0), (0, geo["h_pad"] - h_in),
                 (0, geo["w_pad"] - w_in)],
            )
        planes = call(
            jnp.asarray(geo["rstart"]), jnp.asarray(geo["cstart"]), pls,
            jnp.asarray(geo["mh"]), jnp.asarray(geo["hfac"]),
            jnp.asarray(geo["mv"]), jnp.asarray(geo["vfac"]),
            jnp.asarray(tables),
        )
        planes = planes[:, :, :h_out, :w_out]
        return _pack(plan, planes)

    return fn


def scale_fn_planes(plan: ScalePlan, pls):
    """Channel-major (B, 3, H, W) u8 planes -> (B, h, w, nb_out) u8.
    24bpp-input plans only; caller checks applicable()."""
    squeeze = pls.ndim == 3
    if squeeze:
        pls = pls[None]
    out = _built_planes(plan, pls.shape[0])(pls)
    return out[0] if squeeze else out
