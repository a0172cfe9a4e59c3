"""Fused Pallas kernel for the 128bpp non-sRGB (compressed gamma) classes.

Two plan classes force 128bpp storage without linear light:

* **internal PREMUL16** — unassociated input AND output (smolscale.c:751-758):
  channels are premultiplied at 16 bits (v*a <= 65025) so transparent
  pixels keep their color through filtering; alpha rides as (a<<8)|0x80
  (unpack_pixel_*_p16, generic.c:616-634).
* **deep box** (ratio > 255:1 on either axis, smolscale.c:437-446): plain
  8-bit PREMUL8 values in 32-bit lanes so long span sums don't overflow.

The reference gives these real SIMD (128bpp H-bilinear avx2.c:1786-1912,
V-bilinear/box avx2.c:2171-2954); round 1 left them on the XLA op-graph
fallback.  This kernel reuses the general tile geometry (pallas_bilinear)
and the shared wide int32 stages; vs the sRGB kernel it drops the LUT
passes entirely and needs only 2-limb gathers (values < 2**16), so it
runs tighter tiles at a bigger budget.

Value-range proof for the gather matmuls: per-limb f32 span sums <=
255*65535 < 2**24 (exact); recombined int32 sums wrap mod 2**32, and the
true accumulators stay < 2**32 for every planner-legal span (PREMUL16:
65025*65535 < 2**32; vertical: 65535 * 65535 < 2**32 -- the same bounds
that keep the reference's own 32-bit lanes from overflowing), which the
uint32 box normalization (fixedpoint.mul_shift_round24) is exact over.

Packing (unpremul_p16 on output-sized data, generic.c:290-299) stays in
the shared XLA pack.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats import AlphaType, GammaType, StorageType
from ..plan import FilterType, ScalePlan
from . import pallas_bilinear as pg  # shared geometry + wide stages

MASK = 0xFFFFFF  # 128bpp working mask


def applicable(plan: ScalePlan) -> bool:
    return (
        plan.storage == StorageType.S128
        and plan.gamma == GammaType.SRGB_COMPRESSED
        and plan.meta_in.n_bytes in (3, 4)
        and plan.meta_out.n_bytes in (3, 4)
        and (plan.x.filter.is_bilinear or plan.x.filter == FilterType.BOX)
        and (plan.y.filter.is_bilinear or plan.y.filter == FilterType.BOX)
        and _geo(plan) is not None
    )


_GEO128: dict = {}  # timing-only probe knob (benchmarks/probe_128_ablate)


def _geo(plan: ScalePlan):
    # 2-limb gathers double the geometry's matmul estimate; deep-box spans
    # inflate windows, so let the geometry search shrink tiles as needed.
    kw = dict(jc_out_max=128, budget_mb=6, t_max=32, uniform_ok=True,
              v_chunk_ok=False)
    if (
        plan.internal_alpha == AlphaType.PREMUL16
        and plan.x.filter.is_bilinear
        and plan.y.filter.is_bilinear
        and plan.x.filter.n_halvings >= 1
        and plan.y.filter.n_halvings >= 1
    ):
        # probe_128_ablate (config 7): at jc_out=256 the ladder span
        # matrix splits into two half-window column chunks
        # (_col_chunk_spans), halving the H matmul MACs -- 0.556 ->
        # 0.474 ms bit-exact; jc_out=128 windows are one chunk (no win).
        # Ladder (>=1h) plans only: the probe covered that class, and a
        # 0h dense PREMUL16 upscale hits a geometry V-matrix/window row
        # mismatch at this budget (trace-time shape error).
        kw.update(jc_out_max=256, budget_mb=12)
    kw.update(_GEO128)
    return pg._geometry(plan, **kw)


def _make_kernel(plan: ScalePlan, geo):
    in_layout = plan.meta_in.layout
    if plan.meta_in.n_bytes == 3:
        # 24bpp input arrives padded with a synthesized 255 alpha
        # (unpack_pixel_123_*, generic.c:353-358)
        in_layout = in_layout + (3,)
    alpha_byte = in_layout.index(3)
    premul16 = plan.internal_alpha == AlphaType.PREMUL16
    in_premul = plan.meta_in.alpha == AlphaType.PREMUL8
    win_r, win_c = geo["win_r"], geo["win_c"]
    span_mul_x, span_mul_y = geo["span_mul_x"], geo["span_mul_y"]
    # channel values: PREMUL16 <= 65408 -> 2 limbs; deep-box PREMUL8 <= 255
    h_limbs = 2 if premul16 else 1
    # post-H values are <= 0xFFFF either way (box norm mask / lerp bound)
    v_limbs = 2

    def kernel(rs_ref, cs_ref, x_any, mh_ref, hfac_ref, mv_ref, vfac_ref,
               o_ref, xwin, sem):
        cs = pl.multiple_of(cs_ref[pl.program_id(2)], 128)
        if pg._ABLATE == "nodma":  # timing-only: compute on stale VMEM
            # (probe_r5_i: nodma 0.529 ms vs full 0.429 -- removing the
            # window DMA does NOT speed the kernel up, so the
            # double-buffered fetch is already hidden behind compute)
            px = xwin[0]
        else:
            px = pg._window_dma(
                rs_ref, cs_ref, x_any, xwin, sem, win_r, win_c,
                pl.program_id(0), pl.program_id(1), pl.program_id(2),
            )
        mh = mh_ref[0]
        mv = mv_ref[0]

        a_vals = ((px >> (8 * alpha_byte)) & jnp.uint32(0xFF)).astype(jnp.int32)
        if premul16 and pg._ABLATE != "nopremul":
            # SWAR pair products: ONE u32 multiply forms two channels'
            # v*a 16-bit products in independent halves (v*a <= 65025 <
            # 2**16, no carry; generic.c:616-634), and the third color
            # packs beside the (a<<8)|0x80 alpha word.  For the f=128
            # uniform ladder the lerp also runs on the packed pairs --
            # floor-average per 16-bit lane, (p & q) + (((p ^ q) >> 1)
            # & 0x7FFF7FFF), exact because averages of 16-bit values
            # stay 16-bit and the masked shift stops the high half's
            # low bit from leaking (the 128bpp twin of the 64bpp
            # kernel's _avg_floor_packed).
            a_u = a_vals.astype(jnp.uint32)
            pb = (0, 2) if alpha_byte in (1, 3) else (1, 3)
            sb = next(b for b in range(4)
                      if b != alpha_byte and b not in pb)
            rp = (px if pb[0] == 0 else px >> 8) & jnp.uint32(0x00FF00FF)
            rp = rp * a_u
            aw = ((a_u << 8) | jnp.uint32(0x80))
            rs = ((px >> (8 * sb)) & jnp.uint32(0xFF)) * a_u
            rsa = rs | (aw << 16)
            pre_avg16 = (
                geo["h_lad"] is not None and geo["h_lad"][1] == 128
                and pg._ABLATE is None
            )
            if pre_avg16:
                m15 = jnp.uint32(0x7FFF7FFF)

                def _avg16(p):
                    q = jnp.roll(p, -1, axis=1)
                    return (p & q) + (((p ^ q) >> jnp.uint32(1)) & m15)

                rp, rsa = _avg16(rp), _avg16(rsa)
            halves = {in_layout[pb[0]]: (rp, False),
                      in_layout[pb[1]]: (rp, True),
                      in_layout[sb]: (rsa, False),
                      3: (rsa, True)}
        else:
            pre_avg16 = False
        # Channel-stacked H ladder matmuls (PREMUL16 uniform f=128): all
        # four channels' biased byte limbs concatenate along sublanes so
        # each limb's span matmul runs ONCE at M = 4*win_r instead of
        # four times at M = win_r, and limb prep comes straight off the
        # packed 16-bit pair streams: 8 shift+xor+cast passes feed all 8
        # limb planes (vs per-channel extraction + per-limb prep).
        # (pallas_deep's alpha limb-0 skip does NOT apply here: the
        # pre-average runs BEFORE the matmul, and avg((a1<<8)|0x80,
        # (a2<<8)|0x80) carries into bit 8 when a1+a2 is odd, so the
        # averaged alpha word's low byte is 0x80 or 0x00 -- not
        # constant.  Found by the CPU exactness tests.)
        stacked = pre_avg16 and geo["h_lad"] is not None
        if stacked:
            wr = win_r

            def _lb(lane_, extra):
                src, hi = halves[lane_]
                return (
                    (src >> jnp.uint32((16 if hi else 0) + extra))
                    ^ jnp.uint32(0x80)
                ).astype(jnp.int8)

            l1 = jnp.concatenate([_lb(l, 8) for l in range(4)], axis=0)
            l0 = jnp.concatenate([_lb(l, 0) for l in range(4)], axis=0)
            sp = None if geo["h_spans"] is None else geo["h_spans"][0]

            def _dot(v, m):
                return jnp.dot(v, m, preferred_element_type=jnp.int32)

            y1 = pg._mm_spans(l1, mh, sp, _dot)
            y0 = pg._mm_spans(l0, mh, sp, _dot)
            corr = hfac_ref[0, 1:2, : geo["jc_out"]]
            y = (y1 << 8) + y0 + corr
            kh = geo["kh"]
            s_all = ((y >> kh) & MASK) if kh else y
        for lane in range(4):
            byte_pos = in_layout.index(lane)
            if stacked:
                s = s_all[lane * wr : (lane + 1) * wr]
            elif premul16 and pg._ABLATE == "nopremul":
                # timing-only: a 16-bit-scale stand-in without the SWAR
                # premultiply products (keeps the 2-limb matmul shape)
                ch = (
                    ((px >> (8 * byte_pos)) & jnp.uint32(0xFF)) << 8
                ).astype(jnp.int32)
            elif premul16:
                src, hi = halves[lane]
                ch = (
                    src >> jnp.uint32(16) if hi else src & jnp.uint32(0xFFFF)
                ).astype(jnp.int32)
            elif lane == 3:
                ch = a_vals
            else:
                v8 = ((px >> (8 * byte_pos)) & jnp.uint32(0xFF)).astype(jnp.int32)
                if in_premul:
                    ch = v8
                else:
                    # premul_u_to_p8 (generic.c:238-244)
                    ch = (((v8 + 1) * (a_vals + 1) - 1) >> 8) & 0xFF
            if stacked:
                pass  # s already sliced from the stacked-limb H result
            elif pg._ABLATE in ("nohmm", "nofilter"):
                # timing-only: keep the data dependency, skip the H stage
                rep = -(-geo["jc_out"] // ch.shape[1])
                s = (jnp.concatenate([ch] * rep, axis=1)[:, : geo["jc_out"]]
                     if rep > 1 else ch[:, : geo["jc_out"]])
            elif geo["h_uniform"]:
                # PREMUL16 compressed <= 65535: two biased-8 limbs;
                # deep-box PREMUL8 <= 255: one (see _uniform_span_mm)
                s = pg._h_uniform_stage(
                    ch, mh, hfac_ref, geo, cs, plan.width_out, span_mul_x,
                    0xFFFF, 3 if premul16 else 2,
                )
            elif geo["h_lad"] is not None:
                s = pg._h_uniform_ladder_stage(
                    ch, mh, hfac_ref, geo, MASK, 3 if premul16 else 2,
                    pre_lerped=pre_avg16,
                )
            elif geo["h_lmap"]:
                s = pg._h_lerpmap_stage(
                    ch, mh, hfac_ref, geo, MASK, geo["l8_in"]
                )
            elif geo["h_is_box"]:
                s = pg._h_box_fold_stage(
                    ch, mh, hfac_ref, geo, span_mul_x, MASK, 0xFFFF,
                    geo["l8_in"],
                )
            else:
                sp = None if geo["h_spans"] is None else geo["h_spans"][0]
                y = pg._gather_mm(ch, mh, h_limbs, spans=sp)
                s = pg._h_stage_i32(y, hfac_ref, geo, span_mul_x, MASK, 0xFFFF)
            if pg._ABLATE in ("novmm", "nohmm", "nofilter"):
                # timing-only; broadcast so the shapes still lower
                sv = jnp.broadcast_to(s[:1, :], (geo["t"], s.shape[-1]))
            elif geo["v_uniform"]:
                sv = pg._v_uniform_stage(
                    s, geo, pl.program_id(1), plan.height_out, span_mul_y,
                    MASK, 0xFFFF,
                )
            elif geo["v_lad"] is not None:
                sv = pg._v_uniform_ladder_stage(s, geo, MASK)
            elif geo["v_lmap"]:
                sv = pg._v_lerpmap_stage(
                    s, mv, vfac_ref, geo, MASK, geo["l8_v"]
                )
            elif geo["v_is_box"]:
                sv = pg._v_box_fold_stage(
                    s, mv, vfac_ref, geo, span_mul_y, MASK, 0xFFFF,
                    geo["l8_v"],
                )
            else:
                yv = pg._gather_mm(s, mv, v_limbs, transpose=True)
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
