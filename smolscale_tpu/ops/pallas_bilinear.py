"""General fused Pallas TPU scaling kernel: bilinear(+halvings) and/or
non-uniform box per axis, 64bpp storage.  (Integer-ratio box-x-box plans
take the cheaper reshape-reduce kernel in pallas_box.py; this one covers
everything else the 64bpp premul pipeline can express.)

The XLA op-graph path materializes unpacked planes and gathered p/q sample
arrays in HBM (~16 bytes per input pixel per stage), which bounds these
configs at HBM bandwidth.  This kernel runs the whole
unpack -> H-filter -> V-filter -> pack pipeline on one VMEM tile,
so HBM sees the u8 input once plus the small output.

Per grid step (batch b, output-row group gr, output-col tile gc):

* a 2D input window is DMA'd from HBM: rows [rstart[gr], +WINR) x cols
  [cstart[gc], +WINC), both starts scalar-prefetched (windows are irregular
  because bilinear offsets are fixed-point positions, precalc_bilinear
  generic.c:14-66);
* horizontal p/q sample gathers ride the MXU as a one-hot matmul against a
  per-tile (WINC, 2*JC) matrix; sample columns are ordered k*JCout + j so
  the halving-ladder sum (interp_horizontal_bilinear_Nh, generic.c:1290-1361)
  is a sublane reduction over a leading axis, never a minor-dim reshape;
* vertical gathers are a second one-hot matmul (2*T*2^kv, WINR) applied to
  the h-scaled tile, same ordering trick for the vertical ladder
  (scale_outrow_bilinear_Nh, generic.c:1841-1916);
* the integer lerp ((p-q)*F>>8)+q runs on the VPU via the proven uint32
  form (ops.fixedpoint.lerp256); packing assembles u32 pixels.

Applicability: both axes BILINEAR_0H..6H, 64bpp storage, 4-byte formats,
PREMUL8 internal (unassociated input premultiplied in-kernel; unassociated
output unpremultiplied by pallas_box's output-sized XLA epilogue).
Everything else falls back to the XLA path.
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


def _limbs8(plan: ScalePlan, post_h: bool) -> int:
    """Biased-8-bit-limb count for the filter-stage operand bound.

    S64 values are bytes (1 limb).  128bpp: PREMUL16-linear < 2**19 (3),
    PREMUL16-compressed <= 65408 and P8L-linear <= 2047 (2),
    PREMUL8-compressed deep-box bytes (1); V stages behind a box H see the
    <= 0xFFFF normalized values (2).
    """
    if plan.storage == StorageType.S64:
        return 1
    premul16 = plan.internal_alpha == AlphaType.PREMUL16
    linear = plan.gamma == GammaType.SRGB_LINEAR
    if post_h and plan.x.filter == FilterType.BOX:
        return 2
    if premul16:
        return 3 if linear else 2
    return 2 if linear else 1


def _u7s(plan: ScalePlan, post_h: bool):
    """Shift for the unbiased split-limb matmul (_span_mm_u7), or None.

    Applicable when the stage's value bound is < 2**14 but > 255 (two
    limbs either way, so the cheaper unbiased prep wins; byte values keep
    the single biased matmul): exactly the P8L linear class (values
    <= 2047), except V stages behind a box H, which see the <= 0xFFFF
    normalized values.
    """
    if plan.storage != StorageType.S64 and (
        plan.internal_alpha != AlphaType.PREMUL16
        and plan.gamma == GammaType.SRGB_LINEAR
        and not (post_h and plan.x.filter == FilterType.BOX)
    ):
        return 7
    return None


def _wrap_i32(v):
    """mod-2**32 bias corrections as int32 (the accumulator contract)."""
    return (
        (np.asarray(v, dtype=np.int64) & 0xFFFFFFFF)
        .astype(np.uint32)
        .astype(np.int32)
    )


_ABLATE = None  # timing-only stage ablation knob (benchmarks/probe_bilinear_ablate)

_CHUNK_H = True        # probe kill-switch for block-diagonal H chunking
_CHUNK_V = True        # probe kill-switch for K-chunked dense V matmuls
_CHUNK_MIN_SAVE = 1.25  # emit spans only when the MAC saving clears this


def _round_up(x, m):
    return -(-x // m) * m


def _col_chunk_spans(m_stack, n_blocks=1):
    """Static block-diagonal column chunking for the H gather matmuls.

    Downscale gather/span matrices are nearly banded: each output column
    reads a narrow run of input lanes, and runs advance with the column.
    The dense (win_c, C) matmul pays full contraction against every
    column tile; cutting columns into 128-wide chunks and contracting
    each only over the 128-aligned hull of its nonzero rows (across ALL
    tiles -- the kernel is one program, so slices must be valid for every
    tile g) drops MACs by the band ratio and is bit-identical: the
    dropped rows are zero in the chunk's columns for every tile, so they
    contribute exactly 0.  The same trick took the integer-box kernel
    36 -> 172 Gpix/s (pallas_box._span_chunks); this generalizes it to
    every H matmul form from the matrices' actual nonzero extents, with
    no monotonicity assumption.

    ``m_stack``: (n_tiles, win_c, C) numpy stack; ``n_blocks`` logical
    column blocks of C // n_blocks columns each (the box stages slice the
    matrix into [A|R] / [A|L|R] blocks and run separate matmuls).
    Returns a tuple of per-block span-tuples ((r0, r1, c0, c1), ...) with
    block-local col bounds, or None when chunking saves < _CHUNK_MIN_SAVE
    in MACs (per-matmul overhead would eat the win) or alignment rules it
    out (col boundaries must be 128-aligned for lane-dim slicing).
    """
    if not _CHUNK_H:
        return None
    m = np.asarray(m_stack, dtype=np.float32)
    n_t, win_c, c_tot = m.shape
    bc = c_tot // n_blocks
    if bc % 128 or bc < 256 or win_c < 256:
        return None
    blocks = []
    covered = 0
    for b in range(n_blocks):
        sub = m[:, :, b * bc : (b + 1) * bc]
        spans = []
        for c0 in range(0, bc, 128):
            nz = np.nonzero(sub[:, :, c0 : c0 + 128].any(axis=(0, 2)))[0]
            if len(nz) == 0:
                r0, r1 = 0, 128  # pad columns: minimal legal chunk
            else:
                r0 = (int(nz[0]) // 128) * 128
                r1 = min(_round_up(int(nz[-1]) + 1, 128), win_c)
            spans.append((r0, r1, c0, c0 + 128))
            covered += (r1 - r0) * 128
        blocks.append(tuple(spans))
    if covered * _CHUNK_MIN_SAVE > win_c * c_tot:
        return None
    return tuple(blocks)


_V_CM = 64  # dense-V chunk height (probe knob; see _v_chunk_slices)


def _v_chunk_slices(mv_stack, win_r, cm=None):
    """Static K-chunking for the dense bf16 V matmul.

    The dense V matrix (tv, win_r) is nearly banded like its H twin: each
    output row reads two adjacent h-scaled rows, so a cm-row chunk of
    outputs touches only a narrow window of the win_r contraction dim.
    Unlike H (whose K is the window's LANE dim, sliceable only at 128),
    V's K is s's SUBLANE dim -- sliceable at 8 -- so the hull windows can
    be far tighter: config 2 (512^2 -> 1024^2 upscale) drops from
    (256, 144) @ (144, 512) to 4x (64, 48) @ (48, 512), ~3x fewer MACs.

    Returns (mvc, k0s, cm, kw) -- mvc is (n_rg, n_chunks*cm, kw) with the
    per-chunk hull windows extracted host-side (zero-padded ragged tail;
    the padded output rows are sliced off after the kernel's concat) --
    or None when the MAC saving misses _CHUNK_MIN_SAVE.  Bit-exact: each
    chunk's rows are zero outside their own hull by the hull's
    definition, so the dropped columns contribute exactly 0.
    """
    if not _CHUNK_V:
        return None
    if cm is None:
        cm = _V_CM
    m = np.asarray(mv_stack, dtype=np.float32)
    n_rg, tv, _ = m.shape
    if tv < 2 * cm or win_r < 32:
        return None
    n_chunks = -(-tv // cm)
    hulls = []
    for j in range(n_chunks):
        sub = m[:, j * cm : (j + 1) * cm, :]
        nz = np.nonzero(sub.any(axis=(0, 1)))[0]
        if len(nz) == 0:
            hulls.append((0, 8))
        else:
            hulls.append(((int(nz[0]) // 8) * 8, int(nz[-1]) + 1))
    kw = _round_up(max(k1 - k0 for k0, k1 in hulls), 8)
    if kw > win_r:
        return None
    if n_chunks * cm * kw * _CHUNK_MIN_SAVE > tv * win_r:
        return None
    k0s = tuple(min(k0, win_r - kw) for k0, _ in hulls)
    mvc = np.zeros((n_rg, n_chunks * cm, kw), dtype=np.float32)
    for j, k0 in enumerate(k0s):
        rows = m[:, j * cm : (j + 1) * cm, k0 : k0 + kw]
        mvc[:, j * cm : j * cm + rows.shape[1], :] = rows
    return mvc, k0s, cm, kw


def _axis_ok(f: FilterType) -> bool:
    # COPY/ONE are first-class axes (interp_horizontal_one/copy
    # generic.c:1558-1611, scale_outrow_one/copy generic.c:2262-2318):
    # mixed plans like box-x-copy / ladder-x-one / copy-x-box run fused
    # instead of falling to the XLA op-graph path.
    return f.is_bilinear or f in (FilterType.BOX, FilterType.COPY,
                                  FilterType.ONE)


def applicable(plan: ScalePlan) -> bool:
    if not (
        plan.storage == StorageType.S64
        and plan.internal_alpha == AlphaType.PREMUL8
        and plan.meta_in.n_bytes == 4
        and plan.meta_out.n_bytes == 4
        and _axis_ok(plan.x.filter)
        and _axis_ok(plan.y.filter)
    ):
        return False
    # Box-x-box: integer-ratio plans are intercepted first by the faster
    # reshape kernel (pallas_box, checked before this one in the dispatch);
    # non-integer box-x-box runs here since the larger-row-group geometry
    # landed (measured vs the XLA segment matmuls: 18.3 vs 12.5 Gpix/s at
    # 13.7:1, 14.2 vs 10.2 at 9.1:1, 24.6 vs 21.2 at 51:1; under the old
    # small-t geometry this kernel used to lose, 10.7 vs 12.7).
    geo = _geometry(plan, uniform_ok=True, **_geo_kw(plan))
    return geo is not None


def _lad_uniform(ax):
    """(stride, frac, first_offset) when every bilinear sample sits at
    a constant integer stride >= 2 with a constant fraction (true for
    power-of-two-ish downscales, e.g. 2048->256 2h: d=2, f=128), else
    None.  d >= 2 guarantees sample pair (o, o+1) never crosses the
    window end, so the lerp neighbor is a single lane roll."""
    o = np.asarray(ax.offsets, dtype=np.int64)
    f = np.asarray(ax.factors, dtype=np.int64)
    if len(o) < 2:
        return None
    d = int(o[1] - o[0])
    if d < 2 or not ((np.diff(o) == d).all() and (f == f[0]).all()):
        return None
    return d, int(f[0]), int(o[0])


_GEO_OVERRIDE: dict = {}  # timing-only probe knob (benchmarks/probe_geo)


def _geo_kw(plan: ScalePlan) -> dict:
    """Per-class geometry overrides.

    Bilinear-x-bilinear plans run hundreds of sub-us grid steps under the
    default t_max=64 and are step-overhead-bound; probe_geo on v5e:
    0h-x-0h upscale 512->1024 0.488 -> 0.178 ms at t=256/jc_out=512
    (2.7x), 0h-x-0h downscale 4096->3000 1.57 -> 1.01 ms at t=256 (but
    jc_out=512 LOSES there -- wider tiles re-read 1.37x-ratio windows),
    1h ladder 4096->1371 1.43 -> 1.22 ms at t_max=256, 2h ladder
    unchanged (its narrow-tile pick already maxed t).  Widening column
    tiles for COPY-H plans was also measured SLOWER (strip config
    4096^2 -> 4096x256: 32.1 Gpix/s at jc_out=256 vs 28.9 at 1024), so
    jc_out=512 stays upscale-only."""
    kw: dict = {}
    if (
        plan.x.filter.is_bilinear
        and plan.y.filter.is_bilinear
        # uniform-constant-stride ladders (e.g. 2048->256 2h, config 1b)
        # keep the default: their windows grow 2**k * d per output row, so
        # raising t_max only shifts the candidate ladder past the VMEM
        # budget onto a SMALLER final t (measured 64.5 -> 35.8 Gpix/s on
        # 1b).  The probe-measured wins are all non-uniform classes.
        and _lad_uniform(plan.x) is None
        and _lad_uniform(plan.y) is None
    ):
        kw["t_max"] = 256
        if plan.width_out >= plan.width_in:
            # One column tile when the whole output width fits: multi-tile
            # windows clamp to the input edge at different offsets, so the
            # union hull of _col_chunk_spans goes wide and chunking never
            # emits; a single tile keeps the gather matrix banded (config 2
            # measured 0.150 -> 0.101 ms, 70.1k -> 103.4k pps on v5e;
            # 512->2048 0h: 77k -> 114k pps at jc_out=2048, both exact).
            kw["jc_out_max"] = (
                2048 if plan.width_out <= 2048 else 512
            )
    kw.update(_GEO_OVERRIDE)
    return kw


@functools.cache
def _geometry(plan: ScalePlan, jc_out_max: int = 256, budget_mb: int = 12,
              t_max: int = 64, uniform_ok: bool = False,
              win_rows: int = 512, v_chunk_ok: bool = True):
    """Largest-tile geometry that fits the VMEM budget, or None.

    Tries the requested column-tile width and a narrower 128-lane variant:
    halving jc_out halves the matmul constants, which often lets the row
    group t grow within the same VMEM budget.  Measured on TPU v5e, larger
    t wins decisively when the wide tile had clamped it (8:1 ladder
    12.0 vs 7.5 Gpix/s, 5.9:1 9.0 vs 5.8) and narrower tiles lose mildly
    when t was already maxed (0h upscale/downscale, more window re-reads)
    -- so prefer whichever candidate has the larger t.
    """
    h_in, h_out = plan.height_in, plan.height_out
    v_is_box = plan.y.filter == FilterType.BOX
    kv = 0 if not plan.y.filter.is_bilinear else plan.y.halvings
    if v_is_box:
        est = -(-h_in // h_out) + 2
    elif plan.y.filter in (FilterType.COPY, FilterType.ONE):
        est = 1
    else:
        est = (1 << kv) + 1
    t0 = max(1, min(t_max, win_rows // est))

    def best(jm):
        # Mosaic requires the output row-block to be 8-aligned unless the
        # block spans the whole output, so candidates are the 8-aligned
        # halving ladder plus the whole-output single group.
        cands = []
        t = t0
        while t >= 1:
            tc = h_out if t >= h_out else (t // 8) * 8
            if tc >= 1 and tc not in cands:
                cands.append(tc)
            t //= 2
        if h_out not in cands:
            cands.append(h_out)
        for tc in cands:
            geo = _geometry_for_t(plan, tc, jm, budget_mb, uniform_ok,
                                  v_chunk_ok)
            if geo is not None:
                return geo
        return None

    geo = best(jc_out_max)
    if jc_out_max > 128:
        narrow = best(128)
        if narrow is not None:
            prefer_narrow = geo is None or narrow["t"] > geo["t"]
            if geo is not None and narrow["t"] == geo["t"]:
                # On a row-group tie: dense-matmul downscale ladders
                # (kh >= 1) nearly halve the gather-matmul FLOPs with the
                # narrow tile and win (3a 4.66 -> 4.01 ms); 0h and upscale
                # configs lose to the extra window re-reads (3b 1.36 ->
                # 2.40 ms) -- measured on v5e.  COPY-H also prefers narrow
                # (strip config 36.5 vs 32.6 Gpix/s at jc_out=256 and 28.4
                # at 1024: the small per-step DMAs pipeline better and the
                # identity axis never re-reads).
                prefer_narrow = geo["h_copy"] or (
                    geo["kh"] >= 1
                    and not geo["h_is_box"]
                    and geo["h_lad"] is None
                    and not geo["h_lmap"]  # lmap FLOPs don't scale with
                )                          # tile width; keep the wide tile
            if prefer_narrow:
                geo = narrow
    return geo


@functools.cache
def _geometry_for_t(plan: ScalePlan, t: int, jc_out_max: int = 256,
                    budget_mb: int = 12, uniform_ok: bool = False,
                    v_chunk_ok: bool = True):
    """Static tile geometry + tables for a given row-group size, or None
    if the VMEM budget doesn't work out.

    Each axis is either a bilinear ladder (one-hot p/q matmul + lerp +
    halving reduce) or a general box (segment/edge matmul + span
    normalization, the walk of interp_horizontal_boxes generic.c:1427-1556
    and scale_outrow_box generic.c:2112-2161 as static per-tile tables).

    With ``uniform_ok``, integer-ratio box axes take a cheaper layout
    (the _box_uniform identity of backends/xla.py): tile windows start
    exactly at span boundaries, H uses a plain (win_c, jc_out) 0/1
    span-sum int8 matrix with edge weights folded into the input, and V
    needs no matrix at all (sublane reshape-reduce in the kernel).
    """
    from ..backends.xla import (
        _box_h_arrays, _box_v_arrays, _box_uniform_applicable,
    )

    h_is_box = plan.x.filter == FilterType.BOX
    v_is_box = plan.y.filter == FilterType.BOX
    h_copy = plan.x.filter == FilterType.COPY
    h_one = plan.x.filter == FilterType.ONE
    v_copy = plan.y.filter == FilterType.COPY
    v_one = plan.y.filter == FilterType.ONE
    h_triv = h_copy or h_one
    v_triv = v_copy or v_one
    h_uniform = uniform_ok and h_is_box and _box_uniform_applicable(plan.x)
    v_uniform = uniform_ok and v_is_box and _box_uniform_applicable(plan.y)
    r_x = int(plan.x.strides[0]) + 1 if h_uniform else 0
    r_y = int(plan.y.strides[0]) + 1 if v_uniform else 0

    h_lad = (_lad_uniform(plan.x)
             if uniform_ok and plan.x.filter.is_bilinear else None)
    v_lad = (_lad_uniform(plan.y)
             if uniform_ok and plan.y.filter.is_bilinear else None)
    kh = plan.x.halvings if plan.x.filter.is_bilinear else 0
    kv = plan.y.halvings if plan.y.filter.is_bilinear else 0
    w_out, h_out = plan.width_out, plan.height_out
    w_in, h_in = plan.width_in, plan.height_in

    # >= 128 keeps every reshape's minor dim at full lane width (Mosaic
    # rejects shape casts to sub-128 minor dims); small outputs just clamp.
    jc_out = min(jc_out_max, max(128, _round_up(w_out, 8)))
    if (kh or kv) and jc_out % 128:
        # the H-halving reduce reshapes (win_r, jc) -> (win_r, 2**kh,
        # jc_out), which Mosaic only lowers when the new minor dim is a
        # multiple of 128 (found by on-chip fuzz: w_out=166 -> jc_out=168
        # crashed the compiler); jc_out_max is always a 128-multiple
        jc_out = min(jc_out_max, _round_up(jc_out, 128))
    jc = jc_out << kh  # bilinear samples per col tile (== jc_out for box)
    n_ct = -(-w_out // jc_out)
    n_rg = -(-h_out // t)
    if n_rg > 1 and t % 8:
        # Mosaic: a multi-group output row-block must be 8-aligned
        return None
    # uniform tiling needs span-aligned window starts on the DMA grid
    if h_uniform and n_ct > 1 and (jc_out * r_x) % 128:
        h_uniform = False
    if v_uniform and n_rg > 1 and (t * r_y) % 8:
        v_uniform = False
    if h_lad is not None and n_ct > 1 and (jc * h_lad[0]) % 128:
        h_lad = None
    if v_lad is not None and n_rg > 1 and ((t << kv) * v_lad[0]) % 8:
        v_lad = None

    xoff, xfac = plan.x.offsets, plan.x.factors
    yoff, yfac = plan.y.offsets, plan.y.factors
    bh = _box_h_arrays(plan.x) if h_is_box else None
    bv = _box_v_arrays(plan.y) if v_is_box else None

    def clamp_out_col(j):
        return min(j, w_out - 1)

    def clamp_out_row(i):
        return min(i, h_out - 1)

    def clamp_col(j):
        return min(j, (w_out << kh) - 1)

    def clamp_row(i):
        return min(i, (h_out << kv) - 1)

    def windows(lo_hi, dim, align):
        """Aligned window starts + size covering every group's [lo, hi).

        Starts are rounded down to ``align`` (Mosaic DMA slice constraint);
        clamping a start down can grow the required window, so iterate to a
        fixpoint.  Returns (starts, win) or None when the axis can't be
        covered without out-of-bounds reads.
        """
        starts = np.array([(lo // align) * align for lo, _ in lo_hi],
                          dtype=np.int32)
        for _ in range(4):
            win = max(hi - st for (lo, hi), st in zip(lo_hi, starts))
            win = _round_up(win, align)
            if win >= dim:
                # whole-axis window: full-extent slice, trivially aligned
                starts[:] = 0
                return starts, dim
            new_starts = np.minimum(starts, ((dim - win) // align) * align)
            if (new_starts == starts).all():
                return starts, win
            starts = new_starts
        return None

    # pad dims so aligned windows always fit (fn pads the input once)
    w_pad = _round_up(w_in, 128)
    h_pad = _round_up(h_in, 8)

    col_lo_hi = []
    for g in range(n_ct):
        if h_uniform or h_lad is not None or h_triv:
            break
        if h_is_box:
            outs = [clamp_out_col(g * jc_out + j) for j in range(jc_out)]
            lo = min(int(bh["left_idx"][j]) for j in outs)
            lo = min(lo, min(int(bh["mid_start"][j]) for j in outs))
            hi = max(int(bh["right_idx"][j]) + 1 for j in outs)
            hi = max(hi, max(int(bh["mid_start"][j] + bh["mid_len"][j]) for j in outs))
        else:
            samples = [clamp_col(g * jc + k) for k in range(jc)]
            lo = min(int(xoff[s]) for s in samples)
            hi = max(int(xoff[s]) for s in samples) + 2
        col_lo_hi.append((lo, hi))
    if h_uniform:
        # tile g's outputs cover inputs [g*jc_out*r_x, (g+1)*jc_out*r_x);
        # n_ct == 1 clamps the window to the (padded) image width, with the
        # span matrix's out-of-range columns simply left empty
        cstart = np.arange(n_ct, dtype=np.int32) * (jc_out * r_x)
        win_c = _round_up(jc_out * r_x, 128)
        if n_ct == 1:
            win_c = min(win_c, w_pad)
        w_pad = max(w_pad, int(cstart[-1]) + win_c)
    elif h_lad is not None:
        # tile g's samples sit at o0 + (g*jc + s)*d; the window keeps o0 as
        # a static local offset and must reach one lane past the last pair
        d_x, _, o0 = h_lad
        cstart = np.arange(n_ct, dtype=np.int32) * (jc * d_x)
        win_c = _round_up(o0 + jc * d_x, 128)
        w_pad = max(w_pad, int(cstart[-1]) + win_c)
    elif h_copy:
        # identity axis: tile g's outputs are exactly inputs
        # [g*jc_out, (g+1)*jc_out) (interp_horizontal_copy)
        if n_ct > 1 and jc_out % 128:
            return None
        cstart = np.arange(n_ct, dtype=np.int32) * jc_out
        win_c = _round_up(jc_out, 128)
        w_pad = max(w_pad, int(cstart[-1]) + win_c)
    elif h_one:
        # single input column broadcast (interp_horizontal_one)
        cstart = np.zeros(n_ct, dtype=np.int32)
        win_c = 128
    else:
        cw = windows(col_lo_hi, w_pad, 128)
        if cw is None:
            return None
        cstart, win_c = cw

    row_lo_hi = []
    for g in range(n_rg):
        if v_uniform or v_lad is not None or v_triv:
            break
        if v_is_box:
            outs = [clamp_out_row(g * t + i) for i in range(t)]
            lo = min(int(bv["first_idx"][i]) for i in outs)
            lo = min(lo, min(int(bv["mid_start"][i]) for i in outs))
            hi = max(int(bv["last_idx"][i]) + 1 for i in outs)
            hi = max(hi, max(int(bv["mid_start"][i] + bv["mid_len"][i]) for i in outs))
        else:
            samples = [clamp_row(g * t * (1 << kv) + k) for k in range(t << kv)]
            lo = min(int(yoff[s]) for s in samples)
            hi = max(int(yoff[s]) for s in samples) + 2
        row_lo_hi.append((lo, hi))
    if v_uniform:
        # t <= h_out always, so t*r_y <= h_in and the slice s[:t*r_y] in
        # _v_uniform_stage stays inside the (padded) window
        rstart = np.arange(n_rg, dtype=np.int32) * (t * r_y)
        win_r = _round_up(t * r_y, 8)
        h_pad = max(h_pad, int(rstart[-1]) + win_r)
    elif v_lad is not None:
        d_y, _, o0 = v_lad
        tv_ = t << kv
        rstart = np.arange(n_rg, dtype=np.int32) * (tv_ * d_y)
        win_r = _round_up(o0 + tv_ * d_y, 8)
        h_pad = max(h_pad, int(rstart[-1]) + win_r)
    elif v_copy:
        # identity axis: row group g covers input rows [g*t, (g+1)*t)
        # (scale_outrow_copy)
        rstart = np.arange(n_rg, dtype=np.int32) * t
        win_r = _round_up(t, 8)
        h_pad = max(h_pad, int(rstart[-1]) + win_r)
    elif v_one:
        # single input row broadcast (scale_outrow_one)
        rstart = np.zeros(n_rg, dtype=np.int32)
        win_r = 8
    else:
        rw = windows(row_lo_hi, h_pad, 8)
        if rw is None:
            return None
        rstart, win_r = rw

    # Lerp-first ladder decomposition for non-uniform DOWNSCALE ladders
    # (per-sample stride d > 1 => offsets strictly increase, so each window
    # lane is the p-endpoint of at most one distinct (offset, fraction)
    # sample): the varying-fraction lerp becomes one elementwise pass
    # against a static per-lane factor map, and the gather + halving-ladder
    # sum collapses to a small-count int8 matmul with jc_out columns --
    # 2**kh x fewer matrix columns than the dense weighted gather, at the
    # int8 MXU rate.  Upscales (repeated offsets with different fractions)
    # conflict and return None -> dense bf16 fallback.
    def _lerp_map(ax, k, n_tiles, out_tile, starts, win, dim_out_real):
        o = np.asarray(ax.offsets, dtype=np.int64)
        f = np.asarray(ax.factors, dtype=np.int64)
        fmap = np.zeros((n_tiles, win), dtype=np.int32)
        mat = np.zeros((n_tiles, win, out_tile), dtype=np.int8)
        for g in range(n_tiles):
            base = int(starts[g])
            used: dict = {}
            for j in range(out_tile):
                if g * out_tile + j >= dim_out_real:
                    break  # pad columns stay zero
                for kk in range(1 << k):
                    s = ((g * out_tile + j) << k) + kk
                    lane = int(o[s]) - base
                    fs = int(f[s])
                    if used.setdefault(lane, fs) != fs:
                        return None  # two fractions want one lane
                    fmap[g, lane] = fs
                    mat[g, lane, j] += 1  # clamped tails repeat a sample
        return fmap, mat

    # kh == 0 gains nothing (the count matrix matches the dense matrix's
    # column count and the lerp pass is pure overhead -- measured 19.3 ->
    # 17.5 G on 3b); ladders with kh >= 1 shrink the matmul 2**kh-fold.
    h_lmap = v_lmap = None
    if (plan.x.filter.is_bilinear and kh >= 1 and h_lad is None
            and not h_triv and not h_is_box):
        h_lmap = _lerp_map(plan.x, kh, n_ct, jc_out, cstart, win_c, w_out)
    if (plan.y.filter.is_bilinear and kv >= 1 and v_lad is None
            and not v_triv and not v_is_box):
        v_lmap = _lerp_map(plan.y, kv, n_rg, t, rstart, win_r, h_out)

    # VMEM budget.  Block inputs are double-buffered by the pipeline; the
    # kernel body also materializes the gathered y (win_r x mh_cols i32)
    # and the h-scaled s (win_r x jc) -- omitting those undercounted badly
    # once the lerp-fold halved the matrices (scoped-vmem OOM at 17.6M on
    # a 12M estimate, found on-chip).
    h_uni_any = (h_uniform or h_lad is not None or h_triv
                 or h_lmap is not None)
    v_uni_any = (v_uniform or v_lad is not None or v_triv
                 or v_lmap is not None)
    # single-limb (64bpp) general box axes take the post-gather-edge form:
    # one extra one-hot block instead of two window-wide VPU weight passes
    h_box3 = h_is_box and not h_uni_any and plan.storage == StorageType.S64
    v_box3 = v_is_box and not v_uni_any and plan.storage == StorageType.S64
    mh_cols = jc_out if h_uni_any else (
        (3 if h_box3 else 2) * jc_out if h_is_box else jc
    )
    mh_elt = 1 if (h_uni_any or h_is_box) else 2  # int8 vs bf16 gathers
    mv_rows = 0 if v_uni_any else (
        (3 if v_box3 else 2) * t if v_is_box else (t << kv)
    )
    mv_elt = 1 if v_is_box else 2
    budget = (
        2 * win_r * win_c * 4
        + 2 * win_c * mh_cols * mh_elt
        + 2 * mv_rows * win_r * mv_elt
        + win_r * mh_cols * 4
        + win_r * max(jc, jc_out) * 4 * 2
        + (win_r * win_c * 4
           if (h_lad is not None or h_lmap is not None) else 0)  # lerped win
        + (win_c * jc_out if h_lmap is not None else 0)    # int8 count mat
        + (win_r * (128 + t) if v_lmap is not None else 0)  # fmap + mat
        + (2 * win_c * 4 * 8
           if h_is_box and not h_uniform and not h_box3 else 0)  # lw/rf
        + (win_r * 128 * 4 if v_is_box and not v_uniform else 0)    # w maps
        # the H box fold materializes two weighted copies of the window
        # (adj, zr) -- undercounting them OOM'd scoped vmem at 16.43M on
        # a 12M estimate (3d, found on-chip); the post-gather form has none
        + (2 * win_r * win_c * 4
           if h_is_box and not h_uniform and not h_box3 else 0)
    )
    if budget > budget_mb * 2**20:
        return None

    # H matrix per col tile.  Bilinear: (win_c, jc) WEIGHTED gathers -- the
    # integer lerp is folded into the matmul (col s has F at row off[s] and
    # 256-F at off[s]+1, so y = p*F + q*(256-F); per-limb products <= 255*256
    # are f32-exact, and (y >> 8) & mask equals the proven lerp256).  Sample
    # column order k*jc_out + j so the ladder sums over a leading axis.
    # Box: (win_c, 3*jc_out) = [segments | left | right] one-hots with
    # per-output edge weights in hfac rows (0=left_w, 1=right_F).
    if h_uniform:
        # one shared 0/1 span-sum matrix (identical for every tile because
        # starts sit on span boundaries); edge weights and the final-element
        # drop are folded into the input by _h_uniform_stage
        m1 = np.zeros((win_c, jc_out), dtype=np.int8)
        for j in range(jc_out):
            lo = j * r_x
            if lo >= win_c:
                break
            m1[lo : min(lo + r_x, win_c), j] = 1
        mh = np.broadcast_to(m1, (n_ct, win_c, jc_out)).copy()
        # biased-limb correction (row 1, like the lmap layout): colsum *
        # bias factor for the cheapest exact limb form of this class
        hfac = np.zeros((n_ct, 8, max(128, jc_out)), dtype=np.int32)
        hfac[:, 1, :jc_out] = _wrap_i32(
            m1.astype(np.int64).sum(axis=0)
            * _span_bias_factor(_limbs8(plan, False))
        )
    elif h_lad is not None:
        # 0/1 ladder-sum matrix over the lerped window: col j sums the
        # 2**kh lerped samples at lanes o0 + (j*2**kh + k)*d (identical for
        # every tile; the lerp itself is elementwise in the kernel)
        d_x, _, o0 = h_lad
        m1 = np.zeros((win_c, jc_out), dtype=np.int8)
        for j in range(jc_out):
            for k in range(1 << kh):
                lane = o0 + ((j << kh) + k) * d_x
                if lane < win_c:
                    m1[lane, j] = 1
        mh = np.broadcast_to(m1, (n_ct, win_c, jc_out)).copy()
        # biased-limb correction (row 1, like the lmap layout)
        hfac = np.zeros((n_ct, 8, max(128, jc_out)), dtype=np.int32)
        hfac[:, 1, :jc_out] = _wrap_i32(
            m1.astype(np.int64).sum(axis=0)
            * _span_bias_factor(_limbs8(plan, False))
        )
    elif h_triv:
        # no matrix: COPY slices the window, ONE broadcasts lane 0
        mh = np.zeros((n_ct, 1, 1), dtype=np.int8)
        hfac = np.zeros((n_ct, 1, 1), dtype=np.int32)
    elif h_lmap is not None:
        # lerp-first: int8 count matrix (win_c, jc_out); the per-lane
        # factor map rides hfac row 0, the bias correction row 1
        fmap, mat = h_lmap
        mh = mat
        hfac = np.broadcast_to(
            fmap[:, None, :], (n_ct, 8, win_c)
        ).copy().astype(np.int32)
        hfac[:, 1, :] = 0
        hfac[:, 1, :jc_out] = _wrap_i32(
            mat.astype(np.int64).sum(axis=1)
            * _span_bias_factor(_limbs8(plan, False))
        )
    elif h_is_box and h_box3:
        # Post-gather-edge general box (round-4, single-limb operands):
        # NO input-wide weight passes at all.  Block A gathers {left@1} +
        # mids, blocks L/R gather the raw edge elements, and the per-output
        # edge weights apply on jc_out-wide data in the kernel:
        # y = A - L + ((L*lw)>>8 & m) + ((R*rf)>>8 & m) -- identical
        # truncating arithmetic to interp_horizontal_boxes
        # (generic.c:1427-1556), one extra jc_out-column matmul instead of
        # two window-sized VPU weight passes per channel.
        mh = np.zeros((n_ct, win_c, 3 * jc_out), dtype=np.int8)
        hfac = np.zeros((n_ct, 8, win_c), dtype=np.int32)
        for g in range(n_ct):
            for j in range(jc_out):
                oj = clamp_out_col(g * jc_out + j)
                base = int(cstart[g])
                ms, ml = int(bh["mid_start"][oj]), int(bh["mid_len"][oj])
                li = int(bh["left_idx"][oj]) - base
                ri = int(bh["right_idx"][oj]) - base
                mh[g, ms - base : ms - base + ml, j] = 1
                mh[g, li, j] = 1
                mh[g, li, jc_out + j] = 1
                mh[g, ri, 2 * jc_out + j] = 1
                hfac[g, 0, j] = int(bh["left_w"][oj])
                hfac[g, 1, j] = int(bh["fracs"][oj])
        for blk in range(3):  # bias corrections per block (1 limb)
            hfac[:, 2 + blk, :jc_out] = _wrap_i32(
                mh[:, :, blk * jc_out : (blk + 1) * jc_out]
                .astype(np.int64).sum(axis=1) * _span_bias_factor(1)
            )
    elif h_is_box:
        # Edge-folded general box (round-3): per-lane weight maps replace
        # the [left|right] one-hot blocks.  A lane is the left edge of at
        # most one span and the right edge of at most one (edge positions
        # strictly increase; interiors never coincide with edges since
        # mid_start = left+1, mid_end = right), so lw rides an elementwise
        # weight pass with identity 256 on interior lanes ((v*256)>>8 == v)
        # and rf a second pass with default 0.  Matrix block A covers
        # {left} + mids per column, block R the right one-hots: two int8
        # span matmuls of jc_out columns each vs one bf16 matmul of
        # 3*jc_out -- 1.5x fewer MXU-equivalent FLOPs, same arithmetic
        # (interp_horizontal_boxes, generic.c:1427-1556).
        mh = np.zeros((n_ct, win_c, 2 * jc_out), dtype=np.int8)
        hfac = np.zeros((n_ct, 8, win_c), dtype=np.int32)
        hfac[:, 0, :] = 256  # lw map identity
        for g in range(n_ct):
            for j in range(jc_out):
                oj = clamp_out_col(g * jc_out + j)
                base = int(cstart[g])
                ms, ml = int(bh["mid_start"][oj]), int(bh["mid_len"][oj])
                li = int(bh["left_idx"][oj]) - base
                ri = int(bh["right_idx"][oj]) - base
                mh[g, ms - base : ms - base + ml, j] = 1
                mh[g, li, j] = 1
                mh[g, ri, jc_out + j] = 1
                hfac[g, 0, li] = int(bh["left_w"][oj])
                hfac[g, 1, ri] = int(bh["fracs"][oj])
        bias_h = _span_bias_factor(_limbs8(plan, False))
        hfac[:, 2, :jc_out] = _wrap_i32(
            mh[:, :, :jc_out].astype(np.int64).sum(axis=1) * bias_h
        )
        hfac[:, 3, :jc_out] = _wrap_i32(
            mh[:, :, jc_out:].astype(np.int64).sum(axis=1) * bias_h
        )
    else:
        mh = np.zeros((n_ct, win_c, jc), dtype=np.float32)
        hfac = np.zeros((n_ct, 2, jc), dtype=np.int32)  # unused for ladders
        for g in range(n_ct):
            for j in range(jc_out):
                for k in range(1 << kh):
                    s = clamp_col((g * jc_out + j) * (1 << kh) + k)
                    col = k * jc_out + j
                    o = int(xoff[s]) - int(cstart[g])
                    f = int(xfac[s])
                    mh[g, o, col] = f
                    mh[g, o + 1, col] = 256 - f
    # block-diagonal column chunking of the H matmul (see _col_chunk_spans);
    # computed from the final matrices so it covers every H form: dense
    # weighted gathers (1 block of jc cols), uniform/ladder/lmap span
    # matrices (1 block of jc_out), edge-folded box (2 blocks), box3 (3)
    if h_triv:
        h_spans = None
    elif h_is_box and h_box3:
        h_spans = _col_chunk_spans(mh, 3)
    elif h_is_box and not h_uniform:
        h_spans = _col_chunk_spans(mh, 2)
    else:
        h_spans = _col_chunk_spans(mh, 1)
    if mh.dtype == np.float32:  # dense weighted gathers only; int8 stays
        mh = mh.astype(jnp.bfloat16)

    # V matrix per row group.  Bilinear: (t*2^kv, win_r) WEIGHTED gather
    # rows (lerp folded in, as above), order k*t + i.  Box: (3*t, win_r) =
    # [segments; first; last] with per-output weights in vfac cols (0=w1,
    # 1=w2).
    tv = t << kv
    if v_lmap is not None:
        # lerp-first V: int8 count matrix (t, win_r); per-row factor map
        # rides vfac lane 0-broadcast, bias correction lane 2
        fmap_v, mat_v = v_lmap
        mv = np.transpose(mat_v, (0, 2, 1)).copy()  # (n_rg, t, win_r) int8
        vfac = np.broadcast_to(
            fmap_v[:, :, None], (n_rg, win_r, 128)
        ).copy().astype(np.int32)
        vfac[:, :, 2] = 0
        vfac[:, :t, 2] = _wrap_i32(
            mv.astype(np.int64).sum(axis=2)
            * _span_bias_factor(_limbs8(plan, True))
        )
    elif v_uni_any:
        # no V matrix: the kernel reduces spans with a sublane reshape
        mv = np.zeros((n_rg, 1, 1), dtype=np.float32)
        vfac = np.zeros((n_rg, 1, 1), dtype=np.int32)
    elif v_is_box and v_box3:
        # Post-gather-edge V box (single-limb operands; see the H twin):
        # block A rows = {first@1} + mids, block F = first one-hots,
        # block L = last one-hots; per-output w1/w2 weights apply on
        # t-row data in the kernel.  S64 storage only, so the plain w2
        # weight applies (scale_outrow_box_64bpp, generic.c:2112-2161).
        mv = np.zeros((n_rg, 3 * t, win_r), dtype=np.int8)
        vfac = np.zeros((n_rg, win_r, 128), dtype=np.int32)
        for g in range(n_rg):
            for i in range(t):
                oi = clamp_out_row(g * t + i)
                base = int(rstart[g])
                ms, ml = int(bv["mid_start"][oi]), int(bv["mid_len"][oi])
                fi = int(bv["first_idx"][oi]) - base
                la = int(bv["last_idx"][oi]) - base
                mv[g, i, ms - base : ms - base + ml] = 1
                mv[g, i, fi] = 1
                mv[g, t + i, fi] = 1
                mv[g, 2 * t + i, la] = 1
                vfac[g, i, 0] = int(bv["w1"][oi])
                vfac[g, i, 1] = int(bv["w2"][oi])
        for blk in range(3):  # bias corrections per block (1 limb)
            vfac[:, :t, 2 + blk] = _wrap_i32(
                mv[:, blk * t : (blk + 1) * t]
                .astype(np.int64).sum(axis=2) * _span_bias_factor(1)
            )
    elif v_is_box:
        # Edge-folded V box (same trick as H): per-row weight maps in the
        # vfac lanes (lane 0 = w1 map, identity 256; lane 1 = w2 map,
        # default 0 -- for 128bpp storage the w2-1-with-skip rule
        # (generic.c:2240-2253) folds to max(w2-1, 0)), block A rows =
        # {first} + mids, block R = last one-hots.
        s128 = plan.storage == StorageType.S128
        mv = np.zeros((n_rg, 2 * t, win_r), dtype=np.int8)
        vfac = np.zeros((n_rg, win_r, 128), dtype=np.int32)
        vfac[:, :, 0] = 256  # w1 map identity
        for g in range(n_rg):
            for i in range(t):
                oi = clamp_out_row(g * t + i)
                base = int(rstart[g])
                ms, ml = int(bv["mid_start"][oi]), int(bv["mid_len"][oi])
                fi = int(bv["first_idx"][oi]) - base
                la = int(bv["last_idx"][oi]) - base
                mv[g, i, ms - base : ms - base + ml] = 1
                mv[g, i, fi] = 1
                mv[g, t + i, la] = 1
                vfac[g, fi, 0] = int(bv["w1"][oi])
                w2 = int(bv["w2"][oi])
                vfac[g, la, 1] = max(w2 - 1, 0) if s128 else w2
        bias_v = _span_bias_factor(_limbs8(plan, True))
        vfac[:, :t, 2] = _wrap_i32(
            mv[:, :t].astype(np.int64).sum(axis=2) * bias_v
        )
        vfac[:, :t, 3] = _wrap_i32(
            mv[:, t:].astype(np.int64).sum(axis=2) * bias_v
        )
    else:
        mv = np.zeros((n_rg, tv, win_r), dtype=np.float32)
        vfac = np.zeros((n_rg, tv, 2), dtype=np.int32)  # unused for ladders
        for g in range(n_rg):
            for i in range(t):
                for k in range(1 << kv):
                    s = clamp_row((g * t + i) * (1 << kv) + k)
                    row = k * t + i
                    o = int(yoff[s]) - int(rstart[g])
                    f = int(yfac[s])
                    mv[g, row, o] = f
                    mv[g, row, o + 1] = 256 - f
    # K-chunk the dense V matmul (see _v_chunk_slices): dense weighted
    # gathers only -- the int8/box forms keep their own span machinery.
    # Chunk height by class (probe_r5_k vcm sweep, v5e): DOWNSCALES take
    # cm=16 (3b 48.2 -> 51.2 in-Gpix/s +-0%; tighter hulls beat the extra
    # dispatches), upscales keep cm=64 (config 2: 21.5 G at 64 vs 18.9 at
    # 16 -- the small dots go dispatch-bound).  An explicit _V_CM probe
    # override (!= 64) wins over the class rule.
    # Only the S64 bilinear kernel consumes geo["v_chunks"]; callers whose
    # dense-V stage applies mv whole (pallas_128 / pallas_srgb gather_mm
    # transpose) pass v_chunk_ok=False or they'd receive a hull-windowed
    # matrix their contraction can't use (caught by the CPU exactness
    # tests when the cm=16 downscale rule started firing at t >= 32).
    v_chunks = None
    if mv.dtype == np.float32 and v_chunk_ok:
        cm_cls = 16 if plan.height_out < plan.height_in else None
        vc = _v_chunk_slices(mv, win_r,
                             cm=cm_cls if _V_CM == 64 else None)
        if vc is not None:
            mv, k0s, cm_v, kw_v = vc
            v_chunks = (k0s, cm_v, kw_v)
    if mv.dtype == np.float32:  # dense weighted gathers only; int8 stays
        mv = mv.astype(jnp.bfloat16)

    return dict(
        kh=kh, kv=kv, jc_out=jc_out, jc=jc, t=t, n_ct=n_ct, n_rg=n_rg,
        win_c=win_c, win_r=win_r, rstart=rstart, cstart=cstart,
        mh=mh, hfac=hfac.astype(np.int32), mv=mv, vfac=vfac.astype(np.int32),
        w_out_pad=n_ct * jc_out, h_out_pad=n_rg * t,
        w_pad=w_pad, h_pad=h_pad,
        h_is_box=h_is_box, v_is_box=v_is_box,
        h_copy=h_copy, h_one=h_one, v_copy=v_copy, v_one=v_one,
        h_uniform=h_uniform, v_uniform=v_uniform, r_x=r_x, r_y=r_y,
        h_last_short=bool(h_uniform and int(plan.x.strides[-1]) == r_x - 2),
        v_last_short=bool(v_uniform and int(plan.y.strides[-1]) == r_y - 2),
        h_lad=h_lad, v_lad=v_lad,
        h_spans=h_spans, v_chunks=v_chunks,
        h_box3=h_box3, v_box3=v_box3,
        h_lmap=h_lmap is not None, v_lmap=v_lmap is not None,
        l8_in=_limbs8(plan, False), l8_v=_limbs8(plan, True),
        u7_in=_u7s(plan, False), u7_v=_u7s(plan, True),
        span_mul_x=int(plan.x.span_mul), span_mul_y=int(plan.y.span_mul),
    )


def _mul_shift_round24(a, m):
    """In-kernel alias of ops.fixedpoint.mul_shift_round24 (exact 3-limb
    uint32 split, valid for the full a in [0, 2**32) accumulator domain)."""
    return fp.mul_shift_round24(a, m)


# -- shared in-kernel stages for the wide (128bpp int32-plane) kernels --------
# Used by pallas_srgb (linear light) and pallas_128 (PREMUL16 / deep box);
# the 64bpp kernel keeps its own fused copies below.

def _mm_spans(v, mat, spans, dot):
    """One H-direction matmul, optionally split into static column chunks.

    ``spans`` is a tuple of (r0, r1, c0, c1): chunk k computes
    ``v[:, r0:r1] @ mat[r0:r1, c0:c1]`` -- bit-identical to the dense
    product when rows outside [r0, r1) are zero in mat's [c0, c1) columns
    (the dropped blocks contribute exactly 0).  Row bounds are 128-aligned
    (lane-dim slices of v); col bounds are exact 128-wide chunks (every
    producer -- _col_chunk_spans -- requires the block width to be a
    multiple of 128).  Cuts MACs by the ratio of covered area to the dense
    rectangle;
    the geometry only emits spans when that saving clears a threshold."""
    if spans is None:
        return dot(v, mat)
    return jnp.concatenate(
        [dot(v[:, r0:r1], mat[r0:r1, c0:c1]) for r0, r1, c0, c1 in spans],
        axis=1,
    )


def _gather_mm(x_i32, mat, n_limbs, transpose=False, spans=None):
    """Exact 0/1-matrix application via 8-bit bf16 limb matmuls.

    Limbs <= 255 are exact in bf16; per-limb f32 sums stay < 2**24 for
    every span the planner allows, and the int32 limb recombination is
    mod-2**32 exact (downstream normalization treats accumulators as
    uint32).  n_limbs = ceil(value_bits / 8) of the input bound.
    ``spans`` (H direction only) chunks the matmul block-diagonally.
    """
    def dot(v, m):
        return jnp.dot(v, m, preferred_element_type=jnp.float32)

    def mm(v):
        vb = v.astype(jnp.bfloat16)
        if transpose:
            assert spans is None
            y = jnp.dot(mat, vb, preferred_element_type=jnp.float32)
        else:
            y = _mm_spans(vb, mat, spans, dot)
        return y.astype(jnp.int32)

    if n_limbs == 1:
        return mm(x_i32)
    out = mm(x_i32 & 0xFF) + (mm((x_i32 >> 8) & 0xFF) << 8)
    if n_limbs >= 3:
        out = out + (mm(x_i32 >> 16) << 16)
    return out


def _span_mm_i8(x_i32, mat_i8, n_limbs, transpose=False, spans=None):
    """Exact small-count span sums on the int8 MXU (2x the bf16 rate on
    v5e).

    Nonnegative values split into 7-bit limbs (int8-exact); per-limb int32
    accumulators are exact by construction (counts <= 64 per column keep
    limb sums < 2**20), and the shifted recombination is mod-2**32 exact
    like the bf16 path (_gather_mm).  n_limbs = ceil(value_bits / 7):
    2 covers < 2**14, 3 covers < 2**21.  ``transpose`` computes mat @ x.
    """
    def dot(v, m):
        return jnp.dot(v, m, preferred_element_type=jnp.int32)

    def mm(v):
        vb = v.astype(jnp.int8)
        if transpose:
            assert spans is None
            return jnp.dot(mat_i8, vb, preferred_element_type=jnp.int32)
        return _mm_spans(vb, mat_i8, spans, dot)

    out = mm(x_i32 & 0x7F)
    if n_limbs >= 2:
        out = out + (mm((x_i32 >> 7) & 0x7F) << 7)
    if n_limbs >= 3:
        out = out + (mm(x_i32 >> 14) << 14)
    return out


def _span_mm_u7(x_i32, mat_i8, s, transpose=False, spans=None):
    """Exact span sums for values < 2**(s+7) via two UNBIASED int8 limbs.

    ``hi = x >> s`` fits int8 because the caller guarantees x < 2**(s+7)
    (s <= 7 keeps ``lo = x & (2**s - 1)`` in range too); both limbs are
    nonnegative, so no bias correction is needed at all.  Two int8 matmuls
    like the biased path, but limb prep is 2 VPU ops instead of 6 and the
    per-column correction add disappears -- measured on the window-sized
    operands of the lerp-first stages, where prep dominates (the matmuls
    themselves are far from the MXU roofline).  Per-limb int32 sums are
    exact (counts * 127 << 2**31); recombination is mod-2**32 exact as in
    _span_mm_i8."""
    def dot(v, m):
        return jnp.dot(v, m, preferred_element_type=jnp.int32)

    def mm(v):
        vb = v.astype(jnp.int8)
        if transpose:
            assert spans is None
            return jnp.dot(mat_i8, vb, preferred_element_type=jnp.int32)
        return _mm_spans(vb, mat_i8, spans, dot)

    return mm(x_i32 & ((1 << s) - 1)) + (mm(x_i32 >> s) << s)


def _span_bias_factor(n_limbs8: int) -> int:
    """Static multiplier for the biased-limb correction: 128 * sum(2**8l)."""
    return 128 * sum(1 << (8 * l) for l in range(n_limbs8))


def _span_mm_i8b(x_i32, mat_i8, corr, n_limbs8, transpose=False, spans=None):
    """Biased 8-bit-limb span sums on the int8 MXU.

    Each 8-bit limb [0, 255] is biased by -128 into the signed int8 range,
    so 8-bit limbs replace the unbiased path's 7-bit ones (one matmul for
    byte values, two for 16-bit, vs two/three).  The bias is linear:
    sum((x_i - 128) * m_i) = true_sum - 128 * colsum, so adding the static
    per-column correction ``corr`` = _span_bias_factor(n) * colsum restores
    exactness (per-limb int32 sums <= 128*nnz < 2**20 are exact; the
    shifted recombination is mod-2**32 exact as in _span_mm_i8).
    ``transpose`` computes mat @ x with per-row-sum corrections.
    """
    def dot(v, m):
        return jnp.dot(v, m, preferred_element_type=jnp.int32)

    def mm(v):
        vb = v.astype(jnp.int8)
        if transpose:
            assert spans is None
            return jnp.dot(mat_i8, vb, preferred_element_type=jnp.int32)
        return _mm_spans(vb, mat_i8, spans, dot)

    # biased byte via xor + truncating cast: the int8 cast keeps the low
    # byte two's-complement, so ((x ^ 128) & 0xFF as int8) == (x & 0xFF)
    # - 128 in 2 VPU ops instead of mask+subtract+cast (the cast itself
    # performs the mask)
    out = mm(x_i32 ^ 128)
    if n_limbs8 >= 2:
        out = out + (mm((x_i32 >> 8) ^ 128) << 8)
    if n_limbs8 >= 3:
        out = out + (mm((x_i32 >> 16) ^ 128) << 16)
    return out + corr


def _h_lerpmap_stage(ch, mh_i8, hfac_ref, geo, mask, n_limbs8,
                     pre_lerped=False):
    """Lerp-first non-uniform H ladder: one elementwise lerp against the
    static per-lane factor map (each lane is the p-endpoint of at most one
    distinct sample -- offsets strictly increase for downscale ladders),
    then the gather + 2**kh-sample ladder sum as a single biased int8
    count-matrix matmul with jc_out columns (vs the dense weighted
    gather's jc).  Per-column bias correction rides hfac row 1.

    ``pre_lerped``: the caller already lerped this channel on 16-bit-lane
    packed pixel pairs (_pair_lerp in the 64bpp kernel) -- skip the
    per-channel lerp here."""
    if pre_lerped or _ABLATE == "nolerp":
        lerped = ch
    else:
        f = hfac_ref[0, 0:1, :]  # (1, win_c), broadcasts over rows
        q = jnp.roll(ch, -1, axis=1)
        lerped = fp.lerp256(ch, q, f, mask)
    if _ABLATE == "nomm":  # timing-only: lerp but skip the ladder matmul
        return lerped[:, : geo["jc_out"]]
    sp = None if geo["h_spans"] is None else geo["h_spans"][0]
    if geo["u7_in"] is not None:  # P8L <= 2047: cheaper unbiased limbs
        y = _span_mm_u7(lerped, mh_i8, geo["u7_in"], spans=sp)
    else:
        corr = hfac_ref[0, 1:2, : geo["jc_out"]]
        y = _span_mm_i8b(lerped, mh_i8, corr, n_limbs8, spans=sp)
    kh = geo["kh"]
    return ((y >> kh) & mask) if kh else y


def _v_lerpmap_stage(s, mv_i8, vfac_ref, geo, mask, n_limbs8):
    """Lerp-first non-uniform V ladder (sublane roll + per-row factor map,
    then the biased int8 count-matrix ladder matmul; per-row corrections
    ride vfac lane 2)."""
    f = vfac_ref[0][:, 0:1]  # (win_r, 1), broadcasts over lanes
    q = jnp.roll(s, -1, axis=0)
    lerped = fp.lerp256(s, q, f, mask)
    if geo["u7_v"] is not None:  # P8L <= 2047: cheaper unbiased limbs
        y = _span_mm_u7(lerped, mv_i8, geo["u7_v"], transpose=True)
    else:
        corr = vfac_ref[0][: geo["t"], 2:3]
        y = _span_mm_i8b(lerped, mv_i8, corr, n_limbs8, transpose=True)
    kv = geo["kv"]
    return ((y >> kv) & mask) if kv else y


def _h_box_post_stage(ch, mh_i8, hfac_ref, geo, span_mul_x, wmask,
                      norm_mask):
    """General H box with post-gather edge weighting (single-limb
    operands): no window-wide weight passes at all.  Block A gathers
    {left@1}+mids, blocks L/R the raw edge elements; the per-output edge
    weights apply on jc_out-wide data:
    ``y = A - L + ((L*lw)>>8 & m) + ((R*rf)>>8 & m)`` -- the same
    truncating arithmetic as interp_horizontal_boxes
    (generic.c:1427-1556), since L/R are exact one-hot gathers of the
    edge values.  Weights ride hfac rows 0 (lw) / 1 (rf) at the OUTPUT
    column position; bias corrections rows 2/3/4 (A/L/R)."""
    jc_out = geo["jc_out"]
    lw = hfac_ref[0, 0:1, :jc_out].astype(jnp.uint32)
    rf = hfac_ref[0, 1:2, :jc_out].astype(jnp.uint32)
    corr_a = hfac_ref[0, 2:3, :jc_out]
    corr_l = hfac_ref[0, 3:4, :jc_out]
    corr_r = hfac_ref[0, 4:5, :jc_out]
    sp = geo["h_spans"] or (None, None, None)
    y_a = _span_mm_i8b(ch, mh_i8[:, :jc_out], corr_a, 1, spans=sp[0])
    y_l = _span_mm_i8b(ch, mh_i8[:, jc_out : 2 * jc_out], corr_l, 1,
                       spans=sp[1])
    y_r = _span_mm_i8b(ch, mh_i8[:, 2 * jc_out :], corr_r, 1, spans=sp[2])
    y = (
        y_a - y_l
        + ((y_l.astype(jnp.uint32) * lw >> 8) & wmask).astype(jnp.int32)
        + ((y_r.astype(jnp.uint32) * rf >> 8) & wmask).astype(jnp.int32)
    )
    return _mul_shift_round24(y, jnp.int32(span_mul_x)) & norm_mask


def _v_box_post_stage(s, mv_i8, vfac_ref, geo, span_mul_y, wmask,
                      norm_mask):
    """General V box with post-gather edge weighting (single-limb
    operands; H twin above).  Blocks A={first@1}+mids / F=first / L=last;
    w1/w2 weights and corrections ride vfac lanes 0/1 and 2/3/4 at the
    OUTPUT row position (S64 storage only -> plain w2 weight,
    scale_outrow_box_64bpp generic.c:2112-2161)."""
    t = geo["t"]
    w1 = vfac_ref[0][:t, 0:1].astype(jnp.uint32)
    w2 = vfac_ref[0][:t, 1:2].astype(jnp.uint32)
    corr_a = vfac_ref[0][:t, 2:3]
    corr_f = vfac_ref[0][:t, 3:4]
    corr_l = vfac_ref[0][:t, 4:5]
    y_a = _span_mm_i8b(s, mv_i8[:t], corr_a, 1, transpose=True)
    y_f = _span_mm_i8b(s, mv_i8[t : 2 * t], corr_f, 1, transpose=True)
    y_l = _span_mm_i8b(s, mv_i8[2 * t :], corr_l, 1, transpose=True)
    yv = (
        y_a - y_f
        + ((y_f.astype(jnp.uint32) * w1 >> 8) & wmask).astype(jnp.int32)
        + ((y_l.astype(jnp.uint32) * w2 >> 8) & wmask).astype(jnp.int32)
    )
    return _mul_shift_round24(yv, jnp.int32(span_mul_y)) & norm_mask


def _h_box_fold_stage(ch, mh_i8, hfac_ref, geo, span_mul_x, wmask,
                      norm_mask, n_limbs8):
    """Edge-folded general H box: elementwise lw/rf weight passes (identity
    256 on interior lanes, default 0 for rf) + two biased int8 span
    matmuls ({left}+mids block, right one-hot block), then span
    normalization -- byte-identical to interp_horizontal_boxes + scale
    (generic.c:1427-1556, 1231-1261) since (v*256)>>8 == v and each lane
    holds at most one left-role and one right-role weight.  Bias
    corrections ride hfac rows 2 (A block) and 3 (R block)."""
    jc_out = geo["jc_out"]
    lw = hfac_ref[0, 0:1, :]
    rf = hfac_ref[0, 1:2, :]
    adj = fp.weight256(ch, lw, wmask)
    zr = fp.weight256(ch, rf, wmask)
    sp = geo["h_spans"] or (None, None)
    if geo["u7_in"] is not None:  # P8L <= 2047: cheaper unbiased limbs
        s7 = geo["u7_in"]
        y = (_span_mm_u7(adj, mh_i8[:, :jc_out], s7, spans=sp[0])
             + _span_mm_u7(zr, mh_i8[:, jc_out:], s7, spans=sp[1]))
    else:
        corr_a = hfac_ref[0, 2:3, :jc_out]
        corr_r = hfac_ref[0, 3:4, :jc_out]
        y = (_span_mm_i8b(adj, mh_i8[:, :jc_out], corr_a, n_limbs8,
                          spans=sp[0])
             + _span_mm_i8b(zr, mh_i8[:, jc_out:], corr_r, n_limbs8,
                            spans=sp[1]))
    return _mul_shift_round24(y, jnp.int32(span_mul_x)) & norm_mask


def _v_box_fold_stage(s, mv_i8, vfac_ref, geo, span_mul_y, wmask,
                      norm_mask, n_limbs8):
    """Edge-folded general V box (w1/w2 maps in vfac lanes 0/1; the 128bpp
    w2-1-with-skip rule is pre-folded into the map by the geometry; bias
    corrections per output row in vfac lanes 2 (A) and 3 (R))."""
    t = geo["t"]
    w1 = vfac_ref[0][:, 0:1]
    w2 = vfac_ref[0][:, 1:2]
    adj = fp.weight256(s, w1, wmask)
    zr = fp.weight256(s, w2, wmask)
    if geo["u7_v"] is not None:  # P8L <= 2047: cheaper unbiased limbs
        s7 = geo["u7_v"]
        yv = (_span_mm_u7(adj, mv_i8[:t], s7, transpose=True)
              + _span_mm_u7(zr, mv_i8[t:], s7, transpose=True))
    else:
        corr_a = vfac_ref[0][:t, 2:3]
        corr_r = vfac_ref[0][:t, 3:4]
        yv = (_span_mm_i8b(adj, mv_i8[:t], corr_a, n_limbs8, transpose=True)
              + _span_mm_i8b(zr, mv_i8[t:], corr_r, n_limbs8, transpose=True))
    return _mul_shift_round24(yv, jnp.int32(span_mul_y)) & norm_mask


def _window_dma(rs_ref, cs_ref, x_any, xwin, sem, win_r, win_c, b, gr, gc,
                planes=False):
    """Double-buffered irregular-window fetch for the fused kernels.

    The per-tile windows start at scalar-prefetched offsets, so they can't
    ride the BlockSpec pipeline's automatic double buffering; overlap the
    copies by hand instead: the first grid step starts its own copy, every
    step kicks off the NEXT step's copy into the other half of the
    (2, win_r, win_c) scratch before waiting on its own.  Grid steps run
    sequentially on the scalar core while the DMA engines run ahead.

    With ``planes`` the input is channel-major (B, 3, H, W) u8 and the
    window is (3, win_r, win_c).
    """
    nb = pl.num_programs(0)
    nr = pl.num_programs(1)
    nc = pl.num_programs(2)
    lin = (b * nr + gr) * nc + gc
    slot = jax.lax.rem(lin, 2)

    def dma(sl, bb, rr, cc):
        rs = pl.multiple_of(rs_ref[rr], 8)
        cs = pl.multiple_of(cs_ref[cc], 128)
        if planes:
            src = x_any.at[bb, :, pl.ds(rs, win_r), pl.ds(cs, win_c)]
        else:
            src = x_any.at[bb, pl.ds(rs, win_r), pl.ds(cs, win_c)]
        return pltpu.make_async_copy(src, xwin.at[sl], sem.at[sl])

    @pl.when(lin == 0)
    def _first():
        dma(slot, b, gr, gc).start()

    nxt = lin + 1

    @pl.when(nxt < nb * nr * nc)
    def _ahead():
        c2 = jax.lax.rem(nxt, nc)
        rem = jax.lax.div(nxt, nc)
        r2 = jax.lax.rem(rem, nr)
        b2 = jax.lax.div(rem, nr)
        dma(jax.lax.rem(nxt, 2), b2, r2, c2).start()

    dma(slot, b, gr, gc).wait()
    return xwin[slot]


def _uniform_span_mm(x, mh, hfac_ref, geo, n_limbs):
    """Cheapest exact span-sum matmul for the uniform H stages.

    Picks, per plan class, the cheapest of the three exact forms (the
    same ladder the lmap/fold stages already climb): unbiased u7 split
    limbs (P8L-linear <= 2047, 2 matmuls + 2 prep ops), biased 8-bit
    limbs when that beats the caller's 7-bit count (S64 bytes: 1 matmul
    vs 2; PREMUL16-compressed <= 65535: 2 vs 3; deep-box bytes: 1 vs 2),
    else the original unbiased 7-bit limbs (PREMUL16-linear < 2**20: 3
    either way).  Biased corrections ride hfac row 1 (colsum * bias
    factor, filled by the geometry).  All forms take the block-diagonal
    column spans."""
    sp = None if geo["h_spans"] is None else geo["h_spans"][0]
    if geo["u7_in"] is not None:
        return _span_mm_u7(x, mh, geo["u7_in"], spans=sp)
    l8 = geo["l8_in"]
    if l8 < n_limbs:
        corr = hfac_ref[0, 1:2, : geo["jc_out"]]
        return _span_mm_i8b(x, mh, corr, l8, spans=sp)
    return _span_mm_i8(x, mh, n_limbs, spans=sp)


def _h_uniform_stage(ch, mh, hfac_ref, geo, cs, w_out, span_mul_x,
                     norm_mask, n_limbs):
    """Integer-ratio H box: edge weights folded into the input, one 0/1
    span-sum matmul, span normalization.

    Span j covers inputs [j*r, (j+1)*r); its first pixel carries weight
    255 (the carry (r*255)>>8 of generic.c:1462 with F=0), identity 256
    for global pixel 0.  (v*255)>>8 == v - ((v+255)>>8) exactly, so the
    weight becomes an elementwise adjust that rides the plain span sum
    (the & mask after weight256 is a no-op: adjusted values never exceed
    their inputs, which are < 2**21 <= mask for every caller).  When the
    last span is clamped one short (precalc_boxes_array generic.c:105-110)
    the reference never reads the final input element: zero it.
    """
    r = geo["r_x"]
    lane = jax.lax.broadcasted_iota(jnp.int32, ch.shape, 1)
    glob = lane + cs  # cs % r == 0 by construction (span-aligned starts)
    span_first = (lane % r == 0) & (glob > 0)
    adj = ch - jnp.where(span_first, (ch + 255) >> 8, 0)
    if geo["h_last_short"]:
        adj = jnp.where(glob == w_out * r - 1, 0, adj)
    acc = _uniform_span_mm(adj, mh, hfac_ref, geo, n_limbs)
    return _mul_shift_round24(acc, jnp.int32(span_mul_x)) & norm_mask


def _avg_floor(p, q):
    """floor((p + q) / 2) per lane == lerp256(p, q, 128) exactly.

    lerp256(p, q, 128) = floor((128p + 128q)/256) = floor((p+q)/2), and
    (p & q) + ((p ^ q) >> 1) is the classic carry-free form of that floor
    average (sum = 2*(p&q) + (p^q)).  3 VPU ops against lerp256's ~6, no
    mask needed (values never grow), and f == 128 is what every
    power-of-two uniform ladder uses (d >= 2 with constant fraction
    forces f = 128 in practice).  Exactness is swept in
    test_fixedpoint.py::test_avg_floor_equals_lerp128."""
    return (p & q) + ((p ^ q) >> 1)


def _avg_floor_packed(p, q):
    """Per-byte floor average of packed u32 pixels: all FOUR channels of
    lerp256(ch_p, ch_q, 128) in one 4-op SWAR stream (vs ~6 VPU ops per
    channel after unpack).  (p & q) + (((p ^ q) >> 1) & 0x7F7F7F7F)
    keeps every byte's average inside its own byte (no carries cross:
    the shifted xor is masked to 7 bits per byte).  On config 1b the
    per-channel lerp was 0.65 ms of 1.49 (ablation 2026-08-19); this
    removes ~all of it."""
    return (p & q) + (((p ^ q) >> jnp.uint32(1)) & jnp.uint32(0x7F7F7F7F))


def _pair_lerp(px, f):
    """General-f lerp256 on 16-bit-lane channel pairs of packed u32 pixels.

    Returns (l02, l13): bytes 0/2 and 1/3 of each pixel lerped against the
    next lane's pixel with the per-column factor map ``f`` (shape (1, C),
    entries in [0, 256]).  Exact per 16-bit lane: each product
    p*f <= 255*256 = 65280 < 2**16 and the convex sum p*f + q*(256-f)
    <= 65280, so nothing carries across lanes (mod-2**32 keeps the high
    lane exact).  ~11 window passes for all four channels vs ~20 for
    per-channel lerp256 -- the lmap ablation (probe_lad_ablate, 3c)
    showed the per-channel lerp costing 0.37 of 0.95 ms."""
    f = f.astype(jnp.uint32)
    fm = jnp.uint32(256) - f
    pm = jnp.uint32(0x00FF00FF)
    p02 = px & pm
    p13 = (px >> jnp.uint32(8)) & pm
    l02 = ((p02 * f + jnp.roll(p02, -1, axis=1) * fm) >> jnp.uint32(8)) & pm
    l13 = ((p13 * f + jnp.roll(p13, -1, axis=1) * fm) >> jnp.uint32(8)) & pm
    return l02, l13


def _h_uniform_ladder_stage(ch, mh, hfac_ref, geo, mask, n_limbs,
                            pre_lerped=False):
    """Constant-stride constant-fraction H bilinear ladder.

    Every sample is lerp256(x[o], x[o+1], f) with the SAME f, so the lerp
    runs elementwise over the whole window (neighbor = one lane roll; the
    wrapped last lane is never selected because d >= 2 keeps sample pairs
    short of the window end) and the 2**kh-sample ladder sum
    (interp_horizontal_bilinear_Nh, generic.c:1290-1361) is a 0/1 int8
    span matmul followed by >> kh.  Lerped values stay within the input
    bound (convexity), so the same limb forms are exact.  f == 128 takes
    the 3-op floor average (_avg_floor); ``pre_lerped`` skips the lerp
    entirely (the 64bpp kernel pre-averages the packed pixels once for
    all four channels, _avg_floor_packed).
    """
    d, f, _ = geo["h_lad"]
    if pre_lerped or _ABLATE == "nolerp":
        lerped = ch
    else:
        q = jnp.roll(ch, -1, axis=1)
        if f == 128:
            lerped = _avg_floor(ch, q)
        else:
            lerped = fp.lerp256(ch, q, jnp.uint32(f), mask)
    if _ABLATE == "nomm":  # timing-only: lerp but skip the ladder matmul
        return lerped[:, : geo["jc_out"]]
    y = _uniform_span_mm(lerped, mh, hfac_ref, geo, n_limbs)
    kh = geo["kh"]
    if kh:
        y = (y >> kh) & mask
    return y


def _v_uniform_ladder_stage(s, geo, mask):
    """Constant-stride constant-fraction V bilinear ladder: pure sublane
    reshapes, no matmul.  Sample i is lerp256(row[o0+i*d], row[o0+i*d+1], f)
    -- with d >= 2 both rows live inside sample i's own d-row group, so a
    leading-axis reshape exposes them; the ladder then sums 2**kv
    consecutive sample rows (scale_outrow_bilinear_Nh, generic.c:1841-1916).
    """
    d, f, o0 = geo["v_lad"]
    t, kv = geo["t"], geo["kv"]
    tv = t << kv
    g3 = s[o0 : o0 + tv * d].reshape(tv, d, s.shape[-1])
    if f == 128:  # == lerp256(p, q, 128), 3 ops (see _avg_floor)
        lerped = _avg_floor(g3[:, 0, :], g3[:, 1, :])
    else:
        lerped = fp.lerp256(g3[:, 0, :], g3[:, 1, :], jnp.uint32(f), mask)
    if kv:
        l3 = lerped.reshape(t, 1 << kv, s.shape[-1])
        return (jnp.sum(l3, axis=1) >> kv) & mask
    return lerped


def _v_uniform_stage(s, geo, gr, h_out, span_mul_y, mask, norm_mask):
    """Integer-ratio V box: pure sublane reshape-reduce, no matmul.

    Row span i covers h-scaled rows [i*r, (i+1)*r): first row weighted
    255/256 (256 for output row 0), w2 == 0 so the right edge vanishes,
    and the final input row of the image is dropped when the last span is
    clamped short (scale_outrow_box semantics, generic.c:2112-2260).
    """
    r, t = geo["r_y"], geo["t"]
    g3 = s[: t * r].reshape(t, r, s.shape[-1])
    mids = jnp.sum(g3[:, 1:, :], axis=1)
    row = gr * t + jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    first = g3[:, 0, :].astype(jnp.uint32)
    w = jnp.where(row == 0, jnp.uint32(256), jnp.uint32(255))
    left = ((first * w) >> 8).astype(jnp.int32) & mask
    acc = left + mids
    if geo["v_last_short"]:
        acc = acc - jnp.where(row == h_out - 1, g3[:, r - 1, :], 0)
    return _mul_shift_round24(acc, jnp.int32(span_mul_y)) & norm_mask


def _h_stage_i32(y, hfac_ref, geo, span_mul_x, mask, norm_mask):
    """Horizontal dense-ladder stage on gathered int32 samples: packed
    lerp (folded into the weighted gather matmul, y = p*F + q*(256-F)) +
    halving-ladder sublane reduce (generic.c:1290-1361).  Box plans take
    _h_box_fold_stage instead."""
    jc_out, kh = geo["jc_out"], geo["kh"]
    win_r = geo["win_r"]
    s = (y >> 8) & mask
    if kh:
        s3 = s.reshape(win_r, 1 << kh, jc_out)
        s = (jnp.sum(s3, axis=1) >> kh) & mask
    return s


def _v_stage_i32(yv, vfac_ref, geo, span_mul_y, mask, norm_mask):
    """Vertical dense-ladder stage (lerp + ladder,
    scale_outrow_bilinear_Nh, generic.c:1841-1916).  Box plans take
    _v_box_fold_stage instead."""
    t, kv = geo["t"], geo["kv"]
    jc_out = geo["jc_out"]
    sv = (yv >> 8) & mask
    if kv:
        sv3 = sv.reshape(1 << kv, t, jc_out)
        sv = (jnp.sum(sv3, axis=0) >> kv) & mask
    return sv


def _make_kernel(plan: ScalePlan, geo, planes=False, skip_alpha=False,
                 row_base=0):
    """``planes``: channel-major (B, 3, H, W) u8 feed for 24bpp inputs --
    plane p is surrogate byte p, alpha is the synthesized constant 255
    (unpack_pixel_123_*, generic.c:353-358) so it never rides HBM.  With
    ``skip_alpha`` (24bpp output: the alpha byte is sliced off) the alpha
    channel's filter work is skipped entirely.  ``row_base`` offsets the
    grid's row-group index to the global row-group id (the fused
    row-range path, _built_rows, launches a grid over a sub-range of
    groups; only the uniform V box stage needs global output rows for its
    edge weights -- every other V form encodes position in its sliced
    tables)."""
    in_layout = plan.meta_in.layout
    out_layout = plan.meta_out.layout
    unassoc_in = plan.meta_in.alpha == AlphaType.UNASSOCIATED
    alpha_byte = in_layout.index(3)
    assert not planes or (alpha_byte == 3 and not unassoc_in)
    kh, kv = geo["kh"], geo["kv"]
    t, tv = geo["t"], geo["t"] << kv
    jc, jc_out = geo["jc"], geo["jc_out"]
    win_r, win_c = geo["win_r"], geo["win_c"]
    h_is_box, v_is_box = geo["h_is_box"], geo["v_is_box"]
    span_mul_x, span_mul_y = geo["span_mul_x"], geo["span_mul_y"]

    def _h_general_64(y, hfac_ref):
        # dense ladder (upscales/repeated offsets): lerp folded into the
        # weighted matmul, y = p*F + q*(256-F); box plans take the
        # edge-folded int8 stage instead
        s = (y.astype(jnp.int32) >> 8) & 0xFF  # (win_r, jc)
        if kh:
            s3 = s.reshape(win_r, 1 << kh, jc_out)
            s = (jnp.sum(s3, axis=1) >> kh) & 0xFF
        return s

    def _v_general_64(yv, vfac_ref):
        sv = (yv.astype(jnp.int32) >> 8) & 0xFF  # (tv, jc_out)
        if kv:
            sv3 = sv.reshape(1 << kv, t, jc_out)
            sv = (jnp.sum(sv3, axis=0) >> kv) & 0xFF
        return sv

    def kernel(rs_ref, cs_ref, x_any, mh_ref, hfac_ref, mv_ref, vfac_ref,
               o_ref, xwin, sem):
        b = pl.program_id(0)
        gr = pl.program_id(1)
        gc = pl.program_id(2)
        cs = pl.multiple_of(cs_ref[gc], 128)
        if _ABLATE == "nodma":  # timing-only: compute on stale VMEM
            # (probe_r5_i on the 128bpp twin: nodma ran SLOWER than full,
            # so the hand-rolled double buffering already hides the
            # window DMA behind compute; kept for future overlap checks)
            px = xwin[0]
        else:
            px = _window_dma(
                rs_ref, cs_ref, x_any, xwin, sem, win_r, win_c, b, gr, gc,
                planes=planes,
            )
        mh = mh_ref[0]
        mv = mv_ref[0]

        if planes:
            a_vals = None
        else:
            a_vals = (
                (px >> (8 * alpha_byte)) & jnp.uint32(0xFF)
            ).astype(jnp.int32)
        # f=128 uniform-ladder H: average the PACKED pixels once -- all
        # four channels' lerps in one 4-op SWAR stream (the per-channel
        # lerp was 43% of config 1b's runtime).  Requires byte channels
        # untouched before the H filter, so unassociated input (in-kernel
        # premultiply) keeps the per-channel path.
        pre_avg = (
            geo["h_lad"] is not None
            and geo["h_lad"][1] == 128
            and not planes
            and not unassoc_in
            and _ABLATE is None
        )
        if pre_avg:
            px = _avg_floor_packed(px, jnp.roll(px, -1, axis=1))
        # general-f twin of pre_avg for the lerp-map ladder: lerp the
        # packed pixels as two 16-bit-lane channel pairs (_pair_lerp)
        # instead of four unpacked per-channel lerp256 streams
        pre_lerp = (
            geo["h_lmap"]
            and not planes
            and not unassoc_in
            and _ABLATE is None
        )
        if pre_lerp:
            l02, l13 = _pair_lerp(px, hfac_ref[0, 0:1, :])

        out_px = jnp.zeros((t, jc_out), dtype=jnp.uint32)
        for byte_pos in range(4):
            if planes:
                if byte_pos == alpha_byte:
                    if skip_alpha:
                        continue
                    ch = jnp.full((win_r, win_c), 255, jnp.int32)
                else:
                    ch = px[byte_pos].astype(jnp.int32)
            elif pre_lerp:
                src = l02 if (byte_pos & 1) == 0 else l13
                ch = (
                    (src >> jnp.uint32(16 * (byte_pos >> 1)))
                    & jnp.uint32(0xFF)
                ).astype(jnp.int32)
            else:
                ch = (
                    (px >> (8 * byte_pos)) & jnp.uint32(0xFF)
                ).astype(jnp.int32)
            if unassoc_in and byte_pos != alpha_byte:
                ch = (((ch + 1) * (a_vals + 1) - 1) >> 8) & 0xFF
            if _ABLATE in ("nohmm", "nofilter"):
                # timing-only: keep the data dependency but skip the H
                # stage; tile whole 128-lane slices so upscales
                # (win_c < jc_out) also lower (1-lane broadcasts crash
                # the Mosaic remote compile)
                rep = -(-jc_out // ch.shape[1])
                s = (jnp.concatenate([ch] * rep, axis=1)[:, :jc_out]
                     if rep > 1 else ch[:, :jc_out])
            elif geo["h_copy"]:
                # identity (interp_horizontal_copy, generic.c:1583-1611)
                s = ch[:, :jc_out]
            elif geo["h_one"]:
                # first-pixel broadcast (interp_horizontal_one,
                # generic.c:1558-1581)
                s = jnp.broadcast_to(ch[:, 0:1], (win_r, jc_out))
            elif geo["h_uniform"]:
                # 8-bit values: one biased int8 limb (see _uniform_span_mm)
                s = _h_uniform_stage(
                    ch, mh, hfac_ref, geo, cs, plan.width_out, span_mul_x,
                    0xFF, 2
                )
            elif geo["h_lad"] is not None:
                s = _h_uniform_ladder_stage(ch, mh, hfac_ref, geo, 0xFF, 2,
                                            pre_lerped=pre_avg)
            elif geo["h_lmap"]:
                s = _h_lerpmap_stage(ch, mh, hfac_ref, geo, 0xFF, 1,
                                     pre_lerped=pre_lerp)
            elif h_is_box and geo["h_box3"]:
                s = _h_box_post_stage(
                    ch, mh, hfac_ref, geo, span_mul_x, 0xFF, 0xFF
                )
            elif h_is_box:
                s = _h_box_fold_stage(
                    ch, mh, hfac_ref, geo, span_mul_x, 0xFF, 0xFF, 1
                )
            else:
                sp = None if geo["h_spans"] is None else geo["h_spans"][0]
                y = _gather_mm(ch, mh, 1, spans=sp)
                s = _h_general_64(y, hfac_ref)
            if _ABLATE in ("novmm", "nohmm", "nofilter"):
                # timing-only; broadcast so upscales (win_r < t) lower
                sv = jnp.broadcast_to(s[:1, :], (t, s.shape[-1]))
            elif geo["v_copy"]:
                # identity rows (scale_outrow_copy, generic.c:2296-2318)
                sv = s[:t, :]
            elif geo["v_one"]:
                # first-row broadcast (scale_outrow_one, generic.c:2262-2294)
                sv = jnp.broadcast_to(s[0:1, :], (t, s.shape[-1]))
            elif geo["v_uniform"]:
                sv = _v_uniform_stage(
                    s, geo, gr + row_base, plan.height_out, span_mul_y,
                    0xFF, 0xFF
                )
            elif geo["v_lad"] is not None:
                sv = _v_uniform_ladder_stage(s, geo, 0xFF)
            elif geo["v_lmap"]:
                sv = _v_lerpmap_stage(s, mv, vfac_ref, geo, 0xFF, 1)
            elif v_is_box and geo["v_box3"]:
                sv = _v_box_post_stage(
                    s, mv, vfac_ref, geo, span_mul_y, 0xFF, 0xFF
                )
            elif v_is_box:
                sv = _v_box_fold_stage(
                    s, mv, vfac_ref, geo, span_mul_y, 0xFF, 0xFF, 1
                )
            else:
                if geo["v_chunks"] is not None:
                    # K-chunked dense V (_v_chunk_slices): chunk j's
                    # matrix rows were hull-extracted host-side, so it
                    # contracts only against s[k0:k0+kw]
                    k0s, cm_v, kw_v = geo["v_chunks"]
                    parts = [
                        jnp.dot(
                            mv[j * cm_v : (j + 1) * cm_v],
                            s[k0 : k0 + kw_v].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32,
                        )
                        for j, k0 in enumerate(k0s)
                    ]
                    yv = (jnp.concatenate(parts, axis=0)
                          if len(parts) > 1 else parts[0])[:tv]
                else:
                    yv = jnp.dot(
                        mv, s.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32,
                    )
                sv = _v_general_64(yv, vfac_ref)
            out_byte = out_layout.index(in_layout[byte_pos])
            out_px = out_px | (sv.astype(jnp.uint32) << (8 * out_byte))
        o_ref[0] = out_px

    return kernel


@functools.cache
def _built(plan: ScalePlan, batch: int):
    geo = _geometry(plan, uniform_ok=True, **_geo_kw(plan))
    kernel = _make_kernel(plan, geo)
    t, jc_out = geo["t"], geo["jc_out"]
    grid = (batch, geo["n_rg"], geo["n_ct"])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # rstart, cstart
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # full input, DMA'd manually
            pl.BlockSpec(
                (1,) + geo["mh"].shape[1:],
                lambda b, gr, gc, *_: (gc, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1,) + geo["hfac"].shape[1:],
                lambda b, gr, gc, *_: (gc, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1,) + geo["mv"].shape[1:],
                lambda b, gr, gc, *_: (gr, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1,) + geo["vfac"].shape[1:],
                lambda b, gr, gc, *_: (gr, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, t, jc_out), lambda b, gr, gc, *_: (b, gr, gc),
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
            (batch, geo["h_out_pad"], geo["w_out_pad"]), jnp.uint32
        ),
        grid_spec=grid_spec,
    )

    h_out, w_out = plan.height_out, plan.width_out

    h_in, w_in = plan.height_in, plan.width_in

    unassoc_out = plan.meta_out.alpha == AlphaType.UNASSOCIATED

    def fn(imgs):
        if imgs.dtype == jnp.uint32:  # pre-packed pixel view (free on host)
            px = imgs
        else:
            px = jax.lax.bitcast_convert_type(imgs, jnp.uint32)
        if geo["h_pad"] != h_in or geo["w_pad"] != w_in:
            px = jnp.pad(
                px,
                [(0, 0), (0, geo["h_pad"] - h_in), (0, geo["w_pad"] - w_in)],
            )
        out = call(
            jnp.asarray(geo["rstart"]), jnp.asarray(geo["cstart"]), px,
            jnp.asarray(geo["mh"]), jnp.asarray(geo["hfac"]),
            jnp.asarray(geo["mv"]), jnp.asarray(geo["vfac"]),
        )
        out = out[:, :h_out, :w_out]
        if unassoc_out:
            from .pallas_box import _unpremul_epilogue

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
def _built_rows(plan: ScalePlan, batch: int, g0: int, g1: int):
    """Fused kernel over output row groups [g0, g1) -- the row-batch /
    streaming analogue (smol_scale_batch_full, smolscale.c:506-546): one
    chunk's rows run the SAME fused unpack->H->V->pack pipeline as the
    full image, so HBM sees only the chunk's input window plus its small
    output, where the op-graph row-window path (xla.row_shard_fn)
    materializes ~16 B of int32 intermediates per window pixel.  The
    geometry is the full-image one; the grid simply covers the sub-range
    of row groups, with rstart / mv / vfac sliced to it and the uniform V
    stage's global row ids offset by g0 (row_base)."""
    geo = _geometry(plan, uniform_ok=True, **_geo_kw(plan))
    kernel = _make_kernel(plan, geo, row_base=g0)
    t, jc_out = geo["t"], geo["jc_out"]
    n_rg = g1 - g0
    grid = (batch, n_rg, geo["n_ct"])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # rstart (sliced), cstart
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (1,) + geo["mh"].shape[1:],
                lambda b, gr, gc, *_: (gc, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1,) + geo["hfac"].shape[1:],
                lambda b, gr, gc, *_: (gc, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1,) + geo["mv"].shape[1:],
                lambda b, gr, gc, *_: (gr, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1,) + geo["vfac"].shape[1:],
                lambda b, gr, gc, *_: (gr, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, t, jc_out), lambda b, gr, gc, *_: (b, gr, gc),
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
            (batch, n_rg * t, geo["w_out_pad"]), jnp.uint32
        ),
        grid_spec=grid_spec,
    )

    h_in, w_in = plan.height_in, plan.width_in
    w_out = plan.width_out
    unassoc_out = plan.meta_out.alpha == AlphaType.UNASSOCIATED

    def fn(imgs):
        if imgs.dtype == jnp.uint32:
            px = imgs
        else:
            px = jax.lax.bitcast_convert_type(imgs, jnp.uint32)
        if geo["h_pad"] != h_in or geo["w_pad"] != w_in:
            px = jnp.pad(
                px,
                [(0, 0), (0, geo["h_pad"] - h_in), (0, geo["w_pad"] - w_in)],
            )
        out = call(
            jnp.asarray(geo["rstart"][g0:g1]), jnp.asarray(geo["cstart"]),
            px,
            jnp.asarray(geo["mh"]), jnp.asarray(geo["hfac"]),
            jnp.asarray(geo["mv"][g0:g1]), jnp.asarray(geo["vfac"][g0:g1]),
        )
        out = out[:, :, :w_out]
        if unassoc_out:
            from .pallas_box import _unpremul_epilogue

            out = _unpremul_epilogue(plan, out)
        return jax.lax.bitcast_convert_type(out, jnp.uint8)

    return fn


def scale_rows_fn(plan: ScalePlan, imgs, first: int, n: int):
    """Fused output rows [first, first+n): (B, H, W, 4) u8 / packed u32
    (or one image) -> (B, n, w_out, 4) u8.  Caller checks applicable();
    rows outside the covering row groups are computed and sliced off
    (the recompute-at-edges trade of smolscale.c:512-530, at row-group
    granularity)."""
    geo = _geometry(plan, uniform_ok=True, **_geo_kw(plan))
    t = geo["t"]
    g0, g1 = first // t, -(-(first + n) // t)
    squeeze = imgs.ndim == (2 if imgs.dtype == jnp.uint32 else 3)
    if squeeze:
        imgs = imgs[None]
    out = _built_rows(plan, imgs.shape[0], g0, g1)(imgs)
    lo = first - g0 * t
    out = out[:, lo : lo + n]
    return out[0] if squeeze else out


@functools.cache
def _built_planes(plan: ScalePlan, batch: int, skip_alpha: bool):
    """Channel-major u8 planes variant of _built for 24bpp inputs.

    Takes (B, 3, H, W) u8 (plane p = surrogate byte p) instead of packed
    u32 pixels: no on-device pad-to-32bpp + bitcast relayout, 25% less
    window DMA, and the synthesized-255 alpha channel is a kernel
    constant (skipped outright when the output drops it)."""
    geo = _geometry(plan, uniform_ok=True, **_geo_kw(plan))
    kernel = _make_kernel(plan, geo, planes=True, skip_alpha=skip_alpha)
    t, jc_out = geo["t"], geo["jc_out"]
    grid = (batch, geo["n_rg"], geo["n_ct"])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # rstart, cstart
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # full input, DMA'd manually
            pl.BlockSpec(
                (1,) + geo["mh"].shape[1:],
                lambda b, gr, gc, *_: (gc, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1,) + geo["hfac"].shape[1:],
                lambda b, gr, gc, *_: (gc, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1,) + geo["mv"].shape[1:],
                lambda b, gr, gc, *_: (gr, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1,) + geo["vfac"].shape[1:],
                lambda b, gr, gc, *_: (gr, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, t, jc_out), lambda b, gr, gc, *_: (b, gr, gc),
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
            (batch, geo["h_out_pad"], geo["w_out_pad"]), jnp.uint32
        ),
        grid_spec=grid_spec,
    )

    h_out, w_out = plan.height_out, plan.width_out
    h_in, w_in = plan.height_in, plan.width_in
    unassoc_out = plan.meta_out.alpha == AlphaType.UNASSOCIATED
    assert not (skip_alpha and unassoc_out)

    def fn(pls):
        if geo["h_pad"] != h_in or geo["w_pad"] != w_in:
            pls = jnp.pad(
                pls,
                [(0, 0), (0, 0), (0, geo["h_pad"] - h_in),
                 (0, geo["w_pad"] - w_in)],
            )
        out = call(
            jnp.asarray(geo["rstart"]), jnp.asarray(geo["cstart"]), pls,
            jnp.asarray(geo["mh"]), jnp.asarray(geo["hfac"]),
            jnp.asarray(geo["mv"]), jnp.asarray(geo["vfac"]),
        )
        out = out[:, :h_out, :w_out]
        if unassoc_out:
            from .pallas_box import _unpremul_epilogue

            out = _unpremul_epilogue(plan, out)
        return jax.lax.bitcast_convert_type(out, jnp.uint8)

    return fn


def scale_fn_planes(plan: ScalePlan, pls, skip_alpha: bool):
    """Channel-major (B, 3, H, W) u8 planes -> (B, h, w, 4) u8.

    ``plan`` is the 4-byte surrogate (xla._adapt_24bpp); ``skip_alpha``
    when the caller slices the alpha byte off (24bpp output).  Caller
    checks applicable()."""
    squeeze = pls.ndim == 3
    if squeeze:
        pls = pls[None]
    out = _built_planes(plan, pls.shape[0], skip_alpha)(pls)
    return out[0] if squeeze else out
