"""Fused multi-output thumbnail-pyramid kernel (BASELINE config 5).

The reference's unit of work is one image per context, so a pyramid costs
one full pass over the source per level (smol_scale_simple per level,
smolscale.c:383-420).  On TPU the dominant cost of small-image pyramids
is exactly that re-read plus per-level grid overhead: the three separate
fused-kernel launches for 512^2 -> (64, 128, 256) move 3 x 268 MB and run
at 114-310 GB/s each (benchmarks/probe_pyramid.py).  But every level of a
power-of-two pyramid is the SAME uniform constant-stride f=128 bilinear
lerp (d >= 2, see pallas_bilinear._lad_uniform) followed only by a
different number of halvings (generic.c:1290-1361: sample, then sum
2**halvings samples >> halvings), so one kernel can read each image ONCE,
compute the shared packed-SWAR lerp, and emit all levels:

* H lerp: per-byte floor average of the packed u32 pixels against their
  one-lane-rolled neighbor (_avg_floor_packed; exact for f=128, swept in
  test_fixedpoint.py::test_avg_floor_equals_lerp128).  Samples for every
  level sit at that level's offset lanes of this one array.
* H ladder: one biased int8 matmul per image -- 4 channel planes stacked
  on sublanes, contracted against the lane-concatenated 0/1 count
  matrices of all levels (column j of level l has ones at offsets
  [j*2**n, (j+1)*2**n)); the sum >> n with the per-lane static bias
  correction is the exact generic.c ladder in one MXU pass.
* V lerp: all rows against their one-sublane roll (lerp256 f=128 as
  the 3-op floor average), then ONE K-chunked biased int8 count matmul
  per level: a cm-output-row chunk of the ladder touches only a
  cm*2**n*d-row window of the lerped rows, the windows of every chunk
  share the same local count matrix (uniform stride), and the dropped
  rows are zero in the chunk's columns -- bit-identical, ~3x fewer V
  MACs than the full (h_out, h) matmul.  (A reshape-only V -- strided
  sublane selects -- measured WORSE than the matmul, 0.74 ms of the
  1.24 ms total: probe_pyramid_ablate, recorded negative result.)

Bit-exactness: each level's output equals pallas_bilinear / numpy_ref /
the C oracle byte for byte (tests/test_pallas_pyramid.py); the ladder
matmul sums are exact in int32 (counts <= 2**n <= 64, bytes <= 255).

Applicability is the intersection of the levels' uniform-ladder class:
4-byte premultiplied formats, compressed gamma, f=128 constant-stride
bilinear on both axes of every level, and the whole per-image working set
inside the Mosaic scoped-VMEM budget (one image per grid step, whole-image
blocks; bigger sources fall back to the per-level kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..formats import AlphaType, GammaType, StorageType
from ..plan import ScalePlan
from .pallas_bilinear import _avg_floor_packed, _lad_uniform

# per-image VMEM working set cap (bytes); the Mosaic scoped budget is
# ~16 MB and the kernel's peak live set is estimated in _vmem_bytes
_VMEM_BUDGET = 12 * 2**20

_ABLATE = None  # timing-only stage knob (benchmarks/probe_pyramid_ablate)
_V_CM = 32      # V ladder chunk height: the chunk window kw ~ 2*cm*2**nv,
# so total V MACs scale ~linearly with cm, against MXU M-tile waste
# below cm ~ 32 (probe_pyramid_ablate cm sweep)


def _lad128(ax):
    u = _lad_uniform(ax)
    if u is None or u[1] != 128:
        return None
    return u


def _pad128(n: int) -> int:
    return max(128, -(-n // 128) * 128)


def _vmem_bytes(h: int, w: int, plans) -> int:
    sb_pads = {
        np.asarray(p.x.offsets).tobytes(): _pad128(len(p.x.offsets))
        for p in plans
    }
    hw = h * w
    # in dbuf + the per-base compaction results (live until every level
    # consumed them)
    base = 2 * hw * 4 + sum(4 * h * sp * 4 for sp in sb_pads.values())
    # H stage adds the SWAR lerp + stacked int8 limb plane; the V stage
    # (lerp/limbs dead by then) adds the largest level's hv + its
    # reshape-lerped sample rows (the ladder is a reshape-reduce)
    h_stage = hw * 4 + 4 * hw
    v_stage = max(h * 4 * _pad128(p.width_out) * (4 + 2) for p in plans)
    return base + max(h_stage, v_stage)


def applicable(plans) -> bool:
    """True when every level runs the shared-lerp fused pyramid path.

    Unassociated 4-byte INPUT premultiplies in-kernel (the SWAR pair
    form of premul_u_to_p8, generic.c:238-244), and unassociated OUTPUT
    takes the shared output-sized unpremul epilogue per level -- only
    the unassoc->unassoc pair (internal PREMUL16, 128bpp storage,
    smolscale.c:751-758) falls back to the per-level kernels.  24bpp
    endpoints ride the channel-major planes feed via their 4-byte
    surrogate plans (pyramid_dispatch below)."""
    if not plans or len(plans) < 2:
        return False
    p0 = plans[0]
    for p in plans:
        if (
            p.width_in != p0.width_in
            or p.height_in != p0.height_in
            or p.pixel_type_in != p0.pixel_type_in
            or p.pixel_type_out != p0.pixel_type_out
            or p.with_srgb
            or p.gamma != GammaType.SRGB_COMPRESSED
            or p.storage != StorageType.S64
            or p.internal_alpha != AlphaType.PREMUL8
            or p.meta_in.alpha not in (AlphaType.PREMUL8,
                                       AlphaType.UNASSOCIATED)
            or p.meta_out.alpha not in (AlphaType.PREMUL8,
                                        AlphaType.UNASSOCIATED)
            or p.meta_in.n_bytes != 4
            or p.meta_out.n_bytes != 4
            or _lad128(p.x) is None
            or _lad128(p.y) is None
            # V reshape-lerp slices rows [o0, o0 + ns*d); every sample
            # pair is in range, but the slice end itself must be too
            or _lad128(p.y)[2] + len(p.y.offsets) * _lad128(p.y)[0]
            > p0.height_in
        ):
            return False
    # distinct output shapes only (duplicate plans would alias outputs)
    if len({(p.width_out, p.height_out) for p in plans}) != len(plans):
        return False
    h, w = p0.height_in, p0.width_in
    if w % 128 or h % 8:
        return False
    return _vmem_bytes(h, w, plans) <= _VMEM_BUDGET


def _chunk_slices(mat: np.ndarray):
    """Per-128-column contraction hulls of a static 0/1 matrix (K, N),
    or None when the dense dot is within 1.25x of the chunked MACs --
    the block-diagonal treatment of pallas_box._span_chunks, computed
    from the matrix itself (no structure assumption)."""
    k, n = mat.shape
    if n % 128 or k % 128:
        return None
    chunks, total = [], 0
    for c0 in range(0, n, 128):
        nz = np.nonzero(mat[:, c0 : c0 + 128].any(axis=1))[0]
        if len(nz) == 0:
            chunks.append((0, 0, c0))  # all-zero chunk: emit zeros
            continue
        lo = int(nz[0]) // 128 * 128
        hi = min(k, -(-int(nz[-1] + 1) // 128) * 128)
        chunks.append((lo, hi, c0))
        total += hi - lo
    if total * 1.25 > k * (n // 128):
        return None
    return chunks


def _v_tables(p: ScalePlan, lad, h: int, cm: int = None):
    if cm is None:
        cm = _V_CM
    """K-chunked V ladder tables: (mv, bases, cm, kw).

    Output-row chunk j of size cm reads lerped rows
    [o0 + (j*cm << nv)*d, ...): with uniform stride every chunk's LOCAL
    count pattern is identical, so ONE (cm, kw) int8 matrix serves all
    chunks at 8-aligned static base offsets ``bases`` -- bit-identical
    to the full (h_out, h) matmul because rows outside a chunk's window
    are zero in its columns.  Falls back to a single full-height chunk
    when alignment or divisibility rules it out."""
    d, _, o0 = lad
    nv = p.y.halvings
    h_out = p.height_out
    if h_out % cm or (cm << nv) * d % 8 or cm >= h_out:
        cm = h_out  # single chunk covering every row
    rel0 = o0 % 8
    kw = _round_up8(rel0 + ((cm << nv) - 1) * d + 2)
    bases = tuple(
        o0 - rel0 + ((j * cm) << nv) * d for j in range(h_out // cm)
    )
    if bases[-1] + kw > h:
        cm = h_out
        kw = _round_up8(rel0 + ((cm << nv) - 1) * d + 2)
        bases = (o0 - rel0,)
    # the rounded window may overhang the image; every needed index is
    # < h - base (d >= 2 and the applicable slice-end gate), so clamp
    kw = min(kw, h - bases[-1])
    mv = np.zeros((cm, kw), dtype=np.int8)
    for i in range(cm):
        for k in range(1 << nv):
            mv[i, rel0 + ((i << nv) + k) * d] = 1
    return mv, bases, cm, kw


def _round_up8(n: int) -> int:
    return -(-n // 8) * 8


def _h_tables(plans, w: int):
    """Base-ladder H tables.

    Every _lad128 level of one source shares d = 2 / f = 128 and (in
    practice) the same offset array (dim_bilin = dim_in / 2), so the
    kernel compacts the lerped samples ONCE per distinct offset array
    (one-hot base matmul, column-chunked on its hull) and runs ALL of a
    base's level ladders as ONE fused (sb, sum w_l) count matmul -- the
    n = 0 level is a plain lane slice of the base.  Returns
    (bases, lvl_tbl, comb_mats, comb_of_base): bases = [(mbase, chunks,
    sb_pad)], lvl_tbl[l] = (base_idx, comb_col_off_or_None, corr,
    shift), comb_mats[comb_of_base[bi]] = the fused ladder matrix.
    """
    key_to_idx: dict = {}
    bases, lvl_tbl, parts = [], [], []
    for p in plans:
        off = np.asarray(p.x.offsets)
        key = off.tobytes()
        if key not in key_to_idx:
            sb = len(off)
            sb_pad = _pad128(sb)
            mbase = np.zeros((w, sb_pad), dtype=np.int8)
            mbase[off, np.arange(sb)] = 1
            key_to_idx[key] = len(bases)
            bases.append((mbase, _chunk_slices(mbase), sb_pad))
        bi = key_to_idx[key]
        wl, nh = p.x.dim_out, p.x.halvings
        if nh == 0:
            lvl_tbl.append((bi, None, 0, 0))
            continue
        sb_pad = bases[bi][2]
        g = np.zeros((sb_pad, _pad128(wl)), dtype=np.int8)
        for j in range(wl):
            g[j << nh : (j + 1) << nh, j] = 1
        lvl_tbl.append((bi, g, 128 << nh, nh))
        parts.append((bi, len(lvl_tbl) - 1, g))
    # every base's ladder matrices fuse into ONE wider matmul operand
    # (column blocks are 128-padded, so the per-level slices are clean
    # lane cuts); lvl_tbl's g entry becomes the column offset
    comb_mats, comb_of_base = [], {}
    for bi, li, g in parts:
        if bi not in comb_of_base:
            comb_of_base[bi] = len(comb_mats)
            comb_mats.append([])
        blocks = comb_mats[comb_of_base[bi]]
        off_c = sum(b.shape[1] for b in blocks)
        blocks.append(g)
        bi_, _, corr, nh = lvl_tbl[li]
        lvl_tbl[li] = (bi_, off_c, corr, nh)
    comb_mats = [np.concatenate(b, axis=1) for b in comb_mats]
    return bases, lvl_tbl, comb_mats, comb_of_base


@functools.cache
def _built(plans: tuple, batch: int, planes: bool = False):
    p0 = plans[0]
    h, w = p0.height_in, p0.width_in
    in_layout = p0.meta_in.layout
    out_layout = p0.meta_out.layout
    n_ch = 3 if planes else 4  # planes: 24bpp surrogate, alpha dropped
    # byte position in the (input-ordered) filtered data feeding output
    # byte ob: the input byte holding the channel out_layout[ob]
    perm = [in_layout.index(out_layout[ob]) for ob in range(n_ch)]
    unassoc_in = (not planes
                  and p0.meta_in.alpha == AlphaType.UNASSOCIATED)
    alpha_byte = in_layout.index(3)

    bases, lvl_tbl, comb_mats, comb_of_base = _h_tables(plans, w)
    v_tbls = [_v_tables(p, _lad128(p.y), h) for p in plans]
    wlps = [_pad128(p.width_out) for p in plans]

    def kernel(x_ref, *rest):
        nb, ng = len(bases), len(comb_mats)
        mb_refs = rest[:nb]
        g_refs = rest[nb : nb + ng]
        mv_refs = rest[nb + ng : nb + ng + len(plans)]
        o_refs = rest[nb + ng + len(plans) :]
        x = x_ref[0]  # (h, w) u32, or (3, h, w) u8 with planes
        if planes:
            # leading-axis collapse (free) -> the limb stack directly.
            # The lerp runs in i32 with the -128 bias pre-folded: u8
            # elementwise arithmetic is NOT lowerable ("Only vector<i16>
            # and vector<i32> are supported" -- the u8 floor-average form
            # crashed the 5b mixed-fleet recert on-chip), and
            # ((p-q)>>1)+q == floor((p+q)/2) holds unchanged after a
            # common bias (generic.c:1290 f=128).
            xb = x.reshape(n_ch * h, w).astype(jnp.int32) - 128
            if _ABLATE in ("nolerp", "nofilter"):
                sb = xb
            else:
                qb = jnp.roll(xb, -1, axis=1)
                sb = ((xb - qb) >> 1) + qb
            limbs = sb.astype(jnp.int8)  # (3h, w) biased
        else:
            if unassoc_in and _ABLATE is None:
                # premul_u_to_p8 (generic.c:238-244) as SWAR 16-bit
                # pairs: v*a + v + a == (v+1)*(a+1) - 1 <= 65535 stays
                # inside its lane (the (v+1)*(a+1) form peaks at 65536
                # and would carry); then >> 8.  The alpha byte rides
                # through the pair math and is overwritten after.
                a = (x >> jnp.uint32(8 * alpha_byte)) & jnp.uint32(0xFF)
                a2 = a * jnp.uint32(0x00010001)
                pm = jnp.uint32(0x00FF00FF)
                p02 = x & pm
                p13 = (x >> jnp.uint32(8)) & pm
                r02 = ((p02 * a + p02 + a2) >> jnp.uint32(8)) & pm
                r13 = ((p13 * a + p13 + a2) >> jnp.uint32(8)) & pm
                x = (r02 | (r13 << jnp.uint32(8))) & ~jnp.uint32(
                    0xFF << (8 * alpha_byte)
                ) | (a << jnp.uint32(8 * alpha_byte))
            if _ABLATE in ("nolerp", "nofilter"):
                s = x
            else:
                s = _avg_floor_packed(x, jnp.roll(x, -1, axis=1))
            # channel planes (input byte order) stacked on sublanes,
            # biased via xor + truncating int8 cast (== byte - 128)
            limbs = jnp.concatenate(
                [
                    ((s >> jnp.uint32(8 * bp)) ^ jnp.uint32(0x80)
                     ).astype(jnp.int8)
                    for bp in range(4)
                ],
                axis=0,
            )  # (4h, w)
        # base compaction per distinct offset array: one-hot matmul on
        # its per-128-column hull; Rbase col i == sample_i - 128, so the
        # level ladders' biased int8 limb is a plain cast of it
        rbases = []
        for bi, (mbase, chunks, sb_pad) in enumerate(bases):
            if _ABLATE in ("nobase", "nofilter"):
                rbases.append(limbs[:, :sb_pad].astype(jnp.int32))
                continue
            mb = mb_refs[bi][...]
            if chunks is None:
                rb = jnp.dot(limbs, mb, preferred_element_type=jnp.int32)
            else:
                parts = [
                    jnp.zeros((limbs.shape[0], 128), jnp.int32)
                    if lo == hi
                    else jnp.dot(
                        limbs[:, lo:hi],
                        mb[lo:hi, c0 : c0 + 128],
                        preferred_element_type=jnp.int32,
                    )
                    for lo, hi, c0 in chunks
                ]
                rb = jnp.concatenate(parts, axis=1)
            rbases.append(rb)
        # hoisted biased int8 view of each base (values in [-128, 127],
        # the cast is exact) and the ONE fused ladder matmul per base
        # serving every ladder level at a column offset
        rb8s = {bi: rbases[bi].astype(jnp.int8) for bi in comb_of_base}
        rlcs = {}
        if _ABLATE not in ("nolad", "nofilter"):
            for bi, ci in comb_of_base.items():
                rlcs[bi] = jnp.dot(
                    rb8s[bi], g_refs[ci][...],
                    preferred_element_type=jnp.int32,
                )
        for li, p in enumerate(plans):
            wlp, nv = wlps[li], p.y.halvings
            bi, off_c, corr, nh = lvl_tbl[li]
            # hb = hl - 128, the BIASED ladder output, produced for free:
            # corr == 128 << nh, so (rlc + corr) >> nh - 128 == rlc >> nh
            # (adding a multiple of 2**nh commutes with the floor shift),
            # and the n = 0 level's hl = rbase + 128 bias cancels.  The V
            # lerp and the int8 cast below both want the biased form, so
            # the per-level ^128/+128 VPU passes disappear.
            if off_c is None:  # n = 0 level: the base IS the H output
                hb = rbases[bi][:, :wlp]
            elif _ABLATE in ("nolad", "nofilter"):
                hb = rbases[bi][:, :wlp]
            else:
                assert corr == 128 << nh
                hb = rlcs[bi][:, off_c : off_c + wlp] >> nh
            # V lerp directly on the channel-stacked hb (lerp256 f=128
            # == ((p-q)>>1)+q, generic.c:1290; rows whose lerp partner
            # crosses a channel boundary are odd and never read -- the
            # V count matmul consumes sample rows only), then one
            # K-chunked biased int8 count matmul per chunk over the
            # per-channel i8 slices lane-concatenated in OUTPUT byte
            # order (i8 concat costs 1/4 of the old i32 hv concat)
            if _ABLATE in ("nov", "nofilter"):
                o = jnp.concatenate(
                    [hb[perm[ob] * h : perm[ob] * h + p.height_out] + 128
                     for ob in range(n_ch)], axis=1,
                )
            elif _ABLATE == "novlerp":  # timing-only: V matmul, no lerp
                v8 = hb.astype(jnp.int8)
            if _ABLATE not in ("nov", "nofilter"):
                if _ABLATE != "novlerp":
                    # V lerp on the biased planes: ((p-q)>>1)+q ==
                    # floor((p+q)/2) for any ints (generic.c:1290 f=128),
                    # and the identity holds unchanged after the common
                    # -128 bias, so v8 is directly the biased int8 matmul
                    # operand.  (A u8-lane form would move 4x less VPU
                    # data but sub-32-bit elementwise ops crash the
                    # Mosaic remote compile -- probe_r5_g/_i, recorded
                    # negative result.)
                    qb = jnp.roll(hb, -1, axis=0)
                    v8 = (((hb - qb) >> 1) + qb).astype(jnp.int8)
                mvl = mv_refs[li][...]
                _, v_bases, cm_v, kw_v = v_tbls[li]
                # every chunk shares mvl, so ALL chunks ride ONE matmul
                # with their windows lane-concatenated (i8 copies);
                # 14 small dots per image measured launch-bound
                sw = jnp.concatenate(
                    [v8[perm[ob] * h + b0 : perm[ob] * h + b0 + kw_v]
                     for b0 in v_bases for ob in range(n_ch)], axis=1,
                )  # (kw, n_chunks*n_ch*wlp) i8
                y = jnp.dot(mvl, sw, preferred_element_type=jnp.int32)
                blk = n_ch * wlp
                o = (jnp.concatenate(
                    [y[:, j * blk : (j + 1) * blk]
                     for j in range(len(v_bases))], axis=0)
                    if len(v_bases) > 1 else y)
                o = (o + (128 << nv)) >> nv  # (h_out, n_ch*wlp) bytes
            packed = jnp.zeros((o.shape[0], wlp), dtype=jnp.uint32)
            for ob in range(n_ch):
                packed = packed | (
                    o[:, ob * wlp : (ob + 1) * wlp].astype(jnp.uint32)
                    << jnp.uint32(8 * ob)
                )
            o_refs[li][0] = packed[:, : p.width_out]

    x_spec = (
        pl.BlockSpec((1, 3, h, w), lambda b: (b, 0, 0, 0))
        if planes
        else pl.BlockSpec((1, h, w), lambda b: (b, 0, 0))
    )
    in_specs = (
        [x_spec]
        + [pl.BlockSpec(mb.shape, lambda b: (0, 0)) for mb, _, _ in bases]
        + [pl.BlockSpec(g.shape, lambda b: (0, 0)) for g in comb_mats]
        + [pl.BlockSpec(vt[0].shape, lambda b: (0, 0)) for vt in v_tbls]
    )
    out_specs = [
        pl.BlockSpec((1, p.height_out, p.width_out), lambda b: (b, 0, 0))
        for p in plans
    ]
    call = pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((batch, p.height_out, p.width_out), jnp.uint32)
            for p in plans
        ],
    )

    # keep numpy here: _built is cached, and materializing jnp constants
    # inside a caller's trace would leak tracers into later traces
    consts_np = ([mb for mb, _, _ in bases] + comb_mats
                 + [vt[0] for vt in v_tbls])
    unassoc_out = p0.meta_out.alpha == AlphaType.UNASSOCIATED

    def fn(imgs):
        if planes or imgs.dtype == jnp.uint32:
            px = imgs
        else:
            px = jax.lax.bitcast_convert_type(imgs, jnp.uint32)
        outs = call(px, *(jnp.asarray(c) for c in consts_np))
        if unassoc_out and not planes:
            # output-sized shared unpremul pack (unpremul_p8_to_u,
            # generic.c:227-236), per level
            from .pallas_box import _unpremul_epilogue

            outs = [_unpremul_epilogue(p, o) for p, o in zip(plans, outs)]
        return tuple(jax.lax.bitcast_convert_type(o, jnp.uint8) for o in outs)

    return fn


def pyramid_fn(plans: tuple, imgs):
    """(B, H, W, 4) u8 (or packed (B, H, W) u32) -> tuple of
    (B, h_l, w_l, 4) u8, one per plan.  Caller checks applicable()."""
    squeeze = imgs.ndim == (2 if imgs.dtype == jnp.uint32 else 3)
    if squeeze:
        imgs = imgs[None]
    outs = _built(tuple(plans), imgs.shape[0])(imgs)
    return tuple(o[0] for o in outs) if squeeze else outs


def pyramid_dispatch(plans: tuple):
    """The fused multi-output path for these plans as a traceable
    fn(imgs) -> per-level u8 tuple, or None when the plan set doesn't
    qualify.  24bpp endpoints run the channel-major u8 planes feed
    against their byte-compatible 4-byte surrogate plans (the
    xla._adapt_24bpp identity: the 24bpp unpack is the 32bpp premul
    unpack with a constant 255 alpha, generic.c:353-358), with the
    constant alpha channel's filter work skipped outright."""
    plans = tuple(plans)
    if applicable(plans):
        return lambda imgs: pyramid_fn(plans, imgs)
    p0 = plans[0] if plans else None
    if p0 is None or p0.meta_in.n_bytes != 3 or p0.meta_out.n_bytes != 3:
        return None
    from ..backends.xla import _adapt_24bpp

    adapted = [_adapt_24bpp(p) for p in plans]
    if any(a is None for a in adapted):
        return None
    sps = tuple(a[0] for a in adapted)
    if not applicable(sps):
        return None

    def fn(imgs):
        pls = jnp.moveaxis(imgs, -1, -3)  # (B, 3, H, W) u8 planes
        squeeze = pls.ndim == 3
        if squeeze:
            pls = pls[None]
        outs = _built(sps, pls.shape[0], planes=True)(pls)
        outs = tuple(o[..., :3] for o in outs)
        return tuple(o[0] for o in outs) if squeeze else outs

    return fn
