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
* V lerp + ladder: pure sublane reshapes, NO matmul (the
  _v_uniform_ladder_stage identity): with d >= 2 both rows of sample i
  live inside its own d-row group, so a leading-axis reshape exposes
  the lerp pair, and the ladder sums 2**n consecutive sample rows
  (scale_outrow_bilinear_Nh, generic.c:1841-1916).  Replacing the
  original per-level V count matmuls -- the kernel's largest matmul
  class, ~176M MACs/image -- with reshapes took config 5 from 246k to
  over 300k pyramids/s.

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


def _h_tables(plans, w: int):
    """Base-ladder H tables.

    Every _lad128 level of one source shares d = 2 / f = 128 and (in
    practice) the same offset array (dim_bilin = dim_in / 2), so the
    kernel compacts the lerped samples ONCE per distinct offset array
    (one-hot base matmul, column-chunked on its hull) and runs each
    level's 2**n ladder as a small (sb, w_l) count matmul on the base --
    the n = 0 level is a plain lane slice of it.  Returns
    (bases, lvl_tbl): bases = [(mbase, chunks, sb_pad)], lvl_tbl[l] =
    (base_idx, g_or_None, corr, shift).
    """
    key_to_idx: dict = {}
    bases, lvl_tbl = [], []
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
    return bases, lvl_tbl


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

    bases, lvl_tbl = _h_tables(plans, w)
    v_lads = [_lad128(p.y) for p in plans]
    wlps = [_pad128(p.width_out) for p in plans]
    gl_mats = [g for _, g, _, _ in lvl_tbl if g is not None]

    def kernel(x_ref, *rest):
        nb, ng = len(bases), len(gl_mats)
        mb_refs = rest[:nb]
        g_refs = rest[nb : nb + ng]
        o_refs = rest[nb + ng :]
        x = x_ref[0]  # (h, w) u32, or (3, h, w) u8 with planes
        if planes:
            # leading-axis collapse (free) -> the limb stack directly;
            # the floor average is closed over u8 (never exceeds max)
            xc = x.reshape(n_ch * h, w)
            if _ABLATE in ("nolerp", "nofilter"):
                s8 = xc
            else:
                q = jnp.roll(xc, -1, axis=1)
                s8 = (xc & q) + ((xc ^ q) >> 1)
            limbs = (s8 ^ jnp.uint8(0x80)).astype(jnp.int8)  # (3h, w)
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
        # the cast is exact); computed once, shared by every ladder level
        rb8s = [rb.astype(jnp.int8) for rb in rbases]
        gi = 0
        for li, p in enumerate(plans):
            wlp, nv = wlps[li], p.y.halvings
            bi, g, corr, nh = lvl_tbl[li]
            if g is None:  # n = 0 level: the base IS the H output
                hl = rbases[bi][:, :wlp] + 128
            elif _ABLATE in ("nolad", "nofilter"):
                gi += 1
                hl = rbases[bi][:, :wlp] + 128
            else:
                rl = jnp.dot(
                    rb8s[bi], g_refs[gi][...],
                    preferred_element_type=jnp.int32,
                )
                gi += 1
                hl = (rl + corr) >> nh
            # Pair-packed V: the level's channels pack into TWO
            # 16-bit-lane streams keyed by OUTPUT byte (out bytes k and
            # k+2 share stream k), so the V lerp + ladder run on half
            # the data with both channels per op -- values are bytes,
            # the floor average stays <= 255 per lane, and the ladder
            # sum of 2**nv lanes <= 255 << nv < 2**16 never carries.
            # The final pack is then one shift-or of the two streams.
            e = []
            for k in range(min(2, n_ch)):
                lo = hl[perm[k] * h : (perm[k] + 1) * h]
                if k + 2 < n_ch:
                    hi = hl[perm[k + 2] * h : (perm[k + 2] + 1) * h]
                    e.append(lo | (hi << 16))
                else:
                    e.append(lo)
            # V lerp + ladder as pure sublane reshapes (the
            # _v_uniform_ladder_stage identity; d >= 2 keeps both lerp
            # rows of sample i inside its own d-row group): lerp256 with
            # f = 128 is the floor average per 16-bit lane, the ladder a
            # leading-axis reshape-sum >> nv (generic.c:1841-1916)
            d_y, _, o0y = v_lads[li]
            ns = p.height_out << nv
            outs2 = []
            for st in e:
                if _ABLATE in ("nov", "nofilter"):
                    outs2.append(st[: p.height_out])
                    continue
                g3 = st[o0y : o0y + ns * d_y].reshape(ns, d_y, wlp)
                p_, q_ = g3[:, 0, :], g3[:, 1, :]
                lerped = (p_ & q_) + (((p_ ^ q_) >> 1) & 0x007F007F)
                if nv:
                    ssum = jnp.sum(
                        lerped.reshape(p.height_out, 1 << nv, wlp), axis=1
                    )
                    outs2.append((ssum >> nv) & 0x00FF00FF)
                else:
                    outs2.append(lerped)
            packed = outs2[0]
            if len(outs2) > 1:
                packed = packed | (outs2[1] << 8)
            o_refs[li][0] = packed.astype(jnp.uint32)[:, : p.width_out]

    x_spec = (
        pl.BlockSpec((1, 3, h, w), lambda b: (b, 0, 0, 0))
        if planes
        else pl.BlockSpec((1, h, w), lambda b: (b, 0, 0))
    )
    in_specs = (
        [x_spec]
        + [pl.BlockSpec(mb.shape, lambda b: (0, 0)) for mb, _, _ in bases]
        + [pl.BlockSpec(g.shape, lambda b: (0, 0)) for g in gl_mats]
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
    consts_np = [mb for mb, _, _ in bases] + gl_mats
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
