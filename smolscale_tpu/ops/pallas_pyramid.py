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
* V lerp: the halved H rows are < 256, so lerp256(p, q, 128) elementwise
  against the one-sublane-rolled rows ((p - q) >> 1) + q, per level.
* V ladder: one biased int8 left-matmul per level, channels side by side
  on lanes.

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
    # (lerp/limbs dead by then) adds the largest level's hv + lerp +
    # int8 limbs (the ladder result rl is consumed into hv immediately)
    h_stage = hw * 4 + 4 * hw
    v_stage = max(h * 4 * _pad128(p.width_out) * (4 + 4 + 1) for p in plans)
    return base + max(h_stage, v_stage)


def applicable(plans) -> bool:
    """True when every level runs the shared-lerp fused pyramid path."""
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
            or p.meta_in.alpha != AlphaType.PREMUL8
            or p.meta_out.alpha != AlphaType.PREMUL8
            or p.meta_in.n_bytes != 4
            or p.meta_out.n_bytes != 4
            or _lad128(p.x) is None
            or _lad128(p.y) is None
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


def _v_count_matrix(p: ScalePlan, h: int):
    """One level's V ladder count matrix, (h_out, h) int8."""
    hl, n = p.y.dim_out, p.y.halvings
    c = np.zeros((hl, h), dtype=np.int8)
    off = np.asarray(p.y.offsets)
    for j in range(hl):
        c[j, off[j << n : (j + 1) << n]] = 1
    return c


@functools.cache
def _built(plans: tuple, batch: int):
    p0 = plans[0]
    h, w = p0.height_in, p0.width_in
    in_layout = p0.meta_in.layout
    out_layout = p0.meta_out.layout
    # byte position in the (input-ordered) filtered data feeding output
    # byte ob: the input byte holding the channel out_layout[ob]
    perm = [in_layout.index(out_layout[ob]) for ob in range(4)]

    bases, lvl_tbl = _h_tables(plans, w)
    mvs = [_v_count_matrix(p, h) for p in plans]
    wlps = [_pad128(p.width_out) for p in plans]
    gl_mats = [g for _, g, _, _ in lvl_tbl if g is not None]

    def kernel(x_ref, *rest):
        nb, ng = len(bases), len(gl_mats)
        mb_refs = rest[:nb]
        g_refs = rest[nb : nb + ng]
        mv_refs = rest[nb + ng : nb + ng + len(plans)]
        o_refs = rest[nb + ng + len(plans) :]
        x = x_ref[0]  # (h, w) u32
        s = _avg_floor_packed(x, jnp.roll(x, -1, axis=1))
        # channel planes (input byte order) stacked on sublanes, biased
        # via xor + truncating int8 cast (== byte - 128, the cast masks)
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
        gi = 0
        for li, p in enumerate(plans):
            wlp, nv = wlps[li], p.y.halvings
            bi, g, corr, nh = lvl_tbl[li]
            if g is None:  # n = 0 level: the base IS the H output
                hl = rbases[bi][:, :wlp] + 128
            else:
                rl = jnp.dot(
                    rbases[bi].astype(jnp.int8),
                    g_refs[gi][...],
                    preferred_element_type=jnp.int32,
                )
                gi += 1
                hl = (rl + corr) >> nh
            # channels side by side on lanes for one V matmul per level
            hv = jnp.concatenate(
                [hl[bp * h : (bp + 1) * h] for bp in range(4)], axis=1
            )  # (h, 4*wlp)
            q = jnp.roll(hv, -1, axis=0)
            v = ((hv - q) >> 1) + q  # lerp256(p, q, 128), generic.c:1290
            v8 = (v ^ 128).astype(jnp.int8)  # xor-cast == v - 128
            o = jnp.dot(mv_refs[li][...], v8, preferred_element_type=jnp.int32)
            o = (o + (128 << nv)) >> nv  # (h_out, 4*wlp) bytes
            packed = jnp.zeros(o.shape[:-1] + (wlp,), dtype=jnp.uint32)
            for ob in range(4):
                bp = perm[ob]
                packed = packed | (
                    o[:, bp * wlp : (bp + 1) * wlp].astype(jnp.uint32)
                    << jnp.uint32(8 * ob)
                )
            o_refs[li][0] = packed[:, : p.width_out]

    in_specs = (
        [pl.BlockSpec((1, h, w), lambda b: (b, 0, 0))]
        + [pl.BlockSpec(mb.shape, lambda b: (0, 0)) for mb, _, _ in bases]
        + [pl.BlockSpec(g.shape, lambda b: (0, 0)) for g in gl_mats]
        + [pl.BlockSpec(m.shape, lambda b: (0, 0)) for m in mvs]
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
    consts_np = [mb for mb, _, _ in bases] + gl_mats + list(mvs)

    def fn(imgs):
        if imgs.dtype == jnp.uint32:
            px = imgs
        else:
            px = jax.lax.bitcast_convert_type(imgs, jnp.uint32)
        outs = call(px, *(jnp.asarray(c) for c in consts_np))
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
