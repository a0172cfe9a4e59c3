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
    p_cols = sum(_pad128(p.width_out) for p in plans)
    hw = h * w
    base = 2 * hw * 4 + 4 * h * p_cols * 4  # in dbuf + H matmul result
    # H stage adds the SWAR lerp + stacked int8 limb plane; the V stage
    # (lerp/limbs dead by then) adds the largest level's hv + lerp + limbs
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


def _h_count_matrix(plans, w: int):
    """Lane-concatenated H ladder count matrices, (w, P) int8, plus the
    per-lane bias-correction (128 * 2**n) and shift (n) row vectors."""
    blocks, corr, shift = [], [], []
    for p in plans:
        wl, n = p.x.dim_out, p.x.halvings
        wlp = _pad128(wl)
        c = np.zeros((w, wlp), dtype=np.int8)
        off = np.asarray(p.x.offsets)
        for j in range(wl):
            c[off[j << n : (j + 1) << n], j] = 1
        blocks.append(c)
        corr.append(np.full((wlp,), 128 << n, dtype=np.int32))
        shift.append(np.full((wlp,), n, dtype=np.int32))
    return (
        np.concatenate(blocks, axis=1),
        np.concatenate(corr)[None, :],
        np.concatenate(shift)[None, :],
    )


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

    mh, corr_h, shift_h = _h_count_matrix(plans, w)
    mvs = [_v_count_matrix(p, h) for p in plans]
    wlps = [_pad128(p.width_out) for p in plans]
    col0 = np.concatenate([[0], np.cumsum(wlps)])

    def kernel(x_ref, mh_ref, ch_ref, sh_ref, *rest):
        mv_refs, o_refs = rest[: len(plans)], rest[len(plans) :]
        x = x_ref[0]  # (h, w) u32
        s = _avg_floor_packed(x, jnp.roll(x, -1, axis=1))
        # channel planes (input byte order) stacked on sublanes, biased
        limbs = jnp.concatenate(
            [
                (((s >> jnp.uint32(8 * bp)) & jnp.uint32(0xFF)).astype(jnp.int32) - 128)
                for bp in range(4)
            ],
            axis=0,
        ).astype(jnp.int8)  # (4h, w)
        r = jnp.dot(limbs, mh_ref[...], preferred_element_type=jnp.int32)
        hcat = (r + ch_ref[...]) >> sh_ref[...]  # (4h, P) bytes, all levels
        for li, p in enumerate(plans):
            wlp, nv = wlps[li], p.y.halvings
            lo = int(col0[li])
            # channels side by side on lanes for one V matmul per level
            hv = jnp.concatenate(
                [hcat[bp * h : (bp + 1) * h, lo : lo + wlp] for bp in range(4)],
                axis=1,
            )  # (h, 4*wlp)
            q = jnp.roll(hv, -1, axis=0)
            v = ((hv - q) >> 1) + q  # lerp256(p, q, 128), generic.c:1290
            v8 = (v - 128).astype(jnp.int8)
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

    in_specs = [
        pl.BlockSpec((1, h, w), lambda b: (b, 0, 0)),
        pl.BlockSpec(mh.shape, lambda b: (0, 0)),
        pl.BlockSpec(corr_h.shape, lambda b: (0, 0)),
        pl.BlockSpec(shift_h.shape, lambda b: (0, 0)),
    ] + [pl.BlockSpec(m.shape, lambda b: (0, 0)) for m in mvs]
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
    consts_np = [mh, corr_h, shift_h] + list(mvs)

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
