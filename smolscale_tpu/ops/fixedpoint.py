"""Exact 32-bit formulations of the reference's 64-bit fixed-point primitives.

TPUs have no 64-bit vector lanes (the VPU is 8x128 of 32-bit), so every u64
operation in the C generic backend is re-derived here as int32/uint32
arithmetic with *proven-equal* results over the operand ranges the pipeline
produces.  Each helper documents its operand bounds; tests/test_fixedpoint.py
checks them exhaustively/randomly against int64 ground truth.

These are shared by the XLA backend and the Pallas kernels (jnp works inside
kernel bodies).
"""

from __future__ import annotations

import jax.numpy as jnp

MASK64 = 0xFF  # per-lane working mask in 64bpp storage
MASK128 = 0xFFFFFF  # per-lane working mask in 128bpp storage


def lerp256(p, q, f, mask):
    """Bilinear lerp: floor((p*f + q*(256-f)) / 256) & mask.

    Matches the reference's ((p - q) * F >> 8) + q (generic.c:1317 etc.):
    for f in [0, 256], floor((p-q)f/256) + q == floor((pf + q(256-f))/256).
    Bounds: p, q <= 0xffffff, so each product <= 0xffffff*256 < 2**32 and
    their convex-combination sum <= 0xffffff*256 < 2**32 -- exact in uint32.
    """
    p = p.astype(jnp.uint32)
    q = q.astype(jnp.uint32)
    f = f.astype(jnp.uint32)
    t = p * f + q * (jnp.uint32(256) - f)
    return ((t >> 8) & jnp.uint32(mask)).astype(jnp.int32)


def weight256(v, w, mask):
    """(v * w) >> 8 & mask, w in [0, 256] (weight_pixel_*, generic.c:1177-1192).

    Bounds: v <= 0xffffff -> v*w <= 0xffffff*256 < 2**32, exact in uint32.
    """
    t = v.astype(jnp.uint32) * w.astype(jnp.uint32)
    return ((t >> 8) & jnp.uint32(mask)).astype(jnp.int32)


def mul_shift_round24(a, m):
    """floor((a*m + 2**23) / 2**24), the box normalization
    (scale_64bpp / scale_128bpp_half, generic.c:1231-1261).

    Bounds: 0 <= a < 2**32 (interpreted as uint32) and 0 <= m < 2**24.
    This covers every accumulator the pipeline can produce: the worst case
    is PREMUL16 lanes (<= 255*255 = 65025) over spans up to 65535
    (65025*65535 < 2**32) and linear-light lanes (<= 2047*255 = 521985)
    over spans up to the 8191:1 sRGB cutoff (521985*8191 < 2**32) -- the
    reference enforces exactly these limits so its own 32-bit lane
    accumulators cannot overflow (smolscale.c:760-770, generic.c:2248).

    3-limb split, every intermediate < 2**32 so uint32 (mod-2**32) is exact:
      a = a2*2**24 + a1*2**12 + a0   (a2 < 2**8, a1,a0 < 2**12)
      m = mh*2**12 + ml              (mh,ml < 2**12)
      floor((a*m + 2**23)/2**24)
        = a2*m + floor((a1*m + floor((a0*m + 2**23)/2**12)) / 2**12)
      with  floor((ai*m + c)/2**12) = ai*mh + ((ai*ml + c) >> 12).
      Intermediates: ai*mh < 2**24, ai*ml + c < 2**25+2**23,
      w0,w1 < 2**24 + 2**13; a2*m < 2**32; the final sum equals the true
      result, which is < 2**32 whenever a < 2**32 and m < 2**24.
    """
    a = a.astype(jnp.uint32)
    m = m.astype(jnp.uint32)
    a2 = a >> 24
    a1 = (a >> 12) & jnp.uint32(0xFFF)
    a0 = a & jnp.uint32(0xFFF)
    mh, ml = m >> 12, m & jnp.uint32(0xFFF)
    w0 = a0 * mh + ((a0 * ml + jnp.uint32(1 << 23)) >> 12)
    w1 = a1 * mh + ((a1 * ml + w0) >> 12)
    return (a2 * m + w1).astype(jnp.int32)


def mul_shift_small(v, m, shift):
    """floor(v * m / 2**shift) where v*m < 2**31 -- plain int32.

    Covers unpremul_p8 (v <= 255, m < 2**21, generic.c:227-236) and
    unpremul_p8l (v <= 2047, m < 2**18, generic.c:271-280): products < 2**29.
    """
    return (v.astype(jnp.int32) * m.astype(jnp.int32)) >> shift


def mul_shift_u32(v, m, shift):
    """floor(v * m / 2**shift) where v*m < 2**32 -- exact in uint32.

    Covers unpremul_p16 (v <= 0xffff, m <= 2**16, generic.c:290-299):
    product <= 0xffff * 0x10000 < 2**32.
    """
    t = v.astype(jnp.uint32) * m.astype(jnp.uint32)
    return (t >> shift).astype(jnp.int32)


def mul_shift_p16l(v, m):
    """floor(v * m / 2**19) for unpremul_p16l (generic.c:309-318).

    Bounds: v <= 2047*255 < 2**20, m <= 2**19, so v*m < 2**39 needs a split:
      v = vh*2**8 + vl,  vh < 2**12, vl < 2**8
      vh*m < 2**12 * 2**19 = 2**31 boundary; actually vh <= 522240>>8 = 2040
      < 2**11 so vh*m < 2**30, and vl*m < 2**27 -- both int32-safe.
      floor(v*m / 2**19) = floor((vh*m + floor(vl*m / 2**8)) / 2**11)
    by the nested-floor identity on v*m = (vh*m)*2**8 + vl*m.
    """
    v = v.astype(jnp.int32)
    m = m.astype(jnp.int32)
    vh, vl = v >> 8, v & 0xFF
    return (vh * m + ((vl * m) >> 8)) >> 11


def segsum_cumsum(values, starts, lengths, axis=-1):
    """Exact integer segment sums via split cumulative sums.

    values: int32 planes with entries < 2**24 along ``axis``; returns
    sum(values[start:start+length]) per segment, exact even when the full
    prefix sum exceeds 2**31 (split into 12-bit halves whose cumsums stay
    below 2**28 for dims <= 65535; recombined in uint32, exact because each
    true segment sum < 2**30).
    """
    v = values.astype(jnp.int32)
    lo = v & 0xFFF
    hi = v >> 12
    zshape = list(v.shape)
    zshape[axis] = 1
    zero = jnp.zeros(zshape, dtype=jnp.int32)
    clo = jnp.concatenate([zero, jnp.cumsum(lo, axis=axis, dtype=jnp.int32)], axis=axis)
    chi = jnp.concatenate([zero, jnp.cumsum(hi, axis=axis, dtype=jnp.int32)], axis=axis)
    ends = starts + lengths
    slo = jnp.take(clo, ends, axis=axis) - jnp.take(clo, starts, axis=axis)
    shi = jnp.take(chi, ends, axis=axis) - jnp.take(chi, starts, axis=axis)
    return (
        slo.astype(jnp.uint32) + (shi.astype(jnp.uint32) << 12)
    ).astype(jnp.int32)
