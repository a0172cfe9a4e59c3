"""Microbench: per-element cost of the sRGB from_srgb lookup chain.

The round-4 config-6 ablation (probe_srgb_ablate) shows the linearize
gather chain is ~75% of the sRGB kernel's runtime (1.4 of 1.94 ms), so
this probe races drop-in replacements for pallas_srgb.lut_gather inside
a minimal Pallas kernel shaped like the kernel's inner loop: extract 3
channel bytes + alpha from u32 pixels, look each up in the 256-entry
from_srgb table (11-bit entries, smolscale.c:87-111), premultiply by
alpha, accumulate.  Output = one i32 per pixel, so variants are
bandwidth-comparable; exactness is asserted vs a numpy composition.

Variants:
  cur    -- pallas_srgb.lut_gather as shipped (packed 16/16 row, &127,
            variable-shift half select)
  slim   -- same select, but lo7 / shift extracted straight from the
            pixel word (skips the intermediate v8 materialization)
  where2 -- two unpacked 128-entry rows, two gathers + where select
  u16    -- int16 take_along_axis against a (r, 256) broadcast table:
            probes whether Mosaic lowers a 256-lane 16-bit
            DynamicGatherOp (native (8,128,2) tiling) -- if it does,
            the whole mask/select scaffolding disappears
  flat   -- one take_along_axis on the (r*c/128, 128) reshape instead
            of a python loop of c/128 lane slices (tests whether the
            slice loop + concat costs relayouts)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smolscale_tpu import luts
from smolscale_tpu.ops import pallas_srgb

R, C = 8192, 512  # u32 pixels; 16 MiB in, 16 MiB out
TR = 512  # rows per grid step


def _tables():
    fs = np.asarray(luts.FROM_SRGB, dtype=np.int64)
    t = np.zeros((4, 128), dtype=np.int32)
    t[0] = (fs[:128] | (fs[128:] << 16)).astype(np.int32)
    t[1] = fs[:128]
    t[2] = fs[128:]
    return t


def _lookup(variant, px, byte_pos, tbl, t16):
    r, c = px.shape
    if variant == "cur":
        v8 = ((px >> (8 * byte_pos)) & jnp.uint32(0xFF)).astype(jnp.int32)
        return pallas_srgb.lut_gather(v8, tbl[0:1], None)
    if variant == "slim":
        lo7 = ((px >> (8 * byte_pos)) & jnp.uint32(127)).astype(jnp.int32)
        sh = ((px >> (8 * byte_pos + 3)) & jnp.uint32(16)).astype(jnp.int32)
        src = jnp.broadcast_to(tbl[0:1], (r, 128))
        parts = []
        for k in range(c // 128):
            g = jnp.take_along_axis(src, lo7[:, k * 128 : (k + 1) * 128], axis=1)
            parts.append((g >> sh[:, k * 128 : (k + 1) * 128]) & 0xFFFF)
        return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    if variant == "where2":
        v8 = ((px >> (8 * byte_pos)) & jnp.uint32(0xFF)).astype(jnp.int32)
        lo = jnp.broadcast_to(tbl[1:2], (r, 128))
        hi = jnp.broadcast_to(tbl[2:3], (r, 128))
        parts = []
        for k in range(c // 128):
            sl = v8[:, k * 128 : (k + 1) * 128]
            l7 = sl & 127
            parts.append(jnp.where(sl < 128,
                                   jnp.take_along_axis(lo, l7, axis=1),
                                   jnp.take_along_axis(hi, l7, axis=1)))
        return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    if variant == "u16":
        v16 = ((px >> (8 * byte_pos)) & jnp.uint32(0xFF)).astype(jnp.int16)
        src = jnp.broadcast_to(t16[0:1], (r, 256))
        parts = []
        for k in range(c // 256):
            g = jnp.take_along_axis(src, v16[:, k * 256 : (k + 1) * 256], axis=1)
            parts.append(g)
        out = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        return out.astype(jnp.int32)
    if variant == "flat":
        v8 = ((px >> (8 * byte_pos)) & jnp.uint32(0xFF)).astype(jnp.int32)
        flat = v8.reshape(r * c // 128, 128)
        src = jnp.broadcast_to(tbl[0:1], (r * c // 128, 128))
        g = jnp.take_along_axis(src, flat & 127, axis=1)
        return ((g >> ((flat >> 7) << 4)) & 0xFFFF).reshape(r, c)
    raise ValueError(variant)


def make_fn(variant):
    tbl_np = _tables()
    t16_np = np.zeros((8, 256), dtype=np.int16)
    t16_np[0] = np.asarray(luts.FROM_SRGB, dtype=np.int16)

    def kernel(x_ref, tbl_ref, t16_ref, o_ref):
        px = x_ref[...]
        tbl = tbl_ref[...]
        t16 = t16_ref[...]
        a = ((px >> 24) & jnp.uint32(0xFF)).astype(jnp.int32)
        acc = None
        for b in range(3):
            l11 = _lookup(variant, px, b, tbl, t16)
            term = l11 * a
            acc = term if acc is None else acc + term
        o_ref[...] = acc

    call = pl.pallas_call(
        kernel,
        grid=(R // TR,),
        in_specs=[
            pl.BlockSpec((TR, C), lambda i: (i, 0)),
            pl.BlockSpec((4, 128), lambda i: (0, 0)),
            pl.BlockSpec((8, 256), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TR, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.int32),
    )
    tbl = jnp.asarray(tbl_np)
    t16 = jnp.asarray(t16_np)
    return lambda x: call(x, tbl, t16)


def expected(px_np):
    fs = np.asarray(luts.FROM_SRGB, dtype=np.int64)
    a = (px_np >> 24) & 0xFF
    acc = np.zeros(px_np.shape, np.int64)
    for b in range(3):
        acc += fs[(px_np >> (8 * b)) & 0xFF] * a
    return acc.astype(np.int32)


def main():
    from smolscale_tpu.utils.timing import chain_timer

    rng = np.random.default_rng(0)
    px_np = rng.integers(0, 2**32, (R, C), dtype=np.uint32)
    x = jax.device_put(jnp.asarray(px_np))
    np.asarray(x[0, 0])
    want = expected(px_np)

    for variant in sys.argv[1:] or ["cur", "slim", "where2", "u16", "flat"]:
        try:
            fn = make_fn(variant)
            got = np.asarray(jax.jit(fn)(x))
            ok = bool(np.array_equal(got, want))
            res = chain_timer(lambda v: fn(v)[0, 0], x)
            gpx = R * C / 1e9 / res.per
            print(f"{variant:8s}: {res.per*1e6:8.1f} us  {gpx:6.1f} Gpx/s "
                  f"({3*gpx:6.1f} Glookup/s)  exact={ok}  {res.confidence}",
                  flush=True)
        except Exception as e:
            print(f"{variant:8s}: FAILED {repr(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
