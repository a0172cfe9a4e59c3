"""Probe: three formulations of the headline integer-box kernel, chain-timed.

Variants (all bit-exact, validated vs numpy_ref before timing):
  bf16  -- round-1 production: per-channel (rows, W) @ (W, 2*w_out) bf16
           span-sum + boundary-gather matmul (MXU-bound at ~102 TFLOP/s).
  int8  -- same structure, operands as int8 with a -128 offset on x and a
           static per-column correction (128 * colsum) added back; v5e MXU
           int8 rate is 2x bf16.
  roll  -- span sums on the VPU via sliding-sum roll tree over SWAR pairs
           (2 channels per 32-bit lane, 16-bit sublanes); only the final
           (t, W) -> (t, w_out) compaction rides the MXU.

Usage: python -u benchmarks/probe_box_variants.py [variants...]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from smolscale_tpu.ops import fixedpoint as fp
from smolscale_tpu.ops.pallas_box import _span_matrix, _pick_rows_t
from smolscale_tpu.plan import ScalePlan

W = H = 4096
WOUT = HOUT = 256
B = 8


def _norm24_small(a, ml, mh):
    """floor((a*m + 2**23)/2**24) for a < 2**19, m = mh*2**12 + ml < 2**24.

    a*mh < 2**31 and a*ml + 2**23 < 2**31: plain int32.
    floor((a*m + 2**23)/2**24) = (a*mh + ((a*ml + 2**23) >> 12)) >> 12.
    """
    return (a * mh + ((a * ml + (1 << 23)) >> 12)) >> 12


def make_bf16(plan, rows_t, dtype):
    """Round-1 structure; dtype selects bf16 or int8 operands."""
    w_in, w_out = plan.x.dim_in, plan.x.dim_out
    h_out = plan.y.dim_out
    ry = plan.y.dim_in // plan.y.dim_out
    span_mul_x = int(plan.x.span_mul)
    span_mul_y = int(plan.y.span_mul)
    m_np = np.asarray(_span_matrix(plan.x), dtype=np.float32)
    rx = w_in // w_out

    def kernel(x_ref, m_ref, o_ref):
        g = pl.program_id(1)
        px = x_ref[0]
        m = m_ref[...]
        row_ids = g * rows_t + jax.lax.broadcasted_iota(
            jnp.int32, (rows_t, w_out), 0
        )
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows_t * ry, w_out), 1)
        out_px = jnp.zeros((rows_t, w_out), dtype=jnp.uint32)
        for byte_pos in range(4):
            ch_vals = ((px >> (8 * byte_pos)) & jnp.uint32(0xFF)).astype(jnp.int32)
            if dtype == jnp.int8:
                xb = (ch_vals - 128).astype(jnp.int8)
                y = jnp.dot(xb, m, preferred_element_type=jnp.int32)
                # undo the -128 offset: +128 * colsum, computed arithmetically
                # (span cols sum rx entries, rx-1 for the final span; gather 1)
                fs = y[:, :w_out] + (128 * rx) - jnp.where(
                    col_ids == w_out - 1, 128, 0
                )
                boundary = y[:, w_out:] + 128
            else:
                xb = ch_vals.astype(jnp.bfloat16)
                y = jnp.dot(xb, m, preferred_element_type=jnp.float32).astype(
                    jnp.int32
                )
                fs = y[:, :w_out]
                boundary = y[:, w_out:]
            acc = fs - jnp.where(
                (col_ids > 0) & (boundary > 0), jnp.int32(1), jnp.int32(0)
            )
            hrow = fp.mul_shift_round24(acc, jnp.int32(span_mul_x)) & 0xFF
            gv = hrow.reshape(rows_t, ry, w_out)
            fsv = jnp.sum(gv, axis=1)
            first = gv[:, 0, :]
            accv = fsv - jnp.where(
                (row_ids > 0) & (first > 0), jnp.int32(1), jnp.int32(0)
            )
            accv = accv - jnp.where(row_ids == h_out - 1, gv[:, ry - 1, :], 0)
            out_ch = fp.mul_shift_round24(accv, jnp.int32(span_mul_y)) & 0xFF
            out_px = out_px | (out_ch.astype(jnp.uint32) << (8 * byte_pos))
        o_ref[0] = out_px

    mat = m_np.astype(np.int8) if dtype == jnp.int8 else m_np.astype(jnp.bfloat16)
    return kernel, mat


def make_roll(plan, rows_t):
    w_in, w_out = plan.x.dim_in, plan.x.dim_out
    h_out = plan.y.dim_out
    rx = w_in // w_out
    ry = plan.y.dim_in // plan.y.dim_out
    smx = int(plan.x.span_mul)
    smy = int(plan.y.span_mul)
    mlx, mhx = smx & 0xFFF, smx >> 12
    mly, mhy = smy & 0xFFF, smy >> 12
    rows = rows_t * ry

    # compaction matrix: one-hot (W, w_out) picking lane j*rx
    cm = np.zeros((w_in, w_out), np.float32)
    for j in range(w_out):
        cm[j * rx, j] = 1.0
    cm = cm.astype(jnp.bfloat16)

    def sliding(x, r):
        """S_r[i] = sum x[i..i+r-1] (cyclic); exact for 16-bit SWAR lanes."""
        got = 1
        s = x
        while got * 2 <= r:
            s = s + pltpu.roll(s, w_in - got, 1)
            got *= 2
        rem = r - got
        if rem:
            s = s + pltpu.roll(sliding(x, rem), w_in - got, 1)
        return s

    def kernel(x_ref, cm_ref, o_ref):
        g = pl.program_id(1)
        px = x_ref[0]  # (rows, W) u32
        lo = (px & jnp.uint32(0x00FF00FF)).astype(jnp.int32)  # ch0 | ch2<<16
        hi = ((px >> 8) & jnp.uint32(0x00FF00FF)).astype(jnp.int32)  # ch1 | ch3<<16
        s_lo = sliding(lo, rx)
        s_hi = sliding(hi, rx)
        last_lo = pltpu.roll(lo, w_in - (rx - 1), 1)
        last_hi = pltpu.roll(hi, w_in - (rx - 1), 1)

        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, w_in), 1)
        is_first = lane > 0  # left-edge adjust applies except span 0
        is_last = lane == (w_out - 1) * rx
        row_ids = g * rows_t + jax.lax.broadcasted_iota(
            jnp.int32, (rows_t, w_in), 0
        )

        out_px = jnp.zeros((rows_t, w_out), dtype=jnp.uint32)
        for c, (splane, xplane, lplane, sh) in enumerate(
            [
                (s_lo, lo, last_lo, 0),
                (s_hi, hi, last_hi, 0),
                (s_lo, lo, last_lo, 16),
                (s_hi, hi, last_hi, 16),
            ]
        ):
            s = (splane >> sh) & 0xFFFF
            xv = (xplane >> sh) & 0xFFFF
            xl = (lplane >> sh) & 0xFFFF
            acc = s - (is_first & (xv > 0)).astype(jnp.int32)
            acc = acc - jnp.where(is_last, xl, 0)
            hrow = _norm24_small(acc, mlx, mhx) & 0xFF
            gv = hrow.reshape(rows_t, ry, w_in)
            fsv = jnp.sum(gv, axis=1)
            first = gv[:, 0, :]
            accv = fsv - ((row_ids > 0) & (first > 0)).astype(jnp.int32)
            accv = accv - jnp.where(row_ids == h_out - 1, gv[:, ry - 1, :], 0)
            out_ch = _norm24_small(accv, mly, mhy) & 0xFF  # (rows_t, W) strided
            # compact strided lanes j*rx -> j via one-hot matmul (<=255: bf16)
            comp = jnp.dot(
                out_ch.astype(jnp.bfloat16), cm_ref[...],
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            # loop order is byte 0 (lo,sh0), 1 (hi,sh0), 2 (lo,sh16), 3 (hi,sh16)
            out_px = out_px | (comp.astype(jnp.uint32) << (8 * c))
        o_ref[0] = out_px

    return kernel, np.asarray(cm)


def make_int8h(plan, rows_t):
    """int8 matmul with the span matrix only (no gather half): the left-edge
    -1 adjustment is applied to the *input* (x' = x - [span-first lane &
    x>0]), which rides through the span sum exactly."""
    w_in, w_out = plan.x.dim_in, plan.x.dim_out
    h_out = plan.y.dim_out
    rx = w_in // w_out
    ry = plan.y.dim_in // plan.y.dim_out
    span_mul_x = int(plan.x.span_mul)
    span_mul_y = int(plan.y.span_mul)
    rows = rows_t * ry

    m = np.zeros((w_in, w_out), np.float32)
    for j in range(w_out):
        lo, hi = j * rx, (j + 1) * rx
        if j == w_out - 1:
            hi -= 1
        m[lo:hi, j] = 1.0

    def kernel(x_ref, m_ref, o_ref):
        g = pl.program_id(1)
        px = x_ref[0]
        m8 = m_ref[...]
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, w_in), 1)
        adj_lane = (lane > 0) & (lane % rx == 0)
        row_ids = g * rows_t + jax.lax.broadcasted_iota(
            jnp.int32, (rows_t, w_out), 0
        )
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows_t, w_out), 1)
        out_px = jnp.zeros((rows_t, w_out), dtype=jnp.uint32)
        for byte_pos in range(4):
            ch = ((px >> (8 * byte_pos)) & jnp.uint32(0xFF)).astype(jnp.int32)
            chp = ch - (adj_lane & (ch > 0)).astype(jnp.int32)
            xb = (chp - 128).astype(jnp.int8)
            y = jnp.dot(xb, m8, preferred_element_type=jnp.int32)
            acc = y + (128 * rx) - jnp.where(
                col_ids[:1] == w_out - 1, 128, 0
            )  # undo offset; broadcasts over rows
            hrow = fp.mul_shift_round24(acc, jnp.int32(span_mul_x)) & 0xFF
            gv = hrow.reshape(rows_t, ry, w_out)
            fsv = jnp.sum(gv, axis=1)
            first = gv[:, 0, :]
            accv = fsv - jnp.where(
                (row_ids > 0) & (first > 0), jnp.int32(1), jnp.int32(0)
            )
            accv = accv - jnp.where(row_ids == h_out - 1, gv[:, ry - 1, :], 0)
            out_ch = fp.mul_shift_round24(accv, jnp.int32(span_mul_y)) & 0xFF
            out_px = out_px | (out_ch.astype(jnp.uint32) << (8 * byte_pos))
        o_ref[0] = out_px

    return kernel, m.astype(np.int8)


def make_ablate(plan, rows_t, mode):
    """Timing-only ablations of int8h (results are WRONG; never validate)."""
    w_in, w_out = plan.x.dim_in, plan.x.dim_out
    h_out = plan.y.dim_out
    rx = w_in // w_out
    ry = plan.y.dim_in // plan.y.dim_out
    span_mul_x = int(plan.x.span_mul)
    span_mul_y = int(plan.y.span_mul)
    rows = rows_t * ry

    m = np.zeros((w_in, w_out), np.float32)
    for j in range(w_out):
        m[j * rx : (j + 1) * rx, j] = 1.0

    def kernel(x_ref, m_ref, o_ref):
        g = pl.program_id(1)
        px = x_ref[0]
        m8 = m_ref[...]
        if mode == "dma":
            # just touch the tile: slice + trivial reduce
            o_ref[0] = px[:rows_t, :w_out] + px[rows_t:2 * rows_t, :w_out]
            return
        if mode == "vpuonly":
            # unpack + adjust + convert, no matmul, no norm/vertical
            acc = jnp.zeros((rows, w_out), jnp.int32)
            for byte_pos in range(4):
                ch = ((px >> (8 * byte_pos)) & jnp.uint32(0xFF)).astype(jnp.int32)
                acc = acc + ch[:, :w_out]
            o_ref[0] = acc[:rows_t].astype(jnp.uint32)
            return
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, w_in), 1)
        adj_lane = (lane > 0) & (lane % rx == 0)
        row_ids = g * rows_t + jax.lax.broadcasted_iota(
            jnp.int32, (rows_t, w_out), 0
        )
        out_px = jnp.zeros((rows_t, w_out), dtype=jnp.uint32)
        for byte_pos in range(4):
            if mode == "dotonly":
                xb = px.astype(jnp.int8)  # skip unpack/adjust entirely
            else:
                ch = ((px >> (8 * byte_pos)) & jnp.uint32(0xFF)).astype(jnp.int32)
                if mode != "noadj":
                    ch = ch - (adj_lane & (ch > 0)).astype(jnp.int32)
                xb = (ch - 128).astype(jnp.int8)
            if mode == "nodot":
                y = xb[:, :w_out].astype(jnp.int32) * 0 + 1
            else:
                y = jnp.dot(xb, m8, preferred_element_type=jnp.int32)
            acc = y + (128 * rx)
            hrow = fp.mul_shift_round24(acc, jnp.int32(span_mul_x)) & 0xFF
            gv = hrow.reshape(rows_t, ry, w_out)
            fsv = jnp.sum(gv, axis=1)
            first = gv[:, 0, :]
            accv = fsv - jnp.where(
                (row_ids > 0) & (first > 0), jnp.int32(1), jnp.int32(0)
            )
            accv = accv - jnp.where(row_ids == h_out - 1, gv[:, ry - 1, :], 0)
            out_ch = fp.mul_shift_round24(accv, jnp.int32(span_mul_y)) & 0xFF
            out_px = out_px | (out_ch.astype(jnp.uint32) << (8 * byte_pos))
        o_ref[0] = out_px

    return kernel, m.astype(np.int8)


def make_int8h2(plan, rows_t):
    """int8h + static span-first mask as an input row (kills the in-kernel
    lane%rx modulo) + parallel grid semantics for DMA overlap."""
    w_in, w_out = plan.x.dim_in, plan.x.dim_out
    h_out = plan.y.dim_out
    rx = w_in // w_out
    ry = plan.y.dim_in // plan.y.dim_out
    span_mul_x = int(plan.x.span_mul)
    span_mul_y = int(plan.y.span_mul)
    rows = rows_t * ry

    m = np.zeros((w_in, w_out), np.float32)
    for j in range(w_out):
        lo, hi = j * rx, (j + 1) * rx
        if j == w_out - 1:
            hi -= 1
        m[lo:hi, j] = 1.0
    adj_row = np.zeros((8, w_in), np.int32)
    adj_row[:, ::rx] = 1
    adj_row[:, 0] = 0

    def kernel(x_ref, m_ref, adj_ref, o_ref):
        g = pl.program_id(1)
        px = x_ref[0]
        m8 = m_ref[...]
        adj = adj_ref[0:1, :]
        row_ids = g * rows_t + jax.lax.broadcasted_iota(
            jnp.int32, (rows_t, w_out), 0
        )
        col_last = jax.lax.broadcasted_iota(
            jnp.int32, (1, w_out), 1
        ) == (w_out - 1)
        out_px = jnp.zeros((rows_t, w_out), dtype=jnp.uint32)
        for byte_pos in range(4):
            ch = ((px >> (8 * byte_pos)) & jnp.uint32(0xFF)).astype(jnp.int32)
            chp = ch - (adj & (ch > 0).astype(jnp.int32))
            xb = (chp - 128).astype(jnp.int8)
            y = jnp.dot(xb, m8, preferred_element_type=jnp.int32)
            acc = y + (128 * rx) - jnp.where(col_last, 128, 0)
            hrow = fp.mul_shift_round24(acc, jnp.int32(span_mul_x)) & 0xFF
            gv = hrow.reshape(rows_t, ry, w_out)
            fsv = jnp.sum(gv, axis=1)
            first = gv[:, 0, :]
            accv = fsv - jnp.where(
                (row_ids > 0) & (first > 0), jnp.int32(1), jnp.int32(0)
            )
            accv = accv - jnp.where(row_ids == h_out - 1, gv[:, ry - 1, :], 0)
            out_ch = fp.mul_shift_round24(accv, jnp.int32(span_mul_y)) & 0xFF
            out_px = out_px | (out_ch.astype(jnp.uint32) << (8 * byte_pos))
        o_ref[0] = out_px

    return kernel, m.astype(np.int8), adj_row


def build(plan, variant, pre_u32=False):
    rows_t = _pick_rows_t(plan)
    if variant.startswith("abl-"):
        kernel, mat = make_ablate(plan, rows_t, variant[4:])
        ry = plan.y.dim_in // plan.y.dim_out
        h_out = plan.y.dim_out
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, h_out, plan.width_out), jnp.uint32),
            grid=(B, h_out // rows_t),
            in_specs=[
                pl.BlockSpec((1, rows_t * ry, plan.width_in), lambda b, g: (b, g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(mat.shape, lambda b, g: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rows_t, plan.width_out), lambda b, g: (b, g, 0),
                                   memory_space=pltpu.VMEM),
        )
        matj = jnp.asarray(mat)

        def fn(imgs):
            px = imgs if pre_u32 else jax.lax.bitcast_convert_type(imgs, jnp.uint32)
            out = call(px, matj)
            return jax.lax.bitcast_convert_type(out, jnp.uint8)

        return fn
    if variant.startswith("int8v2"):
        if "-" in variant:
            rows_t = int(variant.split("-")[1])
        kernel, mat, adj = make_int8h2(plan, rows_t)
        ry = plan.y.dim_in // plan.y.dim_out
        h_out = plan.y.dim_out
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, h_out, plan.width_out), jnp.uint32),
            grid=(B, h_out // rows_t),
            in_specs=[
                pl.BlockSpec((1, rows_t * ry, plan.width_in), lambda b, g: (b, g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(mat.shape, lambda b, g: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(adj.shape, lambda b, g: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rows_t, plan.width_out), lambda b, g: (b, g, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )
        matj = jnp.asarray(mat)
        adjj = jnp.asarray(adj)

        def fn(imgs):
            px = imgs if pre_u32 else jax.lax.bitcast_convert_type(imgs, jnp.uint32)
            out = call(px, matj, adjj)
            return jax.lax.bitcast_convert_type(out, jnp.uint8)

        return fn
    if variant.startswith("int8h"):
        if "-" in variant:
            rows_t = int(variant.split("-")[1])
        kernel, mat = make_int8h(plan, rows_t)
        ry = plan.y.dim_in // plan.y.dim_out
        h_out = plan.y.dim_out
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, h_out, plan.width_out), jnp.uint32),
            grid=(B, h_out // rows_t),
            in_specs=[
                pl.BlockSpec((1, rows_t * ry, plan.width_in), lambda b, g: (b, g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(mat.shape, lambda b, g: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rows_t, plan.width_out), lambda b, g: (b, g, 0),
                                   memory_space=pltpu.VMEM),
        )
        matj = jnp.asarray(mat)

        def fn(imgs):
            px = imgs if pre_u32 else jax.lax.bitcast_convert_type(imgs, jnp.uint32)
            out = call(px, matj)
            return jax.lax.bitcast_convert_type(out, jnp.uint8)

        return fn
    ry = plan.y.dim_in // plan.y.dim_out
    h_out = plan.y.dim_out
    if variant == "roll":
        kernel, mat = make_roll(plan, rows_t)
    else:
        kernel, mat = make_bf16(
            plan, rows_t, jnp.int8 if variant == "int8" else jnp.bfloat16
        )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, h_out, plan.width_out), jnp.uint32),
        grid=(B, h_out // rows_t),
        in_specs=[
            pl.BlockSpec((1, rows_t * ry, plan.width_in), lambda b, g: (b, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(mat.shape, lambda b, g: (0,) * len(mat.shape),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows_t, plan.width_out), lambda b, g: (b, g, 0),
                               memory_space=pltpu.VMEM),
    )
    matj = jnp.asarray(mat)

    def fn(imgs):
        px = imgs if pre_u32 else jax.lax.bitcast_convert_type(imgs, jnp.uint32)
        out = call(px, matj)
        return jax.lax.bitcast_convert_type(out, jnp.uint8)

    return fn


def _timed(f, x):
    t0 = time.time()
    np.asarray(f(x))
    return time.time() - t0


def main():
    plan = ScalePlan(W, H, WOUT, HOUT, 0, 0, False)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (B, H, W, 4), dtype=np.uint8)

    from smolscale_tpu.backends import numpy_ref

    want = numpy_ref.scale(plan, imgs[0])

    variants = sys.argv[1:] or ["bf16", "int8", "roll"]
    x = jax.device_put(jnp.asarray(imgs))
    np.asarray(x[0, 0, 0])
    # pre-viewed u32 upload (host view is free; skips the on-device relayout
    # that bitcast_convert_type u8->u32 forces)
    xu32 = jax.device_put(jnp.asarray(imgs.reshape(B, H, W * 4).view(np.uint32)))
    np.asarray(xu32[0, 0, 0])

    for v in variants:
        pre = v.endswith("+u32")
        v = v[:-4] if pre else v
        try:
            fn = build(plan, v, pre_u32=pre)
            xx = xu32 if pre else x
            got = np.asarray(fn(xx))[0]
            ok = np.array_equal(want, got) or v.startswith("abl-")
            print(f"{v}: exact={np.array_equal(want, got)}", flush=True)
            if not ok:
                bad = np.argwhere(want != got)
                print(f"  first diffs {bad[:3]} want {want[tuple(bad[0])]} got {got[tuple(bad[0])]}", flush=True)
                continue

            def make(k):
                @jax.jit
                def f(val):
                    def body(i, carry):
                        return fn(val ^ carry)[0, 0, 0, 0]
                    return jax.lax.fori_loop(0, k, body, jnp.uint8(0))
                return f

            f_s, f_l = make(2), make(22)
            np.asarray(f_s(xx)); np.asarray(f_l(xx))
            ts = min(_timed(f_s, xx) for _ in range(3))
            tl = min(_timed(f_l, xx) for _ in range(3))
            per = (tl - ts) / 20
            print(f"{v}: {per*1e3:.3f} ms/batch, {B*W*H/1e6/per:.0f} Mpix/s", flush=True)
        except Exception as e:
            print(f"{v}: FAILED {repr(e)[:600]}", flush=True)


if __name__ == "__main__":
    main()
