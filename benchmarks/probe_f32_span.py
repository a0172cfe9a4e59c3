"""Microbench: exact f32 matmul vs int8 limb splits for box-span sums.

The sRGB box H stage (config 6 class) contracts 19-bit linear-premul
values against a 0/1 span matrix in 3 unbiased 7-bit int8 limb passes
(_span_mm_i8).  Limb PREP is ~2 VPU ops per limb per element and the
probe_srgb ablation shows the class is VPU-bound, so trading MXU passes
for prep ops could pay: a single f32 matmul at 3-pass bf16x3 precision
is exact here (inputs < 2**19 are f32-exact, the matrix is 0/1 so its
bf16 split has a zero low half, span sums < 2**22 < 2**24 keep every
f32 accumulation step integral) and preps with ONE convert.

Variants (all compute exact 8:1 span sums of 19-bit values):
  i8_3   -- 3x 7-bit int8 limb matmuls (what ships today)
  i8b_3  -- 3x biased 8-bit int8 limb matmuls + static correction
  f32h   -- one f32 dot, precision=HIGH (bf16x3)
  f32hh  -- one f32 dot, precision=HIGHEST
  bf16_3 -- 3x 8-bit bf16 limb matmuls (_gather_mm form)

Usage: python benchmarks/probe_f32_span.py [variant ...]

RESULT (2026-08-19, v5e): NEGATIVE — the f32 forms don't exist in
Mosaic.  `precision=HIGH` raises NotImplementedError('Unsupported dot
precision: HIGH') and `precision=HIGHEST` crashes the remote compile
(HTTP 500 from tpu_compile_helper).  The shipping 3x7-bit int8 form is
also the fastest limb form standalone: i8_3 35.5 us (944 GB/s in),
i8b_3 36.5 (919), bf16_3 67.0 (501), all exact.  The sRGB H stage
keeps _span_mm_i8.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

R, C = 4096, 2048  # input rows x lanes, 32 MiB of i32
D = 8              # span length: C/D out lanes
TR = 512


def _span_matrix(dtype):
    m = np.zeros((C, C // D), dtype=dtype)
    for jj in range(C // D):
        m[jj * D : (jj + 1) * D, jj] = 1
    return m


def make_fn(variant):
    mdt = {"i8_3": np.int8, "i8b_3": np.int8,
           "f32h": np.float32, "f32hh": np.float32,
           "bf16_3": np.float32}[variant]
    mat_np = _span_matrix(mdt)
    mat = jnp.asarray(mat_np)
    if variant == "bf16_3":
        mat = mat.astype(jnp.bfloat16)
    # biased form's static per-column correction: 128 * colsum * sum(2^8l)
    corr_np = (128 * mat_np.astype(np.int64).sum(axis=0)
               * sum(1 << (8 * l) for l in range(3)))
    corr = jnp.asarray((corr_np & 0xFFFFFFFF).astype(np.uint32)
                       .view(np.int32)[None, :])

    def kernel(x_ref, m_ref, c_ref, o_ref):
        x = x_ref[...].astype(jnp.int32)
        m = m_ref[...]
        if variant == "i8_3":
            acc = None
            for sh in (0, 7, 14):
                lb = ((x >> sh) & 0x7F).astype(jnp.int8)
                y = jnp.dot(lb, m, preferred_element_type=jnp.int32)
                acc = y if acc is None else acc + (y << sh)
        elif variant == "i8b_3":
            acc = None
            for sh in (0, 8, 16):
                lb = (((x >> sh) & 0xFF) - 128).astype(jnp.int8)
                y = jnp.dot(lb, m, preferred_element_type=jnp.int32)
                acc = y if acc is None else acc + (y << sh)
            acc = acc + c_ref[...]
        elif variant in ("f32h", "f32hh"):
            prec = (jax.lax.Precision.HIGH if variant == "f32h"
                    else jax.lax.Precision.HIGHEST)
            y = jax.lax.dot_general(
                x.astype(jnp.float32), m,
                (((1,), (0,)), ((), ())),
                precision=prec,
                preferred_element_type=jnp.float32,
            )
            acc = y.astype(jnp.int32)
        elif variant == "bf16_3":
            acc = None
            for sh in (0, 8, 16):
                lb = ((x >> sh) & 0xFF).astype(jnp.bfloat16)
                y = jnp.dot(lb, m, preferred_element_type=jnp.float32)
                acc = (y.astype(jnp.int32) if acc is None
                       else acc + (y.astype(jnp.int32) << sh))
        else:
            raise ValueError(variant)
        o_ref[...] = acc

    return pl.pallas_call(
        kernel,
        grid=(R // TR,),
        in_specs=[
            pl.BlockSpec((TR, C), lambda i: (i, 0)),
            pl.BlockSpec(mat_np.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, C // D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TR, C // D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((R, C // D), jnp.int32),
    ), mat, corr


def main():
    from smolscale_tpu.utils.timing import chain_timer

    rng = np.random.default_rng(0)
    x_np = rng.integers(0, 1 << 19, (R, C), dtype=np.int32)
    x = jax.device_put(jnp.asarray(x_np))
    np.asarray(x[0, 0])
    want = x_np.astype(np.int64).reshape(R, C // D, D).sum(axis=2)
    want = (want & 0xFFFFFFFF).astype(np.uint32).view(np.int32)

    for variant in sys.argv[1:] or ["i8_3", "i8b_3", "f32h", "f32hh",
                                    "bf16_3"]:
        try:
            call, mat, corr = make_fn(variant)
            fn = lambda v: call(v, mat, corr)
            got = np.asarray(jax.jit(fn)(x))
            ok = bool(np.array_equal(got, want))
            res = chain_timer(lambda v: fn(v)[0, 0], x)
            gb = R * C * 4 / 1e9 / res.per
            print(f"{variant:7s}: {res.per*1e6:8.1f} us  {gb:6.0f} GB/s in"
                  f"  exact={ok}  {res.confidence}", flush=True)
        except Exception as e:
            print(f"{variant:7s}: FAILED {repr(e)[:240]}", flush=True)


if __name__ == "__main__":
    main()
