"""Microbench: every-d-th-lane compaction for uniform-ladder H stages.

The uniform 2h ladder (config 6/1b class, 8:1) currently contracts the
whole window against a (win_c, jc_out) 0/1 count matrix in 3 int8 limb
passes -- ~0.24 ms of MXU plus ~8 VPU limb-prep ops per input element on
config 6 (probe_srgb_ablate 2026-08-19: H stage 0.654 ms of 1.295).  But
the ladder sum is just "average adjacent pairs, add 4 strided terms,
keep every 8th lane": if Mosaic can select every d-th lane cheaply, the
matmul AND the limb prep disappear for every uniform-stride plan.

Variants (all compute the exact 8:1 2h ladder on 19-bit values):
  mm3    -- avg + 3-limb int8 count matmul (what ships today)
  gsel   -- avg + stride-2 roll-sum + 8x(DynamicGatherOp + select)
            compaction: out vreg j takes its 16 lanes from input vreg k
            via a per-k clipped index map, masked together
  slice  -- avg + roll-sum + jax.lax.slice with lane stride 8 (probes
            whether Mosaic lowers strided lane slices at all)
  resh   -- avg + roll-sum + reshape (r, 128, 8)[:, :, 0] (probes the
            lane-split relayout)

Usage: python benchmarks/probe_lane_compact.py [variant ...]
"""

import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

R, C = 4096, 2048  # input rows x lanes (u32-sized values), 32 MiB
D = 8              # output stride: C/D out lanes
TR = 512


def _avg(p, q):
    return (p & q) + ((p ^ q) >> 1)


def _ladder_sum(x):
    """avg adjacent pairs, then sum sample lanes {0,2,4,6} of each
    8-lane group into the group's lane 0 (stride-2 roll-sum)."""
    a = _avg(x, jnp.roll(x, -1, axis=1))
    s = a + jnp.roll(a, -2, axis=1)
    s = s + jnp.roll(s, -4, axis=1)
    return s


def _compact_gsel(s, d):
    """out[:, j] = s[:, d*j] via per-vreg DynamicGatherOp + select.

    Built one 128-lane OUT slice at a time (concat at the end -- Mosaic
    has no scatter): out slice m's sources span d input vregs; each
    contributes its window of 128//d out lanes via a clipped per-vreg
    index map and a lane-range select."""
    r, c = s.shape
    co = c // d
    jj = jax.lax.broadcasted_iota(jnp.int32, (r, min(co, 128)), 1)
    parts = []
    for m in range(-(-co // 128)):
        j = jj + m * 128              # global out lane
        src_lane = j * d              # global source lane
        cur = None
        k0 = (m * 128 * d) // 128
        k1 = min(c, ((m * 128 + min(co, 128) - 1) * d) + 1)
        for k in range(k0, -(-k1 // 128)):
            src = s[:, k * 128 : (k + 1) * 128]
            idx = jnp.clip(src_lane - k * 128, 0, 127)
            g = jnp.take_along_axis(src, idx, axis=1)
            win = (src_lane >= k * 128) & (src_lane < k * 128 + 128)
            cur = g if cur is None else jnp.where(win, g, cur)
        parts.append(cur)
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def _count_matrix():
    """(C, C//D) int8 ladder count matrix: out j sums avg-lanes
    {8j, 8j+2, 8j+4, 8j+6} (the mm3 ground-truth contraction)."""
    m = np.zeros((C, C // D), dtype=np.int8)
    for jj in range(C // D):
        for kk in range(0, 8, 2):
            m[jj * D + kk, jj] = 1
    return m


def make_fn(variant):
    mat = jnp.asarray(_count_matrix())

    def kernel(x_ref, m_ref, o_ref):
        x = x_ref[...].astype(jnp.int32)
        if variant == "mm3":
            a = _avg(x, jnp.roll(x, -1, axis=1))
            acc = None
            for sh in (0, 7, 14):
                lb = ((a >> sh) & 0x7F).astype(jnp.int8)
                y = jnp.dot(lb, m_ref[...],
                            preferred_element_type=jnp.int32)
                acc = y if acc is None else acc + (y << sh)
            o_ref[...] = (acc >> 2) & 0xFFFFFF
        elif variant == "gsel":
            s = _ladder_sum(x)
            o_ref[...] = (_compact_gsel(s, D) >> 2) & 0xFFFFFF
        elif variant == "slice":
            s = _ladder_sum(x)
            o_ref[...] = (
                jax.lax.slice(s, (0, 0), (s.shape[0], s.shape[1]),
                              (1, D)) >> 2) & 0xFFFFFF
        elif variant == "resh":
            s = _ladder_sum(x)
            o_ref[...] = (
                s.reshape(s.shape[0], s.shape[1] // D, D)[:, :, 0]
                >> 2) & 0xFFFFFF
        else:
            raise ValueError(variant)

    return pl.pallas_call(
        kernel,
        grid=(R // TR,),
        in_specs=[
            pl.BlockSpec((TR, C), lambda i: (i, 0)),
            pl.BlockSpec((C, C // D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TR, C // D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((R, C // D), jnp.int32),
    ), mat


def expected(x_np):
    q = np.roll(x_np, -1, axis=1)
    a = (x_np & q) + ((x_np ^ q) >> 1)
    out = np.zeros((R, C // D), np.int64)
    for kk in range(0, 8, 2):
        out += a[:, kk::D]
    return ((out >> 2) & 0xFFFFFF).astype(np.int32)


def main():
    from smolscale_tpu.utils.timing import chain_timer

    rng = np.random.default_rng(0)
    x_np = rng.integers(0, 1 << 19, (R, C), dtype=np.int32)
    x = jax.device_put(jnp.asarray(x_np))
    np.asarray(x[0, 0])
    want = expected(x_np.astype(np.int64))

    for variant in sys.argv[1:] or ["mm3", "gsel", "slice", "resh"]:
        try:
            call, mat = make_fn(variant)
            fn = lambda v: call(v, mat)
            got = np.asarray(jax.jit(fn)(x))
            ok = bool(np.array_equal(got, want))
            res = chain_timer(lambda v: fn(v)[0, 0], x)
            gb = R * C * 4 / 1e9 / res.per
            print(f"{variant:6s}: {res.per*1e6:8.1f} us  {gb:6.0f} GB/s in"
                  f"  exact={ok}  {res.confidence}", flush=True)
        except Exception as e:
            print(f"{variant:6s}: FAILED {repr(e)[:240]}", flush=True)


if __name__ == "__main__":
    main()
