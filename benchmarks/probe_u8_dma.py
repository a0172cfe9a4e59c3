#!/usr/bin/env python
"""On-chip micro-probe: can Mosaic window-DMA and load u8 blocks?

The channel-major 24bpp feed wants kernels to fetch (3, win_r, win_c) u8
windows at scalar-prefetched 8-aligned row starts (mirroring
pallas_bilinear._window_dma, which today fetches u32).  u8 VMEM tiling is
(32, 128), so 8-aligned row starts and u8 loads may or may not lower.
This probe tries three shapes, smallest first; a Mosaic crash surfaces
as an HTTP 500 from the remote compiler (axon-tpu-quirks).
"""

import functools
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _build(h, w, win_r, rstarts):
    n = len(rstarts)

    def kernel(rs_ref, x_any, o_ref, xwin, sem):
        g = pl.program_id(0)
        rs = pl.multiple_of(rs_ref[g], 8)
        cp = pltpu.make_async_copy(
            x_any.at[0, pl.ds(rs, win_r), :], xwin, sem
        )
        cp.start()
        cp.wait()
        v = xwin[...].astype(jnp.int32)
        o_ref[0, 0] = jnp.sum(v, dtype=jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, 1), lambda g, *_: (g, 0), memory_space=pltpu.SMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((win_r, w), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.int32),
        grid_spec=grid_spec,
    )


def main():
    rng = np.random.default_rng(11)
    for h, w, win_r, starts in [
        (64, 256, 8, [0, 8, 24]),     # 8-aligned starts, u8 tile is 32 rows
        (64, 256, 32, [0, 32]),       # 32-aligned (the safe fallback)
        (512, 1536, 16, [0, 8, 488]), # taller, non-128-multiple lanes? no:
                                      # 1536 % 128 == 0; odd row starts
    ]:
        x = rng.integers(0, 256, (1, h, w), dtype=np.uint8)
        try:
            call = _build(h, w, win_r, starts)
            got = np.asarray(
                call(jnp.asarray(np.asarray(starts, np.int32)), jnp.asarray(x))
            )[:, 0]
            want = np.asarray(
                [x[0, s : s + win_r].astype(np.int64).sum() for s in starts]
            )
            ok = np.array_equal(want, got)
            print(f"u8 dma h={h} w={w} win_r={win_r} starts={starts}: "
                  f"{'OK' if ok else f'WRONG {got} vs {want}'}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"u8 dma h={h} w={w} win_r={win_r}: FAIL {type(e).__name__}:"
                  f" {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
